package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.Coreset

/** Greedy k-center: hand-traced farthest-point selection, tie-break
  * and duplicate laws, early stop, and the monotone-radius guarantee
  * on the corpus. */
class CoresetSpec extends SparkSpec {

  private def emb(rows: (Long, Seq[Double])*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("vec_id", "embedding")
  }

  private def trace(df: DataFrame, k: Int): Seq[(Long, Long, Long)] =
    Coreset.kcenter(spark, df, k).orderBy(col("rnd"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("1-D line: farthest point first, exact integer radii") {
    // positions (after x1000 fixed-point): 0, 1000, 500, 499
    val t = trace(emb(
      1L -> Seq(0.0), 2L -> Seq(1.0), 3L -> Seq(0.5), 4L -> Seq(0.499)), 3)
    // seed = min id (1). r1: farthest is 2 at d2 = 1000^2.
    // r2: 3 at d2 = 500^2 (closer of the two centers), beats 4 at 499^2.
    assert(t === Seq((0L, 1L, -1L), (1L, 2L, 1000000L), (2L, 3L, 250000L)))
  }

  test("equidistant candidates: smallest vec_id wins") {
    val t = trace(emb(
      1L -> Seq(0.0), 3L -> Seq(-1.0), 2L -> Seq(1.0)), 2)
    assert(t === Seq((0L, 1L, -1L), (1L, 2L, 1000000L)))
  }

  test("duplicate vectors select with radius 0 and never re-pick a center") {
    val t = trace(emb(
      1L -> Seq(0.0), 2L -> Seq(0.0), 3L -> Seq(1.0)), 3)
    // seed 1; r1 picks 3 (d2 = 1e6); r2 the duplicate 2 at radius 0
    assert(t === Seq((0L, 1L, -1L), (1L, 3L, 1000000L), (2L, 2L, 0L)))
    assert(t.map(_._2).distinct.size === 3)
  }

  test("fewer vectors than k: early stop, one row per vector") {
    val t = trace(emb(1L -> Seq(0.0), 2L -> Seq(2.0)), 8)
    assert(t === Seq((0L, 1L, -1L), (1L, 2L, 4000000L)))
  }

  test("empty input: empty selection") {
    import spark.implicits._
    val t = trace(Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding"), 4)
    assert(t.isEmpty)
  }

  test("multi-dim distances are exact squared L2 in fixed point") {
    // d2(a, b) over x1000 ints: (3000-0)^2 + (4000-0)^2 = 25e6
    val t = trace(emb(1L -> Seq(0.0, 0.0), 2L -> Seq(3.0, 4.0)), 2)
    assert(t(1) === ((1L, 2L, 25000000L)))
  }

  test("radii are monotone non-increasing (greedy 2-approx invariant)") {
    val pts = (1L to 40L).map(i =>
      i -> Seq((i * 37 % 11).toDouble / 3.0, (i * 53 % 7).toDouble / 2.0))
    val radii = trace(emb(pts: _*), 8).drop(1).map(_._3)
    assert(radii === radii.sorted.reverse)
    assert(radii.forall(_ >= 0L))
  }

  test("deterministic across layouts") {
    val pts = (1L to 60L).map(i =>
      i -> Seq((i * 37 % 13).toDouble / 3.0, (i * 53 % 17).toDouble / 2.0))
    import spark.implicits._
    val df = pts.toDF("vec_id", "embedding")
    val a = trace(df, 8)
    val b = trace(df.repartition(7), 8)
    assert(a === b)
  }

  test("corpus: k distinct centers, coverage radii monotone") {
    val t = trace(Tables.embeddings(spark, sf()), Coreset.K)
    assert(t.size === Coreset.K)
    assert(t.map(_._2).distinct.size === Coreset.K)
    val radii = t.drop(1).map(_._3)
    assert(radii === radii.sorted.reverse)
    assert(radii.head > 0L)
  }
}
