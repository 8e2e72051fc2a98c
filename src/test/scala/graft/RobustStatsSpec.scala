package graft

import org.apache.spark.sql.functions._

import graft.operators.RobustStats

/** Median/MAD outlier flagging: hand-computed toys (odd/even counts,
  * MAD=0 degenerate), boundary semantics (= 3*MAD is NOT an outlier),
  * and corpus invariants. */
class RobustStatsSpec extends SparkSpec {

  private def run(rows: Seq[(Long, String, Long)]) = {
    import spark.implicits._
    RobustStats.madOutliers(
      rows.toDF("id", "g", "v"), "id", "g", "v")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
  }

  test("odd count: median is the middle element, MAD exact") {
    // values 1,2,3,4,100 -> med=3 (pos (5+1)/2=3), |d|=2,1,0,1,97
    // sorted 0,1,1,2,97 -> mad=1; outlier iff |d| > 3: only 100.
    val m = run(Seq((1L, "a", 1L), (2L, "a", 2L), (3L, "a", 3L),
      (4L, "a", 4L), (5L, "a", 100L)))
    assert(m(1L) === ((3L, 1L, 0L)))
    assert(m(5L) === ((3L, 1L, 1L)))
    assert(m.values.map(_._3).sum === 1L)
  }

  test("even count: LOWER median (position (n+1) div 2)") {
    // values 1,2,3,10 -> pos (4+1) div 2 = 2 -> med=2
    // |d| = 1,0,1,8 sorted 0,1,1,8 -> pos 2 -> mad=1
    val m = run(Seq((1L, "a", 1L), (2L, "a", 2L), (3L, "a", 3L),
      (4L, "a", 10L)))
    assert(m(1L)._1 === 2L)
    assert(m(1L)._2 === 1L)
    assert(m(4L)._3 === 1L) // |10-2|=8 > 3
  }

  test("boundary: exactly k*MAD is not an outlier, one past is") {
    // med=10, mad=2 by construction: values 8,10,12 give |d|=2,0,2,
    // mad = sorted(0,2,2) pos 2 = 2. 16 is exactly med+3*mad -> not
    // flagged; 17 is -> flagged.
    val base = Seq((1L, "a", 8L), (2L, "a", 10L), (3L, "a", 12L))
    val atEdge = run(base :+ ((4L, "a", 16L)))
    // adding the probe shifts stats: recompute expectation directly
    // values 8,10,12,16: med pos 2 -> 10; |d| 2,0,2,6 sorted 0,2,2,6
    // pos 2 -> mad=2; 16: |6| <= 6 -> not outlier
    assert(atEdge(4L) === ((10L, 2L, 0L)))
    val past = run(base :+ ((4L, "a", 17L)))
    // values 8,10,12,17: med=10, |d| 2,0,2,7 -> mad=2; 7 > 6 -> outlier
    assert(past(4L) === ((10L, 2L, 1L)))
  }

  test("MAD=0 degenerate: any deviation from the median is an outlier") {
    // majority at one value -> mad=0; v=5 deviates by 4 > 0 = 3*0
    val m = run(Seq((1L, "a", 1L), (2L, "a", 1L), (3L, "a", 1L),
      (4L, "a", 5L)))
    assert(m(1L) === ((1L, 0L, 0L)))
    assert(m(4L) === ((1L, 0L, 1L)))
  }

  test("groups are independent") {
    val m = run(Seq((1L, "a", 1L), (2L, "a", 2L), (3L, "a", 3L),
      (10L, "b", 100L), (11L, "b", 200L), (12L, "b", 300L)))
    assert(m(2L)._1 === 2L)
    assert(m(11L)._1 === 200L)
  }

  test("percentile rank: mid-rank convention on hand values") {
    import spark.implicits._
    // group a: values 10,20,20,30 (n=4)
    // 10: below=0 ties=1 -> (0 + 1)*1e6/4 = 250000
    // 20: below=1 ties=2 -> (1 + 1)*1e6/4 = 500000
    // 30: below=3 ties=1 -> (3 + 1)*1e6/4 = 1000000
    val df = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 20L),
      (4L, "a", 30L)).toDF("id", "g", "v")
    val m = RobustStats.percentileRank(df, "id", "g", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(m === Map(1L -> 250000L, 2L -> 500000L, 3L -> 500000L,
      4L -> 1000000L))
  }

  test("percentile rank: a constant column sits at the mid-rank, not the extremes") {
    import spark.implicits._
    val df = (1L to 5L).map(i => (i, "a", 7L)).toDF("id", "g", "v")
    val m = RobustStats.percentileRank(df, "id", "g", "v")
      .collect().map(_.getLong(3)).toSet
    assert(m === Set(600000L)) // (0 + (5+1) div 2) * 1e6 / 5
  }

  test("percentile rank: groups calibrate independently") {
    import spark.implicits._
    // the same absolute value lands at different percentiles per group
    val df = Seq((1L, "a", 10L), (2L, "a", 90L),
      (3L, "b", 10L), (4L, "b", 5L)).toDF("id", "g", "v")
    val m = RobustStats.percentileRank(df, "id", "g", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(m(1L) === 500000L) // lower half of a
    assert(m(3L) === 1000000L) // top of b
  }

  test("corpus: every row reported once, median within group range, outliers a minority") {
    val docs = Tables.documents(spark, sf())
    val out = RobustStats.madOutliers(docs, "doc_id", "lang", "n_chars")
    assert(out.count() === docs.count())
    val bad = out.groupBy("g")
      .agg(min("v").as("lo"), max("v").as("hi"),
        min("med").as("m1"), max("med").as("m2"),
        sum("outlier").as("nout"), count(lit(1)).as("n"))
      .filter(col("m1") =!= col("m2") || col("m1") < col("lo") ||
        col("m1") > col("hi") || col("nout") * 2 >= col("n"))
    assert(bad.count() === 0)
  }

  // ---- equi-depth boundaries ---------------------------------------------

  private def equiDepthOf(rows: Seq[(String, Long)],
      buckets: Int = 10): Map[(String, Long), (Long, Long)] = {
    import spark.implicits._
    RobustStats.equiDepth(rows.toDF("g", "cents"), "g", col("cents"), buckets)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("equi-depth: uniform 1..10 puts decile i at value i") {
    val m = equiDepthOf((1L to 10L).map(v => "a" -> v))
    for (i <- 1L to 10L) assert(m(("a", i)) === ((i, 10L)))
  }

  test("equi-depth: a constant column collapses every boundary onto it") {
    val m = equiDepthOf(Seq.fill(7)("a" -> 42L))
    for (i <- 1L to 10L) assert(m(("a", i)) === ((42L, 7L)))
  }

  test("equi-depth: one heavy value absorbs the lower deciles") {
    // nine 1s and one 100: targets 1..9 land on 1, decile 10 on 100
    val m = equiDepthOf(Seq.fill(9)("a" -> 1L) :+ ("a" -> 100L))
    for (i <- 1L to 9L) assert(m(("a", i))._1 === 1L)
    assert(m(("a", 10L))._1 === 100L)
  }

  test("equi-depth: groups are independent, decile B is the group max") {
    val m = equiDepthOf(
      (1L to 4L).map(v => "a" -> v) ++ (10L to 12L).map(v => "b" -> v * 100))
    assert(m(("a", 10L))._1 === 4L)
    assert(m(("b", 10L))._1 === 1200L)
    assert(m(("a", 1L))._1 === 1L)
    assert(m(("b", 1L))._1 === 1000L)
  }

  test("equi-depth: corpus boundaries are nondecreasing within each type") {
    val df = RobustStats.equiDepth(Tables.events(spark, sf()), "event_type",
      (col("value").cast("decimal(18,2)") * 100)
        .cast(org.apache.spark.sql.types.LongType))
    val rows = df.orderBy(col("g"), col("decile")).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val bs = rs.sortBy(_.getLong(1)).map(_.getLong(2))
      assert(bs.zip(bs.tail).forall { case (a, b) => a <= b })
      assert(rs.map(_.getLong(1)).toSet === (1L to 10L).toSet)
    }
  }
}
