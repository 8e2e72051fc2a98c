package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{PipelineQueries, Sketches}

/** Containment-dedup contracts: a short doc embedded in a long one is a
  * containment pair even when its Jaccard sits far below the dedup
  * threshold, the metric is symmetric-input exact, and both metrics ride
  * the same candidate generation. */
class ContainmentSpec extends SparkSpec {

  import spark.implicits._

  // doc 2's shingle set is a strict subset of doc 1's: containment 1.0,
  // Jaccard 3/(8+3-3) = 0.375
  private def toyDocs = Seq(
    (1L, "a b c d e f g h i j"),
    (2L, "c d e f g"),
    (3L, "x y z w v u t s")).toDF("doc_id", "text")

  test("embedded doc is a containment pair but not a Jaccard pair") {
    val posts = Sketches.shinglePostsRow(toyDocs)
    val cont = PipelineQueries.ngramContainmentPairs(posts, 0.8).collect()
    assert(cont.length === 1)
    assert(cont.head.getLong(0) === 1L && cont.head.getLong(1) === 2L)
    assert(cont.head.getDouble(2) === 1.0)
    val jac = PipelineQueries.ngramJaccardPairs(posts, 0.5).collect()
    assert(jac.isEmpty)
  }

  test("containment >= jaccard on every candidate pair (real corpus)") {
    val posts = Sketches.shinglePostsRow(
      Tables.documents(spark, sf()).limit(200))
    val cont = PipelineQueries.ngramContainmentPairs(posts, 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val jac = PipelineQueries.ngramJaccardPairs(posts, 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(cont.keySet === jac.keySet) // same candidate generation
    assert(cont.nonEmpty)
    jac.foreach { case (k, j) =>
      assert(cont(k) >= j - 1e-9, s"pair $k cont ${cont(k)} < jac $j")
    }
  }

  test("leakage-guarded split keeps clusters intact, moves only clustered docs") {
    import graft.registry.Registry
    val df = Registry.byName("d_split_leakage_guard").run(spark, sf())
    val surv = Registry.byName("d_dedup_survivors").run(spark, sf())
    // every clustered doc lands in the same split as its survivor
    val j = surv
      .join(df.select(col("doc_id"), col("split").as("member_split")), Seq("doc_id"))
      .join(df.select(col("doc_id").as("survivor_id"),
        col("split").as("survivor_split")), Seq("survivor_id"))
    assert(j.count() > 0)
    assert(j.filter(col("member_split") =!= col("survivor_split")).count() === 0)
    // and relative to the plain hash split, ONLY clustered docs moved
    val plain = Registry.byName("x_hash_split").run(spark, sf())
    val moved = df
      .join(plain.select(col("doc_id"), col("bucket").as("plain_bucket")), Seq("doc_id"))
      .filter(col("bucket") =!= col("plain_bucket"))
    assert(moved.join(surv, Seq("doc_id"), "left_anti").count() === 0)
  }

  test("df-capped hot shingles still count toward containment") {
    // one shingle shared by every doc (df > cap) plus a rare one shared
    // by the pair: with cap=2 the hot shingle is excluded from candidate
    // generation but must still be counted in the metric
    val docs = Seq(
      (1L, "h1 h2 h3 r1 r2 r3"),
      (2L, "h1 h2 h3 r1 r2 r3"),
      (3L, "h1 h2 h3 q1 q2 q3"),
      (4L, "h1 h2 h3 p1 p2 p3")).toDF("doc_id", "text")
    val posts = Sketches.shinglePostsRow(docs)
    val pairs = PipelineQueries.ngramContainmentPairs(posts, 0.99, dfCap = 2)
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
      === Set((1L, 2L)))
    assert(pairs.head.getDouble(2) === 1.0)
  }
}
