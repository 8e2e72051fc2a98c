package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.{Quantize, SemanticCluster, VectorIndex}

/** Integer-k-means + SemDeDup contracts: exactly one cluster per
  * vector, deterministic re-runs, Lloyd inertia descent, well-separated
  * blobs never share a cluster, exact duplicates land together and are
  * reported at sim 1.0, and every reported semantic-dedup pair is a
  * member of the exact all-pairs qualifying set. */
class SemanticClusterSpec extends SparkSpec {

  private def quantOf(df: DataFrame): DataFrame =
    Quantize.withQuantized(df).select(col("vec_id"), col("q"))

  /** Two tight, far-apart blobs of 16 deterministic 64-dim points: blob
    * A near +e1, blob B near -e1, jitter 0.01 in a rotating coordinate.
    * Inter-blob distance dwarfs intra-blob, so no k-means cluster may
    * mix blobs (seeds are corpus points, assignment goes to the
    * same-blob seed, and updated centroids stay inside their blob). */
  private def blobs: DataFrame = {
    import spark.implicits._
    val rows = (0 until 32).map { i =>
      val sign = if (i < 16) 1.0 else -1.0
      val v = Array.tabulate(64) { j =>
        if (j == 0) sign else if (j == (i % 63) + 1) 0.01 * sign else 0.0
      }
      (i.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "vd")
  }

  test("every vector gets exactly one cluster; ids are in [0, k)") {
    val asg = SemanticCluster.clusters(spark, sf()).collect()
    val n = Tables.embeddings(spark, sf()).count()
    val k = 1L << VectorIndex.dedupCellBits(n)
    assert(asg.length.toLong == n)
    assert(asg.map(_.getLong(0)).distinct.length.toLong == n)
    assert(asg.forall { r => val c = r.getLong(1); c >= 0 && c < k })
  }

  test("clustering is deterministic across runs") {
    val a = SemanticCluster.clusters(spark, sf()).collect().toSeq
    val b = SemanticCluster.clusters(spark, sf()).collect().toSeq
    assert(a == b)
  }

  test("Lloyd inertia is non-increasing from 1 to 3 iterations") {
    val q = quantOf(
      Tables.embeddings(spark, sf()).select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("vd")))
    def inertia(iters: Int): Long =
      SemanticCluster.clustersOf(q, iters)
        .agg(sum(col("dist"))).head.getLong(0)
    // floored-integer means deviate from the exact Lloyd mean by < 1
    // per component, so the classical descent still holds at this
    // separation; a violation here means assignment/update drifted
    assert(inertia(3) <= inertia(1))
  }

  test("well-separated blobs never share a cluster") {
    val asg = SemanticCluster.clustersOf(quantOf(blobs)).collect()
    val byCluster = asg.groupBy(_.getLong(1))
    byCluster.foreach { case (_, members) =>
      val blobsHit = members.map(r => r.getLong(0) < 16).distinct
      assert(blobsHit.length == 1,
        s"cluster mixed blobs: ${members.map(_.getLong(0)).toSeq}")
    }
  }

  test("exact duplicates share a cluster and dedup reports them at 1.0") {
    import spark.implicits._
    // blob corpus + a planted exact duplicate pair (ids 100, 101)
    val dupVec = Array.tabulate(64)(j => if (j < 2) 0.7 else 0.0).toSeq
    val planted = Seq((100L, dupVec), (101L, dupVec)).toDF("vec_id", "vd")
    val corpus = blobs.union(planted)
    val asg = SemanticCluster.clustersOf(quantOf(corpus))
      .filter(col("vec_id") >= 100L).collect()
    assert(asg.map(_.getLong(1)).distinct.length == 1, "dup pair split")

    // full path on real data: every reported pair must be in the exact
    // qualifying set (subset property — SemDeDup trades recall, never
    // precision), and reported sims match the exact computation
    val sem = Registry.byName("d_dedup_semantic").run(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = VectorIndex.exactPairs(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sem.subsetOf(exact), s"non-exact pair reported: ${sem -- exact}")
    info(s"semantic-dedup recall vs exact at sf0.001: ${sem.size}/${exact.size}")
  }

  test("assignment plan is broadcast + aggregate — no global window") {
    // drive the training seam directly: the registered query serves the
    // session-cached (checkpointed) assignment, whose plan is a scan
    val qdf = graft.pipeline.Quantize.quantized(
      Tables.embeddings(spark, sf()))
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("q"))
    val plan = SemanticCluster.trainAssign(qdf)._2
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange")
      || plan.contains("BroadcastNestedLoopJoin")
      || plan.contains("BroadcastHashJoin"), plan)
    // the only Window allowed is the k-row seed numbering; the n-row
    // assignment must go through the min-struct aggregate
    assert(plan.contains("partial_min") || plan.contains("min("), plan)
  }

  private lazy val Registry = graft.registry.Registry
}
