package graft

import org.apache.spark.sql.functions._

import graft.graph.CitationGraph
import graft.sources.PartitionedStore

/** Partition-pruning proof: a year-partitioned store must answer the
  * temporal snapshot predicate with directory-level PartitionFilters,
  * reading only matching partitions. */
class PartitionedStoreSpec extends SparkSpec {

  test("year-partitioned store prunes partitions for snapshot predicates") {
    val tmp = java.nio.file.Files.createTempDirectory("pstore").toString
    val nodes = CitationGraph.nodes(spark, sf())
    PartitionedStore.write(nodes, s"$tmp/nodes", Seq("yr"))

    val snap = PartitionedStore.read(spark, s"$tmp/nodes")
      .filter(col("yr") <= 1996)
    val plan = snap.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("(yr"), plan)

    // correctness: same rows as filtering the unpartitioned source
    val want = nodes.filter(col("yr") <= 1996)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = snap.select(col("id"), col("yr").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want && got.nonEmpty)
  }

  test("extensions class registers SQL functions at session build") {
    // applying the extensions object directly exercises every injectFunction
    val ext = new graft.functions.GraftExtensions
    ext(new org.apache.spark.sql.SparkSessionExtensions)
    // and the runtime registrar makes them callable here and now
    graft.functions.GraftFunctions.register(spark)
    assert(spark.sql("SELECT array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head.getDouble(0) === 11.0)
  }
}
