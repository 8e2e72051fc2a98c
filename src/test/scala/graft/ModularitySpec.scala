package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.analytics.{LabelPropagation, Modularity}

/** Newman-Girvan modularity: hand-computed contributions on classic
  * partition shapes, the zero-law for the all-in-one partition, and
  * corpus bounds for the labelprop-scored assignment. */
class ModularitySpec extends SparkSpec {

  private def run(edges: Seq[(Long, Long)],
      asg: Seq[(Long, Long)]): Map[Long, (Long, Long, Long, Long)] = {
    import spark.implicits._
    Modularity.modularityOf(spark, edges.toDF("src", "dst"),
        asg.toDF("id", "lab"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
  }

  private val twoTriangles = Seq(
    (1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L), (6L, 4L), (3L, 4L))

  test("two triangles + bridge, triangle partition: Q = 70/196") {
    // A = 14 arcs; each triangle: w = 6, d = 7 -> 14*6 - 49 = 35
    val m = run(twoTriangles,
      Seq(1L -> 10L, 2L -> 10L, 3L -> 10L, 4L -> 20L, 5L -> 20L, 6L -> 20L))
    assert(m === Map(
      10L -> ((3L, 6L, 7L, 35L)),
      20L -> ((3L, 6L, 7L, 35L))))
  }

  test("all-in-one partition scores exactly zero") {
    val m = run(twoTriangles, (1L to 6L).map(_ -> 1L))
    assert(m === Map(1L -> ((6L, 14L, 14L, 0L))))
  }

  test("singleton partition: every contribution is minus degree-sum squared") {
    val m = run(Seq((1L, 2L), (2L, 3L)), Seq(1L -> 1L, 2L -> 2L, 3L -> 3L))
    // A = 4; degrees 1, 2, 1; no within arcs
    assert(m === Map(
      1L -> ((1L, 0L, 1L, -1L)),
      2L -> ((1L, 0L, 2L, -4L)),
      3L -> ((1L, 0L, 1L, -1L))))
  }

  test("direction and duplicate edges collapse before scoring") {
    // both orientations + a repeat of the same undirected edge
    val m = run(Seq((1L, 2L), (2L, 1L), (1L, 2L)), Seq(1L -> 1L, 2L -> 1L))
    assert(m === Map(1L -> ((2L, 2L, 2L, 0L))))
  }

  test("sum over communities is bounded by A² (|Q| <= 1 scale)") {
    val m = run(twoTriangles,
      Seq(1L -> 10L, 2L -> 10L, 3L -> 20L, 4L -> 20L, 5L -> 30L, 6L -> 30L))
    val a = 14L
    val total = m.values.map(_._4).sum
    assert(total.abs <= a * a)
  }

  test("corpus: labelprop assignment scores positive modularity") {
    val edges = graft.graph.CitationGraph.edges(spark, sf())
    val asg = LabelPropagation.assignmentFor(spark, sf())
    val df = Modularity.modularityOf(spark, edges, asg)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // total degree equals total arcs (handshake law on the arc set)
    val arcs = rows.map(_.getLong(3)).sum
    val within = rows.map(_.getLong(2)).sum
    assert(within <= arcs)
    // communities beat the random baseline on this graph
    assert(rows.map(_.getLong(4)).sum > 0L)
  }

  test("deterministic across layouts") {
    import spark.implicits._
    val e = twoTriangles.toDF("src", "dst")
    val asg = Seq(1L -> 10L, 2L -> 10L, 3L -> 10L, 4L -> 20L, 5L -> 20L,
      6L -> 20L).toDF("id", "lab")
    val a = Modularity.modularityOf(spark, e, asg).orderBy("community").collect()
    val b = Modularity.modularityOf(spark, e.repartition(5),
      asg.repartition(3)).orderBy("community").collect()
    assert(a.toSeq === b.toSeq)
  }
}
