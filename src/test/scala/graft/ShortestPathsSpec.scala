package graft

import org.apache.spark.sql.functions._

import graft.analytics.ShortestPaths
import graft.graph.CitationGraph

/** Weighted SSSP: exact equality with an in-memory Bellman-Ford of the
  * same recurrence, plus structural properties. */
class ShortestPathsSpec extends SparkSpec {

  private def referenceSssp(edges: Seq[(Long, Long)], source: Long,
      rounds: Int): Map[Long, Long] = {
    val ew = edges.filter(p => p._1 != p._2).distinct
      .map { case (s, d) => (s, d, 1L + (s + d) % 10L) }
    val vs = (ew.map(_._1) ++ ew.map(_._2)).distinct
    var dist = Map(source -> 0L)
    for (_ <- 1 to rounds) {
      val relax = ew.flatMap { case (s, d, w) => dist.get(s).map(ds => d -> (ds + w)) }
        .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).min }
      dist = vs.flatMap { v =>
        (dist.get(v), relax.get(v)) match {
          case (Some(a), Some(b)) => Some(v -> math.min(a, b))
          case (Some(a), None) => Some(v -> a)
          case (None, Some(b)) => Some(v -> b)
          case _ => None
        }
      }.toMap
    }
    dist
  }

  test("diamond graph with asymmetric weights equals the reference") {
    import spark.implicits._
    // weights are 1+(src+dst)%10: 1->2 w4, 1->3 w5, 2->4 w7, 3->4 w8, 1->4 w6
    val edges = Seq[(Long, Long)]((1, 2), (1, 3), (2, 4), (3, 4), (1, 4))
    val got = ShortestPaths.sssp(spark, edges.toDF("src", "dst"), 1L, 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === referenceSssp(edges, 1L, 10))
    assert(got(4L) === 6L) // direct edge beats both 2-hop paths (11, 13)
  }

  test("citation graph: spark == reference recurrence, layout-invariant") {
    val edges = CitationGraph.edges(spark, sf())
    val pairs = edges.filter(col("src") =!= col("dst")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val source = pairs.map(_._1).min
    val got = ShortestPaths.sssp(spark, edges, source, 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === referenceSssp(pairs, source, 10))
    val again = ShortestPaths.sssp(spark, edges.repartition(7), source, 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === got)
  }
}
