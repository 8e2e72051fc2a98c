package graft

import graft.analytics.GraphQueries
import graft.graph.CitationGraph

/** Graph-analytics cross-checks beyond the oracle gate. */
class GraphQueriesSpec extends SparkSpec {

  test("SQL triangle count == GraphX triangleCount") {
    val sql = GraphQueries.triangles.run(spark, sf()).head.getLong(0)
    val tuples = CitationGraph.bidirectional(CitationGraph.edges(spark, sf()))
      .rdd.map(r => (r.getLong(0), r.getLong(1)))
    // GraphX triangleCount counts each triangle at all 3 vertices
    val gx = org.apache.spark.graphx.Graph.fromEdgeTuples(tuples, 1)
      .partitionBy(org.apache.spark.graphx.PartitionStrategy.RandomVertexCut)
      .triangleCount().vertices.map(_._2.toLong).sum() / 3
    assert(sql === gx.toLong)
    assert(sql > 0)
  }
}
