package graft

import org.apache.spark.sql.functions._

import graft.analytics.GraphQueries

/** Per-vertex clustering coefficient: exact hand-computed values on a
  * toy graph, orientation invariance (per-vertex triangle counts match
  * the global count × 3), and zero rows lost for triangle-free
  * vertices. */
class ClusteringCoeffSpec extends SparkSpec {

  import spark.implicits._

  test("toy graph: triangle + wedge vertex values are exact") {
    // edges: triangle {1,2,3}, plus 4 adjacent to 1 and 2 (second
    // triangle {1,2,4}), plus pendant 5 on 3
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L), (2L, 4L),
      (3L, 5L)).toDF("src", "dst")
    val rows = GraphQueries.clusteringCoeffOf(edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // degree, tri_cnt, lcc_ppm = 2e6*tri div deg*(deg-1)
    assert(rows(1L) === ((3L, 2L, 666666L)))
    assert(rows(2L) === ((3L, 2L, 666666L)))
    assert(rows(3L) === ((3L, 1L, 333333L)))
    assert(rows(4L) === ((2L, 1L, 1000000L)))
    assert(rows(5L) === ((1L, 0L, 0L))) // pendant: degree < 2 → 0
  }

  test("per-vertex triangle counts sum to 3x the global triangle count") {
    val df = graft.registry.Registry.byName("g_clustering_coeff")
      .run(spark, sf())
    val perVertexSum = df.agg(sum(col("tri_cnt"))).head.getLong(0)
    val global = graft.registry.Registry.byName("g_triangles")
      .run(spark, sf()).head.getLong(0)
    assert(perVertexSum === 3L * global)
    // every graph vertex is present, triangles or not: one row per
    // degree-table vertex (the left join loses nobody)
    val nVertices = graft.registry.Registry.byName("g1_bidirect_degree")
      .run(spark, sf()).count()
    assert(df.count() === nVertices)
  }

  test("star graph is perfectly disassortative; reciprocity is exact ppm") {
    // star 1-{2,3,4} has assortativity -1 by construction; directed
    // edges include one reciprocated pair out of 3 distinct pairs... use
    // (1,2),(2,1),(1,3),(1,4): n_directed=4, n_recip=2 → 500000 ppm
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val r = GraphQueries.assortativityOf(e).head
    assert(r.getAs[Double]("assortativity") === -1.0)
    assert(r.getAs[Long]("n_directed") === 4L)
    assert(r.getAs[Long]("n_recip") === 2L)
    assert(r.getAs[Long]("reciprocity_ppm") === 500000L)
  }

  test("regular graph (zero variance) reports assortativity 0, not NaN") {
    // a 4-cycle: every vertex degree 2 → denominator 0
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val r = GraphQueries.assortativityOf(e).head
    assert(r.getAs[Double]("assortativity") === 0.0)
  }
}
