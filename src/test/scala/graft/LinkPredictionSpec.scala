package graft

import org.apache.spark.sql.functions._

import graft.analytics.GraphQueries

/** Link prediction (common neighbors + resource-allocation index):
  * hand-computed toy values, adjacency exclusion, hub-cap skew bound,
  * and real-graph sanity (top pairs are non-adjacent, scores exact). */
class LinkPredictionSpec extends SparkSpec {

  import spark.implicits._

  test("path: the single wedge pair scores cn=1, ra=1e6 div 2") {
    // 1-2-3: only candidate pair is {1,3} through center 2 (deg 2)
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val rows = GraphQueries.linkPredictionOf(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq === Seq((1L, 3L, 1L, 500000L)))
  }

  test("4-cycle: both diagonals score cn=2, ra=2*(1e6 div 2)") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val rows = GraphQueries.linkPredictionOf(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows === Set((1L, 3L, 2L, 1000000L), (2L, 4L, 2L, 1000000L)))
  }

  test("triangle: every pair is adjacent, nothing is predicted") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    assert(GraphQueries.linkPredictionOf(e).count() === 0L)
  }

  test("hub cap: a >256-degree center contributes no wedge pairs") {
    // star: center 0 with 300 leaves — without the cap this would emit
    // C(300,2) = 44850 pairs; the skew bound excludes the hub center
    val star = (1L to 300L).map(l => (0L, l)).toDF("src", "dst")
    assert(GraphQueries.linkPredictionOf(star).count() === 0L)
    // at 256 leaves the center sits exactly ON the cap and scores again
    val atCap = (1L to 256L).map(l => (0L, l)).toDF("src", "dst")
    assert(GraphQueries.linkPredictionOf(atCap).count() === 50L) // top-50 cut
  }

  test("real graph: predicted pairs are never adjacent and never self") {
    val pred = GraphQueries.linkPrediction.run(spark, sf())
    val bidir = graft.graph.CitationGraph
      .bidirectional(graft.graph.CitationGraph.edges(spark, sf()))
    assert(pred.count() === 50L)
    assert(pred.filter(col("a") >= col("b")).count() === 0L, "canonical a < b")
    val adjacent = pred.join(bidir,
      col("a") === col("src") && col("b") === col("dst"), "left_semi").count()
    assert(adjacent === 0L, "predicted pairs must be non-edges")
    // scores positive and internally consistent: cn >= 1 and ra <= cn*5e5
    // (every common neighbor has degree >= 2, so contributes <= 1e6/2)
    assert(pred.filter(col("cn") < 1).count() === 0L)
    assert(pred.filter(col("ra_ppm") > col("cn") * 500000L).count() === 0L)
  }
}
