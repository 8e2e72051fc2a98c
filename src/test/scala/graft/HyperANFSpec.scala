package graft

import graft.analytics.{HopPlot, HyperANF}
import graft.graph.CitationGraph

/** HyperANF vs the exact all-pairs BFS: same hop distances, pair counts
  * within HLL error (at these graph sizes the sketches run in sparse
  * mode, so estimates are near-exact). */
class HyperANFSpec extends SparkSpec {

  private def edgesDf(es: Seq[(Long, Long)]) = {
    import spark.implicits._
    es.toDF("src", "dst")
  }

  test("chain graph: approximate curve matches the exact BFS") {
    val chain = (1L until 8L).map(i => (i, i + 1))
    val exact = HopPlot.hopPlotRows(spark, edgesDf(chain))
    val approx = HyperANF.approxHopPlotRows(spark, edgesDf(chain))
    assert(approx.map(_.d) === exact.map(_.d))
    for ((a, e) <- approx.zip(exact))
      assert(math.abs(a.g_d - e.g_d) <= math.max(1L, e.g_d / 20),
        s"d=${a.d}: approx ${a.g_d} vs exact ${e.g_d}")
  }

  test("hop-plot graph at sf0.001: distances equal, counts within 5%") {
    val edges = CitationGraph.hopEdges(spark, sf())
    val exact = HopPlot.hopPlotRows(spark, edges)
    val approx = HyperANF.approxHopPlotRows(spark, edges)
    assert(approx.map(_.d) === exact.map(_.d))
    for ((a, e) <- approx.zip(exact))
      assert(math.abs(a.g_d - e.g_d).toDouble <= math.max(1.0, e.g_d * 0.05),
        s"d=${a.d}: approx ${a.g_d} vs exact ${e.g_d}")
  }

  test("deterministic across runs (sketch hashing is fixed)") {
    val edges = CitationGraph.hopEdges(spark, sf())
    val r1 = HyperANF.approxHopPlotRows(spark, edges)
    val r2 = HyperANF.approxHopPlotRows(spark, edges)
    assert(r1 === r2)
  }

  test("empty graph yields an empty curve") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(HyperANF.approxHopPlotRows(spark, empty) === Seq.empty)
  }

  test("superstep plan has exactly one exchange: the message aggregation") {
    // the co-partitioning contract (VERDICT r2 #9): edges are shuffled
    // by dst ONCE before the loop; state keeps its id-hash partitioning
    // through localCheckpoint, so the two per-round state joins insert
    // no exchange — only the groupBy(m) message shuffle remains
    val edges = CitationGraph.hopEdges(spark, sf())
    HyperANF.approxHopPlotRows(spark, edges, maxD = 2)
    assert(HyperANF.lastSuperstepExchanges === 1,
      s"expected 1 exchange per superstep, saw ${HyperANF.lastSuperstepExchanges}")
  }
}
