package graft

import graft.analytics.HopPlot

/** HopPlot unit + property tests on tiny hand-checkable graphs. */
class HopPlotSpec extends SparkSpec {

  private def edgesDf(es: Seq[(Long, Long)]) = {
    import spark.implicits._
    es.toDF("src", "dst")
  }

  test("path graph P4: distances 1:3, 2:2, 3:1") {
    val rows = HopPlot.hopPlotRows(spark, edgesDf(Seq((1L, 2L), (2L, 3L), (3L, 4L))))
    assert(rows.map(r => (r.d, r.g_d)) === Seq((1, 3L), (2, 5L), (3, 6L)))
    assert(rows.last.pct === 1.0)
  }

  test("star K1,3: one hub, three leaves") {
    val rows = HopPlot.hopPlotRows(spark, edgesDf(Seq((0L, 1L), (0L, 2L), (0L, 3L))))
    assert(rows.map(r => (r.d, r.g_d)) === Seq((1, 3L), (2, 6L)))
  }

  test("disconnected components: pairs never cross") {
    val rows = HopPlot.hopPlotRows(spark, edgesDf(Seq((1L, 2L), (10L, 11L))))
    assert(rows === Seq(HopPlot.HopRow(1, 2L, 1.0)))
  }

  test("duplicate + reversed edges collapse") {
    val rows = HopPlot.hopPlotRows(spark,
      edgesDf(Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L))))
    assert(rows.map(r => (r.d, r.g_d)) === Seq((1, 2L), (2, 3L)))
  }

  test("g(d) is monotone non-decreasing (toy random graph)") {
    val es = (0 until 40).map(i => ((i * 7 % 23).toLong, (i * 11 % 23).toLong))
      .filter { case (a, b) => a != b }
    val rows = HopPlot.hopPlotRows(spark, edgesDf(es))
    assert(rows.map(_.g_d) === rows.map(_.g_d).sorted)
    assert(rows.map(_.d) === (1 to rows.size))
  }

  test("maxD caps the walk") {
    val chain = (1L to 9L).sliding(2).map(s => (s(0), s(1))).toSeq
    val rows = HopPlot.hopPlotRows(spark, edgesDf(chain), maxD = 3)
    assert(rows.map(_.d) === Seq(1, 2, 3))
  }

  test("known total + coverage short-circuits but keeps true denominator") {
    val chain = (1L to 6L).sliding(2).map(s => (s(0), s(1))).toSeq
    // P6: dists 1:5, 2:4, 3:3, 4:2, 5:1 → cum 5,9,12,14,15; 0.8*15=12 at d=3
    val rows = HopPlot.hopPlotRows(spark, edgesDf(chain),
      coverage = 0.8, totalPairs = Some(15L))
    assert(rows.map(r => (r.d, r.g_d)) === Seq((1, 5L), (2, 9L), (3, 12L)))
    assert(rows.last.pct === 0.8)
  }
}
