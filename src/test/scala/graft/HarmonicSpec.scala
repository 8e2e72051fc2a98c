package graft

import org.apache.spark.sql.functions._

import graft.analytics.Harmonic

/** Sampled harmonic centrality: hand-computed ppm sums on toy graphs,
  * the unreachable-contributes-zero law, and corpus sanity. */
class HarmonicSpec extends SparkSpec {

  private def run(rows: Seq[(Long, Long)], sourceMax: Long = 8L,
      rounds: Int = 10): Map[Long, Long] = {
    import spark.implicits._
    Harmonic.harmonic(spark, rows.toDF("src", "dst"), sourceMax, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("path graph: inverse-distance ppm sums") {
    // 1 -> 2 -> 3: d(1,2)=1, d(1,3)=2, d(2,3)=1; nothing reaches 1
    val m = run(Seq((1L, 2L), (2L, 3L)))
    assert(m === Map(2L -> 1000000L, 3L -> 1500000L))
  }

  test("cycle: every vertex sees the other two at depths 1 and 2") {
    val m = run(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    assert(m === Map(1L -> 1500000L, 2L -> 1500000L, 3L -> 1500000L))
  }

  test("unreachable sources contribute zero, not undefined") {
    // two disconnected components; no cross-component terms
    val m = run(Seq((1L, 2L), (5L, 6L)))
    assert(m === Map(2L -> 1000000L, 6L -> 1000000L))
  }

  test("sourceMax restricts the sample") {
    // only vertex 1 is a source; 2 -> 3 contributes nothing
    val m = run(Seq((1L, 3L), (2L, 3L)), sourceMax = 2L)
    assert(m === Map(3L -> 1000000L))
  }

  test("shortest distance wins: a direct edge beats a detour") {
    // 1 -> 4 direct and 1 -> 2 -> 3 -> 4: d(1,4) = 1
    val m = run(Seq((1L, 4L), (1L, 2L), (2L, 3L), (3L, 4L)), sourceMax = 2L)
    assert(m === Map(2L -> 1000000L, 3L -> 500000L, 4L -> 1000000L))
  }

  test("integer division floors: depth 3 contributes 333333") {
    val m = run(Seq((1L, 2L), (2L, 3L), (3L, 4L)), sourceMax = 2L)
    assert(m(4L) === 333333L)
  }

  test("deterministic across layouts") {
    val rows = (0 until 80).map(i =>
      ((i % 11).toLong, ((i * 5 + 2) % 11).toLong)).filter(p => p._1 != p._2)
    val a = run(rows)
    import spark.implicits._
    val b = Harmonic.harmonic(spark, rows.toDF("src", "dst").repartition(9))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("corpus: positive scores, bounded by sources x 1e6") {
    val g = graft.graph.CitationGraph.edges(spark, sf())
    val out = Harmonic.harmonic(spark, g)
    assert(out.count() > 0)
    assert(out.filter(col("harmonic_ppm") <= 0).count() === 0)
    // at most SourceMax sources each contributing at most 1e6
    assert(out.filter(
      col("harmonic_ppm") > Harmonic.SourceMax * 1000000L).count() === 0)
  }
}
