package graft

import org.apache.spark.sql.functions._

import graft.analytics.TemporalReach

/** Earliest-arrival temporal reachability: journeys must respect time
  * (t >= arrival at the tail), which plain BFS does not. */
class TemporalReachSpec extends SparkSpec {

  private def edges(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("src", "dst", "t")
  }

  private def run(rows: Seq[(Long, Long, Long)], source: Long,
      rounds: Int = 10): Map[Long, Long] =
    TemporalReach.earliestArrival(spark, edges(rows), source, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("an edge that activated before arrival does not extend a journey") {
    // 1 -(t=5)-> 2 -(t=3)-> 3 : BFS reaches 3, a journey cannot
    val m = run(Seq((1L, 2L, 5L), (2L, 3L, 3L)), source = 1L)
    assert(m === Map(1L -> 0L, 2L -> 5L))
  }

  test("equal activation time is usable (t >= arrival)") {
    val m = run(Seq((1L, 2L, 5L), (2L, 3L, 5L)), source = 1L)
    assert(m(3L) === 5L)
  }

  test("earliest arrival over parallel temporal edges") {
    // two activations of the same pair: the earlier one wins for
    // arrival, but the LATER one can still carry a journey onward
    val m = run(Seq((1L, 2L, 7L), (1L, 2L, 2L), (2L, 3L, 4L)), source = 1L)
    assert(m(2L) === 2L)
    assert(m(3L) === 4L)
  }

  test("waiting at a node is allowed: arrive early, leave late") {
    // arrive at 2 on day 1, take the day-9 edge onward
    val m = run(Seq((1L, 2L, 1L), (2L, 3L, 9L)), source = 1L)
    assert(m(3L) === 9L)
  }

  test("a faster hop-count path can lose to a time-respecting detour") {
    // direct edge 1->4 activates day 1 but the journey needs t>=0: fine
    // (arr 1); detour 1->2->4 arrives later (day 6) — min wins: 1
    // and the reverse: direct activates day 8, detour arrives day 6
    val m = run(Seq((1L, 4L, 8L), (1L, 2L, 2L), (2L, 4L, 6L)), source = 1L)
    assert(m(4L) === 6L)
  }

  test("deterministic across layouts") {
    val rows = (1 to 40).map(i =>
      ((i % 7).toLong, (i % 11).toLong, (i % 5).toLong))
    val a = run(rows, source = 1L)
    import spark.implicits._
    val b = TemporalReach.earliestArrival(
      spark, rows.toDF("src", "dst", "t").repartition(13), 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("corpus: source at day 0, arrivals non-negative, rounds monotone") {
    val te = graft.graph.CitationGraph.temporalEdges(spark, sf())
    val source = te.agg(min(col("src"))).head.getLong(0)
    val m10 = TemporalReach.earliestArrival(spark, te, source, rounds = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m2 = TemporalReach.earliestArrival(spark, te, source, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m10(source) === 0L)
    assert(m10.values.forall(_ >= 0L))
    // more rounds only add vertices or lower arrivals
    assert(m2.keySet.subsetOf(m10.keySet))
    assert(m2.forall { case (id, a) => m10(id) <= a })
  }
}
