package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Binned range-join contract: identical results to the naive theta
  * join, but planned as an equi join (no nested loop / cartesian) —
  * the rewrite exists purely to fix the plan shape. */
class RangeJoinSpec extends SparkSpec {

  private val W = 60000000L

  private def data = {
    val ev = Tables.events(spark, sf())
    val intervals = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("iid"),
        unix_micros(col("ts")).as("lo"),
        (unix_micros(col("ts")) + W).as("hi"))
    val points = ev.select(col("event_id").as("pid"), unix_micros(col("ts")).as("p"))
    (points, intervals)
  }

  test("binned equals naive theta join, including zero-count intervals") {
    val (points, intervals) = data
    def toMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val binned = toMap(RangeJoin.pointsInIntervals(points, intervals, W))
    val naive = toMap(RangeJoin.naivePointsInIntervals(points, intervals))
    assert(binned == naive)
    assert(binned.valuesIterator.contains(0L) || binned.nonEmpty)
  }

  test("binned plan has no nested loop; naive plan does (the rewrite's point)") {
    val (points, intervals) = data
    val binnedPlan = RangeJoin.pointsInIntervals(points, intervals, W)
      .queryExecution.executedPlan.toString
    assert(!binnedPlan.contains("BroadcastNestedLoopJoin")
      && !binnedPlan.contains("CartesianProduct"),
      s"binned plan must not nested-loop:\n$binnedPlan")
    val naivePlan = RangeJoin.naivePointsInIntervals(points, intervals)
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin")
      || naivePlan.contains("CartesianProduct"),
      s"naive theta form unexpectedly avoided a nested loop:\n$naivePlan")
  }

  test("negative values bin by floor division, matching the naive join") {
    // p=-1 with W=7 must land in bin -1 (floor), not bin 0 (truncate):
    // the interval (-5, 3] explodes to bins -1..0 and would miss it
    // under truncation (ADVICE r5 #1)
    val intervals = spark.range(1)
      .select(lit(1L).as("iid"), lit(-5L).as("lo"), lit(3L).as("hi"))
    val points = spark.range(1)
      .select(lit(10L).as("pid"), lit(-1L).as("p"))
    val out = RangeJoin.pointsInIntervals(points, intervals, 7L).collect()
    assert(out.length == 1 && out.head.getLong(1) == 1L)
    val naive = RangeJoin.naivePointsInIntervals(points, intervals).collect()
    assert(naive.head.getLong(1) == 1L)
  }

  test("intervals spanning many bins still join correctly") {
    val intervals = spark.range(1)
      .select(lit(1L).as("iid"), lit(5L).as("lo"), lit(1000L).as("hi"))
    val points = spark.range(2000).select(col("id").as("pid"), col("id").as("p"))
    val out = RangeJoin.pointsInIntervals(points, intervals, 7L).collect()
    assert(out.length == 1 && out.head.getLong(1) == 995L) // (5, 1000] = 6..1000
  }
}
