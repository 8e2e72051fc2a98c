package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.registry.Q

/** Pure range join (no equi key) by bin-bucketing — the scale rewrite of
  * a points-in-intervals theta join. Spark plans `p > lo AND p <= hi`
  * with no equality conjunct as a BroadcastNestedLoopJoin: O(|points| x
  * |intervals|) compares and a broadcast of a whole side. Bucketing by
  * `bin = floor(value / W)` manufactures the missing equi key: each
  * point lands in exactly one bin, each interval explodes to the bins it
  * overlaps (span/W + 1 rows — bounded when spans are bounded, the
  * common case for event windows), the bin equi-join shuffles both
  * sides narrowly, and the exact range predicate filters candidates.
  * A (point, interval) pair can meet in at most the point's single bin,
  * so no post-join dedup is needed.
  */
object RangeJoin {

  /** Exact integer floor-division bin: `div` alone truncates toward
    * zero (mis-bins negatives); subtracting pmod first realigns. Stays
    * in BIGINT end to end — double floor() rounds past 2^53 and can
    * silently drop matching pairs at the bin edge (ADVICE r5 #1). */
  private def binCol(c: String, w: Long): Column =
    expr(s"($c - pmod($c, ${w}L)) div ${w}L")

  /** Count points in (lo, hi] per interval. `points` = (pid, p),
    * `intervals` = (iid, lo, hi); all BIGINT. Intervals with no points
    * are kept with count 0 (left-join semantics). */
  def pointsInIntervals(points: DataFrame, intervals: DataFrame,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val binnedPts = points.withColumn("__bin", binCol("p", binWidth))
    val binnedIv = intervals.withColumn("__bin",
      explode(sequence(binCol("lo", binWidth), binCol("hi", binWidth))))
    val counts = binnedIv.join(binnedPts, "__bin")
      .filter(col("p") > col("lo") && col("p") <= col("hi"))
      .groupBy(col("iid")).agg(count(lit(1)).as("n"))
    intervals.select(col("iid"))
      .join(counts, Seq("iid"), "left")
      .select(col("iid"), coalesce(col("n"), lit(0L)).as("n"))
  }

  /** For each signup event: how many events ANY user fired in the next
    * 60 seconds — the keyless companion to `x_interval_join` (which has
    * user_id as an equi conjunct and stays a sort-merge join on its
    * own). Bin width = window length, so every interval explodes to
    * exactly 2 bins. RangeJoinSpec asserts the plan has no
    * BroadcastNestedLoopJoin/CartesianProduct and that results equal
    * the naive theta join. */
  val rangeJoinBinned: Q = Q(
    "x_range_join_binned",
    Some("""SELECT a.event_id AS sid, CAST(count(b.event_id) AS BIGINT) AS n_window
           |FROM events a LEFT JOIN events b
           |  ON epoch_us(b.ts) > epoch_us(a.ts)
           |  AND epoch_us(b.ts) - epoch_us(a.ts) <= 60000000
           |WHERE a.event_type = 'signup'
           |GROUP BY 1 ORDER BY sid""".stripMargin),
    (s, d) => {
      val W = 60000000L
      val ev = Tables.events(s, d)
      val intervals = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("iid"),
          unix_micros(col("ts")).as("lo"),
          (unix_micros(col("ts")) + W).as("hi"))
      val points = ev.select(col("event_id").as("pid"), unix_micros(col("ts")).as("p"))
      pointsInIntervals(points, intervals, W)
        .select(col("iid").as("sid"), col("n").as("n_window"))
        .orderBy(col("sid"))
    })

  /** Naive theta form — spec-only baseline the binned rewrite must
    * match; plans as a nested loop, which is the point. */
  def naivePointsInIntervals(points: DataFrame, intervals: DataFrame): DataFrame =
    intervals.join(points, col("p") > col("lo") && col("p") <= col("hi"), "left")
      .groupBy(col("iid")).agg(count(col("pid")).as("n"))

  def all: Seq[Q] = Seq(rangeJoinBinned)
}
