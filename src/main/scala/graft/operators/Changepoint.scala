package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.registry.Q

/** Offline CUSUM changepoint detection (Page 1954; the max-deviation
  * form of Pettitt 1979) per event type over the daily-count series —
  * the drift detector a long-running ingest pipeline runs over its own
  * telemetry: "on which day did the rate change?".
  *
  * The mean-free exact-integer trick: the classic CUSUM statistic
  * S_k = Σ_{i<=k}(x_i − mean) needs the rational mean; multiplying by N
  * gives N·S_k = N·prefix_k − k·total — BIGINT arithmetic end to end,
  * so the argmax day is bit-identical across engines (float CUSUM would
  * tie-break on rounding noise). The changepoint is the day maximizing
  * |N·prefix_k − k·total|, ties broken to the earliest day.
  *
  * Scale shape: the corpus collapses to (type, day) counts in one
  * map-side-combinable aggregation; the window runs per type over DAYS
  * (hundreds of rows), never events; the argmax is a tiny two-step
  * (max score per type, min day at that score) — no corpus sort, no
  * window over an unbounded key. Overflow bound: N·prefix needs
  * N·total < 2^63 — ~10^9 days x 10^10 events headroom. */
object Changepoint {

  /** (event_type, cp_day, score): for any (event_type, ts) frame. */
  def cusum(events: DataFrame): DataFrame = {
    val daily = events.select(col("event_type"),
      datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
        .cast("long").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val byType = Window.partitionBy(col("event_type"))
    val scored = daily
      .withColumn("prefix", sum(col("cnt")).over(w))
      .withColumn("k", count(lit(1)).over(w))
      .withColumn("total", sum(col("cnt")).over(byType))
      .withColumn("n", count(lit(1)).over(byType))
      .select(col("event_type"), col("day"),
        abs(col("n") * col("prefix") - col("k") * col("total")).as("score"))
    val best = scored.groupBy(col("event_type"))
      .agg(max(col("score")).as("score"))
    scored.join(best, Seq("event_type", "score"))
      .groupBy(col("event_type"), col("score"))
      .agg(min(col("day")).as("cp_day"))
      .select(col("event_type"), col("cp_day"), col("score"))
  }

  private val oracleSql: String =
    """WITH daily AS (
      |  SELECT event_type,
      |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS day,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |scored AS (
      |  SELECT event_type, day,
      |    abs(CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
      |        * CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY day
      |            ROWS UNBOUNDED PRECEDING) AS BIGINT)
      |      - CAST(count(*) OVER (PARTITION BY event_type ORDER BY day
      |            ROWS UNBOUNDED PRECEDING) AS BIGINT)
      |        * CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT)) AS score
      |  FROM daily),
      |best AS (SELECT event_type, max(score) AS score FROM scored GROUP BY 1)
      |SELECT s.event_type, CAST(min(s.day) AS BIGINT) AS cp_day,
      |  CAST(s.score AS BIGINT) AS score
      |FROM scored s JOIN best b ON s.event_type = b.event_type
      |  AND s.score = b.score
      |GROUP BY s.event_type, s.score
      |ORDER BY s.event_type""".stripMargin

  val cusumQ: Q = Q(
    "x_cusum_changepoint",
    Some(oracleSql),
    (s, d) => cusum(Tables.events(s, d).select(col("event_type"), col("ts")))
      .orderBy(col("event_type")))

  /** Day-of-week seasonality profile per event type — the periodic
    * companion to the CUSUM level-shift detector: per (type, weekday)
    * the event count and its deviation from uniform, dev = |7·cnt −
    * total| (the integer-exact chi-square numerator — no division, no
    * floats). Weekday = day-number % 7 anchored at the 2024-01-01
    * corpus epoch (a Monday): pure integer arithmetic on both engines,
    * immune to the Sunday-0 / Monday-1 weekday-function disagreements.
    *
    * Scale shape: the corpus collapses to ≤ 7 rows per type in one
    * map-side-combinable count; everything after is constant-size. */
  def dowProfile(events: DataFrame): DataFrame = {
    val daily = events.select(col("event_type"),
      (datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
        .cast("long") % 7L).as("dow"))
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("cnt"))
    val totals = daily.groupBy(col("event_type"))
      .agg(sum(col("cnt")).as("total"))
    daily.join(totals, "event_type")
      .select(col("event_type"), col("dow"), col("cnt"),
        abs(lit(7L) * col("cnt") - col("total")).as("dev"))
  }

  private val dowOracleSql: String =
    """WITH daily AS (
      |  SELECT event_type,
      |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) % 7
      |      AS dow,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |tot AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS total
      |  FROM daily GROUP BY 1)
      |SELECT d.event_type, d.dow, d.cnt,
      |  abs(7 * d.cnt - t.total) AS dev
      |FROM daily d JOIN tot t ON d.event_type = t.event_type
      |ORDER BY d.event_type, d.dow""".stripMargin

  val dowQ: Q = Q(
    "x_dow_seasonality",
    Some(dowOracleSql),
    (s, d) => dowProfile(Tables.events(s, d).select(col("event_type"), col("ts")))
      .orderBy(col("event_type"), col("dow")))

  def all: Seq[Q] = Seq(cusumQ, dowQ)
}
