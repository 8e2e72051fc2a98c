package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.registry.Q

/** Time-series resampling to a fixed grid with LOCF gap-fill (last
  * observation carried forward) — the feature-engineering primitive
  * that turns irregular event streams into aligned training matrices.
  *
  * Shape: one keyed window for the per-bucket latest value, a
  * `sequence`+`explode` grid per key (no driver loop, no cross join —
  * the grid generation is a narrow map over the per-key span row), a
  * co-keyed left join, and one keyed LOCF window. Everything partitions
  * by the series key, so a 100-TB corpus of series parallelizes per key
  * with no global sort.
  */
object Resample {

  /** Resample `df` per `key` to an hourly grid over each key's own
    * observed span, carrying the latest `value` forward through gaps.
    * `seq` breaks intra-bucket timestamp ties deterministically. */
  def resampleHourlyLocf(df: DataFrame, key: String, ts: String,
      seq: String, value: String): DataFrame = {
    val bucketW = Window.partitionBy(col(key), col("h"))
      .orderBy(col(ts).desc, col(seq).desc)
    val hourly = df.withColumn("h", date_trunc("hour", col(ts)))
      .withColumn("__rn", row_number().over(bucketW))
      .filter(col("__rn") === 1)
      .select(col(key), col("h"), col(value))
    val grid = hourly.groupBy(col(key))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col(key),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("h"))
    val locfW = Window.partitionBy(col(key)).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq(key, "h"), "left")
      .select(col(key), col("h"),
        last(col(value), ignoreNulls = true).over(locfW).as("v"))
  }

  // ---- registry entry ---------------------------------------------------

  /** events per user on an hourly grid; each key's grid starts at its
    * first observation, so the LOCF column is never NULL (the strict
    * gate forbids NULL-bearing numeric output). */
  val resampleLocfQ: Q = Q(
    "x_resample_locf",
    Some("""WITH ranked AS (
           |  SELECT user_id, date_trunc('hour', ts) AS h, value,
           |    row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
           |                       ORDER BY ts DESC, event_id DESC) AS rn
           |  FROM events),
           |hourly AS (SELECT user_id, h, value FROM ranked WHERE rn = 1),
           |span AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY 1),
           |grid AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM span)
           |SELECT g.user_id AS user_id, g.h AS h,
           |  last_value(hv.value IGNORE NULLS) OVER (
           |    PARTITION BY g.user_id ORDER BY g.h
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
           |FROM grid g LEFT JOIN hourly hv ON hv.user_id = g.user_id AND hv.h = g.h
           |ORDER BY g.user_id, g.h""".stripMargin),
    (s, d) =>
      resampleHourlyLocf(
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("ts"), col("value")),
        "user_id", "ts", "event_id", "value")
        .orderBy(col("user_id"), col("h")))

  val all: Seq[Q] = Seq(resampleLocfQ)
}
