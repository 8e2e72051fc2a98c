package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Resample

/** LOCF resampling: gap-fill correctness on a constructed series, plus
  * the no-NULL output contract on the real events table. */
class ResampleSpec extends SparkSpec {

  test("gaps carry the last observation forward on an hourly grid") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    // key 1: observations at 00h (v=1.0) and 03h (v=4.0) → 01h,02h carry 1.0
    // key 2: two observations in the same hour → later event wins
    val df = Seq(
      (1L, 10L, ts("2024-01-01 00:15:00"), 1.0),
      (1L, 11L, ts("2024-01-01 03:05:00"), 4.0),
      (2L, 12L, ts("2024-01-01 05:00:00"), 7.0),
      (2L, 13L, ts("2024-01-01 05:30:00"), 8.0))
      .toDF("user_id", "event_id", "ts", "value")
    val got = Resample.resampleHourlyLocf(df, "user_id", "ts", "event_id", "value")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getDouble(2)))
      .toSet
    assert(got === Set(
      (1L, "2024-01-01 00:00:00.0", 1.0),
      (1L, "2024-01-01 01:00:00.0", 1.0),
      (1L, "2024-01-01 02:00:00.0", 1.0),
      (1L, "2024-01-01 03:00:00.0", 4.0),
      (2L, "2024-01-01 05:00:00.0", 8.0)))
  }

  test("events resample: grid matches spans, value column never NULL") {
    val ev = Tables.events(spark, sf())
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val out = Resample.resampleHourlyLocf(ev, "user_id", "ts", "event_id", "value")
    assert(out.filter(col("v").isNull).count() === 0L)
    // per-key row count == hours in the key's observed span
    val spans = ev.withColumn("h", date_trunc("hour", col("ts")))
      .groupBy("user_id")
      .agg(((unix_timestamp(max(col("h"))) - unix_timestamp(min(col("h")))) / 3600 + 1)
        .cast("long").as("hours"))
    val counts = out.groupBy("user_id").count()
    assert(spans.join(counts, "user_id")
      .filter(col("hours") =!= col("count")).count() === 0L)
  }
}
