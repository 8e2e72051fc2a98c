package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DecimalType, LongType}
import org.apache.spark.sql.Column

/** Parquet table access for the driver-generated testdata (TESTDATA.md).
  *
  * All reads go through here so column pruning / filter pushdown can be
  * checked in one place (`.explain` shows PushedFilters + ReadSchema).
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "region")
  /** Timestamp portability across testdata generations. Earlier testdata
    * stored ts as TIMESTAMP(NANOS) (unreadable natively by Spark 4 —
    * sessions set `spark.sql.legacy.parquet.nanosAsLong=true` and the
    * nanos long is truncated to micros below, matching DuckDB). Current
    * testdata stores naive micros (`timestamp[us]`, no TZ annotation),
    * which Spark 4 would infer as TIMESTAMP_NTZ while every query and
    * DuckDB oracle computes in TIMESTAMP; sessions therefore also set
    * `spark.sql.parquet.inferTimestampNTZ.enabled=false` so the reader
    * yields TIMESTAMP (LTZ, session tz pinned UTC) natively — identical
    * micros either way, and filter pushdown survives (no cast on ts).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions
          .timestamp_micros(org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")

  /** Money/measure columns are 2-decimal doubles in the testdata; summing
    * doubles is partition-order dependent, so every aggregated measure is
    * cast to an exact decimal first. The DuckDB oracles do the same
    * (`CAST(x AS DECIMAL(18,s))`) so result hashes match bit-for-bit.
    */
  def dec(c: Column, scale: Int = 2): Column = c.cast(DecimalType(18, scale))

  /** Integer results are normalized to BIGINT on both engines (Spark
    * `year()` yields INT where DuckDB `extract(year ...)` yields BIGINT —
    * standardizing avoids dtype-sensitive hash mismatches).
    */
  def asLong(c: Column): Column = c.cast(LongType)
}
