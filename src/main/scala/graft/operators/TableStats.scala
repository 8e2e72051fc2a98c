package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.registry.Q

/** ANALYZE-style table statistics — the per-column profile a cost-based
  * optimizer (or a data engineer eyeballing a new drop) reads first:
  * row count, null count, EXACT distinct count, and min/max per column.
  * Registered over the orders table with every value normalized into
  * engine-stable space first: doubles ride as exact cents, dates as day
  * numbers, so min/max stringify identically on both engines (raw
  * double-to-string is formatter-dependent — Java flips to scientific
  * notation where DuckDB won't).
  *
  * Scale shape: ONE pass over the table — the multi-column distinct
  * aggregate plans as Spark's Expand (each row fans out once per
  * column), all counts partially aggregated map-side; no per-column
  * re-scan, no sort. min/max/ndv per column at 100 TB is exactly this
  * plan plus more executors. */
object TableStats {

  /** Normalized profile columns: name -> BIGINT-or-VARCHAR expression. */
  private def profiled: Seq[(String, Column)] = Seq(
    "o_orderkey" -> col("o_orderkey").cast("long"),
    "o_custkey" -> col("o_custkey").cast("long"),
    "o_orderstatus" -> col("o_orderstatus"),
    "o_orderpriority" -> col("o_orderpriority"),
    "o_totalprice_cents" ->
      (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"),
    "o_orderdate_day" ->
      datediff(col("o_orderdate").cast("date"), lit("1992-01-01").cast("date"))
        .cast("long"))

  def stats(orders: DataFrame): DataFrame = {
    val aggs = profiled.flatMap { case (name, c) =>
      Seq(
        count(c).as(s"cnt_$name"),
        countDistinct(c).as(s"ndv_$name"),
        min(c).cast("string").as(s"min_$name"),
        max(c).cast("string").as(s"max_$name"))
    }
    val total = orders.agg(count(lit(1)).as("n_rows"), aggs: _*)
    // one row per column: unpivot the single stats row
    val rows = profiled.map { case (name, _) =>
      struct(lit(name).as("col_name"), col("n_rows"),
        (col("n_rows") - col(s"cnt_$name")).as("n_nulls"),
        col(s"ndv_$name").as("ndv"),
        col(s"min_$name").as("min_v"), col(s"max_$name").as("max_v"))
    }
    total.select(explode(array(rows: _*)).as("s"))
      .select(col("s.col_name"), col("s.n_rows"), col("s.n_nulls"),
        col("s.ndv"), col("s.min_v"), col("s.max_v"))
  }

  private val oracleSql: String = {
    val cols = Seq(
      "o_orderkey" -> "CAST(o_orderkey AS BIGINT)",
      "o_custkey" -> "CAST(o_custkey AS BIGINT)",
      "o_orderstatus" -> "o_orderstatus",
      "o_orderpriority" -> "o_orderpriority",
      "o_totalprice_cents" ->
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)",
      "o_orderdate_day" ->
        "CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)")
    cols.map { case (name, e) =>
      s"""SELECT '$name' AS col_name,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(count(*) - count($e) AS BIGINT) AS n_nulls,
         |  CAST(count(DISTINCT $e) AS BIGINT) AS ndv,
         |  CAST(min($e) AS VARCHAR) AS min_v,
         |  CAST(max($e) AS VARCHAR) AS max_v
         |FROM orders""".stripMargin
    }.mkString("\nUNION ALL\n") + "\nORDER BY col_name"
  }

  val statsQ: Q = Q(
    "x_table_stats",
    Some(oracleSql),
    (s, d) => stats(Tables.fanout(Tables.orders(s, d))).orderBy(col("col_name")))

  def all: Seq[Q] = Seq(statsQ)
}
