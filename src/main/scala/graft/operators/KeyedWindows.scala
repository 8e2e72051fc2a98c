package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe replacements for GLOBAL (unpartitioned) running windows
  * (VERDICT r2 #5): `Window.orderBy` with no `partitionBy` forces every
  * row through one partition's sort — serial at any cluster size. These
  * compute IDENTICAL results (oracled against the global-window queries)
  * with a partitioned window plus a boundary stitch: rows get their
  * within-partition running value from a partitioned window, and each
  * partition's starting offset comes from a window over the tiny
  * per-partition aggregate. The serial section shrinks from O(rows) to
  * O(distinct partitions) — months, key ranges — which is bounded and
  * broadcastable.
  *
  * REQUIREMENT: `part` must be monotone non-decreasing in the window
  * order (month over a date order, a key range-bucket over a key order),
  * so every partition is a contiguous slice of the global order — and
  * must be NON-NULL on every row: the offset stitch joins on `part`, so
  * a NULL partition value would silently drop the row (derive `part`
  * from a non-null key, or coalesce a sentinel bucket first).
  */
object KeyedWindows {

  /** Running sums of `vals` over the global order `order`, partitioned by
    * `part`. Appends one output column per (name, expr); input columns
    * pass through. Sum types follow Spark's sum (DECIMAL stays exact). */
  def runningSum(df: DataFrame, part: Column, order: Seq[Column],
      vals: Seq[(String, Column)]): DataFrame = {
    val withPart = df.withColumn("__part", part)
    val wIn = Window.partitionBy(col("__part")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = vals.foldLeft(withPart) { case (acc, (n, v)) =>
      acc.withColumn(s"__within_$n", sum(v).over(wIn))
    }
    // per-partition totals: tiny (one row per month/bucket), so the
    // unpartitioned offset window sorts a bounded table, then broadcasts
    val totals = withPart.groupBy(col("__part"))
      .agg(sum(vals.head._2).as(s"__tot_${vals.head._1}"),
        vals.tail.map { case (n, v) => sum(v).as(s"__tot_$n") }: _*)
    val wOff = Window.orderBy(col("__part"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals.select(
      col("__part") +: vals.map { case (n, _) =>
        sum(col(s"__tot_$n")).over(wOff).as(s"__off_$n")
      }: _*)
    within.join(broadcast(offsets), "__part")
      .select(df.columns.map(col) ++ vals.map { case (n, _) =>
        (col(s"__within_$n") + coalesce(col(s"__off_$n"), lit(0))).as(n)
      }: _*)
  }

  /** Last non-null `value` up to the current row in the global order
    * (last_value IGNORE NULLS ROWS UNBOUNDED PRECEDING), partitioned by
    * `part`. `ord` must be a single orderable column; within a partition
    * the last non-null is max_by over the non-null rows (the order is
    * total, so "last" = largest ord). */
  def runningLastIgnoreNulls(df: DataFrame, part: Column, ord: Column,
      value: Column, outName: String): DataFrame = {
    val withPart = df.withColumn("__part", part).withColumn("__v", value)
    val wIn = Window.partitionBy(col("__part")).orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = withPart
      .withColumn("__within", last(col("__v"), ignoreNulls = true).over(wIn))
    // one row per partition that HAS a non-null value...
    val lasts = withPart.filter(col("__v").isNotNull)
      .groupBy(col("__part")).agg(max_by(col("__v"), ord).as("__lastv"))
    // ...stitched over ALL partitions so empty ones inherit the carry
    val allParts = withPart.select(col("__part")).distinct()
    val wOff = Window.orderBy(col("__part"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = allParts.join(lasts, Seq("__part"), "left")
      .select(col("__part"),
        last(col("__lastv"), ignoreNulls = true).over(wOff).as("__carry"))
    within.join(broadcast(carry), "__part")
      .select(df.columns.map(col)
        :+ coalesce(col("__within"), col("__carry")).as(outName): _*)
  }
}
