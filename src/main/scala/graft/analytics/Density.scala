package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Density / densification query (SURVEY.md §2.12, Analytics.scala:77-142):
  * for each year t, cumulative node count n(t) and cumulative edge count
  * e(t), where an edge is attributed to the year of its source node
  * (J1 semantics, Analytics.scala:39-41).
  *
  * Scale notes: the per-year aggregates shuffle by year (tiny domain); the
  * cumulative window is single-partition but only over #years rows — same
  * caveat as the reference (Analytics.scala:22-25) and harmless because the
  * windowed input is already aggregated to a handful of rows.
  */
object Density {

  /** @param nodes (id, yr)  @param edges (src, dst) */
  def densities(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val nPerYear = nodes.groupBy(col("yr")).agg(count(lit(1)).as("nc"))
    val ePerYear = edges
      .join(nodes, edges("src") === nodes("id"))
      .groupBy(col("yr")).agg(count(lit(1)).as("ec"))
    val w = Window.orderBy(col("yr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    nPerYear.join(ePerYear, "yr")
      .select(
        col("yr").as("year"),
        sum(col("nc")).over(w).cast("long").as("n_t"),
        sum(col("ec")).over(w).cast("long").as("e_t"))
      .orderBy(col("year"))
  }
}
