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

  /** @param nodes (id, yr)  @param edges (src, dst)
    *
    * The running totals MUST be computed per side BEFORE the year join
    * (reference order: W1 then J3, Analytics.scala:121-140) — a year with
    * nodes but no edges drops from the output rows yet still contributes
    * to every later cumulative count. */
  def densities(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val w = Window.orderBy(col("yr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nCum = nodes.groupBy(col("yr")).agg(count(lit(1)).as("nc"))
      .select(col("yr"), sum(col("nc")).over(w).cast("long").as("n_t"))
    val eCum = edges
      .join(nodes, edges("src") === nodes("id"))
      .groupBy(col("yr")).agg(count(lit(1)).as("ec"))
      .select(col("yr"), sum(col("ec")).over(w).cast("long").as("e_t"))
    nCum.join(eCum, "yr")
      .select(col("yr").as("year"), col("n_t"), col("e_t"))
      .orderBy(col("year"))
  }
}
