package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reference-parity entry points over the citation data model
  * (Analytics.scala): density and per-year diameter/hop-plot, with the
  * reference's output column names so the CSV sinks produce comparable
  * files.
  */
object CitationAnalytics {

  /** Densification table `(year, n(t), e(t))` (Analytics.scala:77-142).
    * One edge contributes to the year of its `from` node (J1). Inner
    * join keeps years present on both sides, like the reference (J3).
    */
  def density(citations: DataFrame, publishedDates: DataFrame): DataFrame = {
    // running totals per side BEFORE the year join (reference order:
    // W1 at Analytics.scala:121-125, then J3 at :139) — a year with nodes
    // but no edges drops from the output but still accumulates.
    val w = Window.orderBy(col("year"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nCum = publishedDates.groupBy(col("year")).agg(count(lit(1)).as("nc"))
      .select(col("year"), sum(col("nc")).over(w).cast("long").as("n(t)"))
    val eCum = citations
      .join(publishedDates, citations("from") === publishedDates("id"))
      .groupBy(col("year")).agg(count(lit(1)).as("ec"))
      .select(col("year"), sum(col("ec")).over(w).cast("long").as("e(t)"))
    nCum.join(eCum, "year")
      .select(col("year"), col("n(t)"), col("e(t)"))
      .orderBy(col("year"))
  }

  /** Snapshot edges at `year`: both endpoints published <= year
    * (F3, Analytics.scala:348-360), as (src, dst). */
  def snapshotEdges(citations: DataFrame, publishedDates: DataFrame,
      year: Int): DataFrame = {
    val from = publishedDates.select(col("id").as("fid"), col("year").as("fromYear"))
    val to = publishedDates.select(col("id").as("tid"), col("year").as("toYear"))
    citations
      .join(from, citations("from") === col("fid"))
      .join(to, citations("to") === col("tid"))
      .filter(col("fromYear") <= year && col("toYear") <= year)
      .select(col("from").cast("long").as("src"), col("to").cast("long").as("dst"))
  }

  /** Hop-plot for the undirected `year` snapshot, reference output shape
    * `(d, g(d), percent_of_total)` (Application.scala:116) with the
    * reference's stop conditions (d <= 20, stop once coverage >= 0.9;
    * Analytics.scala:196). The denominator is computed via connected
    * components (cheap, O(diameter) rounds) — or pass `totalPairs`
    * (e.g. from a nodepairs.csv, S3) to skip that — which lets the
    * O(pairs)-state BFS short-circuit at the coverage threshold.
    */
  def diameter(spark: SparkSession, citations: DataFrame,
      publishedDates: DataFrame, year: Int,
      maxD: Int = 20, coverage: Double = 0.9,
      totalPairs: Option[Long] = None): DataFrame = {
    import spark.implicits._
    val edges = snapshotEdges(citations, publishedDates, year)
    val total = totalPairs.orElse(Some(
      ConnectedComponents.componentSizes(edges)
        .agg(sum(col("n_pairs"))).head.getLong(0)))
    HopPlot.hopPlotRows(spark, edges, maxD, coverage, total)
      .toDF("d", "g(d)", "percent_of_total")
  }
}
