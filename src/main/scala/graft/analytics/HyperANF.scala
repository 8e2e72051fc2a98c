package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** HyperANF-style approximate neighborhood function (Boldi/Rosa/Vigna,
  * WWW'11) over Spark's native Datasketches HLL functions — THE scale
  * path for hop-plots/effective diameter (SURVEY.md §2.12 scale note,
  * HopPlot scaladoc): the exact BFS carries O(connected pairs) state
  * (the reference materialized 76.8M pairs at its 37k-node scale,
  * data/nodepairs.csv:6 — quadratic in nodes), while HyperANF keeps one
  * O(2^lgK)-register sketch per VERTEX, independent of graph size.
  *
  * Superstep d: every vertex unions its ball-sketch with its neighbors'
  * (hll_union_agg over the edge join — map-side combinable), then
  * N(d) = Σ_v |ball(v, d)| is one hll_sketch_estimate aggregation.
  * g(d) = (N(d) - n) / 2 estimates the unordered connected pairs within
  * distance d. Sketch hashing is deterministic, so results are stable
  * run to run (registry entry is rows-only: the sketch is
  * engine-specific, like x_approx_distinct).
  */
object HyperANF {

  final case class ApproxHopRow(d: Int, g_d: Long, pct: Double)

  /** Memoized per (session, input key) — g_hopplot_approx and
    * g_eff_diameter_approx share one superstep run, mirroring
    * HopPlot.hopPlotRowsCached for the exact pair. */
  private val rowsCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Seq[ApproxHopRow]]()

  /** maxD/lgK are folded into the cache key and passed through (ADVICE
    * r2: a default-keyed cache would serve the wrong curve to a caller
    * asking for different parameters). */
  def approxHopPlotRowsCached(spark: SparkSession, edges: => DataFrame,
      cacheKey: String, maxD: Int = 20, lgK: Int = 12): Seq[ApproxHopRow] =
    rowsCache.computeIfAbsent(
      (graft.SessionKey(spark), s"$cacheKey|maxD=$maxD|lgK=$lgK"),
      _ => approxHopPlotRows(spark, edges, maxD, lgK))

  /** @param lgK  HLL register count = 2^lgK (12 → ~1.6% rsd, 4 KiB/vertex).
    * @param maxD hard cap on supersteps, like the exact BFS. */
  def approxHopPlotRows(
      spark: SparkSession,
      edges: DataFrame,
      maxD: Int = 20,
      lgK: Int = 12): Seq[ApproxHopRow] = {
    import graft.graph.CitationGraph.bidirectional

    val bidir = bidirectional(edges).persist(StorageLevel.MEMORY_AND_DISK)
    val nbr = bidir.select(col("src").as("m"), col("dst").as("nb"))

    // ball(v, 0) = {v}: a 1-element sketch per vertex
    var st = bidir.select(col("src").as("id")).distinct()
      .groupBy(col("id")).agg(hll_sketch_agg(col("id"), lit(lgK)).as("sk"))
      .localCheckpoint(true)
    val n = st.count()
    if (n == 0) { bidir.unpersist(false); return Seq.empty }

    val rows = scala.collection.mutable.ArrayBuffer[(Int, Long)]()
    var last = n // N(0): every ball is exactly its own vertex
    var d = 0
    var grown = true
    while (grown && d < maxD) {
      d += 1
      val nbrAgg = nbr.join(st, col("nb") === col("id"))
        .groupBy(col("m"))
        .agg(hll_union_agg(col("sk"), lit(false)).as("nsk"))
      val merged = st.join(nbrAgg, col("id") === col("m"), "left")
        .select(col("id"),
          when(col("nsk").isNull, col("sk"))
            .otherwise(hll_union(col("sk"), col("nsk"))).as("sk"))
        .localCheckpoint(true)
      val tot = merged.agg(sum(hll_sketch_estimate(col("sk"))))
        .head.getLong(0)
      grown = tot > last
      if (grown) {
        st = merged
        last = tot
        rows += d -> ((tot - n) / 2) // unordered pair estimate
      }
    }
    bidir.unpersist(false)

    val total = if (rows.isEmpty) 1L else math.max(rows.last._2, 1L)
    rows.map { case (dd, g) =>
      val pct = BigDecimal(g.toDouble / total.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      ApproxHopRow(dd, g, pct)
    }.toSeq
  }

  def approxHopPlot(spark: SparkSession, edges: DataFrame,
      maxD: Int = 20, lgK: Int = 12): DataFrame = {
    import spark.implicits._
    approxHopPlotRows(spark, edges, maxD, lgK)
      .toDF("d", "g_d", "pct")
      .select(col("d").cast("long").as("d"), col("g_d"), col("pct"))
  }
}
