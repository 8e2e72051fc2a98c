package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Hop-plot / effective-diameter queries (SURVEY.md §2.12, §7.3;
  * Analytics.scala:152-229): g(d) = number of distinct connected node
  * pairs at shortest-path distance <= d.
  *
  * Implementation: level-synchronous all-pairs BFS over ordered pairs.
  * Key design vs the reference (Analytics.scala:235-280): no path arrays —
  * the visited-set anti-join subsumes the cycle check for shortest paths,
  * shrinking state from O(pairs x pathLen) to O(pairs). Each round:
  * frontier ⋈ edges -> candidates, anti-join visited -> new frontier,
  * union into visited. `localCheckpoint` truncates the growing union
  * lineage every round (the reference's unpersist dance, done properly);
  * on a real cluster swap for `checkpoint` with a reliable dir.
  *
  * Scale: all-pairs BFS is inherently O(pairs) state — fine for the
  * bounded analytics graph it serves (reference materialized 76M pairs);
  * at 100-TB graph scale the same API should switch to HyperANF-style
  * approximation (approx_count_distinct over neighborhoods).
  */
object HopPlot {

  final case class HopRow(d: Int, g_d: Long, pct: Double)

  /** Hop-plot rows for an undirected graph given by `edges`(src,dst).
    *
    * @param maxD       hard distance cap (reference caps at 20)
    * @param coverage   stop once g(d)/total >= coverage (reference: 0.90);
    *                   1.0 computes the full curve to the fixpoint.
    * @param totalPairs known connected-pair count (unordered). When given
    *                   (from ConnectedComponents.componentSizes or a
    *                   nodepairs file, S3), the BFS SHORT-CIRCUITS at the
    *                   coverage threshold — the scale path: components
    *                   cost O(diameter) cheap rounds, the all-pairs BFS
    *                   O(pairs) state per round. Without it the full
    *                   fixpoint is computed and is itself the denominator.
    */
  def hopPlotRows(
      spark: SparkSession,
      edges: DataFrame,
      maxD: Int = 20,
      coverage: Double = 1.0,
      totalPairs: Option[Long] = None): Seq[HopRow] = {
    import graft.graph.CitationGraph.bidirectional

    val bidir = bidirectional(edges).persist(StorageLevel.MEMORY_AND_DISK)
    // src-partitioned neighbor table, persisted once: every BFS level
    // probes it on m = src; unpartitioned, the full pair list was
    // reshuffled by m at EVERY level (guide §2.4) — now only the
    // (shrinking) frontier side shuffles per level
    val nbr = bidir.select(col("src").as("m"), col("dst").as("nb"))
      .repartition(col("m")).persist(StorageLevel.MEMORY_AND_DISK)

    // ordered pairs (both directions kept: needed to expand frontiers).
    // Fused checkpoint+count: one job materializes and counts (the eager
    // ckpt + fastCount pair was two scheduler round-trips — guide §1.2).
    val (frontier0, newCount0, _) =
      org.apache.spark.sql.GraftColumnBridge.ckptCounted(bidir)
    var frontier = frontier0
    var visited = frontier
    val perD = scala.collection.mutable.ArrayBuffer[(Int, Long)]()
    var newCount = newCount0
    if (newCount > 0) perD += 1 -> newCount // empty graph → empty hop-plot
    var cum = newCount
    var d = 1
    def coverageReached: Boolean = totalPairs.exists { t =>
      coverage < 1.0 && (cum / 2).toDouble / t.toDouble >= coverage
    }
    // checkpoint blocks are freed via the backing RDD (plain df.unpersist
    // is a no-op on a localCheckpoint frame — VERDICT r5 #2's session-long
    // O(pairs) block leak); every round frees its superseded frontier AND
    // visited once the successors are materialized
    import org.apache.spark.sql.GraftColumnBridge
    def free(df: DataFrame): Unit =
      GraftColumnBridge.checkpointRdd(df).foreach(_.unpersist(false))
    while (newCount > 0 && d < maxD && !coverageReached) {
      d += 1
      val cand = frontier.join(nbr, col("dst") === col("m"))
        .select(col("src"), col("nb").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      val (fresh, nFresh, _) = GraftColumnBridge.ckptCounted(
        cand.join(visited, Seq("src", "dst"), "left_anti"))
      newCount = nFresh
      if (newCount > 0) {
        val nextVisited = visited.union(fresh).localCheckpoint(true)
        // round 1's frontier and visited are the same checkpoint —
        // double-unpersist of one RDD is harmless
        free(frontier); free(visited)
        frontier = fresh
        visited = nextVisited
        perD += d -> newCount
        cum += newCount
      } else free(fresh)
    }
    // all results are driver-side counts by now — no lazy frame keeps
    // these blocks alive, so the finals are freed here, not registered
    free(frontier); free(visited)
    nbr.unpersist(false)
    bidir.unpersist(false)

    val total = totalPairs.getOrElse(perD.map(_._2).sum / 2) // unordered
    var c = 0L
    val rows = perD.map { case (dd, n) =>
      c += n
      // unordered pair counts; pct via double division + half-up 6dp,
      // matching DuckDB round(x, 6)
      val g = c / 2
      val pct = BigDecimal(g.toDouble / total.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      HopRow(dd, g, pct)
    }.toSeq
    coverageCut(rows, coverage)
  }

  private def coverageCut(rows: Seq[HopRow], coverage: Double): Seq[HopRow] =
    if (coverage >= 1.0) rows
    else {
      val idx = rows.indexWhere(_.pct >= coverage)
      if (idx < 0) rows else rows.take(idx + 1)
    }

  /** Full-curve hop rows memoized per (session, input key): g_hopplot and
    * g_eff_diameter need the *identical* BFS, so whichever registry entry
    * runs first pays for it and the other reuses the rows (VERDICT r1 #3 —
    * the duplicate recompute was ~30s of the visible bench). The cached
    * value is a plain Seq of (d, count, pct) — tiny (O(diameter)). */
  private val rowsCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Seq[HopRow]]()

  /** maxD/coverage are folded into the cache key and passed through, so a
    * caller asking for a different cut can never be served the default
    * curve (ADVICE r2). */
  def hopPlotRowsCached(spark: SparkSession, edges: => DataFrame,
      cacheKey: String, maxD: Int = 20, coverage: Double = 1.0): Seq[HopRow] =
    rowsCache.computeIfAbsent(
      (graft.SessionKey(spark), s"$cacheKey|maxD=$maxD|cov=$coverage"),
      _ => hopPlotRows(spark, edges, maxD, coverage))

  /** Drop this session's memoized hop curves (driver-side Seqs — no
    * Spark blocks to free). graft.SessionCaches hook: lets Bench time
    * the BFS as its own `_setup_hopplot` entry per rep. */
  private[graft] def clearRows(spark: SparkSession): Unit = {
    val sid = graft.SessionKey(spark)
    rowsCache.keySet.removeIf(k => k._1 == sid)
  }

  def rowsToDf(spark: SparkSession, rows: Seq[HopRow]): DataFrame = {
    import spark.implicits._
    rows.toDF("d", "g_d", "pct")
      .select(col("d").cast("long").as("d"), col("g_d"), col("pct"))
  }

  def hopPlot(spark: SparkSession, edges: DataFrame, maxD: Int = 20,
      coverage: Double = 1.0): DataFrame =
    rowsToDf(spark, hopPlotRows(spark, edges, maxD, coverage))

  /** Interpolated effective diameter (SURVEY.md §2.12): smallest d* with
    * g(d*)/T >= q, linearly interpolated between the straddling rows.
    * Computed from exact pair counts (not the rounded pct) so the oracle's
    * double arithmetic reproduces it bit-for-bit.
    */
  def effectiveDiameter(spark: SparkSession, edges: DataFrame,
      q: Double = 0.9): DataFrame =
    effectiveDiameterFromRows(spark, hopPlotRows(spark, edges), q)

  /** Same interpolation over precomputed hop rows (no BFS). */
  def effectiveDiameterFromRows(spark: SparkSession, rows: Seq[HopRow],
      q: Double = 0.9): DataFrame = {
    import spark.implicits._
    val total = if (rows.isEmpty) 0L else rows.last.g_d
    val target = q * total
    val ed: Double =
      if (rows.isEmpty) 0.0
      else if (rows.head.g_d >= target) 1.0
      else {
        val i = rows.indexWhere(_.g_d >= target)
        if (i < 0) rows.last.d.toDouble
        else {
          val lo = rows(i - 1); val hi = rows(i)
          lo.d + (target - lo.g_d) / (hi.g_d - lo.g_d).toDouble
        }
      }
    Seq(BigDecimal(ed).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      .toDF("effective_diameter")
  }
}
