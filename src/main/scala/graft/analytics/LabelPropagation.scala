package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.registry.Q

/** Synchronous label propagation (community detection): every vertex
  * starts labeled with its own id; each round it adopts the most
  * frequent label among its neighbors, ties to the SMALLEST label — a
  * deterministic total order, so a fixed round count R is bit-identical
  * across engines/layouts and an unrolled DuckDB CTE oracles it exactly
  * (the PageRank/SSSP/KCore discipline; classic async LPA is
  * order-dependent by design and cannot be oracled).
  *
  * Round shape: one co-partitioned histogram aggregation
  * (neighbor-label counts, map-side combinable) + one argmax
  * aggregation via max(struct(count, -label)) — no window over the
  * vertex set. Edges are shuffled onto src once before the loop
  * (LoopConf-pinned).
  */
object LabelPropagation {

  val Rounds = 3

  /** Rounds per checkpoint. Each round references `lab` ONCE (hist ←
    * lab⋈e, next ← hist) — the PageRank-shaped curve, where batching
    * can win, unlike the double-reference k-core/SSSP loops. MEASURED
    * cold per-JVM at sf0.1 (CadenceProbe -labelprop, 2 reps): every=1
    * 5.4/5.8s, every=3 5.6/5.3s — a tie at 3 rounds; stays 1 (simplest,
    * and per-round checkpoints keep lineage flat for deeper runs). */
  val CkptEvery = 1

  def labelProp(spark: SparkSession, edgesRaw: DataFrame,
      rounds: Int = Rounds, ckptEvery: Int = CkptEvery): DataFrame = {
    // rounds=0 would return a lazy frame over the edge checkpoint that
    // the loop epilogue has already unpersisted — reject it up front
    require(rounds >= 1, s"labelProp needs at least 1 round, got $rounds")
    LoopConf.pinned(spark, org.apache.spark.sql.GraftColumnBridge.memoCount(edgesRaw)) {
      labelPropPinned(spark, edgesRaw, rounds, ckptEvery)
    }
  }

  private def labelPropPinned(spark: SparkSession, edgesRaw: DataFrame,
      rounds: Int, ckptEvery: Int): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    import graft.graph.CitationGraph.bidirectional

    val e = bidirectional(edgesRaw)
      .repartition(col("src"))
      .localCheckpoint(true)
    var lab = e.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("lab"))
    var prevCkpt: Option[DataFrame] = None
    var since = 0
    for (r <- 1 to rounds) {
      val hist = lab.join(e, col("id") === col("src"))
        .groupBy(col("dst"), col("lab"))
        .agg(count(lit(1)).as("c"))
      val nextDs = hist
        .groupBy(col("dst"))
        .agg(max(struct(col("c").as("c"), (-col("lab")).as("nl"))).as("m"))
        .select(col("dst").as("id"), (-col("m.nl")).as("lab"))
      since += 1
      if (since == ckptEvery || r == rounds) {
        val next = nextDs.localCheckpoint(true)
        prevCkpt.foreach(p =>
          GraftColumnBridge.checkpointRdd(p).foreach(_.unpersist(false)))
        prevCkpt = Some(next)
        lab = next
        since = 0
      } else lab = nextDs
    }
    GraftColumnBridge.checkpointRdd(e).foreach(_.unpersist(false))
    // final checkpoint backs the lazy result; the runner releases it via
    // CheckpointRegistry once the result is materialized
    prevCkpt.foreach(CheckpointRegistry.trackFinal(spark, _))
    lab
  }

  // ---- registry entry ---------------------------------------------------

  /** The WITH-body CTE chain ending in `lab<rounds>` — shared with the
    * modularity oracle ([[Modularity]]), which scores this exact
    * assignment, so the two oracles can never drift. */
  private[analytics] def oracleCtes(rounds: Int): String = {
    import graft.graph.CitationGraph.edgesSql
    val head =
      s"""$edgesSql,
         |e AS (SELECT src, dst FROM edges WHERE src <> dst
         |  UNION SELECT dst, src FROM edges WHERE src <> dst),
         |lab0 AS (SELECT DISTINCT src AS id, src AS lab FROM e)""".stripMargin
    val levels = (1 to rounds).map { r =>
      s"""h$r AS (SELECT e.dst AS id, p.lab AS lab, count(*) AS c
         |  FROM e JOIN lab${r - 1} p ON p.id = e.src GROUP BY 1, 2),
         |lab$r AS (SELECT id, lab FROM (
         |  SELECT id, lab, row_number() OVER (PARTITION BY id ORDER BY c DESC, lab) AS rk
         |  FROM h$r) WHERE rk = 1)""".stripMargin
    }
    (head +: levels).mkString(",\n")
  }

  private def oracleSql(rounds: Int): String =
    s"WITH ${oracleCtes(rounds)}\nSELECT id, lab FROM lab$rounds ORDER BY id"

  /** Session-scoped assignment cache, keyed (session, dataset):
    * g_labelprop and g_modularity both need the assignment, and a
    * session composing community analytics should pay the propagation
    * loop once (the [[Scc.assignmentFor]] discipline). Eager
    * localCheckpoint of |V| 2-column rows, deliberately NOT
    * CheckpointRegistry-tracked — the registry releases after every
    * query, which would truncate the cache for the next caller. */
  private val assignCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()

  def assignmentFor(spark: SparkSession, dir: String): DataFrame =
    assignCache.computeIfAbsent((graft.SessionKey(spark), dir), _ =>
      labelProp(spark, graft.graph.CitationGraph.edges(spark, dir))
        .localCheckpoint(true))

  /** Drop this session's cached assignments and free their blocks
    * (graft.SessionCaches hook — ADVICE r7 #2). */
  private[graft] def clearAssignments(spark: SparkSession): Unit = {
    val sid = graft.SessionKey(spark)
    val it = assignCache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 == sid) {
        org.apache.spark.sql.GraftColumnBridge.checkpointRdd(e.getValue)
          .foreach(r => try r.unpersist(false) catch { case _: Throwable => () })
        it.remove()
      }
    }
  }

  val labelPropQ: Q = Q(
    "g_labelprop",
    Some(oracleSql(Rounds)),
    (s, d) => assignmentFor(s, d).orderBy(col("id")))

  def all: Seq[Q] = Seq(labelPropQ)
}
