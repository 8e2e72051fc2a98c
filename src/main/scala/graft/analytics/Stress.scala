package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.registry.Q

/** Sampled stress centrality (Shimbel 1953; the path-COUNT sibling of
  * betweenness) — "how many shortest paths ride through this vertex" —
  * from a fixed source sample, by the two-phase Brandes shape
  * (Brandes 2001): a forward level-synchronous BFS accumulating σ
  * (number of shortest source→v paths), then a backward accumulation
  * over the shortest-path DAG. Betweenness proper needs the rational
  * σ_v/σ_w; stress stays in BIGINT the whole way — the engine-parity
  * discipline — via the tail count
  *
  *   T(v) = 1 + Σ_{w : (v,w) edge, d(w) = d(v)+1} T(w)
  *
  * (number of maximal shortest-path continuations from v, counting v
  * itself), giving stress(v) = Σ_s σ_s(v) · T_s(v): the number of
  * (source, target, shortest-path) triples visiting v. Both the BFS
  * and the backward accumulation are idempotent once converged, so a
  * fixed unroll with require-gated measured depths is a sound oracle
  * (the g_scc discipline). Sources: vertices with id < SourceMax — a
  * deterministic sample, the PPR/walks convention.
  *
  * Scale shape: state is (source, vertex) keyed — 8x the vertex frame,
  * constant in |E|; each forward round is one edge join + one (s, dst)
  * sum-aggregation, each backward round one DAG join + (s, v) sum; the
  * DAG is derived once. Overflow honesty: σ and T are path counts and
  * can explode on adversarial graphs — require gates bound max(σ),
  * max(T) so a corpus that would overflow 2^62 fails LOUDLY instead of
  * silently wrapping (Spark BIGINT sum wraps; DuckDB widens to
  * HUGEINT — the gate keeps both inside BIGINT where they agree). */
object Stress {

  val SourceMax = 8L

  /** BFS rounds (= max depth); backward uses the same unroll. Measured
    * (StressProbe in SccProbe's mold — spec prints): depth reached
    * sf0.001 → 4, sf0.01 → 5, sf0.1 → 7; backward converges in
    * depth+1. 10 carries the SSSP headroom convention. */
  val Rounds = 10

  @volatile private[graft] var lastMaxSigma: Long = -1
  @volatile private[graft] var lastMaxTail: Long = -1

  private def ckpt(df: DataFrame): DataFrame = df.localCheckpoint(true)
  private def free(df: DataFrame): Unit = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.checkpointRdd(df).foreach(_.unpersist(false))
  }

  /** Deduped, self-loop-free, src-repartitioned edge frame — the layout
    * every phase joins against. NOT checkpointed here (callers decide
    * whether it is transient or session-pinned). */
  private[analytics] def prep(edgesRaw: DataFrame): DataFrame =
    edgesRaw.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .repartition(col("src"))

  /** Forward level-synchronous BFS from the id < sourceMax sample over
    * a prepped (checkpointed) edge frame: returns the checkpointed
    * (s, v, d, sig) level frame, the max depth reached, and whether the
    * frontier DRAINED before the round cap (true = fixpoint reached —
    * the flag that decides which eccentricity bounds are certified, see
    * [[Eccentricity]]). Shared by stress (which continues with the
    * backward phase) and harmonic centrality (which only needs the
    * levels) — one implementation, one session-cached materialization
    * ([[levelsFor]]). */
  private[analytics] def forward(spark: SparkSession, e: DataFrame,
      sourceMax: Long, rounds: Int): (DataFrame, Int, Boolean) = {
    val verts = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()

    // reached (s, v, d, sig); frontier = rows at depth k-1.
    // Fused checkpoint+count (ckptCounted): materialization counts as it
    // caches, and the per-level comparison carries the previous count in
    // a var — the former fastCount pair was two extra cached-scan jobs
    // per BFS level (guide §1.2).
    val (reached0, nReached0, _) = org.apache.spark.sql.GraftColumnBridge
      .ckptCounted(verts.filter(col("id") < sourceMax)
        .select(col("id").as("s"), col("id").as("v"),
          lit(0L).as("d"), lit(1L).as("sig")))
    var reached = reached0
    var nReached = nReached0
    // early-stop on an empty frontier: rounds past the BFS fixpoint are
    // idempotent (the unrolled oracle runs all of them and matches);
    // maxDepth then bounds the backward iterations needed (T_i is exact
    // for DAG height <= i, and height <= maxDepth)
    var maxDepth = 0
    var k = 1
    var frontierEmpty = false
    while (k <= rounds && !frontierEmpty) {
      val frontier = reached.filter(col("d") === (k - 1).toLong)
      val cand = frontier.join(e, col("v") === col("src"))
        .groupBy(col("s"), col("dst"))
        .agg(sum(col("sig")).as("nsig"))
        .select(col("s"), col("dst").as("v"), col("nsig"))
      val fresh = cand.join(reached.select(col("s"), col("v")),
          Seq("s", "v"), "left_anti")
        .select(col("s"), col("v"), lit(k.toLong).as("d"),
          col("nsig").as("sig"))
      val (next, nNext, _) = org.apache.spark.sql.GraftColumnBridge
        .ckptCounted(reached.union(fresh))
      if (nNext == nReached) frontierEmpty = true
      else maxDepth = k
      free(reached); reached = next; nReached = nNext
      k += 1
    }
    (reached, maxDepth, frontierEmpty)
  }

  def stress(spark: SparkSession, edgesRaw: DataFrame,
      sourceMax: Long = SourceMax, rounds: Int = Rounds): DataFrame =
    LoopConf.pinned(spark, org.apache.spark.sql.GraftColumnBridge.memoCount(edgesRaw)) {
      val e = ckpt(prep(edgesRaw))
      val (reached, maxDepth, _) = forward(spark, e, sourceMax, rounds)
      val out = backward(spark, e, reached, maxDepth, rounds)
      free(e)
      CheckpointRegistry.trackFinal(spark, reached)
      out
    }

  /** DAG derivation + backward tail accumulation + overflow gate. The
    * level frame is read, never freed, here — the caller owns it (it
    * may be the session-pinned cache). */
  private def backward(spark: SparkSession, e: DataFrame,
      reached: DataFrame, maxDepth: Int, rounds: Int): DataFrame = {
    // shortest-path DAG: (s, u, w) with d(w) = d(u) + 1
    val rFrom = reached.select(col("s"), col("v").as("u"), col("d").as("du"))
    val rTo = reached.select(col("s").as("s2"), col("v").as("w"),
      col("d").as("dw"))
    val dag2 = ckpt(rFrom.join(e, col("u") === col("src"))
      .join(rTo, col("s") === col("s2") && col("dst") === col("w"))
      .filter(col("dw") === col("du") + 1L)
      .select(col("s"), col("u"), col("w")))

    // backward: T_0 = 1; T_i(v) = 1 + sum over DAG successors T_{i-1}(w)
    var tail = ckpt(reached.select(col("s"), col("v"), lit(1L).as("t")))
    for (_ <- 1 to math.min(rounds, maxDepth + 1)) {
      // join DAG successors' current T onto each u
      val ss = dag2.join(
        tail.select(col("s").as("ts"), col("v").as("tw"), col("t")),
        col("s") === col("ts") && col("w") === col("tw"))
        .groupBy(col("s"), col("u")).agg(sum(col("t")).as("st"))
        .select(col("s"), col("u").as("v"), col("st"))
      val next = ckpt(reached.select(col("s"), col("v"))
        .join(ss.hint("shuffle_hash"), Seq("s", "v"), "left")
        .select(col("s"), col("v"),
          (lit(1L) + coalesce(col("st"), lit(0L))).as("t")))
      free(tail); tail = next
    }

    val joined = reached.select(col("s"), col("v"), col("sig"))
      .join(tail, Seq("s", "v"))
    val bounds = joined.agg(max(col("sig")).as("ms"), max(col("t")).as("mt"))
      .head
    // empty source set (no vertex under SourceMax / empty graph): max()
    // is NULL and there is nothing to overflow
    lastMaxSigma = if (bounds.isNullAt(0)) 0L else bounds.getLong(0)
    lastMaxTail = if (bounds.isNullAt(1)) 0L else bounds.getLong(1)
    require(lastMaxSigma < (1L << 31) && lastMaxTail < (1L << 31),
      s"stress centrality path counts near overflow (maxSigma=" +
        s"$lastMaxSigma, maxTail=$lastMaxTail) — results would wrap in " +
        "BIGINT; shrink the source sample or the round count")

    val out = joined
      .groupBy(col("v")).agg(sum(col("sig") * col("t")).as("stress"))
      .select(col("v").as("id"), col("stress"))
    free(dag2)
    CheckpointRegistry.trackFinal(spark, tail)
    out
  }

  /** Session-scoped sampled-BFS cache, keyed (session, dataset):
    * g_stress and g_harmonic both consume the (s, v, d, sig) level
    * frame, and a session composing several centrality analytics
    * should pay the BFS ONCE (the [[Scc.assignmentFor]] discipline).
    * Both frames are eager localCheckpoints — |sample| × |V| rows of
    * four longs plus the deduped edges — small enough to pin for the
    * session, and deliberately NOT CheckpointRegistry-tracked (the
    * registry releases after every query; a released truncated
    * checkpoint would be unrecomputable for the next caller). */
  private val levelsCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String), (DataFrame, DataFrame, Int, Long, Boolean)]()

  private[analytics] def levelsFor(spark: SparkSession,
      dir: String): (DataFrame, DataFrame, Int, Long, Boolean) =
    levelsCache.computeIfAbsent((graft.SessionKey(spark), dir), _ => {
      val raw = graft.graph.CitationGraph.edges(spark, dir)
      val eCnt = raw.count()
      LoopConf.pinned(spark, eCnt) {
        val e = ckpt(prep(raw))
        val (reached, maxDepth, drained) = forward(spark, e, SourceMax, Rounds)
        (e, reached, maxDepth, eCnt, drained)
      }
    })

  /** Whether the session-cached sampled BFS for `dir` reached fixpoint
    * (frontier drained before the Rounds cap). Consumed by
    * [[Eccentricity]]: the sampled radius upper bound is only CERTIFIED
    * when this is true — a truncated BFS underestimates eccentricities
    * (ADVICE r7 #4). */
  def bfsDrainedFor(spark: SparkSession, dir: String): Boolean =
    levelsFor(spark, dir)._5

  /** Standalone drained probe over an arbitrary edge frame (same
    * forward phase, nothing cached) — the flag callers of
    * [[Eccentricity.eccentricity]] need before trusting its radius
    * bound. */
  def bfsDrained(spark: SparkSession, edgesRaw: DataFrame,
      sourceMax: Long = SourceMax, rounds: Int = Rounds): Boolean =
    LoopConf.pinned(spark, org.apache.spark.sql.GraftColumnBridge.memoCount(edgesRaw)) {
      val e = ckpt(prep(edgesRaw))
      val (reached, _, drained) = forward(spark, e, sourceMax, rounds)
      free(e); free(reached)
      drained
    }

  /** Warm the session BFS cache for `dir` — Bench times this as its own
    * `_setup_bfs_levels` entry so the g_stress/g_harmonic/g_eccentricity
    * numbers are MARGINAL cost with the build attributed by name
    * (VERDICT r7 #1 / ADVICE r7 #2). */
  def warmLevels(spark: SparkSession, dir: String): Unit =
    levelsFor(spark, dir)

  /** Drop this session's cached BFS levels and free their checkpoint
    * blocks (graft.SessionCaches hook — ADVICE r7 #2: a session cache
    * with no eviction path pins |sample|x|V| blocks for the session and
    * makes repeated-run bench statistics pure cache hits). */
  private[graft] def clearLevels(spark: SparkSession): Unit = {
    val sid = graft.SessionKey(spark)
    val it = levelsCache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 == sid) {
        free(e.getValue._1); free(e.getValue._2)
        it.remove()
      }
    }
  }

  /** Registry path: backward phase over the session-cached levels. */
  def stressFor(spark: SparkSession, dir: String): DataFrame = {
    val (e, reached, maxDepth, eCnt, _) = levelsFor(spark, dir)
    LoopConf.pinned(spark, eCnt) {
      backward(spark, e, reached, maxDepth, Rounds)
    }
  }

  // ---- registry entry ---------------------------------------------------

  private def oracleSql(sourceMax: Long, rounds: Int): String = {
    import graft.graph.CitationGraph.edgesSql
    val sb = new StringBuilder
    sb.append(s"""WITH $edgesSql,
      |e AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
      |v AS (SELECT DISTINCT id FROM
      |  (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
      |r0 AS MATERIALIZED (SELECT id AS s, id AS v, CAST(0 AS BIGINT) AS d,
      |  CAST(1 AS BIGINT) AS sig FROM v WHERE id < $sourceMax)""".stripMargin)
    for (k <- 1 to rounds) {
      sb.append(s""",
        |r$k AS MATERIALIZED (
        |  SELECT s, v, d, sig FROM r${k - 1}
        |  UNION ALL
        |  SELECT c.s, c.v, CAST($k AS BIGINT) AS d, c.nsig AS sig FROM (
        |    SELECT f.s, e.dst AS v, CAST(sum(f.sig) AS BIGINT) AS nsig
        |    FROM r${k - 1} f JOIN e ON e.src = f.v
        |    WHERE f.d = ${k - 1}
        |    GROUP BY f.s, e.dst) c
        |  WHERE NOT EXISTS (SELECT 1 FROM r${k - 1} p
        |    WHERE p.s = c.s AND p.v = c.v))""".stripMargin)
    }
    sb.append(s""",
      |dag AS MATERIALIZED (
      |  SELECT a.s, a.v AS u, b.v AS w
      |  FROM r$rounds a JOIN e ON e.src = a.v
      |    JOIN r$rounds b ON b.s = a.s AND b.v = e.dst
      |  WHERE b.d = a.d + 1),
      |t0 AS (SELECT s, v, CAST(1 AS BIGINT) AS t FROM r$rounds)""".stripMargin)
    for (i <- 1 to rounds) {
      sb.append(s""",
        |t$i AS MATERIALIZED (
        |  SELECT r.s, r.v,
        |    CAST(1 + coalesce(x.st, 0) AS BIGINT) AS t
        |  FROM r$rounds r LEFT JOIN (
        |    SELECT dag.s, dag.u AS v, CAST(sum(p.t) AS BIGINT) AS st
        |    FROM dag JOIN t${i - 1} p ON p.s = dag.s AND p.v = dag.w
        |    GROUP BY dag.s, dag.u) x ON x.s = r.s AND x.v = r.v)""".stripMargin)
    }
    sb.append(s"""
      |SELECT r.v AS id, CAST(sum(r.sig * t.t) AS BIGINT) AS stress
      |FROM r$rounds r JOIN t$rounds t ON t.s = r.s AND t.v = r.v
      |GROUP BY r.v
      |ORDER BY r.v""".stripMargin)
    sb.toString
  }

  val stressQ: Q = Q(
    "g_stress",
    Some(oracleSql(SourceMax, Rounds)),
    (s, d) => stressFor(s, d).orderBy(col("id")))

  def all: Seq[Q] = Seq(stressQ)
}
