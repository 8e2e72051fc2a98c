package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.registry.Q

/** Strongly connected components by forward-max coloring (Orzan 2004;
  * the Pregel/BSP "Coloring" SCC algorithm) — the directed closure of
  * g_components' undirected min-label propagation, and the classic
  * missing piece next to it: u and v share an SCC iff each reaches the
  * other ALONG edge directions.
  *
  * Per outer round, on the still-unassigned subgraph:
  *   1. forward flood: color(v) = max vertex id that reaches v
  *      (max-propagation along edges to its fixpoint);
  *   2. roots: vertices with color(v) == v — each root's SCC is exactly
  *      the vertices that can reach it WITHIN its color class;
  *   3. backward flood inside each color class from its root; members
  *      get scc_id = root id and leave the graph.
  * Every vertex is assigned after finitely many rounds (each round
  * assigns at least every root).
  *
  * All three levels are monotone and IDEMPOTENT past their fixpoints
  * (extra rounds change nothing), so the unrolled DuckDB twin runs each
  * flood at a FIXED depth ≥ the measured fixpoint and the outer loop at
  * a fixed round count — with require gates exporting the ACTUAL
  * convergence depths, the k-core/Mis discipline, so a dataset that
  * outgrows the unrolled depths fails loudly, never silently wrong.
  *
  * Scale shape: each flood round is one co-partitioned max/any
  * aggregation over the edge frame + a join back to state (the PageRank
  * exchange budget); subgraph shrink is two semi-joins; state and edges
  * localCheckpoint per round with eager release (Mis's layout). Rounds
  * measured on the citation graph: see the require gates.
  */
object Scc {

  /** Unrolled oracle depths, asserted ≥ the measured fixpoints at run
    * time. Measured on the citation graph (SccProbe): sf0.001 → outer 1,
    * fwd 4, bwd 4; sf0.01 → outer 1, fwd 5, bwd 6; sf0.1 → outer 2,
    * fwd 7, bwd 7 (the graph is one giant SCC plus a small periphery,
    * so the coloring converges fast). Depths carry ~2x headroom, the
    * established fixpoint-oracle discipline. */
  val OuterDepth = 3
  val FwdDepth = 14
  val BwdDepth = 12

  @volatile private[graft] var lastOuterRounds: Int = -1
  @volatile private[graft] var lastMaxFwdRounds: Int = -1
  @volatile private[graft] var lastMaxBwdRounds: Int = -1
  @volatile private[graft] var lastTrimRounds: Int = -1
  @volatile private[graft] var lastTrimmed: Long = -1L
  @volatile private[graft] var lastInputEdges: Long = -1L

  def scc(spark: SparkSession, edgesRaw: DataFrame): DataFrame =
    LoopConf.pinned(spark, org.apache.spark.sql.GraftColumnBridge.memoCount(edgesRaw)) { sccPinned(spark, edgesRaw) }

  private def sccPinned(spark: SparkSession, edgesRaw: DataFrame): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge

    def ckpt(df: DataFrame): DataFrame = df.localCheckpoint(true)
    // fused checkpoint+count (GraftColumnBridge.ckptCounted): one job
    // materializes AND counts — the eager ckpt + fastCount/countTrue
    // pair was two scheduler round-trips per loop step (guide §1.2,
    // VERDICT r13 next-round #1)
    def ckptN(df: DataFrame): (DataFrame, Long) = {
      val (c, n, _) = GraftColumnBridge.ckptCounted(df)
      (c, n)
    }
    def free(df: DataFrame): Unit =
      GraftColumnBridge.checkpointRdd(df).foreach(_.unpersist(false))

    val (edges0, nEdges0) = ckptN(
      edgesRaw.select(col("src"), col("dst"))
        .filter(col("src") =!= col("dst")).distinct()
        .repartition(col("dst")))
    var edges = edges0
    // src-partitioned twin of the live edge list: the forward flood
    // joins edges on src every round, and with only the dst-partitioned
    // copy the FULL edge list was reshuffled by src per flood round
    // (guide §2.4 share the exchange / Pregel practice: partition edges
    // once, route only messages). One extra checkpoint per trim/shrink
    // buys zero edge exchanges in all fwd rounds; bwd keeps the dst copy.
    var edgesSrc = ckpt(edges.repartition(col("src")))
    val (verts0, nVerts0) = ckptN(
      edges.select(col("src").as("id"))
        .union(edges.select(col("dst").as("id"))).distinct()
        .repartition(col("id")))
    var verts = verts0

    val sccFrames = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var nActive = nVerts0
    lastInputEdges = nEdges0
    var outer = 0
    var maxFwd = 0
    var maxBwd = 0
    var trimRounds = 0
    var trimmed = 0L

    // Trim phase (Hong et al. 2013, "On Fast Parallel Detection of
    // Strongly Connected Components": FW-BW-Trim): a live vertex with
    // no in-edge or no out-edge in the live subgraph lies on no cycle —
    // it is its own singleton SCC — and peeling it can expose more.
    // Each trim round is two cheap semi-joins + a shrink (no flood),
    // and running trim before every coloring round means the expensive
    // fwd/bwd fixpoint floods only ever run on the 2-core-like residue
    // that actually contains cycles; on the citation graph the
    // post-giant-SCC residue is pure DAG, so trim eliminates the entire
    // second outer round's 14+ flood rounds (the r9 job-count cut).
    // scc_id = id for a singleton — identical to what the coloring
    // round would assign (the root is the max member id), so the
    // unrolled no-trim oracle still matches value for value.
    def trim(): Unit = {
      // A/B kill-switch for SccProbe measurement only (on by default)
      if (!sys.props.getOrElse("graft.scc.trim", "true").toBoolean) return
      var go = nActive > 0
      while (go) {
        val (nextVerts, nNext) = ckptN(verts
          .join(edges.select(col("src").as("id")), Seq("id"), "left_semi")
          .join(edges.select(col("dst").as("id")), Seq("id"), "left_semi"))
        if (nNext == nActive) { free(nextVerts); go = false }
        else {
          trimRounds += 1
          val assigned = ckpt(verts.join(nextVerts, Seq("id"), "left_anti")
            .select(col("id"), col("id").as("scc_id")))
          sccFrames += assigned
          CheckpointRegistry.trackFinal(spark, assigned)
          trimmed += nActive - nNext
          val nextEdges = ckpt(edges
            .join(nextVerts.select(col("id").as("src")), Seq("src"), "left_semi")
            .join(nextVerts.select(col("id").as("dst")), Seq("dst"), "left_semi")
            .select(col("src"), col("dst")))
          free(verts); free(edges); free(edgesSrc)
          verts = nextVerts; edges = nextEdges
          edgesSrc = ckpt(edges.repartition(col("src")))
          nActive = nNext
          go = nActive > 0
        }
      }
    }

    trim()
    while (nActive > 0) {
      outer += 1
      // 1. forward max flood to fixpoint. NEGATIVE RESULT, measured
      // and kept (round 10): chaining TWO flood steps per checkpoint
      // cut jobs 79 -> 74 but RAISED warm wall 6.9s -> 8.2s at sf0.1 —
      // each step consumes its input twice (incoming build + state
      // join), so the un-checkpointed inner step re-evaluates its
      // whole subtree inside the outer one, and the doubled
      // propagation work outweighs the halved scheduler round-trips.
      // One step per checkpoint is the measured optimum; the job-RT
      // exposure is attributed instead (contract rounds x host
      // job_rt_ms).
      def fwdStep(color: DataFrame): DataFrame = {
        val incoming = color.join(edgesSrc, col("id") === col("src"))
          .groupBy(col("dst")).agg(max(col("c")).as("mc"))
          .select(col("dst").as("id"), col("mc"))
        color.join(incoming.hint("shuffle_hash"), Seq("id"), "left")
          .select(col("id"),
            greatest(col("c"), coalesce(col("mc"), col("c"))).as("c"),
            (col("mc").isNotNull && col("mc") > col("c")).as("chg"))
      }
      var colorFull = ckpt(verts.select(col("id"), col("id").as("c"),
        lit(false).as("chg")))
      var color = colorFull.select(col("id"), col("c"))
      var changed = 1L
      var fwd = 0
      while (changed > 0) {
        fwd += 1
        // ONE job per flood round: materialization counts the changed
        // flags as it caches (previously ckpt + countTrue = two jobs)
        val (nextFull, _, nChg) = GraftColumnBridge.ckptCounted(fwdStep(color), "chg")
        changed = nChg
        free(colorFull); colorFull = nextFull
        color = colorFull.select(col("id"), col("c"))
      }
      maxFwd = math.max(maxFwd, fwd)
      // 2+3. backward flood inside color classes from the roots
      // u joins when some edge u->w has w a member and color(u)==color(w);
      // one membership step per checkpoint (the stride-2 negative
      // result above applies here identically — member is consumed
      // twice per step)
      def bwdStep(member: DataFrame): DataFrame = {
        val newFrontier = member.select(col("id").as("dst"), col("c"))
          .join(edges, "dst")
          .select(col("src").as("id"), col("c"))
          .join(color.withColumnRenamed("c", "uc"), "id")
          .filter(col("c") === col("uc"))
          .select(col("id"), col("c"))
        member.union(newFrontier).distinct()
      }
      val (member0, nMember0) = ckptN(color.filter(col("id") === col("c"))
        .select(col("id"), col("c")))
      var member = member0
      var nMember = nMember0
      changed = 1L
      var bwd = 0
      while (changed > 0) {
        bwd += 1
        // one fused job per membership round; the previous count is
        // carried in a var (re-counting the cached previous checkpoint
        // was one more scheduler round-trip per round)
        val (nextM, nNext) = ckptN(bwdStep(member))
        changed = nNext - nMember
        nMember = nNext
        free(member); member = nextM
      }
      maxBwd = math.max(maxBwd, bwd)
      val assigned = ckpt(member.select(col("id"), col("c").as("scc_id")))
      sccFrames += assigned
      CheckpointRegistry.trackFinal(spark, assigned)
      free(member); free(colorFull)
      // 4. shrink the live subgraph (vertex materialization + count fused)
      val (nextVerts, nNextVerts) = ckptN(verts.join(assigned.select(col("id")),
        Seq("id"), "left_anti"))
      val nextEdges = ckpt(edges
        .join(nextVerts.select(col("id").as("src")), Seq("src"), "left_semi")
        .join(nextVerts.select(col("id").as("dst")), Seq("dst"), "left_semi")
        .select(col("src"), col("dst")))
      free(verts); free(edges); free(edgesSrc)
      verts = nextVerts; edges = nextEdges
      edgesSrc = ckpt(edges.repartition(col("src")))
      nActive = nNextVerts
      trim()
    }
    free(verts); free(edges); free(edgesSrc)
    lastOuterRounds = outer
    lastMaxFwdRounds = maxFwd
    lastMaxBwdRounds = maxBwd
    lastTrimRounds = trimRounds
    lastTrimmed = trimmed
    if (sccFrames.isEmpty)
      spark.range(0).select(col("id"), col("id").as("scc_id"))
    else sccFrames.reduce(_ union _)
  }

  // ---- registry entry ---------------------------------------------------

  /** Unrolled (outer × (fwd + bwd)) DuckDB twin. Idempotence past each
    * fixpoint makes fixed depths sound; the require gates make them
    * honest. Split as (CTE body, assignment union) so g_condensation
    * can build on the same assignment without duplicating the unroll. */
  private[analytics] def oracleCtes(outer: Int, fwdD: Int, bwdD: Int): (String, String) = {
    import graft.graph.CitationGraph.edgesSql
    val sb = new StringBuilder
    sb.append(s"""$edgesSql,
      |e1 AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
      |v1 AS MATERIALIZED (SELECT DISTINCT id FROM
      |  (SELECT src AS id FROM e1 UNION ALL SELECT dst FROM e1))""".stripMargin)
    for (o <- 1 to outer) {
      // forward flood
      sb.append(s""",
        |c${o}_0 AS (SELECT id, id AS c FROM v$o)""".stripMargin)
      for (f <- 1 to fwdD) {
        sb.append(s""",
          |c${o}_$f AS MATERIALIZED (
          |  SELECT p.id, CAST(CASE WHEN m.mc IS NOT NULL AND m.mc > p.c
          |    THEN m.mc ELSE p.c END AS BIGINT) AS c
          |  FROM c${o}_${f - 1} p LEFT JOIN (
          |    SELECT e.dst AS id, max(q.c) AS mc
          |    FROM c${o}_${f - 1} q JOIN e$o e ON e.src = q.id
          |    GROUP BY e.dst) m ON m.id = p.id)""".stripMargin)
      }
      // backward flood from roots within color classes
      sb.append(s""",
        |m${o}_0 AS (SELECT id, c FROM c${o}_$fwdD WHERE id = c)""".stripMargin)
      for (b <- 1 to bwdD) {
        sb.append(s""",
          |m${o}_$b AS MATERIALIZED (
          |  SELECT id, c FROM m${o}_${b - 1}
          |  UNION
          |  SELECT cu.id, m.c
          |  FROM m${o}_${b - 1} m
          |    JOIN e$o e ON e.dst = m.id
          |    JOIN c${o}_$fwdD cu ON cu.id = e.src AND cu.c = m.c)""".stripMargin)
      }
      sb.append(s""",
        |a$o AS MATERIALIZED (SELECT id, c AS scc_id FROM m${o}_$bwdD)""".stripMargin)
      // shrink
      sb.append(s""",
        |v${o + 1} AS MATERIALIZED (SELECT id FROM v$o
        |  WHERE id NOT IN (SELECT id FROM a$o)),
        |e${o + 1} AS MATERIALIZED (SELECT src, dst FROM e$o
        |  WHERE src IN (SELECT id FROM v${o + 1})
        |    AND dst IN (SELECT id FROM v${o + 1}))""".stripMargin)
    }
    val union = (1 to outer).map(o => s"SELECT id, scc_id FROM a$o")
      .mkString("\n  UNION ALL ")
    (sb.toString, union)
  }

  private def oracleSql(outer: Int, fwdD: Int, bwdD: Int): String = {
    val (ctes, union) = oracleCtes(outer, fwdD, bwdD)
    s"WITH $ctes\nSELECT id, scc_id FROM (\n  $union)\nORDER BY id"
  }

  /** Session-scoped SCC assignment cache, keyed (session, dataset):
    * g_scc and g_condensation both need the assignment, and a cluster
    * session composing several SCC-derived analytics should pay the
    * superstep loop ONCE. The cached frame is an eager localCheckpoint
    * of ~|V| 2-column rows — small enough to pin for the session
    * lifetime, so it is deliberately NOT CheckpointRegistry-tracked
    * (the registry releases after every query; a released truncated
    * checkpoint would be unrecomputable for the next caller). The
    * convergence gates run inside the compute, so a cache hit is a
    * result that already passed them. */
  private val assignCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()

  def assignmentFor(spark: SparkSession, dir: String): DataFrame =
    assignCache.computeIfAbsent((graft.SessionKey(spark), dir), _ => {
      val a = scc(spark, graft.graph.CitationGraph.edges(spark, dir))
        .localCheckpoint(true)
      require(lastOuterRounds <= OuterDepth &&
        lastMaxFwdRounds <= FwdDepth && lastMaxBwdRounds <= BwdDepth,
        s"g_scc converged in (outer=$lastOuterRounds, fwd=$lastMaxFwdRounds, " +
          s"bwd=$lastMaxBwdRounds) but the unrolled oracle is " +
          s"($OuterDepth, $FwdDepth, $BwdDepth) — raise Scc depths")
      a
    })

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

  val sccQ: Q = Q(
    "g_scc",
    Some(oracleSql(OuterDepth, FwdDepth, BwdDepth)),
    (s, d) => assignmentFor(s, d).orderBy(col("id")))

  def all: Seq[Q] = Seq(sccQ)
}
