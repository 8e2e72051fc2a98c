package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.registry.Q

/** Newman-Girvan modularity of a community assignment (Newman & Girvan,
  * Phys Rev E 2004) — the standard "is this partition actually
  * community-shaped?" score, here grading the g_labelprop assignment so
  * the community detector ships with its own quality audit:
  *
  *   Q = Σ_c [ e_c/m − (d_c/2m)² ]
  *
  * (e_c = within-community undirected edges, d_c = degree sum of c,
  * m = undirected edge count). Exact-integer engine parity: on the
  * deduped bidirectional arc set (A = 2m arcs, w_c = 2e_c within
  * arcs), each community's contribution scaled by 4m² is
  *
  *   contribution_4m2 = A·w_c − d_c²      (so Q = Σ/A²)
  *
  * — pure BIGINT, no rational arithmetic: Q itself is never
  * materialized as a float; consumers divide by A² at the precision
  * they need. Overflow honesty: |contribution| ≤ A² (A ≈ 7·10⁵ at
  * sf0.1, 7·10⁶ at sf1 → ≤ 5·10¹³, far inside BIGINT); a require gate
  * bounds A < 2³¹ so the square can never wrap silently.
  *
  * Scale shape: the assignment comes from the session-cached
  * propagation loop ([[LabelPropagation.assignmentFor]] — paid once
  * per session, the Scc discipline); scoring is then two vertex-keyed
  * equi-joins of the arc set against the 2-column assignment (label
  * both endpoints), one arc-side degree aggregation, and two
  * label-keyed sums — no window, no pairwise frame, one bounded 1-row
  * broadcast for the A scalar. The oracle composes label propagation's
  * own unrolled CTEs ([[LabelPropagation.oracleCtes]]), so the scored
  * assignment can never drift from the one g_labelprop exports.
  */
object Modularity {

  /** Per-community modularity table over an explicit assignment
    * (id, lab) — the unit-testable formula; the registry entry feeds it
    * the session-cached labelprop assignment. */
  def modularityOf(spark: SparkSession, edgesRaw: DataFrame,
      assignment: DataFrame): DataFrame = {
    import graft.graph.CitationGraph.bidirectional
    val e2 = bidirectional(edgesRaw)
    val asg = assignment.select(col("id"), col("lab"))

    val arcs = e2.agg(count(lit(1)).as("arcs"))
    val arcCnt = arcs.head.getLong(0)
    require(arcCnt < (1L << 31),
      s"modularity arc count $arcCnt would overflow the A² scale — " +
        "score a sampled subgraph or widen the arithmetic")

    val la = asg.select(col("id").as("src"), col("lab").as("la"))
    val lb = asg.select(col("id").as("dst"), col("lab").as("lb"))
    val within = e2.join(la, "src").join(lb, "dst")
      .filter(col("la") === col("lb"))
      .groupBy(col("la").as("community"))
      .agg(count(lit(1)).as("within_arcs"))

    val deg = e2.groupBy(col("src").as("id")).agg(count(lit(1)).as("dg"))
    val dsum = asg.join(deg, "id")
      .groupBy(col("lab").as("community"))
      .agg(count(lit(1)).as("n_vertices"), sum(col("dg")).as("degree_sum"))

    dsum.join(within, Seq("community"), "left")
      .crossJoin(broadcast(arcs))
      .select(col("community"), col("n_vertices"),
        coalesce(col("within_arcs"), lit(0L)).as("within_arcs"),
        col("degree_sum"),
        (col("arcs") * coalesce(col("within_arcs"), lit(0L))
          - col("degree_sum") * col("degree_sum")).as("contribution_4m2"))
  }

  // ---- registry entry ---------------------------------------------------

  private def oracleSql(rounds: Int): String =
    s"""WITH ${LabelPropagation.oracleCtes(rounds)},
       |asg AS (SELECT id, lab FROM lab$rounds),
       |a AS (SELECT CAST(count(*) AS BIGINT) AS arcs FROM e),
       |deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS dg
       |  FROM e GROUP BY 1),
       |win AS (SELECT la.lab AS community, CAST(count(*) AS BIGINT) AS w
       |  FROM e JOIN asg la ON la.id = e.src JOIN asg lb ON lb.id = e.dst
       |  WHERE la.lab = lb.lab GROUP BY 1),
       |dsum AS (SELECT asg.lab AS community,
       |    CAST(count(*) AS BIGINT) AS n_vertices,
       |    CAST(sum(deg.dg) AS BIGINT) AS degree_sum
       |  FROM asg JOIN deg ON deg.id = asg.id GROUP BY 1)
       |SELECT ds.community, ds.n_vertices,
       |  COALESCE(w.w, 0) AS within_arcs, ds.degree_sum,
       |  CAST(a.arcs * COALESCE(w.w, 0)
       |    - ds.degree_sum * ds.degree_sum AS BIGINT) AS contribution_4m2
       |FROM dsum ds LEFT JOIN win w ON w.community = ds.community
       |CROSS JOIN a
       |ORDER BY ds.community""".stripMargin

  val modularityQ: Q = Q(
    "g_modularity",
    Some(oracleSql(LabelPropagation.Rounds)),
    (s, d) =>
      modularityOf(s, graft.graph.CitationGraph.edges(s, d),
        LabelPropagation.assignmentFor(s, d))
        .orderBy(col("community")))

  def all: Seq[Q] = Seq(modularityQ)
}
