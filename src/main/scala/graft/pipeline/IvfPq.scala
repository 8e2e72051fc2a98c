package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions.array_dot_long
import graft.registry.Q

/** IVF-PQ: the canonical billion-scale ANN layout (FAISS "IVFADC",
  * Jégou et al. 2011 §IV) — compose the engine's two quantizers:
  *
  *   1. COARSE: the exact-integer k-means of [[SemanticCluster]]
  *      partitions the corpus into k ~ sqrt(n) inverted lists; a query
  *      probes only its nProbe nearest cells, so the scan touches
  *      ~nProbe/k of the corpus instead of all of it;
  *   2. FINE: within the probed lists, candidates are scored by
  *      [[PqIndex]] ADC — M table lookups against the query's
  *      partial-distance table, reading 8 code bytes per candidate,
  *      never the vector;
  *   3. REFINE: the ADC shortlist alone is re-ranked with exact int8
  *      distances.
  *
  * Scale shape at 100 TB: the probe is a map against a broadcast of k
  * centroid rows; candidate generation is an equi-join of the
  * assignment table against the tiny probed-cell list; ADC joins the
  * code table to the broadcast M·K partial table; only `Short` vectors
  * per query are ever read at full (int8) width. Every stage is the
  * already-audited shape of its parent operator — this file adds NO new
  * distance arithmetic, only the composition, which is exactly why the
  * oracle can be assembled from the parents' CTE chains.
  */
object IvfPq {

  /** Coarse cells probed per query. The measured recall@5 curve vs the
    * exact int8 L2 top-5 at sf0.01 (k = 64 cells): nProbe 4 -> 0.62,
    * 8 -> 0.80, 16 -> 0.92 — the standard IVF trade (probed fraction
    * buys recall linearly-ish until the PQ shortlist becomes the
    * binding loss, 0.96 at full-corpus PQ). 8 probes = 12.5% of the
    * lists scanned. */
  val NProbe = 8

  private def quantDf(s: SparkSession, d: String): DataFrame =
    Quantize.quantized(Tables.embeddings(s, d)).select(col("vec_id"), col("q"))

  /** IVF-PQ top-5 with exact refine: (qid, nid, d2, rnk). */
  def annIvfPq(s: SparkSession, d: String): DataFrame = {
    val qdf = quantDf(s, d)
    val (ccents, casg) = SemanticCluster.trainedFor(s, d)
    val (pcents, pcodes) = PqIndex.trained(s, d)
    val queries = PipelineQueries.requireBounded(
      qdf.filter(col("vec_id") < 10), "sim_ann_ivf_pq query side", 1024L)
      .select(col("vec_id").as("qid"), col("q").as("qq"))
    // probe: the nProbe nearest coarse cells per query (exact integer
    // distance vs a broadcast of the k centroid rows; the rank window
    // runs over k rows per query)
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("cdist"), col("c"))
    val probed = queries
      .withColumn("q2", array_dot_long(col("qq"), col("qq")))
      .crossJoin(broadcast(
        ccents.withColumn("c2", array_dot_long(col("cm"), col("cm")))))
      .withColumn("cdist",
        col("q2") - lit(2L) * array_dot_long(col("qq"), col("cm")) + col("c2"))
      .withColumn("crk", row_number().over(wProbe))
      .filter(col("crk") <= NProbe)
      .select(col("qid"), col("c").as("cell"))
    // candidates: every vector whose inverted list was probed
    val cand = casg.select(col("vec_id").as("nid"), col("c").as("cell"))
      .join(broadcast(probed), "cell")
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"))
    // ADC over the candidates only: M code-table lookups per candidate
    val pd = PqIndex.pdTable(qdf, pcents)
    val wAdc = Window.partitionBy(col("qid")).orderBy(col("adc"), col("nid"))
    val shortlist = cand
      .join(pcodes.select(col("vec_id").as("nid"), col("sub"), col("c")), "nid")
      .join(broadcast(pd), Seq("qid", "sub", "c"))
      .groupBy(col("qid"), col("nid"))
      .agg(sum(col("pdist")).as("adc"))
      .withColumn("rk", row_number().over(wAdc))
      .filter(col("rk") <= PqIndex.Short)
      .select(col("qid"), col("nid"))
    // exact int8 refine of the shortlist
    val nv = qdf.select(col("vec_id").as("nid"), col("q").as("nq"))
    val wRef = Window.partitionBy(col("qid")).orderBy(col("d2"), col("nid"))
    shortlist
      .join(nv, "nid")
      .join(broadcast(queries), "qid")
      .withColumn("d2",
        array_dot_long(col("qq"), col("qq"))
          - lit(2L) * array_dot_long(col("qq"), col("nq"))
          + array_dot_long(col("nq"), col("nq")))
      .withColumn("rnk", row_number().over(wRef))
      .filter(col("rnk") <= 5)
      .select(col("qid"), col("nid"), col("d2"),
        col("rnk").cast("long").as("rnk"))
      .orderBy(col("qid"), col("rnk"))
  }

  // ---- oracle: the parents' CTE chains + the composition ----------------

  val annIvfPqQ: Q = Q(
    "sim_ann_ivf_pq",
    Some {
      val qcDist =
        "list_sum(list_transform(generate_series(1, 64), " +
          "j -> (q.q[j] - c.cm[j]) * (q.q[j] - c.cm[j])))"
      val abDist =
        "list_sum(list_transform(generate_series(1, 64), " +
          "j -> (a.q[j] - b.q[j]) * (a.q[j] - b.q[j])))"
      s"""WITH ${SemanticCluster.quantCtes},
         |${SemanticCluster.lloydCtes},
         |${PqIndex.pqChainNoQuant},
         |${PqIndex.pdCtesNoQuant},
         |qp AS (
         |  SELECT q.vec_id AS qid, c.c AS cell,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY $qcDist, c.c) AS crk
         |  FROM qt q CROSS JOIN ${SemanticCluster.FinalCentsCte} c
         |  WHERE q.vec_id < 10),
         |probed AS (SELECT qid, cell FROM qp WHERE crk <= $NProbe),
         |cand AS (
         |  SELECT p.qid, a.vec_id AS nid
         |  FROM ${SemanticCluster.FinalAsgCte} a
         |  JOIN probed p ON a.c = p.cell AND a.vec_id <> p.qid),
         |adcq AS (
         |  SELECT c.qid, c.nid, CAST(sum(t.pdist) AS BIGINT) AS adc
         |  FROM cand c
         |  JOIN pasg${PqIndex.Iters} k ON k.vec_id = c.nid
         |  JOIN pd t ON t.qid = c.qid AND t.sub = k.sub AND t.c = k.c
         |  GROUP BY 1, 2),
         |short AS (
         |  SELECT qid, nid FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY qid ORDER BY adc, nid) AS rk FROM adcq)
         |  WHERE rk <= ${PqIndex.Short}),
         |rr AS (
         |  SELECT s.qid, s.nid, CAST($abDist AS BIGINT) AS d2
         |  FROM short s
         |  JOIN qt a ON a.vec_id = s.qid
         |  JOIN qt b ON b.vec_id = s.nid)
         |SELECT qid, nid, d2, rnk FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY qid ORDER BY d2, nid) AS rnk FROM rr)
         |WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin
    },
    (s, d) => annIvfPq(s, d))

  val all: Seq[Q] = Seq(annIvfPqQ)
}
