package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.registry.Q

/** Corpus health report — the one-look dashboard a data engineer pulls
  * before training on a new drop: size, duplication, language mix,
  * length outliers, and novelty, as a single (metric, value) table.
  * This is a COMPOSITION capstone: every number re-derives through the
  * library's own operators (exact-hash dup via the d_dedup_exact rule,
  * outliers via RobustStats' histogram MAD, novelty via the
  * first-occurrence gram pipeline), so the report stays consistent
  * with the individually-verified queries by construction.
  *
  * All ratios are exact-integer ppm of n_docs (or of gram counts);
  * BIGINT only. Scale shape: one narrow scan feeds the scalar
  * aggregates; the dup check is a hash-keyed aggregation; outliers and
  * novelty reuse their operators' keyed shapes — nothing new is added
  * to the shuffle budget beyond what the component queries already
  * spend. */
object CorpusReport {

  def report(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"), col("lang"))

    val scalars = base.agg(
      count(lit(1)).as("n_docs"),
      sum(size(split(trim(col("text")), "\\s+")).cast("long")).as("n_tokens"),
      countDistinct(col("lang")).as("langs"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"))

    // exact-duplicate docs: md5(text) held by >= 2 distinct doc_ids
    val dupDocs = base.groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .agg(coalesce(sum(col("n")), lit(0L)).as("dup_docs"))

    val outliers = graft.operators.RobustStats
      .madOutliers(docs.select(col("doc_id"), col("lang"), col("n_chars")),
        "doc_id", "lang", "n_chars")
      .agg(sum(col("outlier")).as("outlier_docs"))

    val novelty = Novelty.noveltyOf(base.select(col("doc_id"), col("text")))
      .agg(sum(col("novelty_ppm")).as("nv_sum"), count(lit(1)).as("nv_n"))

    val j = scalars.crossJoin(dupDocs).crossJoin(outliers).crossJoin(novelty)
    val rows = Seq(
      ("n_docs", col("n_docs")),
      ("n_tokens", col("n_tokens")),
      ("mean_doc_tokens", expr("n_tokens div n_docs")),
      ("langs", col("langs")),
      ("en_ppm", expr("(1000000L * n_en) div n_docs")),
      ("exact_dup_doc_ppm", expr("(1000000L * dup_docs) div n_docs")),
      ("len_outlier_ppm", expr("(1000000L * outlier_docs) div n_docs")),
      ("novelty_mean_ppm", expr("nv_sum div nv_n")))
    j.select(explode(array(rows.map { case (m, v) =>
      struct(lit(m).as("metric"), v.cast("long").as("value"))
    }: _*)).as("s"))
      .select(col("s.metric"), col("s.value"))
  }

  private val oracleSql: String =
    """WITH s AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
      |      AS n_tokens,
      |    CAST(count(DISTINCT lang) AS BIGINT) AS langs,
      |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en
      |  FROM documents),
      |dd AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS dup_docs FROM (
      |  SELECT md5(text) AS h, count(*) AS n FROM documents
      |  GROUP BY md5(text) HAVING count(*) >= 2)),
      |hist AS (SELECT lang AS g, CAST(n_chars AS BIGINT) AS v,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM documents GROUP BY 1, 2),
      |medh AS (SELECT g, v, c,
      |    sum(c) OVER (PARTITION BY g ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumc,
      |    sum(c) OVER (PARTITION BY g) AS tot FROM hist),
      |med AS (SELECT g, CAST(min(v) AS BIGINT) AS med FROM medh
      |  WHERE cumc >= (tot + 1) // 2 GROUP BY g),
      |adh AS (SELECT h.g, abs(h.v - m.med) AS v, CAST(sum(h.c) AS BIGINT) AS c
      |  FROM hist h JOIN med m ON h.g = m.g GROUP BY h.g, abs(h.v - m.med)),
      |madh AS (SELECT g, v, c,
      |    sum(c) OVER (PARTITION BY g ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumc,
      |    sum(c) OVER (PARTITION BY g) AS tot FROM adh),
      |mad AS (SELECT g, CAST(min(v) AS BIGINT) AS mad FROM madh
      |  WHERE cumc >= (tot + 1) // 2 GROUP BY g),
      |outl AS (SELECT CAST(sum(CASE WHEN abs(d.n_chars - m.med) > 3 * x.mad
      |    THEN 1 ELSE 0 END) AS BIGINT) AS outlier_docs
      |  FROM documents d JOIN med m ON d.lang = m.g JOIN mad x ON d.lang = x.g),
      |t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents),
      |g AS (SELECT doc_id, list_transform(generate_series(1, len(toks) - 7),
      |    i -> array_to_string(toks[i:i+7], ' ')) AS grams
      |  FROM t WHERE len(toks) >= 8),
      |p AS (SELECT doc_id, unnest(grams) AS gram FROM g),
      |fst AS (SELECT gram, min(doc_id) AS first_doc FROM p GROUP BY gram),
      |nvd AS (SELECT p.doc_id, CAST(count(*) AS BIGINT) AS novel
      |  FROM p JOIN fst ON p.gram = fst.gram AND p.doc_id = fst.first_doc
      |  GROUP BY p.doc_id),
      |ngd AS (SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams FROM g),
      |nv AS (SELECT CAST(sum(CASE WHEN coalesce(ngd.n_grams, 0) > 0
      |      THEN (1000000 * coalesce(nvd.novel, 0)) // ngd.n_grams
      |      ELSE 0 END) AS BIGINT) AS nv_sum,
      |    CAST(count(*) AS BIGINT) AS nv_n
      |  FROM documents d
      |    LEFT JOIN ngd ON d.doc_id = ngd.doc_id
      |    LEFT JOIN nvd ON d.doc_id = nvd.doc_id)
      |SELECT metric, value FROM (
      |  SELECT 'n_docs' AS metric, n_docs AS value FROM s
      |  UNION ALL SELECT 'n_tokens', n_tokens FROM s
      |  UNION ALL SELECT 'mean_doc_tokens', n_tokens // n_docs FROM s
      |  UNION ALL SELECT 'langs', langs FROM s
      |  UNION ALL SELECT 'en_ppm', (1000000 * n_en) // n_docs FROM s
      |  UNION ALL SELECT 'exact_dup_doc_ppm',
      |    (1000000 * dd.dup_docs) // s.n_docs FROM s, dd
      |  UNION ALL SELECT 'len_outlier_ppm',
      |    (1000000 * outl.outlier_docs) // s.n_docs FROM s, outl
      |  UNION ALL SELECT 'novelty_mean_ppm', nv.nv_sum // nv.nv_n FROM nv)
      |ORDER BY metric""".stripMargin

  val reportQ: Q = Q(
    "d_corpus_report",
    Some(oracleSql),
    (s, d) => report(Tables.documents(s, d)).orderBy(col("metric")))

  def all: Seq[Q] = Seq(reportQ)
}
