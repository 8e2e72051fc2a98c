package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.registry.Q

/** N-gram novelty scoring — the curriculum/ordering signal next to
  * d_dup_span's duplication signal: processing docs in doc_id order,
  * how much of each doc's 8-gram content is seen here FIRST? A doc
  * whose grams all first-occur in earlier docs adds nothing to the
  * corpus (novelty 0); a fully novel doc scores 1e6 ppm. Used to order
  * ingestion (novel-first curricula) and to bound the marginal value
  * of an incremental crawl batch.
  *
  * Definition: gram = word 8-gram (d_dup_span's convention, same
  * windowed build); first_doc(gram) = min doc_id containing it; a gram
  * POSITION in doc d is novel iff first_doc == d (so within-doc repeats
  * of a doc's own new gram count as novel — the doc introduced them).
  * Exact integers throughout; docs with < 8 tokens report 0 grams,
  * novelty 0.
  *
  * Scale shape: in-array gram build (map-only), one gram-keyed
  * min-aggregation (map-side combinable), one equi-join back on gram,
  * one per-doc count — d_dup_span's exact exchange budget with min in
  * place of the dup count. */
object Novelty {

  private def toks(c: Column): Column = split(trim(c), "\\s+")

  /** (doc_id, n_grams, novel_grams, novelty_ppm) for any
    * (doc_id, text) frame.
    *
    * Gram build: the codegen'd per-row kernel
    * (SketchFunctions.word_ngrams — positional 8-grams), NOT the
    * higher-order `transform(sequence, ...)` form: Spark evaluates
    * lambda transforms INTERPRETED per element, and the postings frame
    * feeds two plan branches so the build executed per branch — the
    * honest toRdd bench measured the transform form at 35.7s where the
    * kernel does the identical work in ~3s (round 8). `n_grams` is
    * derived arithmetically (tokens - 7) — counting grams must not
    * rebuild them. */
  def noveltyOf(docs: DataFrame): DataFrame = {
    import graft.functions.SketchFunctions.word_ngrams
    val p = docs.select(col("doc_id"),
      explode(word_ngrams(col("text"), 8)).as("gram"))
    val first = p.groupBy(col("gram")).agg(min(col("doc_id")).as("first_doc"))
    val novel = p.join(first, "gram")
      .filter(col("doc_id") === col("first_doc"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("novel"))
    val ng = docs
      .select(col("doc_id"), toks(col("text")).as("toks"))
      .filter(size(col("toks")) >= 8)
      .select(col("doc_id"),
        (size(col("toks")) - lit(7)).cast(LongType).as("n_grams"))
    docs.select(col("doc_id"))
      .join(ng, Seq("doc_id"), "left")
      .join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("novel"), lit(0L)).as("novel_grams"))
      .withColumn("novelty_ppm",
        expr("CASE WHEN n_grams > 0 THEN (1000000L * novel_grams) div n_grams ELSE 0L END"))
      .orderBy(col("doc_id"))
  }

  private val oracleSql: String =
    """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents),
      |g AS (SELECT doc_id, list_transform(
      |    generate_series(1, len(toks) - 7),
      |    i -> array_to_string(toks[i:i+7], ' ')) AS grams
      |  FROM t WHERE len(toks) >= 8),
      |p AS (SELECT doc_id, unnest(grams) AS gram FROM g),
      |fst AS (SELECT gram, min(doc_id) AS first_doc FROM p GROUP BY gram),
      |nv AS (SELECT p.doc_id, CAST(count(*) AS BIGINT) AS novel
      |  FROM p JOIN fst ON p.gram = fst.gram AND p.doc_id = fst.first_doc
      |  GROUP BY p.doc_id),
      |ng AS (SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams FROM g)
      |SELECT d.doc_id,
      |  coalesce(ng.n_grams, CAST(0 AS BIGINT)) AS n_grams,
      |  coalesce(nv.novel, CAST(0 AS BIGINT)) AS novel_grams,
      |  CASE WHEN coalesce(ng.n_grams, 0) > 0
      |    THEN (1000000 * coalesce(nv.novel, CAST(0 AS BIGINT))) // ng.n_grams
      |    ELSE CAST(0 AS BIGINT) END AS novelty_ppm
      |FROM documents d
      |  LEFT JOIN ng ON d.doc_id = ng.doc_id
      |  LEFT JOIN nv ON d.doc_id = nv.doc_id
      |ORDER BY d.doc_id""".stripMargin

  val noveltyQ: Q = Q(
    "t_ngram_novelty",
    Some(oracleSql),
    (s, d) => noveltyOf(Tables.documents(s, d)))

  def all: Seq[Q] = Seq(noveltyQ)
}
