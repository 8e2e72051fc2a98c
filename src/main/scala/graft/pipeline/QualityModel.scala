package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.registry.Q

/** LEARNED quality filter (VERDICT r9 #4): a multinomial naive-Bayes
  * text classifier trained on weak labels and applied corpus-wide —
  * the standard upgrade path from hand-written quality rules
  * (t_quality_filter's Gopher bitmask) to a model that generalizes
  * them (the CCNet/fastText-classifier pattern: label a corpus with a
  * cheap heuristic, train a linear text model on it, gate on the model
  * score).
  *
  * Everything is INTEGER-EXACT so the DuckDB oracle matches hash for
  * hash (the t_quality_filter discipline — no double anywhere):
  *
  *  - weak label: `16 * stopword_hits >= n_tokens` — a pure integer
  *    compare (~48/52 split on the synthetic corpus);
  *  - the NB log-posterior runs in base-2 FIXED POINT: log2 is
  *    replaced by [[ilog]], the classic integer piecewise-linear
  *    approximation `1024*floor(log2 x) + ((x*1024) >> floor(log2 x))
  *    - 1024` (exact at powers of two, max error 0.086 bits between
  *    them — irrelevant to classification, decisive for determinism:
  *    every operation is BIGINT arithmetic both engines compute
  *    identically, where `round(K*ln x)` would hang the hash match on
  *    libm ulp agreement);
  *  - per-token weight: `llr(t) = [ilog(c_pos(t)+1) - ilog(N_pos+V)]
  *    - [ilog(c_neg(t)+1) - ilog(N_neg+V)]` — multinomial NB with
  *    Laplace +1 smoothing, as a fixed-point log-likelihood ratio;
  *  - doc score: `ilog(D_pos) - ilog(D_neg) + sum over token
  *    OCCURRENCES of llr(t)` (the prior's log-odds plus the
  *    occurrence-weighted evidence); predicted = score > 0.
  *
  * Scale shape (100 TB): training is ONE token-keyed shuffle with
  * map-side combine (explode -> groupBy(token) with conditional
  * sums); the model is vocab-sized — tiny next to the corpus — so
  * scoring BROADCASTS it to an explode + broadcast-hash join +
  * doc_id-keyed re-aggregation (map-side combinable: partials are one
  * row per doc per input partition). No driver-side loop, no
  * all-pairs anything; the only corpus-sized exchanges are the two
  * keyed aggregations any NB trainer/scorer must pay.
  */
object QualityModel {

  // same tokenization + stopword contract as the heuristic quality
  // family (PipelineQueries.toks / enStops)
  private def toks(c: Column): Column = split(trim(c), "\\s+")
  private val toksSql = "string_split_regex(trim(text), '\\s+')"
  private val enStops = Seq("the", "a", "of", "and", "to")
  private def hits(tc: Column): Column =
    size(filter(tc, t => t.isInCollection(enStops))).cast(LongType)
  private val hitsSql =
    "CAST(len(list_filter(toks, t -> list_contains(['the', 'a', 'of', 'and', 'to'], t))) AS BIGINT)"

  /** Fixed-point base-2 integer log (x >= 1):
    * `1024*e + ((x*1024) >> e) - 1024` with `e = floor(log2 x)`
    * derived integer-exactly as `length(bin(x)) - 1`.
    * private[pipeline]: LangIdModel runs the same arithmetic. */
  private[pipeline] def ilog(x: Column): Column = {
    val e = (length(bin(x)) - 1).cast(LongType)
    lit(1024L) * e +
      call_function("shiftright", x * lit(1024L), e.cast("int")) - lit(1024L)
  }

  /** The identical arithmetic as DuckDB SQL (bin/`>>` are exact
    * integer ops there too). */
  private[pipeline] def ilogSql(x: String): String =
    s"(1024 * (length(bin($x)) - 1) + " +
      s"((($x) * 1024) >> (length(bin($x)) - 1)) - 1024)"

  /** (doc_id, toks, n_tokens, weak_label) — the labeled view both
    * training and scoring read. */
  private def labeled(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), toks(col("text")).as("toks"))
    .select(col("doc_id"), col("toks"),
      size(col("toks")).cast(LongType).as("n_tokens"),
      (lit(16L) * hits(col("toks")) >=
        size(col("toks")).cast(LongType)).as("weak_label"))

  /** The model's SUFFICIENT STATISTICS — per-token class counts plus
    * per-class doc counts. Everything downstream (weights, prior,
    * unseen) derives from these, and they are ADDITIVE: counts(A ∪ B)
    * = mergeCounts(counts(A), counts(B)) exactly, which is what makes
    * the model incrementally updatable (a new ingest batch folds into
    * the stored statistics without re-reading the standing corpus). */
  def trainCounts(docs: DataFrame): (DataFrame, DataFrame) = {
    val lab = labeled(docs)
    val tok = lab.select(col("weak_label"), explode(col("toks")).as("token"))
    // one token-keyed shuffle, conditional sums = per-class occurrence
    // counts with map-side combine
    val cnt = tok.groupBy(col("token")).agg(
      coalesce(sum(when(col("weak_label"), 1L)), lit(0L)).as("cp"),
      coalesce(sum(when(!col("weak_label"), 1L)), lit(0L)).as("cn"))
    val dc = lab.agg(
      coalesce(sum(when(col("weak_label"), 1L)), lit(0L)).as("dp"),
      coalesce(sum(when(!col("weak_label"), 1L)), lit(0L)).as("dn"))
    (cnt, dc)
  }

  /** Fold one corpus's statistics into another's — token-keyed outer
    * merge + 1-row doc-count add. Cost is O(vocab), never O(corpus):
    * this is the model-update a standing pipeline runs per batch. */
  def mergeCounts(a: (DataFrame, DataFrame),
      b: (DataFrame, DataFrame)): (DataFrame, DataFrame) = {
    val cnt = a._1.union(b._1)
      .groupBy(col("token"))
      .agg(sum(col("cp")).as("cp"), sum(col("cn")).as("cn"))
    val dc = a._2.union(b._2)
      .agg(sum(col("dp")).as("dp"), sum(col("dn")).as("dn"))
    (cnt, dc)
  }

  /** Weights + constants from the sufficient statistics. */
  def modelFromCounts(counts: (DataFrame, DataFrame)): (DataFrame, DataFrame) = {
    val (cnt, dc) = counts
    val tot = cnt.agg(
      sum(col("cp")).as("np"), sum(col("cn")).as("nn"),
      count(lit(1)).as("v"))
    val w = cnt.crossJoin(broadcast(tot)).select(col("token"),
      ((ilog(col("cp") + 1) - ilog(col("np") + col("v"))) -
        (ilog(col("cn") + 1) - ilog(col("nn") + col("v")))).as("llr"))
    val consts = dc.crossJoin(tot).select(
      (ilog(col("dp")) - ilog(col("dn"))).as("prior"),
      (ilog(col("nn") + col("v")) - ilog(col("np") + col("v"))).as("unseen"))
    (w, consts)
  }

  /** Train on a corpus: the vocab-sized (token, llr) weight table plus
    * a 1-row (prior, unseen) constants frame. `unseen` is the weight of
    * a token the training corpus never saw — Laplace +1 on both
    * classes: `ilog(N_neg+V) - ilog(N_pos+V)` — so split-trained
    * scoring stays total over any input. */
  def train(docs: DataFrame): (DataFrame, DataFrame) =
    modelFromCounts(trainCounts(docs))

  /** Score a corpus against a trained model: explode + BROADCAST model
    * join + doc-keyed re-agg (map-side combinable). Unseen tokens fall
    * back to the `unseen` weight via the left join's coalesce. */
  def scoreWith(w: DataFrame, consts: DataFrame, docs: DataFrame): DataFrame = {
    val lab = labeled(docs)
    val s = lab.select(col("doc_id"), explode(col("toks")).as("token"))
      .join(broadcast(w), Seq("token"), "left")
      .crossJoin(broadcast(consts.select(col("unseen"))))
      .groupBy(col("doc_id"))
      .agg(sum(coalesce(col("llr"), col("unseen"))).as("tok_score"))
    lab.join(s, Seq("doc_id"), "left")
      .crossJoin(broadcast(consts.select(col("prior"))))
      .select(col("doc_id"), col("n_tokens"), col("weak_label"),
        (col("prior") + coalesce(col("tok_score"), lit(0L)))
          .cast(LongType).as("score"))
      .withColumn("predicted", col("score") > 0)
      .orderBy(col("doc_id"))
  }

  /** (doc_id, n_tokens, weak_label, score, predicted) for every doc,
    * self-trained — public so the crafted-distribution spec can drive
    * planted corpora through the full train+score path. */
  def scoreOf(docs: DataFrame): DataFrame = {
    val (w, consts) = train(docs)
    scoreWith(w, consts, docs)
  }

  /** The trained model as a DRIVER-SIDE artifact: (token→llr map,
    * prior, unseen). The model is vocab-sized — bounded and tiny next
    * to the corpus — which is exactly what makes a learned filter
    * deployable in a streaming ingest: ship the weights, score each
    * row statelessly. (The collect here is the model-artifact export
    * path, not a data path.) */
  def trainArtifact(docs: DataFrame): (Map[String, Long], Long, Long) = {
    val (w, consts) = train(docs)
    val wm = w.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val c = consts.head()
    (wm, c.getLong(0), c.getLong(1))
  }

  /** Stateless per-row scoring against a shipped model artifact — the
    * STREAMING form: a literal token→weight map + a higher-order fold
    * over the token array, zero shuffles, zero state; works unchanged
    * on a streaming DataFrame in append mode. Exactly the arithmetic
    * of [[scoreWith]] (spec-pinned equality). */
  def scoreRows(docs: DataFrame, weights: Map[String, Long], prior: Long,
      unseen: Long): DataFrame = {
    val wmap = typedlit(weights)
    docs
      .select(col("doc_id"), toks(col("text")).as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast(LongType).as("n_tokens"),
        (lit(prior) + aggregate(col("toks"), lit(0L),
          (acc, t) => acc + coalesce(element_at(wmap, t), lit(unseen))))
          .cast(LongType).as("score"))
      .withColumn("predicted", col("score") > 0)
  }

  /** Oracle: the identical weak labeling, NB counts, fixed-point
    * arithmetic, and gate replayed in DuckDB — every step BIGINT, so
    * the planted token distributions make the posterior EXACTLY
    * computable (no float tie anywhere). */
  private val scoreOracle: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |lab AS (SELECT doc_id, toks,
       |    CAST(len(toks) AS BIGINT) AS n_tokens,
       |    16 * $hitsSql >= len(toks) AS weak_label
       |  FROM t),
       |tok AS (SELECT doc_id, weak_label, unnest(toks) AS token FROM lab),
       |cnt AS (SELECT token,
       |    CAST(coalesce(sum(CASE WHEN weak_label THEN 1 END), 0) AS BIGINT) AS cp,
       |    CAST(coalesce(sum(CASE WHEN NOT weak_label THEN 1 END), 0) AS BIGINT) AS cn
       |  FROM tok GROUP BY token),
       |tot AS (SELECT CAST(sum(cp) AS BIGINT) AS np,
       |    CAST(sum(cn) AS BIGINT) AS nn, CAST(count(*) AS BIGINT) AS v
       |  FROM cnt),
       |dc AS (SELECT
       |    CAST(coalesce(sum(CASE WHEN weak_label THEN 1 END), 0) AS BIGINT) AS dp,
       |    CAST(coalesce(sum(CASE WHEN NOT weak_label THEN 1 END), 0) AS BIGINT) AS dn
       |  FROM lab),
       |w AS (SELECT token,
       |    (${ilogSql("cp + 1")} - ${ilogSql("np + v")})
       |      - (${ilogSql("cn + 1")} - ${ilogSql("nn + v")}) AS llr
       |  FROM cnt, tot),
       |s AS (SELECT doc_id, CAST(sum(llr) AS BIGINT) AS tok_score
       |  FROM tok JOIN w USING (token) GROUP BY doc_id)
       |SELECT lab.doc_id, lab.n_tokens, lab.weak_label,
       |  CAST((${ilogSql("dp")} - ${ilogSql("dn")})
       |    + coalesce(s.tok_score, 0) AS BIGINT) AS score,
       |  (${ilogSql("dp")} - ${ilogSql("dn")})
       |    + coalesce(s.tok_score, 0) > 0 AS predicted
       |FROM lab LEFT JOIN s USING (doc_id), dc
       |ORDER BY lab.doc_id""".stripMargin

  val scoreQ: Q = Q(
    "t_quality_model_score",
    Some(scoreOracle),
    (s, d) => scoreOf(Tables.documents(s, d)))

  /** The model as a GATE (the d_* composition): keep the docs the
    * classifier accepts, like t_quality_filter keeps reasons = 0. */
  val filterQ: Q = Q(
    "d_quality_model_filter",
    Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
            |lab AS (SELECT doc_id, toks,
            |    CAST(len(toks) AS BIGINT) AS n_tokens,
            |    16 * $hitsSql >= len(toks) AS weak_label
            |  FROM t),
            |tok AS (SELECT doc_id, weak_label, unnest(toks) AS token FROM lab),
            |cnt AS (SELECT token,
            |    CAST(coalesce(sum(CASE WHEN weak_label THEN 1 END), 0) AS BIGINT) AS cp,
            |    CAST(coalesce(sum(CASE WHEN NOT weak_label THEN 1 END), 0) AS BIGINT) AS cn
            |  FROM tok GROUP BY token),
            |tot AS (SELECT CAST(sum(cp) AS BIGINT) AS np,
            |    CAST(sum(cn) AS BIGINT) AS nn, CAST(count(*) AS BIGINT) AS v
            |  FROM cnt),
            |dc AS (SELECT
            |    CAST(coalesce(sum(CASE WHEN weak_label THEN 1 END), 0) AS BIGINT) AS dp,
            |    CAST(coalesce(sum(CASE WHEN NOT weak_label THEN 1 END), 0) AS BIGINT) AS dn
            |  FROM lab),
            |w AS (SELECT token,
            |    (${ilogSql("cp + 1")} - ${ilogSql("np + v")})
            |      - (${ilogSql("cn + 1")} - ${ilogSql("nn + v")}) AS llr
            |  FROM cnt, tot),
            |s AS (SELECT doc_id, CAST(sum(llr) AS BIGINT) AS tok_score
            |  FROM tok JOIN w USING (token) GROUP BY doc_id)
            |SELECT lab.doc_id, lab.n_tokens,
            |  CAST((${ilogSql("dp")} - ${ilogSql("dn")})
            |    + coalesce(s.tok_score, 0) AS BIGINT) AS score
            |FROM lab LEFT JOIN s USING (doc_id), dc
            |WHERE (${ilogSql("dp")} - ${ilogSql("dn")})
            |    + coalesce(s.tok_score, 0) > 0
            |ORDER BY lab.doc_id""".stripMargin),
    (s, d) => scoreOf(Tables.documents(s, d))
      .filter(col("predicted"))
      .select(col("doc_id"), col("n_tokens"), col("score"))
      .orderBy(col("doc_id")))

  /** Split-trained gate — the batch twin of the STREAMING quality
    * filter (Streams.qualityGate): the model trains on the STANDING
    * corpus (doc_id % 10 <> 7, the stored-model discipline of
    * d_dedup_incremental), and the INGEST BATCH (doc_id % 10 = 7)
    * is scored against it — the production shape where a trained
    * filter gates new data it never saw. Unseen tokens fall back to
    * the Laplace unseen weight on both engines. */
  val gateQ: Q = Q(
    "st_quality_model_gate",
    Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
            |lab AS (SELECT doc_id, toks,
            |    CAST(len(toks) AS BIGINT) AS n_tokens,
            |    16 * $hitsSql >= len(toks) AS weak_label
            |  FROM t),
            |tok AS (SELECT weak_label, unnest(toks) AS token
            |  FROM lab WHERE doc_id % 10 <> 7),
            |cnt AS (SELECT token,
            |    CAST(coalesce(sum(CASE WHEN weak_label THEN 1 END), 0) AS BIGINT) AS cp,
            |    CAST(coalesce(sum(CASE WHEN NOT weak_label THEN 1 END), 0) AS BIGINT) AS cn
            |  FROM tok GROUP BY token),
            |tot AS (SELECT CAST(sum(cp) AS BIGINT) AS np,
            |    CAST(sum(cn) AS BIGINT) AS nn, CAST(count(*) AS BIGINT) AS v
            |  FROM cnt),
            |dc AS (SELECT
            |    CAST(coalesce(sum(CASE WHEN weak_label THEN 1 END), 0) AS BIGINT) AS dp,
            |    CAST(coalesce(sum(CASE WHEN NOT weak_label THEN 1 END), 0) AS BIGINT) AS dn
            |  FROM lab WHERE doc_id % 10 <> 7),
            |w AS (SELECT token,
            |    (${ilogSql("cp + 1")} - ${ilogSql("np + v")})
            |      - (${ilogSql("cn + 1")} - ${ilogSql("nn + v")}) AS llr
            |  FROM cnt, tot),
            |btok AS (SELECT doc_id, unnest(toks) AS token
            |  FROM lab WHERE doc_id % 10 = 7),
            |s AS (SELECT btok.doc_id,
            |    CAST(sum(coalesce(w.llr,
            |      ${ilogSql("nn + v")} - ${ilogSql("np + v")})) AS BIGINT) AS tok_score
            |  FROM btok LEFT JOIN w USING (token), tot
            |  GROUP BY btok.doc_id),
            |p AS (SELECT (${ilogSql("dp")} - ${ilogSql("dn")}) AS prior FROM dc)
            |SELECT lab.doc_id, lab.n_tokens,
            |  CAST(p.prior + coalesce(s.tok_score, 0) AS BIGINT) AS score,
            |  p.prior + coalesce(s.tok_score, 0) > 0 AS predicted
            |FROM lab LEFT JOIN s USING (doc_id), p
            |WHERE lab.doc_id % 10 = 7
            |ORDER BY lab.doc_id""".stripMargin),
    (s, d) => {
      val docs = Tables.documents(s, d)
      val (w, consts) = train(docs.filter(col("doc_id") % 10 =!= 7))
      scoreWith(w, consts, docs.filter(col("doc_id") % 10 === 7))
        .select(col("doc_id"), col("n_tokens"), col("score"),
          col("predicted"))
        .orderBy(col("doc_id"))
    })

  /** Incremental model update — the NB statistics are additive, so a
    * new ingest batch folds into the STORED statistics in O(vocab)
    * without re-reading the standing corpus, and the refreshed model
    * must equal a full retrain EXACTLY (not approximately — same
    * integers). The query proves it end to end: standing counts +
    * batch counts merged, full corpus scored with the merged model —
    * and the oracle is t_quality_model_score's full-retrain replay
    * verbatim, so merge == retrain is the hash gate itself. */
  val incrementalQ: Q = Q(
    "t_quality_model_incremental",
    Some(scoreOracle),
    (s, d) => {
      val docs = Tables.documents(s, d)
      val merged = mergeCounts(
        trainCounts(docs.filter(col("doc_id") % 10 =!= 7)),
        trainCounts(docs.filter(col("doc_id") % 10 === 7)))
      val (w, consts) = modelFromCounts(merged)
      scoreWith(w, consts, docs)
    })

  def all: Seq[Q] = Seq(scoreQ, filterQ, gateQ, incrementalQ)
}
