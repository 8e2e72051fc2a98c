package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.registry.Q

/** Deterministic dataset splitting and stratified sampling — the
  * reproducible-split primitives of a training-data pipeline: at 100 TB
  * a split must be (a) a pure function of the record key, so it's stable
  * across reruns, engines, and repartitioning (Spark's `randomSplit` is
  * none of those — it's seed+partition-layout dependent), and (b) a
  * narrow map, so assignment adds zero shuffles to the pipeline.
  *
  * The bucket is the first 4 hex digits of md5("<salt>:<key>") mod 100 —
  * a keyed 0..99 percentile draw. md5 is bit-identical everywhere, so
  * the DuckDB oracle reproduces assignments exactly, and adding a new
  * record never moves an existing one (unlike modulo-on-row-number
  * schemes).
  */
object Splits {

  /** 0..99 bucket as a pure function of (salt, key). */
  def hashBucket(key: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt + ":"), key.cast("string"))), 1, 4), 16, 10)
      .cast(LongType) % 100

  /** train/val/test assignment at 80/10/10. */
  def assignSplit(df: DataFrame, key: String, salt: String = "split"): DataFrame =
    df.withColumn("bucket", hashBucket(col(key), salt))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test"))

  /** Per-stratum deterministic downsampling: keep a record iff its
    * bucket falls under its stratum's rate — e.g. rebalance a corpus by
    * keeping 10% of the dominant language but 50% of the rest. Same
    * narrow-map shape; the rate table is a literal CASE, not a join. */
  def stratifiedSample(df: DataFrame, key: String, stratum: String,
      rates: Map[String, Int], defaultRate: Int,
      salt: String = "strat"): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(col(stratum) === k, lit(r)).otherwise(acc)
    }
    df.withColumn("bucket", hashBucket(col(key), salt))
      .filter(col("bucket") < rate)
  }

  /** Domain mixing with COMPUTED quotas: downsample every domain to the
    * scarcest domain's size — the "equal mixture" rebalance a corpus
    * gets before source-weighted training — keeping each domain's
    * deterministic hash-order prefix. Unlike stratifiedSample's fixed
    * per-stratum RATES (probabilistic sizes), quotas here are derived
    * from the observed counts and hit EXACTLY: rank-in-hash-order <=
    * quota, ties broken by key, so reruns, engines, and insertions of
    * later-hashing records all agree on the selected set.
    *
    * Shape: one count aggregation (1-row broadcast), one keyed window
    * per domain partition. At 100 TB with a dominant domain the ranking
    * window concentrates that domain in one task; the scale refinement
    * (same contract) is threshold selection — approx-quantile the
    * domain's hash distribution to bracket the quota-th hash, count to
    * exact, then narrow-filter — worth it only past ~single-task-sized
    * domains, so this keeps the simpler plan. */
  def domainMix(df: DataFrame, key: String, domain: String,
      salt: String = "mix", budgetPct: Int = 80): DataFrame = {
    // quota = budgetPct% of the scarcest domain (integer math): on a
    // perfectly balanced corpus quota==min would select everything, so
    // the budget keeps the operator a real selection there too
    // floor(), not bare `/`: Column division is double division, and the
    // oracle must floor too — DuckDB CAST(double AS BIGINT) ROUNDS
    val quota = df.groupBy(col(domain)).agg(count(lit(1)).as("n_domain"))
      .agg(floor(min(col("n_domain")) * budgetPct / 100).as("quota"))
    val h = md5(concat(lit(salt + ":"), col(key).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domain)).orderBy(h, col(key))
    df.withColumn("rnk", row_number().over(w).cast(LongType))
      .crossJoin(broadcast(quota))
      .filter(col("rnk") <= col("quota"))
  }

  // ---- registry entries -------------------------------------------------

  /** Portable oracle arithmetic: DuckDB parses '0x....' string casts. */
  private def bucketSql(salt: String): String =
    s"CAST(concat('0x', substr(md5('$salt:' || CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100"

  val hashSplitQ: Q = Q(
    "x_hash_split",
    Some(s"""WITH b AS (SELECT doc_id, ${bucketSql("split")} AS bucket FROM documents)
            |SELECT doc_id, bucket,
            |  CASE WHEN bucket < 80 THEN 'train'
            |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
            |FROM b ORDER BY doc_id""".stripMargin),
    (s, d) =>
      assignSplit(Tables.documents(s, d).select(col("doc_id")), "doc_id")
        .orderBy(col("doc_id")))

  val stratifiedSampleQ: Q = Q(
    "x_stratified_sample",
    Some(s"""WITH b AS (
            |  SELECT doc_id, lang, ${bucketSql("strat")} AS bucket,
            |    CASE WHEN lang = 'en' THEN 10 ELSE 50 END AS rate
            |  FROM documents)
            |SELECT doc_id, lang, bucket FROM b
            |WHERE bucket < rate ORDER BY doc_id""".stripMargin),
    (s, d) =>
      stratifiedSample(Tables.documents(s, d).select(col("doc_id"), col("lang")),
        "doc_id", "lang", Map("en" -> 10), defaultRate = 50)
        .select(col("doc_id"), col("lang"), col("bucket"))
        .orderBy(col("doc_id")))

  val domainMixQ: Q = Q(
    "d_domain_mix",
    Some("""WITH q AS (SELECT CAST(floor(min(n) * 80 / 100) AS BIGINT) AS quota FROM
           |    (SELECT count(*) AS n FROM documents GROUP BY source)),
           |r AS (SELECT doc_id, source,
           |    row_number() OVER (PARTITION BY source
           |      ORDER BY md5('mix:' || CAST(doc_id AS VARCHAR)), doc_id) AS rnk
           |  FROM documents)
           |SELECT r.doc_id, r.source, CAST(r.rnk AS BIGINT) AS rnk
           |FROM r, q WHERE r.rnk <= q.quota ORDER BY r.doc_id""".stripMargin),
    (s, d) =>
      domainMix(Tables.documents(s, d).select(col("doc_id"), col("source")),
        "doc_id", "source")
        .select(col("doc_id"), col("source"), col("rnk"))
        .orderBy(col("doc_id")))

  /** Integer-epoch domain upsampling — the other half of mixture
    * control: d_domain_mix DOWNsamples every source to a shared budget;
    * this UPsamples scarce sources by whole-corpus repetition, the
    * "epochs per source" lever of data-constrained pretraining
    * (repeating a small high-quality source up to ~4 epochs is
    * near-free in loss terms — Muennighoff et al. 2023, "Scaling
    * Data-Constrained Language Models", arXiv:2305.16264 — while
    * unbounded repetition is not, hence the cap). epochs(source) =
    * min(maxEpochs, T div n_source) with T the LARGEST source's size:
    * every doc of a source appears exactly epochs times, tagged with
    * its copy index. Exact integer arithmetic end-to-end; fractional
    * remainders are deliberately NOT emitted — a partial epoch is a
    * SELECTION problem, solved by composing d_domain_mix's
    * rank-in-hash-order rule over the last copy.
    *
    * Scale shape: per-source counts are a map-side-combined agg into a
    * few-row broadcast; the corpus side is a broadcast join + sequence
    * explode — ZERO corpus shuffles, output is writer-ready in source
    * order. */
  def domainUpsample(df: DataFrame, key: String, domain: String,
      maxEpochs: Int = 4): DataFrame = {
    val counts = df.groupBy(col(domain)).agg(count(lit(1)).as("n_domain"))
    val target = counts.agg(max(col("n_domain")).as("t"))
    val epochs = counts.crossJoin(broadcast(target))
      .select(col(domain),
        least(lit(maxEpochs.toLong), expr("t div n_domain")).as("n_epochs"))
    df.join(broadcast(epochs), domain)
      .select(col(key), col(domain), col("n_epochs"),
        explode(sequence(lit(0L), col("n_epochs") - 1L)).as("copy"))
  }

  val domainUpsampleQ: Q = Q(
    "d_domain_upsample",
    // keyed by lang, not source: the testdata's sources are perfectly
    // balanced (epochs would be identically 1 — a no-op oracle), while
    // lang is ~3:1 skewed (en dominates), so the registered query
    // exercises real 2-4x upsampling at every sf
    Some("""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_domain
           |  FROM documents GROUP BY lang),
           |t AS (SELECT max(n_domain) AS t FROM c),
           |e AS (SELECT lang, least(4, t // n_domain) AS n_epochs FROM c, t),
           |u AS (SELECT d.doc_id, d.lang, e.n_epochs,
           |    unnest(generate_series(0, e.n_epochs - 1)) AS copy
           |  FROM documents d JOIN e ON d.lang = e.lang)
           |SELECT doc_id, lang, CAST(n_epochs AS BIGINT) AS n_epochs,
           |  CAST(copy AS BIGINT) AS copy
           |FROM u ORDER BY doc_id, copy""".stripMargin),
    (s, d) =>
      domainUpsample(Tables.documents(s, d).select(col("doc_id"), col("lang")),
        "doc_id", "lang")
        .orderBy(col("doc_id"), col("copy")))

  /** Deterministic training-order shuffle + sharding — the LAST
    * operator of a curation pipeline: a trainer wants the corpus in a
    * pseudorandom order it can reproduce (and re-randomize per epoch by
    * changing the salt), written as a fixed number of shard files.
    * order key = md5(salt:key); shard = keyed hash prefix mod shards
    * (narrow map); pos = rank within the shard. Global training order
    * is (shard, pos) lexicographic — a deterministic permutation that
    * needs NO global sort: at 100 TB this is one shuffle on the shard
    * key + a per-shard sort (exactly what writing sorted shard files
    * costs anyway), where a row_number over a global ORDER BY would
    * serialize the corpus through one task. Spark's own rand()-based
    * orderBy is seed+partition-layout dependent — rerunning it on a
    * different cluster layout yields a different epoch order; this is
    * a pure function of (salt, key). */
  def corpusShuffle(df: DataFrame, key: String, shards: Int,
      salt: String = "shuffle"): DataFrame = {
    val h = md5(concat(lit(salt + ":"), col(key).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("sort_key"), col(key))
    df.withColumn("sort_key", h)
      .withColumn("shard",
        conv(substring(col("sort_key"), 1, 4), 16, 10).cast(LongType) % shards)
      .withColumn("pos", row_number().over(w).cast(LongType))
      .drop("sort_key")
  }

  val corpusShuffleQ: Q = Q(
    "d_corpus_shuffle",
    Some("""WITH s AS (SELECT doc_id,
           |    md5('shuffle:' || CAST(doc_id AS VARCHAR)) AS h,
           |    CAST(concat('0x', substr(md5('shuffle:' || CAST(doc_id AS VARCHAR)), 1, 4))
           |      AS BIGINT) % 16 AS shard
           |  FROM documents)
           |SELECT doc_id, shard,
           |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id)
           |    AS BIGINT) AS pos
           |FROM s ORDER BY doc_id""".stripMargin),
    (s, d) =>
      corpusShuffle(Tables.documents(s, d).select(col("doc_id")),
        "doc_id", shards = 16)
        .orderBy(col("doc_id")))

  /** Quality-ranked selection under a per-domain token budget — "fill
    * the mixture from the best documents down": rank each domain's docs
    * by an EXACT-integer quality score (type-token ratio in ppm — the
    * t_quality_score signal without the float), take the prefix whose
    * running token count fits the budget. The real curation shape for
    * "give me N tokens of src_k, best first". Deterministic: integer
    * score, doc_id tiebreak, ROWS-framed running sum. Scale shape: one
    * narrow map for score/tokens, one shuffle into domain-keyed
    * windows (the domainMix caveat on dominant domains applies — see
    * its scaladoc for the threshold-selection refinement). */
  def budgetSelect(df: DataFrame, key: String, domain: String,
      textCol: String, budgetTokens: Long): DataFrame = {
    val toks = split(trim(col(textCol)), "\\s+")
    val scored = df
      .withColumn("n_tokens", size(toks).cast(LongType))
      .filter(col("n_tokens") > 0)
      .withColumn("score",
        expr(s"cast(size(array_distinct(split(trim($textCol), '\\\\s+'))) as bigint)" +
          " * 1000000 div n_tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domain)).orderBy(col("score").desc, col(key))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    scored
      .withColumn("cum", sum(col("n_tokens")).over(w).cast(LongType))
      .filter(col("cum") <= budgetTokens)
      .select(col(key), col(domain), col("n_tokens"), col("score"), col("cum"))
  }

  val budgetSelectQ: Q = Q(
    "d_budget_select",
    Some("""WITH t AS (SELECT doc_id, source,
           |    string_split_regex(trim(text), '\s+') AS toks FROM documents),
           |s AS (SELECT doc_id, source,
           |    CAST(len(toks) AS BIGINT) AS n_tokens,
           |    CAST(len(list_distinct(toks)) AS BIGINT) * 1000000 // len(toks) AS score
           |  FROM t WHERE len(toks) > 0),
           |c AS (SELECT doc_id, source, n_tokens, CAST(score AS BIGINT) AS score,
           |    CAST(sum(n_tokens) OVER (PARTITION BY source
           |      ORDER BY score DESC, doc_id ROWS UNBOUNDED PRECEDING)
           |      AS BIGINT) AS cum
           |  FROM s)
           |SELECT doc_id, source, n_tokens, score, cum
           |FROM c WHERE cum <= 600 ORDER BY doc_id""".stripMargin),
    (s, d) =>
      budgetSelect(Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("text")),
        "doc_id", "source", "text", budgetTokens = 600L)
        .orderBy(col("doc_id")))

  /** Temperature-balanced domain sampling (τ = 0.5): keep quotas
    * proportional to n_domain^τ — the multilingual-mixture rule
    * (upweight scarce languages, flatten dominant ones; the mT5/XLM-R
    * α-sampling shape) — selected, as everywhere in this file, by the
    * deterministic rank-in-hash-order prefix. All arithmetic is exact
    * integer: weight = isqrt(n) (floor sqrt — IEEE sqrt is correctly
    * rounded, so floor(sqrt(BIGINT)) is engine-identical), quota =
    * budget · w_d / Σw floored, capped at n_d. Same broadcast + keyed
    * window shape as domainMix. */
  def domainTemperature(df: DataFrame, key: String, domain: String,
      budgetPct: Int = 60, salt: String = "temp"): DataFrame = {
    val counts = df.groupBy(col(domain)).agg(count(lit(1)).as("n_domain"))
    val budget = df.agg(floor(count(lit(1)) * budgetPct / 100).as("budget"))
    val quotas = counts.crossJoin(broadcast(budget))
      .select(col(domain), col("n_domain"),
        least(col("n_domain"),
          expr("budget * cast(floor(sqrt(n_domain)) as bigint) div " +
            "sum(cast(floor(sqrt(n_domain)) as bigint)) over ()")).as("quota"))
    val h = md5(concat(lit(salt + ":"), col(key).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domain)).orderBy(h, col(key))
    df.withColumn("rnk", row_number().over(w).cast(LongType))
      .join(broadcast(quotas), domain)
      .filter(col("rnk") <= col("quota"))
      .select(col(key), col(domain), col("rnk"), col("quota"))
  }

  val domainTemperatureQ: Q = Q(
    "d_domain_temperature",
    // keyed by lang (3:1 skewed) for the same reason as d_domain_upsample
    Some("""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_domain
           |  FROM documents GROUP BY lang),
           |b AS (SELECT CAST(floor(count(*) * 60 / 100) AS BIGINT) AS budget
           |  FROM documents),
           |q AS (SELECT lang, n_domain,
           |    least(n_domain, budget * CAST(floor(sqrt(n_domain)) AS BIGINT)
           |      // (SELECT CAST(sum(CAST(floor(sqrt(n_domain)) AS BIGINT)) AS BIGINT)
           |          FROM c)) AS quota
           |  FROM c, b),
           |r AS (SELECT doc_id, lang,
           |    row_number() OVER (PARTITION BY lang
           |      ORDER BY md5('temp:' || CAST(doc_id AS VARCHAR)), doc_id) AS rnk
           |  FROM documents)
           |SELECT r.doc_id, r.lang, CAST(r.rnk AS BIGINT) AS rnk,
           |  CAST(q.quota AS BIGINT) AS quota
           |FROM r JOIN q ON r.lang = q.lang
           |WHERE r.rnk <= q.quota ORDER BY r.doc_id""".stripMargin),
    (s, d) =>
      domainTemperature(Tables.documents(s, d).select(col("doc_id"), col("lang")),
        "doc_id", "lang")
        .orderBy(col("doc_id")))

  /** Deterministic negative sampling — reproducible "random" partners
    * for contrastive training (embedder / reranker data): each doc
    * gets k negatives drawn uniformly-at-random-but-reproducibly from
    * the corpus. Shape: docs land in hash shards (narrow map), and a
    * doc's negatives are the next k docs on its SHARD's md5 ring —
    * the shard is already a uniform random subset and the ring order
    * inside it is a second independent hash draw, so partners are
    * unbiased, while every window/join stays shard-partitioned (no
    * global ring, which would be a single-task sort at 100 TB; the
    * corpusShuffle scaladoc's argument). Self-partners (wrap-around on
    * a tiny shard) are filtered; duplicate partners can only occur on
    * shards with <= k docs. */
  def negativeSamples(df: DataFrame, key: String, k: Int, shards: Int = 64,
      salt: String = "neg"): DataFrame = {
    val h = md5(concat(lit(salt + ":"), col(key).cast("string")))
    val wPos = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("hh"), col(key))
    val wN = org.apache.spark.sql.expressions.Window.partitionBy(col("shard"))
    val ring = df
      .withColumn("hh", h)
      .withColumn("shard",
        conv(substring(col("hh"), 1, 4), 16, 10).cast(LongType) % shards)
      .withColumn("pos", row_number().over(wPos).cast(LongType))
      .withColumn("n", count(lit(1)).over(wN))
      .select(col(key), col("shard"), col("pos"), col("n"))
    val wanted = ring
      .select(col(key).as("doc_id_a"), col("shard"), col("pos"), col("n"),
        explode(sequence(lit(1L), lit(k.toLong))).as("j"))
      .withColumn("need", pmod(col("pos") - 1 + col("j"), col("n")) + 1)
    wanted
      .join(ring.select(col("shard"), col("pos").as("need"),
        col(key).as("neg_id")), Seq("shard", "need"))
      .filter(col("doc_id_a") =!= col("neg_id"))
      .select(col("doc_id_a").as("doc_id"), col("j"), col("neg_id"))
  }

  val negativeSamplesQ: Q = Q(
    "d_negative_samples",
    Some("""WITH r AS (SELECT doc_id,
           |    md5('neg:' || CAST(doc_id AS VARCHAR)) AS hh,
           |    CAST(concat('0x', substr(md5('neg:' || CAST(doc_id AS VARCHAR)), 1, 4))
           |      AS BIGINT) % 64 AS shard
           |  FROM documents),
           |ring AS (SELECT doc_id, shard,
           |    CAST(row_number() OVER (PARTITION BY shard ORDER BY hh, doc_id)
           |      AS BIGINT) AS pos,
           |    CAST(count(*) OVER (PARTITION BY shard) AS BIGINT) AS n
           |  FROM r),
           |w AS (SELECT a.doc_id, a.shard, j.j,
           |    ((a.pos - 1 + j.j) % a.n) + 1 AS need
           |  FROM ring a, (SELECT unnest(generate_series(1, 4)) AS j) j)
           |SELECT w.doc_id, CAST(w.j AS BIGINT) AS j, b.doc_id AS neg_id
           |FROM w JOIN ring b ON b.shard = w.shard AND b.pos = w.need
           |WHERE b.doc_id <> w.doc_id
           |ORDER BY w.doc_id, j""".stripMargin),
    (s, d) =>
      negativeSamples(Tables.documents(s, d).select(col("doc_id")),
        "doc_id", k = 4)
        .orderBy(col("doc_id"), col("j")))

  val all: Seq[Q] = Seq(hashSplitQ, stratifiedSampleQ, domainMixQ,
    domainUpsampleQ, corpusShuffleQ, budgetSelectQ, domainTemperatureQ,
    negativeSamplesQ)
}
