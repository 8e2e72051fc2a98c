package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.registry.Q

/** Prefix-filtered set-similarity self-join (the PPJoin family — Xiao,
  * Wang, Lin & Yu, WWW 2008; Chaudhuri's SSJoin lineage) over word
  * TOKEN SETS: find every doc pair with token-set Jaccard ≥ τ by
  * joining only each doc's PREFIX — its p = n − ⌈τ·n⌉ + 1 globally
  * rarest tokens — instead of all postings.
  *
  * Why this exists next to d_dedup_ngram_jaccard: the inverted-index
  * path bounds hot-key blowup with a df-cap, which is exact for every
  * surfaced pair but can MISS a pair whose entire overlap is
  * boilerplate hotter than the cap. The prefix filter is provably
  * COMPLETE with no cap: if J(x,y) ≥ τ, the two prefixes must share a
  * token (fewer than p_x + p_y − ... tokens can be disjoint only if
  * overlap < the τ-implied bound), so candidate generation never drops
  * a qualifying pair, and stopword-hot tokens almost never appear in a
  * prefix because prefixes are taken in GLOBAL (df ASC, token ASC)
  * order — the rare end of the vocabulary. The classic trade: a cap
  * bounds worst-case work unconditionally; the prefix bounds it
  * distribution-wise while keeping exact completeness.
  *
  * Engine parity is all-integer: τ = TauNum/TauDen, the prefix length
  * uses ⌈τn⌉ = (TauNum·n + TauDen − 1) div TauDen, the qualifying
  * predicate is c·TauDen ≥ TauNum·(na + nb − c), and the reported
  * similarity is jac_ppm = 1e6·c div (na + nb − c) — no float
  * anywhere, so the ORACLE can be an INDEPENDENT brute-force all-pairs
  * join (a genuinely different construction than the Spark side — a
  * stronger check than replaying the same algorithm).
  *
  * Scale shape: token sets and prefixes are per-doc narrow (the prefix
  * selection is a doc-keyed window over that doc's tokens ordered by
  * the global (df, token) order — no global rank materialization);
  * candidates come from a prefix-token equi-join whose skew is bounded
  * by how often a token lands in a prefix (rare end of the df
  * spectrum); verification joins full postings through the candidate
  * pairs only — O(|candidates| × doc size), never all-pairs.
  */
object PpJoin {

  /** τ = 19/20. Unigram SETS are far less discriminating than the
    * shingle paths' 3-gram structure — this corpus draws docs from a
    * shared vocabulary, so τ = 1/2 would label 74% of ALL pairs
    * near-dups (measured at sf0.01: 92,254 of 124,750) and the
    * operator's output itself would be quadratic, a scale-killer.
    * At 0.95 the output is ~1.5% of pairs (1,887) AND the prefix
    * shrinks to ~n/20 + 1 rarest tokens — the regime where prefix
    * filtering actually pays. */
  val TauNum = 19L
  val TauDen = 20L

  /** (doc_id, ts = distinct non-empty whitespace tokens, n = |ts|),
    * empty docs dropped (Jaccard undefined on two empty sets). */
  def tokenSets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        array_distinct(filter(split(trim(col("text")), "\\s+"),
          t => length(t) > 0)).as("ts"))
      .withColumn("n", size(col("ts")).cast(LongType))
      .filter(col("n") > 0L)

  /** All pairs with token-set Jaccard ≥ TauNum/TauDen:
    * (a_id, b_id, c, na, nb, jac_ppm). */
  def similarPairs(spark: SparkSession, docs: DataFrame): DataFrame = {
    val sets = tokenSets(docs)
    val posts = sets.select(col("doc_id"), col("n"),
      explode(col("ts")).as("t"))
    val dfTab = posts.groupBy(col("t")).agg(count(lit(1)).as("df"))

    // prefix = the p rarest tokens of each doc under the global total
    // order (df ASC, t ASC); p = n - ceil(tau*n) + 1, all integer
    // (`div`, not float division — a double quotient that rounds up
    // across an integer boundary would silently change the floor)
    val p = expr(s"n - (($TauNum * n + ${TauDen - 1}) div $TauDen) + 1")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("t"))
    val prefix = posts.join(dfTab, "t")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= p)
      .select(col("doc_id"), col("t"))

    val cand = prefix.select(col("doc_id").as("a_id"), col("t"))
      .join(prefix.select(col("doc_id").as("b_id"), col("t")), "t")
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()

    // candidate-scoped exact verify: common-token counts through the
    // pair, then the integer tau predicate
    val pa = posts.select(col("doc_id").as("a_id"), col("t"))
    val pb = posts.select(col("doc_id").as("bb_id"), col("t").as("tb"))
    val common = cand.join(pa, "a_id")
      .join(pb, col("b_id") === col("bb_id") && col("t") === col("tb"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("c"))

    val sa = sets.select(col("doc_id").as("a_id"), col("n").as("na"))
    val sb = sets.select(col("doc_id").as("b_id"), col("n").as("nb"))
    common.join(sa, "a_id").join(sb, "b_id")
      .filter(col("c") * TauDen >= lit(TauNum) * (col("na") + col("nb") - col("c")))
      .select(col("a_id"), col("b_id"), col("c"), col("na"), col("nb"),
        expr("(1000000 * c) div (na + nb - c)").as("jac_ppm"))
  }

  // ---- registry entry ---------------------------------------------------

  /** Independent brute-force oracle: all-pairs list_intersect — a
    * different construction than the prefix filter, so a completeness
    * bug in the filter (not just a scoring bug) hash-fails. */
  private val oracleSql: String =
    s"""WITH tk AS (
       |  SELECT doc_id,
       |    list_distinct(list_filter(
       |      string_split_regex(trim(text), '\\s+'),
       |      t -> len(t) > 0)) AS ts
       |  FROM documents),
       |tn AS (SELECT doc_id, ts, CAST(len(ts) AS BIGINT) AS n FROM tk
       |  WHERE len(ts) > 0),
       |p AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |    CAST(len(list_intersect(a.ts, b.ts)) AS BIGINT) AS c,
       |    a.n AS na, b.n AS nb
       |  FROM tn a JOIN tn b ON a.doc_id < b.doc_id)
       |SELECT a_id, b_id, c, na, nb,
       |  CAST(1000000 * c // (na + nb - c) AS BIGINT) AS jac_ppm
       |FROM p
       |WHERE c * $TauDen >= $TauNum * (na + nb - c)
       |ORDER BY a_id, b_id""".stripMargin

  val ppjoinQ: Q = Q(
    "d_dedup_ppjoin",
    Some(oracleSql),
    (s, d) => similarPairs(s, Tables.documents(s, d))
      .orderBy(col("a_id"), col("b_id")))

  def all: Seq[Q] = Seq(ppjoinQ)
}
