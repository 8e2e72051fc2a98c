package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.registry.Q

/** BPE merge-candidate training round (Sennrich et al. ACL 2016) — the
  * TRAINING side of tokenization (t_token_bpe is the inference side):
  * given the corpus, which symbol pair would the byte-pair encoder
  * merge first? Round 1 operates on the character alphabet: the merge
  * score of pair (a, b) is the number of adjacent (a, b) occurrences
  * summed over the corpus, weighted by word frequency. The output is
  * the top-20 candidates under the total order (count DESC, pair ASC) —
  * rank 1 is the merge a real BPE trainer would apply.
  *
  * The BPE-training insight that makes this scale: pair counting runs
  * over DISTINCT WORD TYPES (each with its corpus frequency), never
  * over corpus tokens — the classic trainer's word-frequency dictionary.
  * The corpus collapses to the type table in one map-side-combinable
  * count; the per-type character pairs are an in-array transform over
  * strings of bounded length; the final agg is alphabet²-sized. Exact
  * BIGINT counts; the (count, pair) order is total, so the top-20
  * boundary is deterministic on both engines.
  */
object BpeTrain {

  val TopK = 20

  /** (pair, cnt): top-K merge candidates for any (text) frame. */
  def mergeCandidates(docs: DataFrame, k: Int = TopK): DataFrame = {
    val types = docs
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
      .filter(length(col("w")) >= 2)
    // adjacent char pairs inside the word — the filter(i < len) guard
    // (not sequence(1, len-1)) because Spark's sequence DESCENDS when
    // start > stop
    val pairs = types.select(col("wc"), explode(expr(
      "transform(filter(sequence(1, length(w)), i -> i < length(w)), " +
        "i -> concat(substring(w, i, 1), ' ', substring(w, i + 1, 1)))"))
      .as("pair"))
    pairs.groupBy(col("pair")).agg(sum(col("wc")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(k)
  }

  private def oracleSql(k: Int): String =
    s"""WITH w AS (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
       |  FROM documents),
       |types AS (SELECT w, CAST(count(*) AS BIGINT) AS wc FROM w
       |  WHERE length(w) >= 2 GROUP BY w),
       |p AS (SELECT wc, unnest(list_transform(
       |    generate_series(1, length(w) - 1),
       |    i -> substr(w, i, 1) || ' ' || substr(w, i + 1, 1))) AS pair
       |  FROM types)
       |SELECT pair, CAST(sum(wc) AS BIGINT) AS cnt
       |FROM p GROUP BY pair
       |ORDER BY cnt DESC, pair
       |LIMIT $k""".stripMargin

  val bpeTrainQ: Q = Q(
    "t_bpe_merge",
    Some(oracleSql(TopK)),
    (s, d) => mergeCandidates(Tables.documents(s, d)))

  def all: Seq[Q] = Seq(bpeTrainQ)
}
