package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.registry.Q

/** Preference-pair (DPO/RLHF) data validation — the governance pass a
  * preference corpus runs before training: records arrive as JSON
  * {prompt, chosen, rejected} and the defect classes that silently
  * corrupt a DPO loss must be flagged from the PARSED record —
  * degenerate pairs (chosen == rejected: zero learning signal, wasted
  * compute), empty responses, and rejected-extends-chosen pairs (the
  * rejected response is the chosen plus a suffix — a length-bias trap
  * well documented in DPO practice).
  *
  * Construction: prompt = the first L/3 tokens, chosen = the next
  * (L−p)/2, rejected = the remainder; three defect classes planted by
  * doc_id arithmetic (%11==3 copies chosen into rejected, %13==5
  * empties chosen, %17==7 makes rejected = chosen + one extra token).
  * Unlike the Chat oracle (which attributes verdicts to the plants and
  * needed a corpus-invariant pin — ADVICE r10 #3), this oracle
  * DERIVES every verdict by rebuilding the exact strings from the
  * slice arithmetic and comparing — so a pair that is degenerate BY
  * CHANCE (the ~31-token vocabulary makes short equal slices
  * possible) is flagged identically on both engines, and plants that
  * compose (%11 ∧ %13 → an empty degenerate pair) need no special
  * casing. Everything is a narrow map until the output sort. */
object Pref {

  /** documents -> (doc_id, pref JSON). */
  def withPrefPairs(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .withColumn("L", size(col("toks")))
      .withColumn("p", expr("L div 3"))
      .withColumn("c", expr("(L - p) div 2"))
      .withColumn("prompt", expr("array_join(slice(toks, 1, p), ' ')"))
      .withColumn("chosen_base", expr("array_join(slice(toks, p + 1, c), ' ')"))
      .withColumn("rej_base",
        expr("array_join(slice(toks, p + c + 1, L - p - c), ' ')"))
      .withColumn("chosen",
        when(col("doc_id") % 13 === 5, lit("")).otherwise(col("chosen_base")))
      .withColumn("rejected",
        when(col("doc_id") % 11 === 3, col("chosen"))
          .when(col("doc_id") % 17 === 7,
            concat(col("chosen_base"), lit(" "), element_at(col("toks"), -1)))
          .otherwise(col("rej_base")))
      .select(col("doc_id"),
        to_json(struct(col("prompt"), col("chosen"), col("rejected")))
          .as("pref"))

  /** Parse + validate: every verdict and count from the PARSED record. */
  def validate(prefs: DataFrame): DataFrame = {
    val parsed = prefs.withColumn("r",
      from_json(col("pref"),
        org.apache.spark.sql.types.DataType.fromDDL(
          "struct<prompt:string,chosen:string,rejected:string>")))
    def ntok(c: org.apache.spark.sql.Column) =
      when(c === "", 0L).otherwise(size(split(c, " ")).cast(LongType))
    parsed.select(
      col("doc_id"),
      ntok(col("r.prompt")).as("n_prompt_tokens"),
      ntok(col("r.chosen")).as("n_chosen_tokens"),
      ntok(col("r.rejected")).as("n_rejected_tokens"),
      (col("r.chosen") === col("r.rejected")).as("is_degenerate"),
      (col("r.chosen") === "" || col("r.rejected") === "").as("has_empty"),
      (col("r.chosen") =!= "" &&
        col("r.rejected").startsWith(concat(col("r.chosen"), lit(" "))))
        .as("rejected_extends_chosen"))
      .withColumn("valid",
        !col("is_degenerate") && !col("has_empty") &&
          !col("rejected_extends_chosen"))
  }

  /** The oracle rebuilds the exact strings by the same slice
    * arithmetic and derives every verdict by comparison — never by
    * plant attribution. */
  private val Oracle =
    """WITH m AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS L
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, toks, L, L // 3 AS p, (L - L // 3) // 2 AS c FROM m),
      |s AS (
      |  SELECT doc_id,
      |    array_to_string(toks[1 : p], ' ') AS prompt,
      |    array_to_string(toks[p + 1 : p + c], ' ') AS chosen_base,
      |    array_to_string(toks[p + c + 1 : L], ' ') AS rej_base,
      |    toks[L] AS last_tok
      |  FROM g),
      |x AS (
      |  SELECT doc_id, prompt,
      |    CASE WHEN doc_id % 13 = 5 THEN '' ELSE chosen_base END AS chosen,
      |    CASE WHEN doc_id % 11 = 3 THEN
      |           (CASE WHEN doc_id % 13 = 5 THEN '' ELSE chosen_base END)
      |         WHEN doc_id % 17 = 7 THEN chosen_base || ' ' || last_tok
      |         ELSE rej_base END AS rejected
      |  FROM s),
      |v AS (
      |  SELECT doc_id,
      |    CAST(CASE WHEN prompt = '' THEN 0
      |      ELSE len(string_split(prompt, ' ')) END AS BIGINT) AS n_prompt_tokens,
      |    CAST(CASE WHEN chosen = '' THEN 0
      |      ELSE len(string_split(chosen, ' ')) END AS BIGINT) AS n_chosen_tokens,
      |    CAST(CASE WHEN rejected = '' THEN 0
      |      ELSE len(string_split(rejected, ' ')) END AS BIGINT) AS n_rejected_tokens,
      |    chosen = rejected AS is_degenerate,
      |    chosen = '' OR rejected = '' AS has_empty,
      |    chosen <> '' AND starts_with(rejected, chosen || ' ')
      |      AS rejected_extends_chosen
      |  FROM x)
      |SELECT doc_id, n_prompt_tokens, n_chosen_tokens, n_rejected_tokens,
      |  is_degenerate, has_empty, rejected_extends_chosen,
      |  NOT is_degenerate AND NOT has_empty AND NOT rejected_extends_chosen
      |    AS valid
      |FROM v ORDER BY doc_id""".stripMargin

  val prefValidateQ: Q = Q(
    "t_pref_pairs_validate",
    Some(Oracle),
    (s, d) =>
      validate(withPrefPairs(Tables.documents(s, d)))
        .orderBy(col("doc_id")))

  val all: Seq[Q] = Seq(prefValidateQ)
}
