package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.registry.Q

/** SFT chat-data validation — the governance pass instruction-tuning
  * corpora run before training: conversations arrive as JSON turn
  * arrays, and malformed structure (roles that don't alternate, empty
  * turns, a dangling user prompt with no response) must be flagged
  * BEFORE tokenization, where it would silently corrupt loss masking.
  *
  * The corpus constructs one JSON conversation per document from its
  * token slices, with three DEFECT classes planted by doc_id
  * arithmetic: %11==3 breaks role alternation (two adjacent user
  * turns), %13==5 empties a turn's content, %17==7 appends a dangling
  * user prompt. The Spark side must recover every verdict by PARSING
  * the JSON (from_json → typed turn array → higher-order checks); the
  * oracle re-derives the verdicts from the planted arithmetic alone
  * and never parses. Everything is a narrow map until the output sort. */
object Chat {

  /** Turn construction: base turns = 2·(doc_id%2 + 1) (2 or 4 — even,
    * so a well-formed dialog ends on assistant); content i = the i-th
    * equal token slice. */
  private def turnsExpr: String =
    """transform(sequence(0, n_turns - 1), i -> struct(
      |  CASE WHEN doc_id % 11 = 3 AND i = 0 THEN 'assistant'
      |       WHEN i % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
      |  CASE WHEN doc_id % 13 = 5 AND i = 1 THEN ''
      |       ELSE array_join(slice(toks, CAST(i * size(toks) / n_turns AS INT) + 1,
      |         CAST((i + 1) * size(toks) / n_turns AS INT)
      |           - CAST(i * size(toks) / n_turns AS INT)), ' ') END AS content))""".stripMargin

  /** documents -> (doc_id, chat JSON string). */
  def withChats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .withColumn("n_turns",
        (expr("2 * (doc_id % 2 + 1)") +
          when(col("doc_id") % 17 === 7, 1).otherwise(0)).cast("int"))
      .withColumn("turns", expr(turnsExpr))
      .select(col("doc_id"), to_json(col("turns")).as("chat"))

  /** Parse + validate: every verdict from the PARSED turn array. */
  def validate(chats: DataFrame): DataFrame = {
    val parsed = chats.withColumn("turns",
      from_json(col("chat"),
        org.apache.spark.sql.types.DataType.fromDDL(
          "array<struct<role:string,content:string>>")))
    parsed.select(
      col("doc_id"),
      size(col("turns")).cast(LongType).as("n_turns"),
      expr("""size(filter(sequence(1, size(turns) - 1),
        i -> turns[i].role = turns[i - 1].role)) = 0""").as("alternates"),
      expr("exists(turns, t -> t.content = '')").as("has_empty"),
      expr("element_at(turns, -1).role = 'assistant'").as("ends_assistant"))
      .withColumn("valid",
        col("alternates") && !col("has_empty") && col("ends_assistant"))
  }

  /** Verdicts by direct construction — the oracle never parses JSON. */
  private val Oracle =
    """SELECT doc_id,
      |  CAST(2 * (doc_id % 2 + 1)
      |    + CASE WHEN doc_id % 17 = 7 THEN 1 ELSE 0 END AS BIGINT) AS n_turns,
      |  doc_id % 11 <> 3 AS alternates,
      |  doc_id % 13 = 5 AS has_empty,
      |  doc_id % 17 <> 7 AS ends_assistant,
      |  doc_id % 11 <> 3 AND doc_id % 13 <> 5 AND doc_id % 17 <> 7 AS valid
      |FROM documents ORDER BY doc_id""".stripMargin

  val chatValidateQ: Q = Q(
    "t_chat_validate",
    Some(Oracle),
    (s, d) =>
      validate(withChats(Tables.documents(s, d)))
        .orderBy(col("doc_id")))

  /** Loss-mask accounting — the SFT step that decides which tokens GET
    * LOSS: only assistant-turn content trains; user/system tokens are
    * masked. Per conversation: assistant tokens, total tokens, and the
    * mask ratio in exact ppm — the number a data budget is actually
    * written in ("N billion ASSISTANT tokens"). Computed from the
    * PARSED turns (roles included, so the planted alternation defect
    * shifts the count — plants propagate, they're not special-cased);
    * the oracle re-derives both counts from the slice arithmetic. */
  def lossTokens(chats: DataFrame): DataFrame = {
    val parsed = chats.withColumn("turns",
      from_json(col("chat"),
        org.apache.spark.sql.types.DataType.fromDDL(
          "array<struct<role:string,content:string>>")))
    parsed.select(
      col("doc_id"),
      expr("""aggregate(filter(turns, t -> t.role = 'assistant'), 0L,
        (acc, t) -> acc + CASE WHEN t.content = '' THEN 0L
          ELSE size(split(t.content, ' ')) END)""").as("assistant_tokens"),
      expr("""aggregate(turns, 0L,
        (acc, t) -> acc + CASE WHEN t.content = '' THEN 0L
          ELSE size(split(t.content, ' ')) END)""").as("total_tokens"))
      .withColumn("mask_ppm",
        expr("CASE WHEN total_tokens = 0 THEN 0L " +
          "ELSE (1000000 * assistant_tokens) div total_tokens END"))
  }

  /** Slice-size arithmetic: turn i carries ((i+1)·L div n) − (i·L div
    * n) tokens of the L-token document; assistant turns are the odd i
    * (plus turn 0 under the %11 plant), the %13 plant zeroes turn 1. */
  private val LossOracle =
    """WITH m AS (
      |  SELECT doc_id,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS L,
      |    CAST(2 * (doc_id % 2 + 1)
      |      + CASE WHEN doc_id % 17 = 7 THEN 1 ELSE 0 END AS BIGINT) AS n
      |  FROM documents),
      |t AS (
      |  SELECT doc_id,
      |    CAST(coalesce(list_sum(list_transform(range(n), i ->
      |      CASE WHEN (i % 2 = 1 OR (doc_id % 11 = 3 AND i = 0))
      |             AND NOT (doc_id % 13 = 5 AND i = 1)
      |        THEN ((i + 1) * L) // n - (i * L) // n ELSE 0 END)), 0) AS BIGINT)
      |      AS assistant_tokens,
      |    CAST(coalesce(list_sum(list_transform(range(n), i ->
      |      CASE WHEN doc_id % 13 = 5 AND i = 1 THEN 0
      |        ELSE ((i + 1) * L) // n - (i * L) // n END)), 0) AS BIGINT)
      |      AS total_tokens
      |  FROM m)
      |SELECT doc_id, assistant_tokens, total_tokens,
      |  CAST(CASE WHEN total_tokens = 0 THEN 0
      |    ELSE (1000000 * assistant_tokens) // total_tokens END AS BIGINT)
      |    AS mask_ppm
      |FROM t ORDER BY doc_id""".stripMargin

  val chatLossTokensQ: Q = Q(
    "t_chat_loss_tokens",
    Some(LossOracle),
    (s, d) =>
      lossTokens(withChats(Tables.documents(s, d)))
        .orderBy(col("doc_id")))

  val all: Seq[Q] = Seq(chatValidateQ, chatLossTokensQ)
}
