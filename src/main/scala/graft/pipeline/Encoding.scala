package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions.utf8_stats
import graft.registry.Q

/** Encoding validation — the byte-level gate a crawl corpus passes
  * BEFORE decode (a decoded String can no longer see mojibake; the
  * check runs on the wire bytes): strict UTF-8 with maximal-subpart
  * error accounting (EncodingUtil), per document: byte count, decoded
  * char count, invalid-sequence count, first bad offset, verdict.
  *
  * The corpus plants three corruption classes by doc_id arithmetic
  * into otherwise-clean UTF-8 bytes: %9==4 inserts a lone continuation
  * byte (0x80) at offset L%23, %9==7 inserts the classic overlong pair
  * C0 AF at L%19 (TWO errors under maximal subpart: C0 heads nothing,
  * AF is then a lone continuation), %9==2 appends a truncated 3-byte
  * sequence E2 82 at EOF (ONE error: the lead plus its one good
  * continuation form a single maximal subpart). The oracle derives
  * every field from the plant arithmetic — byte offsets equal char
  * offsets on the ASCII corpus (CorpusInvariantSpec pins that).
  * One narrow pass; the scan reads only (doc_id, text). */
object Encoding {

  private val loneCont = Array[Byte](0x80.toByte)
  private val overlong = Array[Byte](0xC0.toByte, 0xAF.toByte)
  private val truncated = Array[Byte](0xE2.toByte, 0x82.toByte)

  /** documents -> (doc_id, raw BINARY) with the planted corruption. */
  def withRawBytes(docs: DataFrame): DataFrame =
    docs
      .withColumn("L", length(col("text")))
      .withColumn("raw",
        when(col("doc_id") % 9 === 4,
          concat(
            encode(expr("substring(text, 1, L % 23)"), "UTF-8"),
            lit(loneCont),
            encode(expr("substring(text, L % 23 + 1)"), "UTF-8")))
          .when(col("doc_id") % 9 === 7,
            concat(
              encode(expr("substring(text, 1, L % 19)"), "UTF-8"),
              lit(overlong),
              encode(expr("substring(text, L % 19 + 1)"), "UTF-8")))
          .when(col("doc_id") % 9 === 2,
            concat(encode(col("text"), "UTF-8"), lit(truncated)))
          .otherwise(encode(col("text"), "UTF-8")))
      .select(col("doc_id"), col("raw"))

  /** The gate: every doc reported with its verdict. */
  def check(raw: DataFrame): DataFrame =
    raw.select(col("doc_id"), utf8_stats(col("raw")).as("s"))
      .select(col("doc_id"),
        col("s.n_bytes").as("n_bytes"),
        col("s.n_chars").as("n_chars"),
        col("s.n_invalid").as("n_invalid"),
        col("s.first_bad").as("first_bad"))
      .withColumn("valid", col("n_invalid") === 0L)

  private val Oracle =
    """SELECT doc_id,
      |  CAST(length(text) + CASE CAST(doc_id % 9 AS INT)
      |    WHEN 4 THEN 1 WHEN 7 THEN 2 WHEN 2 THEN 2 ELSE 0 END
      |    AS BIGINT) AS n_bytes,
      |  CAST(length(text) AS BIGINT) AS n_chars,
      |  CAST(CASE CAST(doc_id % 9 AS INT)
      |    WHEN 4 THEN 1 WHEN 7 THEN 2 WHEN 2 THEN 1 ELSE 0 END
      |    AS BIGINT) AS n_invalid,
      |  CAST(CASE CAST(doc_id % 9 AS INT)
      |    WHEN 4 THEN length(text) % 23
      |    WHEN 7 THEN length(text) % 19
      |    WHEN 2 THEN length(text)
      |    ELSE -1 END AS BIGINT) AS first_bad,
      |  doc_id % 9 NOT IN (4, 7, 2) AS valid
      |FROM documents ORDER BY doc_id""".stripMargin

  val encodingCheckQ: Q = Q(
    "t_encoding_check",
    Some(Oracle),
    (s, d) =>
      check(withRawBytes(Tables.documents(s, d)))
        .orderBy(col("doc_id")))

  val all: Seq[Q] = Seq(encodingCheckQ)
}
