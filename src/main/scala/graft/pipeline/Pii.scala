package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.registry.Q

/** PII detection and redaction — the compliance stage every
  * training-data pipeline runs before text leaves curation: find
  * emails / IPv4s / phone patterns, count them per document, and strip
  * them with stable placeholder tokens.
  *
  * The synthetic corpus is PII-free word salad, so the queries PLANT
  * deterministic PII first (doc_id-derived email + IP + phone appended
  * to every third document) and then scan/redact it — the detection
  * machinery is exercised with known ground truth and the DuckDB
  * oracle replicates both the planting and the scan. The patterns stay
  * inside the Java-regex ∩ RE2 common subset (`\d`, `\b`, bounded
  * repetition, literal classes) so both engines match byte-identically.
  *
  * Scale shape: planting, scanning, and redaction are all per-row
  * narrow projections — no shuffle, no UDFs (regexp_extract_all /
  * regexp_replace are codegen'd built-ins), so the stage streams past
  * 100 TB at scan speed.
  */
object Pii {

  /** Patterns in the Java-regex ∩ RE2 common subset. */
  val EmailRe = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b555-\\d{4}\\b"

  /** Every third document gets one email, one IPv4, one phone number,
    * all derived from doc_id so the oracle can re-plant them exactly. */
  def withPlantedPii(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val planted = concat(
      col("text"),
      lit(" contact user"), id.cast("string"),
      lit("@mail"), (id % 7).cast("string"),
      lit(".net from 10."), (id % 250).cast("string"),
      lit("."), ((id * 7) % 250).cast("string"),
      lit("."), ((id * 13) % 250).cast("string"),
      lit(" call 555-"), (lit(1000) + id % 9000).cast("string"))
    docs.select(id, when(id % 3 === 0, planted).otherwise(col("text")).as("t"))
  }

  /** The same planting in DuckDB SQL (|| implicit-casts BIGINT). */
  private val PlantSql =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN
      |    text || ' contact user' || doc_id || '@mail' || (doc_id % 7) ||
      |      '.net from 10.' || (doc_id % 250) || '.' || ((doc_id * 7) % 250) ||
      |      '.' || ((doc_id * 13) % 250) ||
      |      ' call 555-' || (1000 + doc_id % 9000)
      |  ELSE text END AS t
      |FROM documents""".stripMargin

  private def countMatches(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0))).cast(LongType)

  /** Per-document PII hit counts + a boolean routing flag. */
  def piiScanDf(docs: DataFrame): DataFrame =
    withPlantedPii(docs).select(
      col("doc_id"),
      countMatches(col("t"), EmailRe).as("n_emails"),
      countMatches(col("t"), Ipv4Re).as("n_ips"),
      countMatches(col("t"), PhoneRe).as("n_phones"))
      .withColumn("has_pii",
        col("n_emails") + col("n_ips") + col("n_phones") > 0)

  /** Email → IP → phone replacement; placeholder tokens contain no
    * digits or '@' so passes cannot create new matches for each other
    * (redaction is idempotent — asserted in PiiSpec). */
  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "[EMAIL]"),
        Ipv4Re, "[IP]"),
      PhoneRe, "[PHONE]")

  def piiRedactDf(docs: DataFrame): DataFrame =
    withPlantedPii(docs)
      .withColumn("r", redact(col("t")))
      .select(
        col("doc_id"),
        md5(col("r")).as("redacted_fp"),
        (length(col("t")) - length(col("r"))).cast(LongType)
          .as("n_chars_removed"))

  val piiScan: Q = Q(
    "t_pii_scan",
    Some(s"""WITH p AS ($PlantSql)
            |SELECT doc_id,
            |  CAST(len(regexp_extract_all(t, '$EmailRe')) AS BIGINT) AS n_emails,
            |  CAST(len(regexp_extract_all(t, '$Ipv4Re')) AS BIGINT) AS n_ips,
            |  CAST(len(regexp_extract_all(t, '$PhoneRe')) AS BIGINT) AS n_phones,
            |  (len(regexp_extract_all(t, '$EmailRe'))
            |    + len(regexp_extract_all(t, '$Ipv4Re'))
            |    + len(regexp_extract_all(t, '$PhoneRe'))) > 0 AS has_pii
            |FROM p ORDER BY doc_id""".stripMargin),
    (s, d) => piiScanDf(Tables.documents(s, d)).orderBy(col("doc_id")))

  val piiRedact: Q = Q(
    "t_pii_redact",
    Some(s"""WITH p AS ($PlantSql),
            |r AS (SELECT doc_id, t,
            |    regexp_replace(regexp_replace(regexp_replace(t,
            |      '$EmailRe', '[EMAIL]', 'g'),
            |      '$Ipv4Re', '[IP]', 'g'),
            |      '$PhoneRe', '[PHONE]', 'g') AS red
            |  FROM p)
            |SELECT doc_id, md5(red) AS redacted_fp,
            |  CAST(length(t) - length(red) AS BIGINT) AS n_chars_removed
            |FROM r ORDER BY doc_id""".stripMargin),
    (s, d) => piiRedactDf(Tables.documents(s, d)).orderBy(col("doc_id")))

  val all: Seq[Q] = Seq(piiScan, piiRedact)
}
