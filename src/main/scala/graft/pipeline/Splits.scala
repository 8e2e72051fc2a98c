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

  val all: Seq[Q] = Seq(hashSplitQ, stratifiedSampleQ)
}
