package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Pii

/** PII scan/redact properties: planted ground truth is found exactly,
  * redaction removes every match, redaction is idempotent, and the
  * whole stage is a narrow (shuffle-free) projection. */
class PiiSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf())

  test("planted docs scan to exactly 1 email + 1 ip + 1 phone; others 0") {
    val rows = Pii.piiScanDf(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val (e, ip, ph) = (r.getLong(1), r.getLong(2), r.getLong(3))
      if (id % 3 == 0) assert((e, ip, ph) === ((1L, 1L, 1L)), s"doc $id")
      else assert((e, ip, ph) === ((0L, 0L, 0L)), s"doc $id")
      assert(r.getBoolean(4) === (id % 3 == 0))
    }
  }

  test("redacted text contains no remaining PII matches") {
    val red = Pii.withPlantedPii(docs).withColumn("r", Pii.redact(col("t")))
    val hits = red.select(
      size(regexp_extract_all(col("r"), lit(Pii.EmailRe), lit(0))).as("e"),
      size(regexp_extract_all(col("r"), lit(Pii.Ipv4Re), lit(0))).as("i"),
      size(regexp_extract_all(col("r"), lit(Pii.PhoneRe), lit(0))).as("p"))
      .agg(sum(col("e") + col("i") + col("p"))).head.getLong(0)
    assert(hits === 0L)
  }

  test("redaction is idempotent") {
    val once = Pii.withPlantedPii(docs).withColumn("r", Pii.redact(col("t")))
    val diff = once.withColumn("r2", Pii.redact(col("r")))
      .filter(col("r") =!= col("r2")).count()
    assert(diff === 0L)
  }

  test("planted docs lose chars to placeholders; clean docs are untouched") {
    Pii.piiRedactDf(docs).collect().foreach { r =>
      val id = r.getLong(0)
      if (id % 3 == 0) assert(r.getLong(2) > 0L, s"doc $id")
      else assert(r.getLong(2) === 0L, s"doc $id")
    }
  }

  test("scan and redact plans are narrow: no Exchange") {
    Seq(Pii.piiScanDf(docs), Pii.piiRedactDf(docs)).foreach { df =>
      val plan = sansFanout(df.queryExecution.executedPlan.toString)
      assert(!plan.contains("Exchange"), plan)
    }
  }
}
