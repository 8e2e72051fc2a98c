package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Source/sink format matrix beyond parquet/text/CSV sinks: the same
  * relation round-trips through JSONL and ORC with explicit schemas
  * (schema inference is a scale anti-pattern: one extra full scan). */
class StoreFormatsSpec extends SparkSpec {

  private def docs: DataFrame =
    Tables.documents(spark, sf()).select(col("doc_id"), col("text"))

  private def asSet(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("jsonl roundtrip with explicit schema") {
    val tmp = java.nio.file.Files.createTempDirectory("fmt_json").toString
    docs.write.mode("overwrite").json(tmp)
    val back = spark.read.schema("doc_id BIGINT, text STRING").json(tmp)
    assert(asSet(back) === asSet(docs))
  }

  test("orc roundtrip") {
    val tmp = java.nio.file.Files.createTempDirectory("fmt_orc").toString
    docs.write.mode("overwrite").orc(tmp)
    val back = spark.read.orc(tmp)
    assert(asSet(back) === asSet(docs))
  }

  test("csv roundtrip with quoting and explicit schema") {
    val tmp = java.nio.file.Files.createTempDirectory("fmt_csv").toString
    docs.write.mode("overwrite")
      .option("header", "true").option("escape", "\"")
      .csv(tmp)
    val back = spark.read
      .schema("doc_id BIGINT, text STRING")
      .option("header", "true").option("escape", "\"").option("multiLine", "true")
      .csv(tmp)
    assert(asSet(back) === asSet(docs))
  }

  test("orc predicate pushdown reaches the scan") {
    val tmp = java.nio.file.Files.createTempDirectory("fmt_orc_pd").toString
    docs.write.mode("overwrite").orc(tmp)
    val p = spark.read.orc(tmp).filter(col("doc_id") > 100L)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,100)]"), p)
  }
}
