package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Splits

/** Deterministic split/sampling properties: stability under layout
  * changes (the property Spark's randomSplit lacks), expected
  * proportions, per-stratum rates. */
class SplitsSpec extends SparkSpec {

  test("assignment is a pure function of the key: repartitioning changes nothing") {
    val docs = Tables.documents(spark, sf()).select(col("doc_id"))
    val a = Splits.assignSplit(docs, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = Splits.assignSplit(docs.repartition(13), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a === b)
  }

  test("80/10/10 split lands near its proportions") {
    val docs = Tables.documents(spark, sf()).select(col("doc_id"))
    val n = docs.count().toDouble
    val counts = Splits.assignSplit(docs, "doc_id")
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") / n - 0.8) < 0.06)
    assert(math.abs(counts("val") / n - 0.1) < 0.05)
    assert(math.abs(counts("test") / n - 0.1) < 0.05)
  }

  test("stratified sampling applies per-stratum rates") {
    val docs = Tables.documents(spark, sf()).select(col("doc_id"), col("lang"))
    val base = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Splits.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 10), defaultRate = 50)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // en downsampled to ~10%, everything else ~50%
    assert(math.abs(kept("en").toDouble / base("en") - 0.10) < 0.06)
    for ((l, c) <- base if l != "en" && c >= 20)
      assert(math.abs(kept.getOrElse(l, 0L).toDouble / c - 0.50) < 0.15,
        s"lang $l: kept ${kept.getOrElse(l, 0L)} of $c")
  }

  test("split assignment is key-stable: a subset sees identical buckets") {
    val docs = Tables.documents(spark, sf()).select(col("doc_id"))
    val full = Splits.assignSplit(docs, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sub = Splits.assignSplit(docs.filter(col("doc_id") % 3 === 0), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, b) <- sub) assert(full(id) === b)
  }
}
