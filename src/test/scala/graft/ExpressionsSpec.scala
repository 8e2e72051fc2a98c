package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.pipeline.Multimodal

/** Native expression units: eval + codegen paths, SQL registration,
  * multimodal plumbing. */
class ExpressionsSpec extends SparkSpec {

  test("pack_pair canonicalizes and packs") {
    import spark.implicits._
    val got = Seq((5L, 3L), (3L, 5L), (0L, 7L))
      .toDF("a", "b")
      .select(GraftFunctions.pack_pair(col("a"), col("b")).as("k"))
      .collect().map(_.getLong(0))
    assert(got(0) === ((3L << 32) | 5L))
    assert(got(0) === got(1)) // order-insensitive
    assert(got(2) === 7L)     // min 0 packs high bits to 0
  }

  test("byte_histogram counts high nibbles (eval + codegen agree)") {
    import spark.implicits._
    val df = Seq("AAAB", " !~").toDF("t")
      .select(GraftFunctions.byte_histogram(encode(col("t"), "UTF-8")).as("h"))
    val rows = df.collect().map(_.getSeq[Long](0))
    // 'A'=0x41,'B'=0x42 → nibble 4 count 4
    assert(rows(0)(4) === 4L && rows(0).sum === 4L)
    // ' '=0x20 → bin 2; '!'=0x21 → bin 2; '~'=0x7E → bin 7
    assert(rows(1)(2) === 2L && rows(1)(7) === 1L)
  }

  test("sample_bytes takes every k-th byte") {
    import spark.implicits._
    val got = Seq("abcdefghij").toDF("t")
      .select(GraftFunctions.sample_bytes(encode(col("t"), "UTF-8"), lit(3)).as("s"))
      .head.getAs[Array[Byte]](0)
    assert(new String(got, "UTF-8") === "adgj")
  }

  test("functions callable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT pack_pair(9L, 2L) AS k, byte_histogram(encode('AA', 'UTF-8'))[4] AS h")
      .head
    assert(r.getLong(0) === ((2L << 32) | 9L))
    assert(r.getLong(1) === 2L)
  }

  test("typed mapPartitions decode equals the expression decode") {
    val assets = Multimodal.withAssets(Tables.documents(spark, sf()))
    val viaExpr = Multimodal.decodeFeatures(assets)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](3)).toMap
    val viaTyped = Multimodal.decodeFeaturesTyped(assets)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaExpr === viaTyped)
  }

  test("vectorized batch decode equals the expression decode across batch boundaries") {
    val assets = Multimodal.withAssets(Tables.documents(spark, sf()))
    val viaExpr = Multimodal.decodeFeatures(assets)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](3)).toMap
    // batchSize 7 << partition row count: most partitions span many
    // batches, including a final partial one
    val viaBatch = Multimodal.decodeFeaturesBatch(assets, batchSize = 7)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaExpr === viaBatch)
  }

  test("multimodal pipeline: assets carry metadata, features are 16-wide") {
    val feats = Multimodal.decodeFeatures(
      Multimodal.withAssets(Tables.documents(spark, sf())))
    val r = feats.head
    assert(feats.columns.toSeq === Seq("doc_id", "width", "height", "features"))
    assert(r.getSeq[Long](3).size === 16)
    // narrow plan: no shuffle in a per-row pipeline
    val plan = feats.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
