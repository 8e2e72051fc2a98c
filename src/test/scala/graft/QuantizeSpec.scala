package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.{array_dot, array_dot_long}
import graft.pipeline.Quantize

/** Int8 quantization contracts: values clamp to [-127, 127] with the
  * max-abs component pinned at ±127, a zero vector quantizes to zeros,
  * quantization is a narrow projection, and the int8 top-k agrees with
  * the exact float top-k on most neighbors. */
class QuantizeSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sf())

  test("quantized values live in [-127, 127] and the max-abs hits ±127") {
    val rows = Quantize.quantized(emb)
      .select(
        array_min(col("q")).as("lo"),
        array_max(col("q")).as("hi"),
        array_max(transform(col("q"), x => abs(x))).as("amax"),
        col("m"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) >= -127L && r.getLong(1) <= 127L)
      // symmetric max-abs scheme: the largest-|v| component maps to
      // exactly ±127 whenever the vector is nonzero
      if (r.getDouble(3) > 0.0) assert(r.getLong(2) === 127L)
    }
  }

  test("a zero vector quantizes to all zeros, not NaN/overflow") {
    import spark.implicits._
    val z = Seq((0L, Seq(0.0f, 0.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    val q = Quantize.quantized(z).select(col("q")).head.getSeq[Long](0)
    assert(q == Seq(0L, 0L, 0L))
  }

  test("quantization is a narrow (shuffle-free) projection") {
    val plan = Quantize.quantized(emb).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("int8 top-5 by integer dot recalls most exact float-dot top-5") {
    val n = Quantize.quantized(emb)
    val q = n.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("q").as("qq"), col("vd").as("qv"))
    val c = n.select(col("vec_id").as("nid"), col("q").as("cq"), col("vd").as("cv"))
    val joined = q.join(c, col("qid") =!= col("nid"))
      .withColumn("isim", array_dot_long(col("qq"), col("cq")))
      .withColumn("fsim", array_dot(col("qv"), col("cv")))
    def top5(simCol: String): Set[(Long, Long)] = {
      val w = Window.partitionBy(col("qid"))
        .orderBy(col(simCol).desc, col("nid"))
      joined.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("qid"), col("nid"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val exact = top5("fsim")
    val int8 = top5("isim")
    assert(exact.size === 50)
    val recall = (exact & int8).size.toDouble / exact.size
    assert(recall >= 0.6, s"int8 top-5 recall $recall vs exact float dot")
  }

  test("int8-verify IVF agrees with the float IVF path on most neighbors") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("qid"), col("nid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val f = pairs(graft.pipeline.VectorIndex.ivfTopk(spark, sf(), nprobe = 2))
    val i = pairs(graft.pipeline.VectorIndex.ivfTopkInt8(spark, sf(), nprobe = 2))
    assert(f.nonEmpty && i.nonEmpty)
    // identical probes and candidates; int8 only perturbs ranking
    val agree = (f & i).size.toDouble / f.size
    assert(agree >= 0.6, s"int8 IVF ranking agreement $agree vs float IVF")
  }
}
