package graft

import org.apache.spark.sql.functions._

import graft.functions.TopKByAgg
import graft.queries.Extended2

/** TopKByAgg contract: the k-bounded aggregate is value-for-value
  * interchangeable with the `row_number() <= k` window form (same
  * (ord DESC, value ASC) total order), and it plans as an object-hash
  * aggregate with no Window operator — the point of the rewrite. */
class TopKAggSpec extends SparkSpec {

  private def windowTopk(k: Int): Seq[(Long, Long, Int)] = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("s_acctbal").desc, col("s_suppkey"))
    Tables.supplier(spark, sf())
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("s_nationkey").cast("long"), col("s_suppkey").cast("long"), col("rn"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
  }

  private def aggTopk(k: Int): Seq[(Long, Long, Int)] =
    Tables.supplier(spark, sf())
      .groupBy(col("s_nationkey"))
      .agg(TopKByAgg.top_k_by(
        (col("s_acctbal").cast("decimal(18,2)") * 100).cast("long"),
        col("s_suppkey").cast("long"), k).as("top"))
      .select(col("s_nationkey").cast("long"), posexplode(col("top")))
      .select(col("s_nationkey"), col("col.value"), (col("pos") + 1).cast("int"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted

  test("aggregate top-k equals window row_number form for k in 1..5") {
    for (k <- 1 to 5)
      assert(aggTopk(k) == windowTopk(k), s"k=$k mismatch")
  }

  test("plan is an object-hash aggregate with no Window operator") {
    val plan = Extended2.topkAgg.run(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"expected ObjectHashAggregate in:\n$plan")
    assert(!plan.contains("Window"), s"window operator must not appear in:\n$plan")
  }

  test("groups smaller than k emit all their rows, ties break on value asc") {
    import scala.jdk.CollectionConverters._
    val rows = Seq(
      org.apache.spark.sql.Row(1L, 10L, 100L),
      org.apache.spark.sql.Row(1L, 10L, 50L),
      org.apache.spark.sql.Row(1L, 7L, 1L),
      org.apache.spark.sql.Row(2L, 5L, 9L))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("g", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("o", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType)))
    val df = spark.createDataFrame(rows.asJava, schema)
      .repartition(3) // force partial/merge across partitions
    val out = df.groupBy(col("g"))
      .agg(TopKByAgg.top_k_by(col("o"), col("v"), 2).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("col.ord"), col("col.value"), col("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(out == Set(
      (1L, 10L, 50L, 0), // tie on ord=10 → lower value first
      (1L, 10L, 100L, 1),
      (2L, 5L, 9L, 0)))  // group smaller than k: all rows, no padding
  }

  test("top_k_by is callable from SQL text") {
    graft.functions.GraftFunctions.register(spark)
    Tables.supplier(spark, sf()).createOrReplaceTempView("sup_topk")
    val n = spark.sql(
      """SELECT s_nationkey, top_k_by(CAST(s_acctbal*100 AS BIGINT),
        |  CAST(s_suppkey AS BIGINT), 3) AS top
        |FROM sup_topk GROUP BY s_nationkey""".stripMargin).count()
    assert(n > 0)
  }
}
