package graft

import org.apache.spark.sql.functions._

import graft.sources.BucketedStore

/** Co-located join proof: two tables bucketed on the same key must join
  * with ZERO Exchange operators (bucket layout satisfies the join's
  * distribution requirement). */
class BucketedJoinSpec extends SparkSpec {

  test("join of co-bucketed tables runs without a shuffle") {
    val o = Tables.orders(spark, sf("0.01"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val l = Tables.lineitem(spark, sf("0.01"))
      .select(col("l_orderkey"), col("l_quantity"))
    // fresh metastore per JVM but the warehouse dir persists: clear both
    Seq("orders_b", "lineitem_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:") + s"/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    BucketedStore.writeBucketed(o, "orders_b", 8, "o_orderkey")
    BucketedStore.writeBucketed(l, "lineitem_b", 8, "l_orderkey")

    // small inputs auto-broadcast, which ignores bucketing — force the
    // shuffle-join path to show buckets satisfy its distribution
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = BucketedStore.table(spark, "lineitem_b")
        .join(BucketedStore.table(spark, "orders_b"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)

      // correctness: same count as the unbucketed join
      val want = l.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === want)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
