package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Decompose x_try_arith's honest cost (round 8): scan vs expressions
  * vs global sort vs full query, each via the toRdd materialization
  * Bench uses. `runMain graft.ArithProbe <sfDir> <reps>`. */
object ArithProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"ARITH_PROBE $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val li = Tables.lineitem(spark, sfDir)
    def exprs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("l_orderkey"), col("l_linenumber"),
        coalesce(try_divide(col("l_orderkey").cast(LongType),
          (col("l_linenumber") - 1).cast(LongType)), lit(-1L)).as("div0_guarded"),
        coalesce(expr("TRY_CAST(CASE WHEN l_linenumber % 2 = 0 THEN CAST(l_orderkey AS STRING)" +
          " ELSE l_returnflag END AS BIGINT)"), lit(-1L)).as("maybe_num"))
    for (_ <- 1 to reps) {
      t("scan_2col") {
        li.select(col("l_orderkey"), col("l_linenumber"))
          .queryExecution.toRdd.count()
      }
      t("exprs_only") { exprs(li).queryExecution.toRdd.count() }
      t("sort_only") {
        li.select(col("l_orderkey"), col("l_linenumber"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
          .queryExecution.toRdd.count()
      }
      t("full") {
        exprs(li).orderBy(col("l_orderkey"), col("l_linenumber"))
          .queryExecution.toRdd.count()
      }
    }
    spark.stop()
  }
}
