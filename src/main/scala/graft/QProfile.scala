package graft

import org.apache.spark.sql.SparkSession

/** Per-query cold/warm profiler: `runMain graft.QProfile <sfDir> <reps>
  * <query> [query ...]` runs each named registry query `reps` times in
  * one JVM (after the standard Bench warmup) and prints every rep —
  * separating one-time JVM/codegen cost from per-run cost is the round-7
  * lesson (see Bench's warmup comment / the g_pagerank story). */
object QProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val queries = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.queries("q1_agg")(spark, sfDir).count()
    catch { case _: Throwable => () }
    for (name <- queries; r <- 1 to reps) {
      val t0 = System.nanoTime()
      // toRdd, not Dataset.count(): count() lets Catalyst prune per-row
      // expression work (see Bench's materialization comment)
      val n = SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      graft.analytics.CheckpointRegistry.releaseAll(spark)
      println(f"QPROFILE $name rep=$r $sec%.2fs rows=$n")
    }
    spark.stop()
  }
}
