package graft

import org.apache.spark.sql.SparkSession

/** Stage-level attribution for d_curate_incremental / d_curate_write
  * (VERDICT r7 "What's wrong" #3: incremental doubled 5.4 -> 11.6s in
  * the driver artifact with the sever-cache change in its path —
  * attribute or exonerate). `runMain graft.CurateProbe <sfDir> <reps>`
  * times each phase of the registered queries separately after the
  * standard warmup, so the doubling can be pinned to a phase (survivor
  * build / checkpoint / partitioned write / append / re-read) instead
  * of guessed at. */
object CurateProbe {
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
      println(f"CURATE_PROBE $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    // family warm (the bench position: _setup_dedup_family precedes)
    t("family_warm") {
      graft.pipeline.PipelineQueries.warmSharedFamily(spark, sfDir)
    }
    for (r <- 1 to reps) {
      t(s"rep$r:d_curate_incremental") {
        SparkEntry.queries("d_curate_incremental")(spark, sfDir).count()
      }
      graft.analytics.CheckpointRegistry.releaseAll(spark)
      t(s"rep$r:d_curate_write") {
        SparkEntry.queries("d_curate_write")(spark, sfDir).count()
      }
      graft.analytics.CheckpointRegistry.releaseAll(spark)
    }
    spark.stop()
  }
}
