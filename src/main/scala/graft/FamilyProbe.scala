package graft

import org.apache.spark.sql.SparkSession

/** One-off profiling of the dedup family's shared cache build: times
  * each stage of PipelineQueries.warmSharedFamily separately (stages
  * build on each other, so each number is marginal).
  * Usage: runMain graft.FamilyProbe <sfDir>
  */
object FamilyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
    // two passes with a cache release between: pass 1 includes one-time
    // codegen/JIT of the family's operators, pass 2 is the repeatable
    // build cost (the round-7 cold/warm discipline)
    val reps = if (args.length > 1) args(1).toInt else 2
    for (r <- 1 to reps) {
      graft.pipeline.PipelineQueries.profileSharedFamily(spark, sfDir)
        .foreach { case (k, v) =>
          println(f"FAMILY rep=$r $k%-16s $v%6.2fs")
        }
      graft.pipeline.PipelineQueries.releaseShared(spark)
    }
    spark.stop()
  }
}
