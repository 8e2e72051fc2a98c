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
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.queries("q1_agg")(spark, sfDir).count()
    catch { case _: Throwable => () }
    graft.pipeline.PipelineQueries.profileSharedFamily(spark, sfDir)
      .foreach { case (k, v) =>
        println(f"FAMILY $k%-16s $v%6.2fs")
      }
    spark.stop()
  }
}
