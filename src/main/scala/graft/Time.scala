package graft

import org.apache.spark.sql.SparkSession

/** Builder-side profiling: time named registry queries one at a time
  * (count-driven, like Bench) and optionally print the formatted plan.
  *
  * Usage: runMain graft.Time <sfDir> [-explain] <query> [query ...]
  * Each query is executed twice — cold then warm — because first-touch
  * scan/codegen cost versus steady-state cost is usually the diagnosis.
  */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val explain = args.contains("-explain")
    val names = args.drop(1).filterNot(_ == "-explain")
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
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      // mirror Bench's post-materialization hygiene so a profiled number
      // reflects what the harness will see
      val cold = once()
      graft.analytics.CheckpointRegistry.releaseAll(spark)
      val warm = once()
      graft.analytics.CheckpointRegistry.releaseAll(spark)
      println(f"TIME $name%-28s cold=$cold%7.2fs warm=$warm%7.2fs")
      if (explain) fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
