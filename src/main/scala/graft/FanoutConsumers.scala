package graft

import org.apache.spark.sql.SparkSession

/** Prints the registry queries whose physical plan contains the scan
  * fan-out exchange (Tables.fanout) — the population FanoutAb A/Bs. */
object FanoutConsumers {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.registry.Registry.all.foreach { q =>
      try {
        val p = q.run(spark, sfDir).queryExecution.executedPlan.toString
        if (p.contains("RoundRobinPartitioning")) println(s"FANOUTCONSUMER ${q.name}")
      } catch { case e: Throwable => println(s"FANOUTCONSUMER_ERR ${q.name}: ${e.getMessage}") }
      graft.analytics.CheckpointRegistry.releaseAll(spark)
      graft.pipeline.PipelineQueries.releaseShared(spark)
    }
    spark.stop()
  }
}
