package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Jobs-per-query counter: `runMain graft.JobCount <sfDir> <query> ...`
  * runs each named registry query once (after the standard warmup) and
  * prints how many Spark jobs it scheduled. Job counts are DETERMINISTIC
  * for a fixed dataset — unlike wall time on a drifting host — which
  * makes them the honest evidence for scheduler-floor optimizations
  * (guide §1.2: every superstep loop here is bounded by jobs × the
  * ~30 ms/job local round-trip, SchedProbe). */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val queries = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    try SparkEntry.queries("q1_agg")(spark, sfDir).count()
    catch { case _: Throwable => () }
    for (name <- queries) {
      graft.analytics.CheckpointRegistry.releaseAll(spark)
      Thread.sleep(300) // drain the async listener bus
      jobs.set(0)
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"JOBCOUNT $name jobs=${jobs.get} $sec%.2fs rows=$n")
    }
    graft.analytics.CheckpointRegistry.releaseAll(spark)
    spark.stop()
  }
}
