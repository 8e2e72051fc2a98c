package graft

import org.apache.spark.sql.SparkSession

/** Decomposes the local-mode job round-trip cost that bounds every
  * superstep loop (Bench's job_rt_ms probe measured ~100-160 ms per
  * trivial `spark.range(1).count()` job; each flood/peel/jump round
  * pays one or more of those). This probe separates the candidates:
  *
  *   - pure RDD job on a pre-built 1-partition RDD (scheduler only);
  *   - pure RDD job on a pre-built 32-partition RDD (per-task dispatch);
  *   - fresh Dataset count (planning + codegen-cache + scheduler);
  *   - same with AQE off.
  *
  * runMain graft.SchedProbe
  */
object SchedProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext

    def timeN(name: String, n: Int)(body: => Unit): Unit = {
      body // warm
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) { body; i += 1 }
      val ms = (System.nanoTime() - t0) / 1e6 / n
      println(f"SCHEDPROBE $name%-38s ${ms}%8.2f ms/job")
    }

    val rdd1 = sc.parallelize(Seq(1), 1).cache(); rdd1.count()
    val rdd32 = sc.parallelize(1 to 32, 32).cache(); rdd32.count()
    val ds = spark.range(1).cache(); ds.count()

    timeN("rdd 1-partition count", 50)(rdd1.count())
    timeN("rdd 32-partition count", 50)(rdd32.count())
    timeN("cached Dataset count (reused plan)", 50)(ds.count())
    timeN("fresh range(1).count (plan each)", 50)(spark.range(1).count())
    timeN("fresh range(1).toRdd.count", 50)(
      spark.range(1).queryExecution.toRdd.count())
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    timeN("fresh range(1).count, AQE off", 50)(spark.range(1).count())
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // a 4-partition shuffle job, the superstep loop's actual shape
    val kv = sc.parallelize(1 to 1000, 4).map(i => (i % 10, i)).cache()
    kv.count()
    timeN("rdd 4-part reduceByKey (shuffle)", 30)(
      kv.reduceByKey(_ + _, 4).count())
    spark.stop()
  }
}
