package graft

import org.apache.spark.sql.SparkSession

/** Same-JVM A/B for the byte-gated scan fan-out (Tables.fanout): runs
  * each named query alternating the `graft.fanout` kill-switch within
  * ONE session, interleaved (A B A B), so host drift between the arms
  * is bounded by seconds — the only honest comparison on a noisy host.
  *
  * runMain graft.FanoutAb <sfDir> <reps-per-arm> <query> [query ...]
  */
object FanoutAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val queries = args.drop(2)
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
    try SparkEntry.queries("q1_agg")(spark, sfDir).count()
    catch { case _: Throwable => () }
    for (name <- queries) {
      // one unmeasured warm pass per arm (codegen for both plan shapes)
      for (arm <- Seq("false", "true")) {
        sys.props("graft.fanout") = arm
        try SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
        catch { case _: Throwable => () }
        graft.analytics.CheckpointRegistry.releaseAll(spark)
        graft.pipeline.PipelineQueries.releaseShared(spark)
      }
      val acc = scala.collection.mutable.Map("false" -> List.empty[Double],
        "true" -> List.empty[Double])
      for (_ <- 1 to reps; arm <- Seq("false", "true")) {
        sys.props("graft.fanout") = arm
        val t0 = System.nanoTime()
        // a failed run contributes NO sample (ADVICE r13: its tiny
        // elapsed time could otherwise win the reported min and skew
        // the A/B verdict the fan-out decisions are based on)
        val ok =
          try { SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count(); true }
          catch { case e: Throwable => println(s"FANOUTAB $name $arm FAILED: $e"); false }
        val sec = (System.nanoTime() - t0) / 1e9
        if (ok) acc(arm) = acc(arm) :+ sec
        graft.analytics.CheckpointRegistry.releaseAll(spark)
        graft.pipeline.PipelineQueries.releaseShared(spark)
      }
      def fmt(l: List[Double]) = l.map(s => f"$s%.2f").mkString(",")
      def mn(l: List[Double]) =
        if (l.isEmpty) "ALL_FAILED" else f"${l.min}%.2f"
      println(s"FANOUTAB $name raw=[${fmt(acc("false"))}] fan=[${fmt(acc("true"))}] " +
        s"minRaw=${mn(acc("false"))} minFan=${mn(acc("true"))}")
    }
    sys.props("graft.fanout") = "true"
    spark.stop()
  }
}
