package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage profiler for g_pagerank (round-7 investigation). */
object PrProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
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
    def t(name: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PROFILE $name ${(System.nanoTime() - t0) / 1e9}%.2fs ($r)")
    }
    t("edges_load") {
      graft.graph.CitationGraph.edges(spark, sfDir).count()
    }
    val edges = graft.graph.CitationGraph.edges(spark, sfDir)
    t("edges_count_again") { edges.count() }
    t("pagerank_total") {
      graft.analytics.PageRank.pageRank(spark, edges, iters = 10).count()
    }
    graft.analytics.CheckpointRegistry.releaseAll(spark)
    t("pagerank_again_warm") {
      graft.analytics.PageRank.pageRank(spark, edges, iters = 10).count()
    }
    graft.analytics.CheckpointRegistry.releaseAll(spark)
    // loop internals: replicate pageRankPinned phases
    t("orderby_count") {
      graft.analytics.PageRank.pageRank(spark, edges, iters = 10)
        .orderBy(col("id")).count()
    }
    graft.analytics.CheckpointRegistry.releaseAll(spark)
    spark.stop()
  }
}
