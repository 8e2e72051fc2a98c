package graft

import org.apache.spark.sql.SparkSession

/** Cold-JVM probe for superstep checkpoint cadences (the VERDICT r5
  * lesson: never turn a cadence knob without a cold bench).
  * `runMain graft.CadenceProbe <sfDir> <ckptEvery> [-kcore]` runs
  * g_pagerank's (or the k-core fixpoint's) exact shape once, cold, and
  * prints the seconds. Run once per JVM so numbers are comparable to
  * Bench's cold cost.
  */
object CadenceProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val ck = args(1).toInt
    val kcoreMode = args.contains("-kcore")
    val ssspMode = args.contains("-sssp")
    val lpMode = args.contains("-labelprop")
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
    // same warmup as Bench so codegen/JIT cost doesn't land on the probe
    // (incl. the sf0.001 superstep warmup — round 7: ~6.3s of the old
    // "cold" numbers was one-time loop codegen, which made every cadence
    // look alike; see PrProfile)
    try SparkEntry.queries("q1_agg")(spark, sfDir).count()
    catch { case _: Throwable => () }
    try {
      graft.analytics.PageRank.pageRank(spark,
        graft.graph.CitationGraph.edges(spark, "/root/testdata/sf0.001"),
        iters = 2).count()
      graft.analytics.CheckpointRegistry.releaseAll(spark)
    } catch { case _: Throwable => () }
    val t0 = System.nanoTime()
    val edges = graft.graph.CitationGraph.edges(spark, sfDir)
    if (kcoreMode)
      graft.analytics.KCore
        .kcore(spark, edges, rounds = Int.MaxValue, ckptEvery = ck)
        .orderBy("id").count()
    else if (ssspMode) {
      val src = edges.filter(org.apache.spark.sql.functions.col("src") =!=
        org.apache.spark.sql.functions.col("dst"))
        .agg(org.apache.spark.sql.functions.min(
          org.apache.spark.sql.functions.col("src"))).head.getLong(0)
      graft.analytics.ShortestPaths
        .sssp(spark, edges, src, rounds = 10, ckptEvery = ck)
        .orderBy("id").count()
    } else if (lpMode)
      graft.analytics.LabelPropagation
        .labelProp(spark, edges, rounds = 3, ckptEvery = ck)
        .orderBy("id").count()
    else
      graft.analytics.PageRank
        .pageRank(spark, edges, iters = 10, ckptEvery = ck)
        .orderBy("id").count()
    val sec = (System.nanoTime() - t0) / 1e9
    graft.analytics.CheckpointRegistry.releaseAll(spark)
    val what =
      if (kcoreMode) "kcore" else if (ssspMode) "sssp"
      else if (lpMode) "labelprop" else "pagerank"
    println(f"CADENCE $what ckptEvery=$ck cold=$sec%.2fs")
    spark.stop()
  }
}
