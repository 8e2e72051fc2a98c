package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warmup so the first measured query isn't penalized
    try SparkEntry.queries("q1_agg")(spark, sfDir).count()
    catch { case _: Throwable => () }
    // deterministic name order: stable per-query numbers across rounds
    val base = SparkEntry.queries.toSeq.sortBy(_._1)
    // The dedup family's shared cache build is timed as its own entry
    // right before the first d_* query, so every d_* number is MARGINAL
    // cost (VERDICT r5 #3: the build previously hid inside whichever
    // family member sorted first). Bench-only: not a registry query, no
    // oracle — it produces no result, only cache state.
    val setup: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
      (s, dir) => { graft.pipeline.PipelineQueries.warmSharedFamily(s, dir); s.range(1).toDF("ok") }
    val firstD = base.indexWhere(_._1.startsWith("d_"))
    val names =
      if (firstD < 0) base
      else base.patch(firstD, Seq("_setup_dedup_family" -> setup), 0)
    val results = names.zipWithIndex.map { case ((name, fn), i) =>
      val t0 = System.nanoTime()
      // ok=false must be visible in the output — a silently swallowed
      // failure would otherwise read as a fast query (VERDICT r2 #4)
      val ok = try { fn(spark, sfDir).count(); true }
      catch { case _: Throwable => false }
      val sec = (System.nanoTime() - t0) / 1e9
      // free the dedup family's shared persisted intermediates the
      // moment the family completes (VERDICT r2 #2: the 9-query
      // mid-tier regression cluster)
      val next = if (i + 1 < names.size) names(i + 1)._1 else ""
      graft.pipeline.PipelineQueries.releaseSharedAfterFamily(spark, name, next)
      // the result is materialized (count above), so the superstep
      // queries' final checkpoints can drop — without this they pin
      // blocks for the session and slow every later query (VERDICT r5 #2)
      graft.analytics.CheckpointRegistry.releaseAll(spark)
      (name, sec, ok)
    }
    // Locale.ROOT: a comma-decimal locale would break the JSON
    def sec3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def qmap(rs: Seq[(String, Double, Boolean)]): String =
      rs.map { case (k, v, _) => "\"" + k + "\":" + sec3(v) }
        .mkString("{", ",", "}")
    val oks = results.map { case (k, _, ok) => s"\"" + k + "\":" + ok }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val nOk = results.count(_._3)
    // Full per-query detail (all timings + ok flags) goes to the file.
    val fullJson = s"""{"metric":"total","value":${sec3(total)},"unit":"sec","queries":${qmap(results)},"ok":$oks,"n_queries":${results.size},"n_ok":$nOk,"sf":"$sfDir"}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/BENCH_LOCAL.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), fullJson + "\n")
    catch { case _: Throwable => () }
    // The driver captures only the TAIL of sbt stdout (~2 KB window:
    // BENCH_r03's "tail" field cut the head of our 5.9 KB line, hence
    // three rounds of parsed:null). The stdout line must therefore be
    // SHORT: total + a fixed headline subset of per-query timings, with
    // the full 110+-query detail in BENCH_LOCAL.json. Keep this line
    // under ~1.5 KB.
    // Refreshed round 6 (VERDICT r5 #4): the heavy movers (supersteps,
    // curation, embedding dedup, the explicit family setup) are in; the
    // dropped entries were stable sub-second for 3+ rounds — full detail
    // is always in BENCH_LOCAL.json.
    val headline = Seq(
      "q1_agg", "w1_running_total", "g_hopplot", "g_components",
      "g_pagerank", "g_sssp", "g_kcore", "g_labelprop",
      "_setup_dedup_family", "d_curate_e2e", "d_dedup_embedding_ivf",
      "d_dedup_minhash_lsh", "d_dedup_ngram_jaccard", "d_dedup_simhash",
      "d_pipeline_e2e", "sim_ann_topk", "st_tumbling_window",
      "x_asof_join_native", "x_merge_upsert").toSet
    val head = results.filter(r => headline(r._1))
    // a renamed/removed headline query must not just vanish silently
    // (ADVICE r4 #2) — surface the count of names that found no result
    val headlineMissing = headline.size - head.size
    val json = s"""{"metric":"total","value":${sec3(total)},"unit":"sec","queries":${qmap(head)},"n_queries":${results.size},"n_ok":$nOk,"headline_missing":$headlineMissing,"detail":"BENCH_LOCAL.json","sf":"$sfDir"}"""
    // stop() must not be able to take the JSON down with it — the
    // contract is "JSON is the final stdout line", not "JSON if shutdown
    // was clean"
    try spark.stop() catch { case _: Throwable => () }
    println(json)
    System.out.flush()
  }
}
