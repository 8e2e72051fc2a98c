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
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
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
      (name, sec, ok)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val oks = results.map { case (k, _, ok) => s"\"" + k + "\":" + ok }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"ok":$oks,"sf":"$sfDir"}"""
    // The driver parses sbt stdout (BENCH_r01/r02 both recorded
    // parsed:null because sbt's trailing "[success] Total time" line came
    // after the JSON). Contract now: build.sbt suppresses [success] and
    // pipes forked stdout straight through, and this JSON is printed
    // exactly once, AFTER spark.stop(), as the final stdout line. A file
    // copy is kept as belt and braces.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/BENCH_LOCAL.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    catch { case _: Throwable => () }
    // stop() must not be able to take the JSON down with it — the
    // contract is "JSON is the final stdout line", not "JSON if shutdown
    // was clean"
    try spark.stop() catch { case _: Throwable => () }
    println(json)
    System.out.flush()
  }
}
