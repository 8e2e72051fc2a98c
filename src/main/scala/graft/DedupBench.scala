package graft

import org.apache.spark.sql.SparkSession

import graft.pipeline.{PipelineQueries, Sketches}

/** Micro-bench for the MinHash build variants (VERDICT r2 #1): the
  * 32-column min() aggregate, the native TypedImperativeAggregate, and the
  * per-row codegen'd kernel — each timed from a cold cache on the same
  * scan-warmed session — plus the full d_dedup_minhash_lsh query on the
  * main (per-row) path. Prints one JSON line.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.DedupBench"
  */
object DedupBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir)
    docs.count() // warm the scan so variant 1 isn't charged for parquet IO

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // two passes in both orders; report the per-variant minimum so JIT
    // warmup order doesn't pick the winner
    val variants: Seq[(String, () => Unit)] = Seq(
      "agg_32col_min" -> (() => { Sketches.minhashTable(docs).count(): Unit }),
      "agg_native" -> (() => { Sketches.minhashTableNative(docs).count(): Unit }),
      "per_row" -> (() => { Sketches.minhashTableRow(docs).count(): Unit }))
    val passes = (variants ++ variants.reverse).map { case (n, f) => n -> time(f()) }
    val best = passes.groupBy(_._1).map { case (n, ts) => n -> ts.map(_._2).min }

    // the headline query cold: shared caches empty, per-row main path
    PipelineQueries.releaseShared(spark)
    spark.catalog.clearCache()
    val lsh = time(SparkEntry.queries("d_dedup_minhash_lsh")(spark, sfDir).count())

    val json = best.toSeq.sortBy(_._1)
      .map { case (n, t) => s""""$n":$t""" }
      .mkString("{\"metric\":\"minhash_variants\",", ",",
        s""","d_dedup_minhash_lsh_cold":$lsh,"sf":"$sfDir"}""")
    spark.stop()
    println(json)
    System.out.flush()
  }
}
