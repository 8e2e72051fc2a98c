package graft

import org.apache.spark.sql.functions._

import graft.sources.Compaction

/** Compaction: fewer files, identical content, restored clustering,
  * old directory gone. */
class CompactionSpec extends SparkSpec {

  private def parquetFiles(path: String) =
    new java.io.File(path).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))

  test("compacts a fragmented table without changing its content") {
    val path = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    val ev = Tables.events(spark, sf())
      .select(col("event_id"), col("user_id"), col("value"))
    ev.repartition(40).write.parquet(path)
    assert(parquetFiles(path).length === 40)
    val before = spark.read.parquet(path).collect().map(_.toSeq).toSet

    val stats = Compaction.compact(spark, path, targetBytes = 1L << 20,
      sortBy = Seq("event_id"))

    assert(stats.filesBefore === 40)
    assert(stats.filesAfter < 40 && parquetFiles(path).length === stats.filesAfter)
    val after = spark.read.parquet(path).collect().map(_.toSeq).toSet
    assert(after === before)
    assert(!new java.io.File(path + ".compact-old").exists())
    assert(!new java.io.File(path + ".compact-tmp").exists())
  }

  test("sortBy restores disjoint per-file key ranges") {
    val path = java.nio.file.Files.createTempDirectory("compact2").toString + "/t"
    Tables.events(spark, sf())
      .select(col("event_id"), col("user_id"))
      .repartition(20).write.parquet(path)

    Compaction.compact(spark, path, targetBytes = 8192, Seq("event_id"))

    // each output file's [min,max] of the sort key must not overlap
    val ranges = spark.read.parquet(path)
      .withColumn("__f", input_file_name())
      .groupBy("__f").agg(min("event_id").as("lo"), max("event_id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length > 1, "want multiple output files for this test")
    for (Seq((_, hi), (lo2, _)) <- ranges.toSeq.sliding(2))
      assert(hi < lo2, s"overlapping file ranges: $ranges")
  }
}
