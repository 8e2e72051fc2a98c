package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the table-maintenance pass every streaming or
  * incremental sink eventually needs: micro-batches and per-task writes
  * leave thousands of KB-scale files whose open/footer overhead comes to
  * dominate 100-TB scans (and driver memory during planning). Compaction
  * rewrites a directory to ~targetBytes files, optionally restoring a
  * sort so min/max pruning stays tight, and swaps atomically via a
  * rename (write to a sibling temp dir, then move — readers never see a
  * half-written table).
  */
object Compaction {

  /** Rewrite `path` into ceil(bytes/targetBytes) files. `sortBy`
    * restores clustering (repartitionByRange + local sort: each output
    * file covers a disjoint key range, like the Z-order writer's 1-D
    * case); empty `sortBy` just coalesces. */
  def compact(spark: SparkSession, path: String, targetBytes: Long,
      sortBy: Seq[String] = Seq.empty): CompactionStats = {
    val dir = new java.io.File(path)
    def dataFiles = dir.listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    val before = dataFiles
    val totalBytes = before.map(_.length()).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

    val df = spark.read.parquet(path)
    val shaped =
      if (sortBy.nonEmpty)
        df.repartitionByRange(nOut, sortBy.map(col): _*)
          .sortWithinPartitions(sortBy.map(col): _*)
      else df.coalesce(nOut)

    val tmp = path.stripSuffix("/") + ".compact-tmp"
    shaped.write.mode("overwrite").parquet(tmp)
    // atomic-ish swap: a rename per directory, not a slow copy
    val old = new java.io.File(path.stripSuffix("/") + ".compact-old")
    require(dir.renameTo(old) && new java.io.File(tmp).renameTo(dir),
      s"compaction swap failed for $path")
    org.apache.commons.io.FileUtils.deleteDirectory(old)

    CompactionStats(before.length, dataFiles.length, totalBytes)
  }

  final case class CompactionStats(filesBefore: Int, filesAfter: Int,
      bytes: Long)
}
