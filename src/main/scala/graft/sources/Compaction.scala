package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the table-maintenance pass every streaming or
  * incremental sink eventually needs: micro-batches and per-task writes
  * leave thousands of KB-scale files whose open/footer overhead comes to
  * dominate 100-TB scans (and driver memory during planning). Compaction
  * rewrites a directory to ~targetBytes files, optionally restoring a
  * sort so min/max pruning stays tight, and swaps by directory rename
  * (write to a sibling temp dir, then move) — readers never observe a
  * half-WRITTEN table; the swap itself is two renames with rollback,
  * so a crash can briefly leave the table at its `.compact-old` name
  * (an object-store deployment would use a metastore pointer swap).
  */
object Compaction {

  /** Rewrite `path` into ceil(bytes/targetBytes) files. `sortBy`
    * restores clustering (repartitionByRange + local sort: each output
    * file covers a disjoint key range, like the Z-order writer's 1-D
    * case); empty `sortBy` just coalesces. */
  def compact(spark: SparkSession, path: String, targetBytes: Long,
      sortBy: Seq[String] = Seq.empty): CompactionStats = {
    import org.apache.commons.io.FileUtils
    val dir = new java.io.File(path)
    require(dir.isDirectory, s"compaction target is not a directory: $path")
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

    val tmp = new java.io.File(path.stripSuffix("/") + ".compact-tmp")
    val old = new java.io.File(path.stripSuffix("/") + ".compact-old")
    // leftovers from a crashed prior run must not block this one: the
    // live table at `path` is authoritative, the side dirs are garbage
    if (tmp.exists()) FileUtils.deleteDirectory(tmp)
    if (old.exists()) FileUtils.deleteDirectory(old)

    shaped.write.mode("overwrite").parquet(tmp.getPath)
    // swap by two renames; if the second fails, roll the first back so
    // readers still find the (uncompacted) table at `path`
    require(dir.renameTo(old), s"compaction swap failed for $path")
    if (!tmp.renameTo(dir)) {
      old.renameTo(dir)
      throw new IllegalStateException(
        s"compaction swap-in failed for $path; original restored")
    }
    FileUtils.deleteDirectory(old)

    CompactionStats(before.length, dataFiles.length, totalBytes)
  }

  final case class CompactionStats(filesBefore: Int, filesAfter: Int,
      bytes: Long)
}
