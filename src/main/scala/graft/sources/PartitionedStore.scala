package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hive-style partitioned parquet store — the layout that makes temporal
  * snapshot queries (F3) prune at the DIRECTORY level at 100 TB: a scan
  * with `year <= y` touches only the matching partitions
  * (PartitionFilters in the plan, asserted in PartitionedStoreSpec),
  * instead of row-group filtering inside every file.
  */
object PartitionedStore {

  /** Write df partitioned by the given columns (e.g. year). */
  def write(df: DataFrame, path: String, partitionBy: Seq[String]): Unit =
    df.write
      .partitionBy(partitionBy: _*)
      .mode("overwrite")
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
