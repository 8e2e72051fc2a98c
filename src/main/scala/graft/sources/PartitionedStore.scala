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

  /** Schema-explicit read: an EMPTY store (a write of zero rows emits no
    * part files, only _SUCCESS) has nothing to infer a schema from and
    * the plain read throws — with the schema supplied, it returns an
    * empty frame instead. `schema` must include the partition columns. */
  def read(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).parquet(path)
}
