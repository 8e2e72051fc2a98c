package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed managed tables: pre-hash-partition + sort fact tables on
  * their join key at write time so repeated equi-joins and aggregations
  * on that key run WITHOUT a shuffle (no Exchange in the plan —
  * asserted in BucketedJoinSpec). At 100 TB this converts every
  * fact-to-fact join on the bucket key from a full network shuffle into
  * a local zip of co-located buckets; the write-side cost is paid once.
  */
object BucketedStore {

  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      key: String): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
