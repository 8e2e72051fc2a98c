package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.registry.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All capabilities live in the registry (graft.registry.Registry); this
  * object only adapts them to the driver's Map-based interface.
  */
object SparkEntry {

  /** Flagship query (densification n(t)/e(t), Analytics.scala:77-142) on
    * sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Registry.byName("g_density").run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
