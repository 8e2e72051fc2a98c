package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-file sources for the reference's citation-graph data model
  * (DataFrameLoader.scala:28-74). Declarative re-expression: one
  * `spark.read.text` scan + Catalyst column expressions instead of the
  * reference's RDD map/filter lambdas, so pruning/pushdown/codegen apply.
  */
object CitationLoaders {

  val citationsSchema: StructType = StructType(Seq(
    StructField("from", IntegerType, nullable = false),
    StructField("to", IntegerType, nullable = false)))

  val publishedDatesSchema: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("year", IntegerType, nullable = false)))

  /** Drop `#`-comment and blank lines (reference semantics: any line
    * *containing* '#', DataFrameLoader.scala:31,58). */
  private def cleanLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .filter(!col("value").contains("#") && trim(col("value")) =!= "")

  /** Whitespace-separated directed edge list -> citations(from, to)
    * (DataFrameLoader.scala:28-38). */
  def loadCitations(spark: SparkSession, path: String): DataFrame = {
    val parts = split(trim(col("value")), "\\s+")
    cleanLines(spark, path)
      .select(
        element_at(parts, 1).cast(IntegerType).as("from"),
        element_at(parts, 2).cast(IntegerType).as("to"))
      .na.drop()
  }

  /** `<id>\t<yyyy-mm-dd>` node table -> publishedDates(id, year)
    * (DataFrameLoader.scala:55-74). Reproduces: year = first 4 chars of
    * the date; cross-listed 9-digit ids starting "11" lose that prefix
    * (data/published-dates.txt:1). Divergence from the reference, by
    * design: duplicate ids resolve to min(year) instead of the
    * order-nondeterministic first-wins dropDuplicates
    * (DataFrameLoader.scala:73, SURVEY.md §7.6).
    */
  def loadPublishedDates(spark: SparkSession, path: String): DataFrame = {
    val parts = split(trim(col("value")), "\\s+")
    val rawId = element_at(parts, 1)
    val id = when(length(rawId) === 9 && substring(rawId, 1, 2) === "11",
      substring(rawId, 3, 7)).otherwise(rawId)
    cleanLines(spark, path)
      .select(
        id.cast(IntegerType).as("id"),
        substring(element_at(parts, 2), 1, 4).cast(IntegerType).as("year"))
      .na.drop()
      .groupBy(col("id")).agg(min(col("year")).as("year"))
  }

  /** Precomputed per-year connected-pair totals (S3) — the path is a
    * parameter here, not the reference's hard-coded HDFS URI
    * (Application.scala:26-32). */
  def loadNodePairs(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(StructType(Seq(
        StructField("year", IntegerType, nullable = false),
        StructField("totalPairs", LongType, nullable = false))))
      .csv(path)
}
