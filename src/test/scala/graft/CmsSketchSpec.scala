package graft

import org.apache.spark.sql.functions._

import graft.functions.{CmsParams, GraftFunctions}

/** Count-Min sketch contracts: never undercounts (for EVERY key, not
  * just the surfaced top-20), bounded overshoot in aggregate, and
  * layout-independence (counters are associative integer sums, so the
  * sketch is identical under any partitioning — the property that makes
  * t_heavy_hitters strict-hash safe). */
class CmsSketchSpec extends SparkSpec {

  private def words = Tables.documents(spark, sf())
    .select(explode(split(trim(col("text")), "\\s+")).as("w"))

  test("estimate >= exact for every distinct word; mean overshoot within bound") {
    val sk = words.agg(GraftFunctions.cms_sketch(xxhash64(col("w"))).as("sk"),
      count(lit(1)).as("n"))
    val rows = words.groupBy(col("w")).agg(count(lit(1)).as("exact"))
      .crossJoin(broadcast(sk))
      .select(col("w"), col("exact"),
        GraftFunctions.cms_estimate(col("sk"), xxhash64(col("w"))).as("est"),
        col("n"))
      .collect()
    assert(rows.nonEmpty)
    val n = rows.head.getLong(3)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS undercounted '${r.getString(0)}': est=${r.getLong(2)} exact=${r.getLong(1)}")
    }
    val meanOver = rows.map(r => (r.getLong(2) - r.getLong(1)).toDouble).sum / rows.length
    val bound = 2.0 * n / CmsParams.Width
    info(f"distinct=${rows.length} n=$n meanOvershoot=$meanOver%.2f bound=$bound%.2f")
    assert(meanOver <= bound,
      f"mean overshoot $meanOver%.2f exceeds 2N/W = $bound%.2f")
  }

  test("sketch is identical under different partition layouts") {
    def sketch(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.agg(GraftFunctions.cms_sketch(xxhash64(col("w"))).as("sk"))
        .collect().head.getSeq[Long](0)
    assert(sketch(words.repartition(7)) == sketch(words.coalesce(1)))
  }

  test("cms functions are callable from SQL text") {
    GraftFunctions.register(spark)
    words.createOrReplaceTempView("cms_words")
    val est = spark.sql(
      """WITH sk AS (SELECT cms_sketch(xxhash64(w)) AS s FROM cms_words)
        |SELECT cms_estimate(s, xxhash64('the')) FROM sk""".stripMargin)
      .collect().head.getLong(0)
    val exact = words.filter(col("w") === "the").count()
    assert(est >= exact)
  }
}
