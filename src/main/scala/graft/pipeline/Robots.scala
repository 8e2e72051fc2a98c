package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.registry.Q

/** Robots-exclusion politeness filtering for the crawl frontier
  * (RFC 9309 §2.2.2 semantics, the subset a frontier filter needs:
  * literal path prefixes, LONGEST-match wins, allow wins a length tie,
  * no matching rule means allowed; `*`/`$` wildcards are out of
  * contract — documented, like the resolve() dot-segment bound).
  *
  * A crawl that fetches a frontier without this filter is a broken
  * crawler, so it belongs next to d_crawl_frontier as a first-class
  * stage, not an afterthought.
  *
  * Scale shape (100 TB): the rule table is robots.txt-sized per host —
  * bounded and tiny next to the frontier — so it BROADCASTS: the
  * frontier joins it host-equi (broadcast-hash), prefix-filters, and
  * elects each link's verdict with one link-keyed max over
  * (prefix_length, allow) structs — struct ordering gives longest
  * match first and allow-on-tie for free. One link-keyed exchange, no
  * nested loop wider than the broadcast.
  */
object Robots {

  /** Keep the links a (host, prefix, allow) rule table permits.
    * `links` must carry a `link` column (absolute URL; other columns
    * pass through); rules match on the link's host and a literal path
    * prefix (a host-only URL matches as path "/"). */
  def politeFilter(links: DataFrame, rules: DataFrame): DataFrame = {
    val host = regexp_extract(col("link"), "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1)
    val rawPath = regexp_extract(col("link"), "://[^/?#]+(/[^#]*)", 1)
    val passthrough = links.columns.toSeq
    // ONE pass over links (a verdict subquery joined back would evaluate
    // the upstream frontier twice — measured before this shape): LEFT
    // broadcast join fans each link out to its host's rules, a
    // non-matching or absent rule contributes a null, and the verdict is
    // max over (prefix_length, allow) structs — longest match first,
    // allow-on-tie, null-safe max + coalesce = default-allow.
    links
      .withColumn("host", host)
      .withColumn("path", when(rawPath === "", lit("/")).otherwise(rawPath))
      .join(broadcast(rules), Seq("host"), "left")
      .withColumn("m",
        when(col("prefix").isNotNull && col("path").startsWith(col("prefix")),
          struct(length(col("prefix")).as("l"), col("allow").as("a"))))
      .groupBy(passthrough.map(col): _*)
      .agg(max(col("m")).as("best"))
      .filter(coalesce(col("best.a"), lit(true)))
      .select(passthrough.map(col): _*)
  }

  /** The planted rule table for the crawl corpus: default-DENY the
    * crawl host, allow only the content pages — `Disallow: /` +
    * `Allow: /p`, the classic "index the articles, skip the chrome"
    * robots file. Longest match sends every /p… link through and
    * blocks /a, /c, /x, /y, /n, /buy, and the root. */
  def plantedRules(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("crawl.example.com", "/", false),
      ("crawl.example.com", "/p", true))
      .toDF("host", "prefix", "allow")
  }

  /** Polite frontier — d_crawl_frontier restricted to what robots
    * permits. The oracle is the frontier oracle's /p branch by direct
    * construction: with `Disallow: /` + `Allow: /p`, the polite
    * frontier is EXACTLY the unseen next-page links. */
  val politeFrontierQ: Q = Q(
    "d_crawl_frontier_polite",
    Some("""SELECT 'https://crawl.example.com/p' || CAST(k + 1 AS VARCHAR)
           |    || '?a=1&b=2' AS link,
           |  CAST(count(*) AS BIGINT) AS n_refs
           |FROM (SELECT doc_id // 2 AS k FROM documents)
           |WHERE k + 1 NOT IN (SELECT doc_id // 2 FROM documents)
           |GROUP BY k
           |ORDER BY link""".stripMargin),
    (s, d) =>
      politeFilter(CrawlE2e.frontierOf(s, d), plantedRules(s))
        .orderBy(col("link")))

  def all: Seq[Q] = Seq(politeFrontierQ)
}
