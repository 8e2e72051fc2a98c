package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.registry.Q

/** URL canonicalization + URL-key dedup — the FIRST dedup a crawled
  * corpus gets, before any content is even fetched twice: the same
  * resource arrives under case-shuffled schemes/hosts, spurious `www.`,
  * explicit default ports, tracking parameters, reordered query
  * strings, fragments, and trailing slashes. Canonicalization is a
  * pure per-row string normalization (narrow map, codegen'd regex and
  * array ops — no UDF), and the dedup is then exact-dedup on the
  * canonical key: one shuffle.
  *
  * The corpus has no URL column, so a deterministic messy-URL
  * generator (every variant keyed on doc_id arithmetic — the
  * multimodal generators' discipline) plants equivalence classes; the
  * oracle re-derives each CANONICAL form from the document columns by
  * direct construction, never by parsing, so the Spark side's actual
  * parse + normalize is what's being checked.
  *
  * Normalization rules (the RFC 3986 §6 safe set + tracking-param
  * stripping):
  *   - scheme and host lowercased; leading `www.` dropped;
  *   - explicit default port (`:443` for https) dropped;
  *   - trailing slash on a non-root path dropped;
  *   - `utm_*` query parameters dropped, the rest SORTED;
  *   - fragment dropped.
  */
object Urls {

  /** documents -> (doc_id, url) with deterministic mess. */
  def withUrls(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val k = col("n_chars") % 10
    val scheme = when(id % 2 === 0, "HTTPS").otherwise("https")
    val host = when(id % 2 === 0,
      concat(upper(col("source")), lit(".EXAMPLE.COM")))
      .otherwise(concat(col("source"), lit(".example.com")))
    val www = when(id % 3 === 0, "www.").otherwise("")
    val port = when(id % 5 === 0, ":443").otherwise("")
    val slash = when(id % 13 === 0, "/").otherwise("")
    val params = when(id % 2 === 0, "b=2&a=1").otherwise("a=1&b=2")
    val utm = when(id % 7 === 0, "&utm_source=feed&utm_campaign=x").otherwise("")
    val frag = when(id % 11 === 0, "#sec-2").otherwise("")
    docs.select(id,
      concat(scheme, lit("://"), www, host, port, lit("/p"), k, slash,
        lit("?"), params, utm, frag).as("url"))
  }

  /** The messy-URL construction as SQL (both engines build the same
    * INPUT; only the Spark side parses it back). Single line: this
    * string is interpolated into stripMargin templates, where a
    * leading `||` would be eaten as a margin pipe. */
  val urlSql: String = Seq(
    "CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END",
    "'://'",
    "CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END",
    "CASE WHEN doc_id % 2 = 0 THEN upper(source) || '.EXAMPLE.COM' ELSE source || '.example.com' END",
    "CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END",
    "'/p'", "CAST(n_chars % 10 AS VARCHAR)",
    "CASE WHEN doc_id % 13 = 0 THEN '/' ELSE '' END",
    "'?'",
    "CASE WHEN doc_id % 2 = 0 THEN 'b=2&a=1' ELSE 'a=1&b=2' END",
    "CASE WHEN doc_id % 7 = 0 THEN '&utm_source=feed&utm_campaign=x' ELSE '' END",
    "CASE WHEN doc_id % 11 = 0 THEN '#sec-2' ELSE '' END"
  ).mkString("(", " || ", ")")

  /** The canonical form by DIRECT construction from the doc columns —
    * the oracle side: independent of any parsing. */
  val canonicalSql: String =
    "'https://' || source || '.example.com/p' || CAST(n_chars % 10 AS VARCHAR) || '?a=1&b=2'"

  /** Resolve an href against its page URL (RFC 3986 §5, the cases a
    * crawl frontier meets): absolute hrefs pass through; `//host/...`
    * inherits the base scheme; rooted `/...` replaces the path;
    * `?query` keeps the base path and replaces query+fragment (§5.3,
    * ADVICE r9); `#frag` re-points at the base document; anything else
    * replaces the base path's last segment. Dot-segments (§5.2.4) are
    * normalized in the merged path — `/./` removed, `seg/../` collapsed
    * up to [[DotSegmentDepth]] levels (deeper nesting is out of
    * contract for a crawl frontier and passes through unnormalized).
    * Pure regex/conditional column ops — codegen'd, no UDF. */
  def resolve(base: Column, href: Column): Column = {
    val scheme = regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*):", 1)
    val schemeHost = regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    val basePath = regexp_extract(base, "://[^/?#]*(/[^?#]*)", 1)
    val dir = regexp_replace(basePath, "/[^/]*$", "")
    val baseNoFrag = regexp_replace(base, "#.*$", "")
    when(href.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), href)
      .when(href.startsWith("//"), concat(scheme, lit(":"), href))
      .when(href.startsWith("/"), concat(schemeHost, normPath(href)))
      .when(href.startsWith("?"), concat(schemeHost, basePath, href))
      .when(href.startsWith("#"), concat(baseNoFrag, href))
      .otherwise(concat(schemeHost,
        normPath(concat(dir, lit("/"), href))))
  }

  /** Max `seg/../` collapse depth in [[resolve]] — each level is one
    * more regexp_replace in the codegen'd expression tree, so the bound
    * keeps the plan finite; real frontiers rarely nest past 2-3. */
  val DotSegmentDepth = 8

  /** RFC 3986 §5.2.4 remove_dot_segments over the PATH part only (the
    * query/fragment tail, split on the first `?` or `#`, is untouched —
    * dots inside a query are literal). Bounded unrolling: `/./` and a
    * trailing `/.` collapse in one pass; each `seg/../` level costs one
    * pass, [[DotSegmentDepth]] passes total. */
  private def normPath(p: Column): Column = {
    val path = regexp_extract(p, "^([^?#]*)", 1)
    val tail = regexp_replace(p, "^[^?#]*", "")
    val noDot = regexp_replace(
      regexp_replace(path, "/\\.(?=/)", ""), "/\\.$", "/")
    val collapsed = (1 to DotSegmentDepth).foldLeft(noDot) { (c, _) =>
      regexp_replace(
        regexp_replace(c, "/(?!\\.\\./)[^/]+/\\.\\.(?=/)", ""),
        "/(?!\\.\\./)[^/]+/\\.\\.$", "/")
    }
    // §5.2.4 2C: leading `/..` with nothing left to consume drops.
    val rooted = regexp_replace(collapsed, "^(/\\.\\.)+(?=/|$)", "")
    concat(when(rooted === "", lit("/")).otherwise(rooted), tail)
  }

  /** Canonicalize a URL column by parsing + normalizing (the real
    * operator): all regex/array work, codegen'd, no UDF. */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host = regexp_replace(
      lower(regexp_extract(url, "://([^/:?#]+)", 1)), "^www\\.", "")
    val port = regexp_extract(url, "://[^/:?#]+:([0-9]+)", 1)
    val keptPort = when(
      port === "" || (scheme === "https" && port === "443") ||
        (scheme === "http" && port === "80"), lit(""))
      .otherwise(concat(lit(":"), port))
    val path = regexp_replace(
      regexp_extract(url, "://[^/?#]+(/[^?#]*)", 1), "/+$", "")
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val kept = array_join(
      array_sort(filter(split(query, "&"),
        p => !p.startsWith("utm_") && p =!= "")), "&")
    concat(scheme, lit("://"), host, keptPort, path,
      when(kept === "", lit("")).otherwise(concat(lit("?"), kept)))
  }

  val canonicalizeQ: Q = Q(
    "t_url_canonicalize",
    Some(s"""SELECT doc_id,
            |  $urlSql AS url,
            |  $canonicalSql AS canonical
            |FROM documents ORDER BY doc_id""".stripMargin),
    (s, d) => {
      val u = withUrls(Tables.documents(s, d))
      u.select(col("doc_id"), col("url"),
        canonicalize(col("url")).as("canonical"))
        .orderBy(col("doc_id"))
    })

  /** Exact dedup on the canonical URL key: min-id survivor election,
    * one (canonical) shuffle — the d_dedup_exact shape with the
    * normalization in front. */
  val dedupUrlQ: Q = Q(
    "d_dedup_url",
    Some(s"""WITH u AS (SELECT doc_id, $canonicalSql AS canonical FROM documents)
            |SELECT doc_id,
            |  min(doc_id) OVER (PARTITION BY canonical) AS keeper_id,
            |  doc_id > min(doc_id) OVER (PARTITION BY canonical) AS is_dup
            |FROM u ORDER BY doc_id""".stripMargin),
    (s, d) => {
      val u = withUrls(Tables.documents(s, d))
        .select(col("doc_id"), canonicalize(col("url")).as("canonical"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("canonical"))
      u.withColumn("keeper_id", min(col("doc_id")).over(w))
        .withColumn("is_dup", col("doc_id") > col("keeper_id"))
        .select(col("doc_id"), col("keeper_id"), col("is_dup"))
        .orderBy(col("doc_id"))
    })

  val all: Seq[Q] = Seq(canonicalizeQ, dedupUrlQ)
}
