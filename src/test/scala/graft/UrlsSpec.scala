package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Urls

/** URL canonicalization contracts: hand-built normalization cases, the
  * idempotence law, and collapse of every planted messy variant class. */
class UrlsSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("url").select(Urls.canonicalize(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  test("hand cases: case, www, default ports, utm, param order, fragment, slash") {
    assert(canon("HTTPS://WWW.Ex.COM:443/a/?b=2&utm_x=1&a=1#f") ===
      Seq("https://ex.com/a?a=1&b=2"))
    // non-default port is KEPT; http default port 80 dropped
    assert(canon("https://ex.com:8080/a?a=1") ===
      Seq("https://ex.com:8080/a?a=1"))
    assert(canon("HTTP://ex.com:80/a") === Seq("http://ex.com/a"))
    // no query -> no '?'; utm-only query collapses to none
    assert(canon("https://ex.com/a?utm_source=x") === Seq("https://ex.com/a"))
    // root path: the trailing-slash rule strips it entirely (a host-only
    // canonical); both spellings agree
    assert(canon("https://ex.com/", "https://ex.com/?utm_c=1") ===
      Seq("https://ex.com", "https://ex.com"))
  }

  test("canonicalization is idempotent") {
    import spark.implicits._
    val urls = Urls.withUrls(Tables.documents(spark, sf()))
    val once = urls.select(col("doc_id"), Urls.canonicalize(col("url")).as("c"))
    val twice = once.select(col("doc_id"), Urls.canonicalize(col("c")).as("c2"),
      col("c"))
    assert(twice.filter(col("c") =!= col("c2")).count() === 0)
  }

  private def res(cases: (String, String)*): Seq[String] = {
    import spark.implicits._
    cases.toDF("base", "href")
      .select(Urls.resolve(col("base"), col("href")).as("r"))
      .collect().map(_.getString(0)).toSeq
  }

  test("resolve: RFC 3986 §5 reference cases incl. query-only and dot-segments") {
    val base = "https://ex.com/a/b/page?q=0#top"
    assert(res(
      (base, "http://other.com/x"),   // absolute passes through
      (base, "//cdn.com/x"),          // scheme-relative
      (base, "/rooted"),              // rooted replaces path
      (base, "?x=1"),                 // query-only keeps base PATH (ADVICE r9)
      (base, "#sec"),                 // fragment re-points base doc
      (base, "rel")                   // relative replaces last segment
    ) === Seq(
      "http://other.com/x",
      "https://cdn.com/x",
      "https://ex.com/rooted",
      "https://ex.com/a/b/page?x=1",
      "https://ex.com/a/b/page?q=0#sec",
      "https://ex.com/a/b/rel"))
    // §5.2.4 dot-segment removal in merged and rooted paths
    assert(res(
      (base, "./x"),
      (base, "../x"),
      (base, "../../x"),
      (base, "../../../x"),          // over-pops clamp at root (2C)
      (base, "/a/./b/../c"),
      (base, "x/../y?q=./keep")      // query tail untouched
    ) === Seq(
      "https://ex.com/a/b/x",
      "https://ex.com/a/x",
      "https://ex.com/x",
      "https://ex.com/x",
      "https://ex.com/a/c",
      "https://ex.com/a/b/y?q=./keep"))
  }

  test("every planted variant class collapses to one canonical form") {
    val docs = Tables.documents(spark, sf())
    val got = Urls.withUrls(docs)
      .select(col("doc_id"), Urls.canonicalize(col("url")).as("c"))
      .join(docs.select(col("doc_id"), col("source"),
        (col("n_chars") % 10).as("k")), "doc_id")
      .collect().map(r => ((r.getString(2), r.getLong(3)), r.getString(1)))
    got.groupBy(_._1).foreach { case (cls, rows) =>
      assert(rows.map(_._2).distinct.length === 1,
        s"class $cls must share one canonical: ${rows.map(_._2).distinct.toSeq}")
    }
    // and distinct classes stay distinct
    assert(got.map(_._2).distinct.length === got.map(_._1).distinct.length)
  }
}
