package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{CrawlE2e, Robots}

/** Robots politeness contracts: RFC 9309 longest-match on crafted
  * rule/link tables, allow-on-tie, default-allow, per-host isolation,
  * and the planted crawl corpus's polite frontier. */
class RobotsSpec extends SparkSpec {

  private def kept(links: Seq[String], rules: Seq[(String, String, Boolean)]): Set[String] = {
    import spark.implicits._
    Robots.politeFilter(
      links.toDF("link"),
      rules.toDF("host", "prefix", "allow"))
      .collect().map(_.getString(0)).toSet
  }

  test("longest matching prefix wins, regardless of rule order") {
    val rules = Seq(
      ("h.com", "/", true),
      ("h.com", "/x", false),
      ("h.com", "/x/y", true))
    assert(kept(Seq(
      "https://h.com/a",      // matches "/" -> allow
      "https://h.com/x/z",    // longest "/x" -> deny
      "https://h.com/x/y/1",  // longest "/x/y" -> allow
      "https://h.com/x"       // "/x" -> deny
    ), rules) === Set("https://h.com/a", "https://h.com/x/y/1"))
  }

  test("equal-length allow and deny: allow wins the tie (least restrictive)") {
    val rules = Seq(("h.com", "/p", false), ("h.com", "/p", true))
    assert(kept(Seq("https://h.com/p1"), rules) === Set("https://h.com/p1"))
  }

  test("no matching rule (or unknown host) means allowed; rules are host-scoped") {
    val rules = Seq(("a.com", "/", false))
    assert(kept(Seq(
      "https://a.com/x",      // a.com default-deny
      "https://b.com/x",      // no rules for b.com -> allowed
      "https://a.org/x"       // different host entirely
    ), rules) === Set("https://b.com/x", "https://a.org/x"))
  }

  test("a host-only URL matches as path '/'") {
    val deny = Seq(("h.com", "/", false))
    assert(kept(Seq("https://h.com"), deny) === Set.empty[String])
    val allow = Seq(("h.com", "/", true))
    assert(kept(Seq("https://h.com"), allow) === Set("https://h.com"))
  }

  test("planted corpus: the polite frontier is exactly the /p slice of the frontier") {
    val frontier = CrawlE2e.frontierOf(spark, sf())
      .collect().map(_.getString(0)).toSet
    val polite = Robots.politeFilter(
      CrawlE2e.frontierOf(spark, sf()), Robots.plantedRules(spark))
      .collect().map(_.getString(0)).toSet
    assert(polite.subsetOf(frontier))
    assert(polite === frontier.filter(_.startsWith("https://crawl.example.com/p")))
    // the filter actually removed the chrome links
    assert(polite.size < frontier.size)
  }
}
