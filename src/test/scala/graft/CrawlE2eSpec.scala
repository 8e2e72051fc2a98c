package graft

import org.apache.spark.sql.functions._

import graft.pipeline.CrawlE2e

/** Crawl-front capstone (d_crawl_e2e): waterfall structure, the planted
  * URL-pair and mirror-page duplicate classes landing at the RIGHT
  * stage (URL dedup cannot see a mirror; content dedup must), and
  * excision trimming tokens without dropping rows. */
class CrawlE2eSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("crawl urls canonicalize to one key per id pair") {
    val u = CrawlE2e.withCrawlUrls(Tables.documents(spark, sf))
    val canon = u.select(graft.pipeline.Urls.canonicalize(col("url")).as("c"),
      col("doc_id"))
    assert(canon.select("c").distinct().count() === 250)
    // every canonical key groups exactly the pair (2k, 2k+1)
    val bad = canon.groupBy("c")
      .agg(min("doc_id").as("lo"), max("doc_id").as("hi"),
        count(lit(1)).as("n"))
      .filter(col("n") =!= 2 || col("hi") - col("lo") =!= 1 ||
        col("lo") % 2 =!= 0)
    assert(bad.count() === 0)
  }

  test("mirror pages are byte-identical copies of doc_id - 2") {
    val pages = CrawlE2e.withMirroredPages(Tables.documents(spark, sf))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    pages.keys.filter(id => id % 10 == 2 && pages.contains(id - 2)).foreach {
      id => assert(pages(id) === pages(id - 2), s"doc $id")
    }
    // non-mirror pages differ from their neighbors (doc_id in the page)
    assert(pages(1L) !== pages(3L))
  }

  test("frontier: seen next-links dropped, only past-the-end + chrome survive") {
    val rows = CrawlE2e.crawlFrontierQ.run(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val host = "https://crawl.example.com"
    // 500 contiguous ids -> pairs 0..249; the ONLY unseen next-link is p250
    assert(rows.keySet === Set(host, s"$host/a", s"$host/c", s"$host/buy",
      s"$host/x", s"$host/y", s"$host/n", s"$host/p250?a=1&b=2"))
    assert(rows(host) === 500)
    assert(rows(s"$host/x") === 167)      // doc_id % 3 == 0 in [0, 500)
    assert(rows(s"$host/n") === 50)       // doc_id % 10 == 0
    assert(rows(s"$host/p250?a=1&b=2") === 2) // referrers: ids 498, 499
    // every in-range next-link canonical equals a seen URL — the 249
    // dropped links prove the anti-join pruned real matches
    val links = CrawlE2e.htmlLinksQ.run(spark, sf)
      .filter(col("link").contains("/p")).select("link").distinct().count()
    assert(links === 250) // p1..p250 all extracted before the seen filter
  }

  test("incremental: refetches drop at the URL stage, mirrors at content") {
    val w = CrawlE2e.crawlIncrementalQ.run(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    val ids = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0))
    val batch = ids.filter(id => (id / 2) % 4 == 3)
    val rows = w.map(_._2)
    assert(w.map(_._1).toSeq === Seq("batch_fetch", "url_new",
      "decode_extract", "content_new"))
    assert(rows(0) === batch.length)
    // url_new derived independently from the plant arithmetic: re-fetch
    // docs (% 3 == 0) point at standing paths and drop; the rest dedup
    // to one survivor per pair
    val expectedUrlNew = batch.filter(_ % 3 != 0).groupBy(_ / 2).size
    assert(rows(1) === expectedUrlNew)
    assert(rows(2) === rows(1)) // every URL survivor decodes
    // the batch mirrors (% 10 == 2 survivors serving standing pages)
    // MUST fall here — and only content dups fall here
    val mirrorSurvivors = batch.filter(id => id % 3 != 0 && id % 10 == 2)
      .groupBy(_ / 2).map(_._2.min).count(_ % 10 == 2)
    assert(rows(3) <= rows(2) - mirrorSurvivors)
    assert(w(3)._3 < w(2)._3) // tokens drop with the dropped rows
  }

  test("waterfall: stage placement of each planted duplicate class") {
    val w = CrawlE2e.waterfall(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(w.map(_._1).toSeq === (1L to 6L).toSeq)
    assert(w.map(_._2).toSeq === Seq("fetch", "url_dedup", "decode_extract",
      "quality", "content_dedup", "span_excise"))
    val rows = w.map(_._3)
    val toks = w.map(_._4)
    assert(rows(0) === 500)
    assert(rows(1) === 250)          // URL dedup halves: one key per pair
    assert(rows(2) === rows(1))      // every survivor gunzips + extracts
    assert(rows(3) <= rows(2))       // quality can only drop
    // the ~50 mirrors (doc_id % 10 == 2, all even, all URL-surviving)
    // MUST fall at content dedup, nowhere earlier
    assert(rows(3) - rows(4) >= 45)
    assert(rows(5) === rows(4))      // excision re-emits every row
    assert(toks(5) <= toks(4))       // ... but only ever trims tokens
    assert(toks(2) >= toks(3) && toks(3) >= toks(4))
    assert(toks(0) === 0 && toks(1) === 0) // opaque payload: no counts yet
  }
}
