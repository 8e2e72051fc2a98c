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
    val docs = Tables.documents(spark, sf)
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    val u = CrawlE2e.withCrawlUrls(docs)
    val canon = u.select(graft.pipeline.Urls.canonicalize(col("url")).as("c"),
      col("doc_id"))
    // expected keys derived from the id arithmetic, not a pinned count
    assert(canon.select("c").distinct().count() ===
      ids.map(_ / 2).distinct.length)
    // every canonical key groups exactly the ids sharing doc_id div 2
    val grouped = canon.collect()
      .groupBy(_.getString(0)).values.map(_.map(_.getLong(1)).sorted.toSeq)
    val expected = ids.groupBy(_ / 2).values.map(_.sorted.toSeq).toSet
    assert(grouped.toSet === expected)
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
    val ids = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0))
    // expectations DERIVED from the id arithmetic (regeneration-proof):
    // unseen next-links = pairs whose successor pair has no doc
    val pairs = ids.map(_ / 2).toSet
    val unseenNext = ids.groupBy(_ / 2).filter(kv => !pairs(kv._1 + 1))
      .map { case (k, refs) => s"$host/p${k + 1}?a=1&b=2" -> refs.length.toLong }
    assert(rows.keySet === Set(host, s"$host/a", s"$host/c", s"$host/buy",
      s"$host/x", s"$host/y", s"$host/n") ++ unseenNext.keySet)
    assert(rows(host) === ids.length.toLong)
    assert(rows(s"$host/x") === ids.count(_ % 3 == 0).toLong)
    assert(rows(s"$host/n") === ids.count(_ % 10 == 0).toLong)
    unseenNext.foreach { case (k, v) => assert(rows(k) === v, k) }
    // every in-range next-link canonical equals a seen URL — the
    // dropped links prove the anti-join pruned real matches
    val links = CrawlE2e.htmlLinksQ.run(spark, sf)
      .filter(col("link").contains("/p")).select("link").distinct().count()
    assert(links === ids.map(_ / 2 + 1).distinct.length.toLong)
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
    val ids = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0))
    val rows = w.map(_._3)
    val toks = w.map(_._4)
    assert(rows(0) === ids.length.toLong)
    assert(rows(1) === ids.map(_ / 2).distinct.length.toLong) // one key/pair
    assert(rows(2) === rows(1))      // every survivor gunzips + extracts
    assert(rows(3) <= rows(2))       // quality can only drop
    // the planted mirrors (doc_id % 10 == 2, all even, all URL-surviving)
    // MUST fall at content dedup, nowhere earlier — count derived from
    // the plant arithmetic, with slack for the quality gate's bite
    val idSet = ids.toSet
    val mirrors = ids.count(id => id % 10 == 2 && idSet(id - 2))
    assert(rows(3) - rows(4) >= mirrors - 3)
    assert(rows(5) === rows(4))      // excision re-emits every row
    assert(toks(5) <= toks(4))       // ... but only ever trims tokens
    assert(toks(2) >= toks(3) && toks(3) >= toks(4))
    assert(toks(0) === 0 && toks(1) === 0) // opaque payload: no counts yet
  }
}
