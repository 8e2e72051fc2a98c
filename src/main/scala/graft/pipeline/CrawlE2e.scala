package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.functions.GraftFunctions.{gunzip_text, gzip_text, html_extract}
import graft.registry.Q

/** Crawl-front-to-curation capstone (VERDICT r8 Next #6): the round's
  * front-end operators composed END TO END the way `d_pipeline_e2e`
  * composed the r6 surface, with a per-stage row/token WATERFALL as the
  * result — the number a 100-TB corpus build actually reports to its
  * operators ("we fetched X pages, kept Y after URL dedup, decoded Z,
  * ... , trained on T tokens").
  *
  * Stages (each an already-oracled operator, chained):
  *   1 `fetch`          — every document arrives as (messy URL, gzipped
  *                        HTML payload); tokens unknown (payload opaque)
  *   2 `url_dedup`      — RFC 3986 canonicalization + min-id survivor
  *                        per canonical key (t_url_canonicalize /
  *                        d_dedup_url); the crawl's FIRST dedup, before
  *                        any byte of content is decoded
  *   3 `decode_extract` — gunzip (CRC-verified) → HTML main-text
  *                        extraction (t_html_extract); token counting
  *                        becomes possible here
  *   4 `quality`        — type-token-ratio gate >= 1/3 on the EXTRACT,
  *                        as EXACT integer arithmetic (d_pipeline_e2e's
  *                        gate, applied post-extract where it belongs —
  *                        chrome would dominate raw)
  *   5 `content_dedup`  — exact dedup on the extracted content hash,
  *                        min-id survivor (f4_dedup_exact's shape);
  *                        catches the planted MIRROR pages — same
  *                        content under a different URL, the duplicate
  *                        class URL dedup structurally cannot see
  *   6 `span_excise`    — duplicated-span excision over the survivors
  *                        (d_dup_span_excise): rows unchanged, tokens
  *                        drop — the sub-document dedup doc-level
  *                        passes can't see
  *
  * The crawl URL generator plants ONE canonical collision per id pair
  * (path segment doc_id div 2 on a fixed host, wrapped in the full
  * messy-variant machinery of [[Urls]]) so stage 2 halves the corpus —
  * every equivalence is still re-derived by the oracle through direct
  * construction, never parsing.
  *
  * Plan shape: one per-doc pass computes every stage flag (the decode/
  * extract kernel runs ONLY on url-dedup survivors via a guarded
  * projection), two hash shuffles for the survivor windows (canonical
  * key, content hash), the excision branch reuses the d_dup_span
  * exchanges, and the waterfall itself is a single-row aggregate
  * exploded into six rows — no driver-side collect, no cartesian wider
  * than a 1-row broadcast.
  */
object CrawlE2e {

  private def toks(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    split(trim(c), "\\s+")

  /** documents -> (doc_id, url): the full messy-variant set of
    * [[Urls.withUrls]] on a fixed host with a per-PAIR path, so the
    * canonical key is 'https://crawl.example.com/p<id div 2>?a=1&b=2'
    * and ids 2k / 2k+1 collide. */
  def withCrawlUrls(docs: DataFrame): DataFrame =
    withCrawlUrls(docs, expr("doc_id div 2"))

  /** Path-key override: the incremental crawl plants RE-FETCHES (batch
    * URLs whose canonical form equals a STANDING page's) by pointing
    * selected docs at another pair's path. */
  def withCrawlUrls(docs: DataFrame, pathKey: org.apache.spark.sql.Column): DataFrame =
    docs.select(col("doc_id"), crawlUrlCol(pathKey).as("url"))

  /** The crawl-URL derivation as a bare column over doc_id, so callers
    * that also need other per-row derivations (pagesWithUrls) can
    * compute everything in ONE projection instead of self-joining two
    * derivations of the same table. */
  def crawlUrlCol(pathKey: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val id = col("doc_id")
    val scheme = when(id % 2 === 0, "HTTPS").otherwise("https")
    val host = when(id % 2 === 0, "CRAWL.EXAMPLE.COM").otherwise("crawl.example.com")
    val www = when(id % 3 === 0, "www.").otherwise("")
    val port = when(id % 5 === 0, ":443").otherwise("")
    val slash = when(id % 13 === 0, "/").otherwise("")
    val params = when(id % 2 === 0, "b=2&a=1").otherwise("a=1&b=2")
    val utm = when(id % 7 === 0, "&utm_source=feed&utm_campaign=x").otherwise("")
    val frag = when(id % 11 === 0, "#sec-2").otherwise("")
    concat(scheme, lit("://"), www, host, port, lit("/p"),
      pathKey, slash, lit("?"), params, utm, frag)
  }

  /** documents -> (doc_id, html) with MIRROR pages planted: a doc with
    * doc_id % 10 == 2 serves a byte-identical copy of doc_id - 2's page
    * (a mirror site: different URL — different canonical, so URL dedup
    * can NOT catch it — same content, so content dedup MUST). Both ids
    * are even, so both survive the pair-keyed URL dedup and the
    * collision reaches stage 5 intact. */
  def withMirroredPages(docs: DataFrame): DataFrame = {
    val pages = Html.withHtml(docs)
    val mirrorSrc = pages.select(
      (col("doc_id") + 2).as("doc_id"), col("html").as("mhtml"))
    pages.join(mirrorSrc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("doc_id") % 10 === 2 && col("mhtml").isNotNull,
          col("mhtml")).otherwise(col("html")).as("html"))
  }

  /** The six-row waterfall: (stage_id, stage, n_rows, n_tokens). */
  def waterfall(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // fetch: (doc_id, url, payload) — gzipped page, real RFC 1952 member
    val fetched = withCrawlUrls(docs)
      .join(withMirroredPages(docs), "doc_id")
      .select(col("doc_id"), col("url"), gzip_text(col("html")).as("payload"))
    val byCanonical = Window.partitionBy(col("canonical"))
    val byContent = Window.partitionBy(md5(col("extract")))
    val staged = fetched
      .withColumn("canonical", Urls.canonicalize(col("url")))
      .withColumn("s2", col("doc_id") === min(col("doc_id")).over(byCanonical))
      // decode + extract ONLY for url-dedup survivors — at 100 TB the
      // dropped half never pays the inflate/parse kernel
      .withColumn("extract",
        when(col("s2"), html_extract(gunzip_text(col("payload")))))
      .withColumn("tk", toks(col("extract")))
      .withColumn("ntok", size(col("tk")).cast(LongType))
      // type-token ratio >= 1/3 as EXACT integer arithmetic (3*distinct
      // >= total): no double division at the gate, so engine parity is
      // structural, not numeric luck
      .withColumn("qual", col("s2") && col("extract").isNotNull &&
        size(array_distinct(col("tk"))) * 3 >= size(col("tk")))
      .withColumn("s5", col("qual") &&
        col("doc_id") === min(when(col("qual"), col("doc_id"))).over(byContent))
    val excised = SpanExcise.dupSpanExciseOf(
      staged.filter(col("s5")).select(col("doc_id"), col("extract").as("text")))
    val agg1 = staged.agg(
      count(lit(1)).as("r1"),
      count_if(col("s2")).as("r2"),
      count_if(col("s2") && col("extract").isNotNull).as("r3"),
      coalesce(sum(when(col("s2"), col("ntok"))), lit(0L)).as("t3"),
      count_if(col("qual")).as("r4"),
      coalesce(sum(when(col("qual"), col("ntok"))), lit(0L)).as("t4"),
      count_if(col("s5")).as("r5"),
      coalesce(sum(when(col("s5"), col("ntok"))), lit(0L)).as("t5"))
    val agg2 = excised.agg(
      coalesce(sum(col("n_removed")), lit(0L)).as("nrem"))
    def st(i: Long, name: String, rows: org.apache.spark.sql.Column,
        toksC: org.apache.spark.sql.Column) =
      struct(lit(i).as("stage_id"), lit(name).as("stage"),
        rows.as("n_rows"), toksC.as("n_tokens"))
    agg1.crossJoin(broadcast(agg2))
      .select(explode(array(
        st(1L, "fetch", col("r1"), lit(0L)),
        st(2L, "url_dedup", col("r2"), lit(0L)),
        st(3L, "decode_extract", col("r3"), col("t3")),
        st(4L, "quality", col("r4"), col("t4")),
        st(5L, "content_dedup", col("r5"), col("t5")),
        st(6L, "span_excise", col("r5"), col("t5") - col("nrem")))).as("w"))
      .select(col("w.stage_id"), col("w.stage"), col("w.n_rows"),
        col("w.n_tokens"))
      .orderBy(col("stage_id"))
  }

  /** Every stage re-derived by direct construction: canonical keys from
    * doc_id arithmetic (never URL parsing), extracts from the
    * [[Html.extractConstructSql]] construction (never HTML parsing),
    * excision coverage from the positional dup-gram union — the Spark
    * side's parse/inflate/walk kernels are what's being checked. */
  private val OracleSql: String =
    s"""WITH s2 AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id, min(doc_id) OVER (PARTITION BY doc_id // 2) AS k
       |    FROM documents) WHERE doc_id = k),
       |src AS (
       |  SELECT d.doc_id AS real_id,
       |    CASE WHEN d.doc_id % 10 = 2 AND m.doc_id IS NOT NULL
       |      THEN m.doc_id ELSE d.doc_id END AS doc_id,
       |    CASE WHEN d.doc_id % 10 = 2 AND m.doc_id IS NOT NULL
       |      THEN m.text ELSE d.text END AS text
       |  FROM documents d
       |  JOIN s2 ON s2.doc_id = d.doc_id
       |  LEFT JOIN documents m ON m.doc_id = d.doc_id - 2),
       |e0 AS (
       |  SELECT real_id, ${Html.extractConstructSql} AS extract FROM src),
       |e AS (SELECT real_id AS doc_id, extract FROM e0),
       |tk AS (
       |  SELECT doc_id, extract,
       |    string_split_regex(trim(extract), '\\s+') AS toks
       |  FROM e),
       |t3 AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS ntok FROM tk),
       |q AS (
       |  SELECT doc_id, extract, toks, CAST(len(toks) AS BIGINT) AS ntok
       |  FROM tk
       |  WHERE 3 * len(list_distinct(toks)) >= len(toks)),
       |s5 AS (
       |  SELECT doc_id, toks, ntok FROM (
       |    SELECT *, min(doc_id) OVER (PARTITION BY md5(extract)) AS k
       |    FROM q) WHERE doc_id = k),
       |pg AS (
       |  SELECT doc_id,
       |    unnest(range(len(toks) - 7)) AS pos,
       |    unnest(list_transform(range(len(toks) - 7),
       |      i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' '
       |        || toks[i+4] || ' ' || toks[i+5] || ' ' || toks[i+6] || ' '
       |        || toks[i+7] || ' ' || toks[i+8])) AS gram
       |  FROM s5 WHERE len(toks) >= 8),
       |dup AS (
       |  SELECT gram FROM (
       |    SELECT gram, count(DISTINCT doc_id) AS nd FROM pg GROUP BY gram)
       |  WHERE nd >= 2),
       |cov AS (
       |  SELECT pg.doc_id, count(DISTINCT pg.pos + off.o) AS ncov
       |  FROM pg JOIN dup USING (gram)
       |  CROSS JOIN (SELECT unnest(range(8)) AS o) off
       |  GROUP BY pg.doc_id)
       |SELECT * FROM (
       |  SELECT CAST(1 AS BIGINT) AS stage_id, 'fetch' AS stage,
       |    (SELECT count(*) FROM documents) AS n_rows,
       |    CAST(0 AS BIGINT) AS n_tokens
       |  UNION ALL SELECT 2, 'url_dedup',
       |    (SELECT count(*) FROM s2), 0
       |  UNION ALL SELECT 3, 'decode_extract',
       |    (SELECT count(*) FROM s2),
       |    (SELECT CAST(coalesce(sum(ntok), 0) AS BIGINT) FROM t3)
       |  UNION ALL SELECT 4, 'quality',
       |    (SELECT count(*) FROM q),
       |    (SELECT CAST(coalesce(sum(ntok), 0) AS BIGINT) FROM q)
       |  UNION ALL SELECT 5, 'content_dedup',
       |    (SELECT count(*) FROM s5),
       |    (SELECT CAST(coalesce(sum(ntok), 0) AS BIGINT) FROM s5)
       |  UNION ALL SELECT 6, 'span_excise',
       |    (SELECT count(*) FROM s5),
       |    (SELECT CAST(coalesce(sum(ntok), 0) AS BIGINT) FROM s5)
       |      - (SELECT CAST(coalesce(sum(ncov), 0) AS BIGINT) FROM cov))
       |ORDER BY stage_id""".stripMargin

  val crawlE2eQ: Q = Q(
    "d_crawl_e2e",
    Some(OracleSql),
    (s, d) => waterfall(s, d))

  // ---- outlink extraction + crawl frontier ------------------------------

  /** (doc_id, url, html): each page with its own crawl URL. Both are
    * per-row derivations of doc_id, computed in ONE projection over ONE
    * scan — the former `withCrawlUrls(docs).join(withHtml(docs))`
    * self-joined two derivations of the same table, paying a second
    * scan, a second fan-out exchange, and the join's two hash exchanges
    * for columns a single select produces (guide §2.4 remove shuffles
    * outright; VERDICT r13 what's-wrong #4: the double fan-out). */
  private def pagesWithUrls(s: SparkSession, d: String): DataFrame =
    Html.withHtml(Tables.fanout(Tables.documents(s, d)))
      .select(col("doc_id"), crawlUrlCol(expr("doc_id div 2")).as("url"),
        col("html"))

  /** Outlink extraction — the crawl-graph edge source: every `<a href>`
    * in document order, RESOLVED against the page's (messy) URL and
    * canonicalized. One codegen'd narrow map (HtmlLinks) + the Urls
    * regex ops; the only exchange is the output sort. The oracle
    * re-derives every link from the plant arithmetic — chrome links,
    * the %3 nav, the %10 paragraph link, and the next-page link whose
    * path is doc_id/2 + 1 — never parsing HTML or URLs. */
  val htmlLinksQ: Q = Q(
    "t_html_links",
    Some("""WITH l AS (
           |  SELECT doc_id,
           |    ['/', '/a', '/c',
           |     '/p' || CAST(doc_id // 2 + 1 AS VARCHAR) || '?a=1&b=2']
           |    || CASE WHEN doc_id % 3 = 0 THEN ['/x', '/y'] ELSE [] END
           |    || CASE WHEN doc_id % 10 = 0 THEN ['/n'] ELSE [] END
           |    || ['/buy'] AS hs
           |  FROM documents)
           |SELECT doc_id,
           |  unnest(range(len(hs))) AS rnk,
           |  unnest(list_transform(hs, h -> 'https://crawl.example.com'
           |    || CASE WHEN h = '/' THEN '' ELSE h END)) AS link
           |FROM l ORDER BY doc_id, rnk""".stripMargin),
    (s, d) =>
      pagesWithUrls(s, d)
        .select(col("doc_id"), col("url"),
          posexplode(graft.functions.GraftFunctions.html_links(col("html")))
            .as(Seq("rnk", "href")))
        .select(col("doc_id"), col("rnk").cast(LongType).as("rnk"),
          Urls.canonicalize(Urls.resolve(col("url"), col("href"))).as("link"))
        .orderBy(col("doc_id"), col("rnk")))

  /** Crawl frontier — the incremental-crawl primitive: canonical
    * outlinks NOT already in the seen-URL set, with distinct-referrer
    * counts. Shape: narrow link explode, (doc, link) distinct +
    * link-keyed count (both map-side-combinable), one LEFT ANTI join
    * against the canonicalized seen set — at 100 TB both sides hash on
    * the link key, nothing global. The planted next-page links make the
    * anti-join real: all but the past-the-end pair are seen and MUST be
    * dropped; the chrome links survive with full-corpus referrer
    * counts. */
  val crawlFrontierQ: Q = Q(
    "d_crawl_frontier",
    Some("""SELECT link, n_refs FROM (
           |  SELECT 'https://crawl.example.com' AS link,
           |    (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_refs
           |  UNION ALL SELECT 'https://crawl.example.com/a',
           |    (SELECT CAST(count(*) AS BIGINT) FROM documents)
           |  UNION ALL SELECT 'https://crawl.example.com/buy',
           |    (SELECT CAST(count(*) AS BIGINT) FROM documents)
           |  UNION ALL SELECT 'https://crawl.example.com/c',
           |    (SELECT CAST(count(*) AS BIGINT) FROM documents)
           |  UNION ALL SELECT 'https://crawl.example.com/n',
           |    (SELECT CAST(count(*) AS BIGINT) FROM documents
           |     WHERE doc_id % 10 = 0)
           |  UNION ALL SELECT 'https://crawl.example.com/x',
           |    (SELECT CAST(count(*) AS BIGINT) FROM documents
           |     WHERE doc_id % 3 = 0)
           |  UNION ALL SELECT 'https://crawl.example.com/y',
           |    (SELECT CAST(count(*) AS BIGINT) FROM documents
           |     WHERE doc_id % 3 = 0)
           |  UNION ALL
           |  SELECT 'https://crawl.example.com/p' || CAST(k + 1 AS VARCHAR)
           |      || '?a=1&b=2',
           |    CAST(count(*) AS BIGINT)
           |  FROM (SELECT doc_id // 2 AS k FROM documents)
           |  WHERE k + 1 NOT IN (SELECT doc_id // 2 FROM documents)
           |  GROUP BY k)
           |ORDER BY link""".stripMargin),
    (s, d) => frontierOf(s, d).orderBy(col("link")))

  /** The frontier computation (unordered) — shared by the registered
    * d_crawl_frontier and the robots-filtered polite twin. */
  def frontierOf(s: SparkSession, d: String): DataFrame = {
    val withUrls = pagesWithUrls(s, d)
    val links = withUrls
      .select(col("doc_id"), col("url"),
        explode(graft.functions.GraftFunctions.html_links(col("html")))
          .as("href"))
      .select(col("doc_id"),
        Urls.canonicalize(Urls.resolve(col("url"), col("href"))).as("link"))
    val seen = withUrls
      .select(Urls.canonicalize(col("url")).as("link")).distinct()
    links.distinct()
      .groupBy(col("link")).agg(count(lit(1)).as("n_refs"))
      .join(seen, Seq("link"), "left_anti")
  }

  // ---- incremental crawl -------------------------------------------------

  /** Incremental crawl — a NEW BATCH probed against standing state (the
    * d_dedup_incremental discipline applied to the crawl front):
    *
    *   batch    = whole URL pairs with (doc_id div 2) % 4 == 3;
    *   standing = everything else (its canonical-URL set and extract
    *              hashes are the state a production crawler would hold
    *              as a stored index — built inline here so the query is
    *              self-contained and the oracle can replay it);
    *   stage 1 `batch_fetch`  — the batch as fetched;
    *   stage 2 `url_new`      — canonicalize, drop RE-FETCHES (batch
    *                            docs with doc_id % 3 == 0 point at a
    *                            standing pair's path: already-seen,
    *                            must drop BEFORE any decode), then
    *                            batch-internal min-id dedup;
    *   stage 3 `decode_extract` — gunzip + HTML extract, survivors only;
    *   stage 4 `content_new`  — drop extracts whose content hash is in
    *                            the standing set (the batch MIRRORS —
    *                            doc_id % 10 == 2 serving a standing
    *                            page — land here, not at stage 2).
    *
    * Scale shape: the standing state is one canonical-key projection +
    * one decode pass (in production: a stored index — the build is the
    * setup cost, the probe is O(batch)); the batch side is two anti
    * joins and one window, all hashed on the canonical/content key.
    */
  def incremental(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val isBatch = expr("doc_id div 2") % 4 === 3
    val pathKey = when(isBatch && col("doc_id") % 3 === 0,
      expr("doc_id div 2 - 2")).otherwise(expr("doc_id div 2"))
    val fetched = withCrawlUrls(docs, pathKey)
      .join(withMirroredPages(docs), "doc_id")
      .select(col("doc_id"), col("url"), gzip_text(col("html")).as("payload"))
    val standing = fetched.filter(!isBatch)
    val batch = fetched.filter(isBatch)
    val seenUrl = standing
      .select(Urls.canonicalize(col("url")).as("canonical")).distinct()
    val urlNew = batch
      .withColumn("canonical", Urls.canonicalize(col("url")))
      .join(seenUrl, Seq("canonical"), "left_anti")
      .withColumn("keep", col("doc_id") ===
        min(col("doc_id")).over(Window.partitionBy(col("canonical"))))
      .filter(col("keep"))
    val decoded = urlNew
      .select(col("doc_id"),
        html_extract(gunzip_text(col("payload"))).as("extract"))
      .filter(col("extract").isNotNull)
      .withColumn("ntok", size(toks(col("extract"))).cast(LongType))
    val seenContent = standing
      .select(md5(html_extract(gunzip_text(col("payload")))).as("h"))
      .distinct()
    val accepted = decoded
      .join(seenContent, md5(col("extract")) === col("h"), "left_anti")
    val agg1 = batch.agg(count(lit(1)).as("r1"))
    val agg2 = decoded.agg(
      count(lit(1)).as("r3"),
      coalesce(sum(col("ntok")), lit(0L)).as("t3"))
    val agg3 = accepted.agg(
      count(lit(1)).as("r4"),
      coalesce(sum(col("ntok")), lit(0L)).as("t4"))
    def st(i: Long, name: String, rows: org.apache.spark.sql.Column,
        toksC: org.apache.spark.sql.Column) =
      struct(lit(i).as("stage_id"), lit(name).as("stage"),
        rows.as("n_rows"), toksC.as("n_tokens"))
    agg1.crossJoin(broadcast(agg2)).crossJoin(broadcast(agg3))
      .select(explode(array(
        st(1L, "batch_fetch", col("r1"), lit(0L)),
        st(2L, "url_new", col("r3"), lit(0L)),
        st(3L, "decode_extract", col("r3"), col("t3")),
        st(4L, "content_new", col("r4"), col("t4")))).as("w"))
      .select(col("w.stage_id"), col("w.stage"), col("w.n_rows"),
        col("w.n_tokens"))
      .orderBy(col("stage_id"))
  }

  /** Oracle by plant arithmetic: re-fetch keys, pair survivor election,
    * the mirror rule, and the standing extract set are all re-derived
    * from doc_id/text by direct construction. */
  private val IncrementalOracleSql: String = {
    // the mirror-rule source projection over a doc set, reused for the
    // batch survivors and the standing side
    def mirrored(fromWhere: String) =
      s"""SELECT d.doc_id AS real_id,
         |    CASE WHEN d.doc_id % 10 = 2 AND m.doc_id IS NOT NULL
         |      THEN m.doc_id ELSE d.doc_id END AS doc_id,
         |    CASE WHEN d.doc_id % 10 = 2 AND m.doc_id IS NOT NULL
         |      THEN m.text ELSE d.text END AS text
         |  $fromWhere""".stripMargin
    s"""WITH b AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 3 = 0 THEN doc_id // 2 - 2
       |      ELSE doc_id // 2 END AS pkey
       |  FROM documents WHERE (doc_id // 2) % 4 = 3),
       |sp AS (SELECT DISTINCT doc_id // 2 AS pkey FROM documents
       |  WHERE (doc_id // 2) % 4 <> 3),
       |b2 AS (SELECT doc_id, pkey FROM b
       |  WHERE pkey NOT IN (SELECT pkey FROM sp)),
       |b3 AS (SELECT doc_id FROM (
       |    SELECT doc_id, min(doc_id) OVER (PARTITION BY pkey) AS k
       |    FROM b2) WHERE doc_id = k),
       |src AS (
       |  ${mirrored("""FROM documents d
       |  JOIN b3 ON b3.doc_id = d.doc_id
       |  LEFT JOIN documents m ON m.doc_id = d.doc_id - 2""")}),
       |e0 AS (SELECT real_id, ${Html.extractConstructSql} AS extract FROM src),
       |be AS (SELECT real_id AS doc_id, extract,
       |    CAST(len(string_split_regex(trim(extract), '\\s+')) AS BIGINT)
       |      AS ntok
       |  FROM e0),
       |ssrc AS (
       |  ${mirrored("""FROM documents d
       |  LEFT JOIN documents m ON m.doc_id = d.doc_id - 2
       |  WHERE (d.doc_id // 2) % 4 <> 3""")}),
       |se0 AS (SELECT real_id, ${Html.extractConstructSql} AS extract FROM ssrc),
       |se AS (SELECT DISTINCT extract FROM se0),
       |acc AS (SELECT doc_id, ntok FROM be
       |  WHERE extract NOT IN (SELECT extract FROM se))
       |SELECT * FROM (
       |  SELECT CAST(1 AS BIGINT) AS stage_id, 'batch_fetch' AS stage,
       |    (SELECT count(*) FROM b) AS n_rows, CAST(0 AS BIGINT) AS n_tokens
       |  UNION ALL SELECT 2, 'url_new', (SELECT count(*) FROM b3), 0
       |  UNION ALL SELECT 3, 'decode_extract', (SELECT count(*) FROM b3),
       |    (SELECT CAST(coalesce(sum(ntok), 0) AS BIGINT) FROM be)
       |  UNION ALL SELECT 4, 'content_new', (SELECT count(*) FROM acc),
       |    (SELECT CAST(coalesce(sum(ntok), 0) AS BIGINT) FROM acc))
       |ORDER BY stage_id""".stripMargin
  }

  val crawlIncrementalQ: Q = Q(
    "d_crawl_incremental",
    Some(IncrementalOracleSql),
    (s, d) => incremental(s, d))

  val all: Seq[Q] = Seq(crawlE2eQ, htmlLinksQ, crawlFrontierQ,
    crawlIncrementalQ)
}
