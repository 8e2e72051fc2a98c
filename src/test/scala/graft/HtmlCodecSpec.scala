package graft

import graft.functions.HtmlCodec.extractText
import graft.pipeline.Html

/** HTML main-text extraction: tag/entity/script-block edge cases, the
  * boilerplate density rule, malformed-input degradation (never throw),
  * and expr == batch parity on the generated page corpus (VERDICT r8
  * Missing #2 / Next #4). */
class HtmlCodecSpec extends SparkSpec {

  private val prose =
    "this is a long enough prose sentence to clear the minimum block size"

  test("tags stripped, inline tags do not split a block") {
    assert(extractText(s"<p>$prose</p>") === prose)
    assert(extractText(s"<p>${prose.take(30)} <b>bold</b> <em>and</em> " +
      s"<span>inline</span> tail words</p>") ===
      s"${prose.take(30)} bold and inline tail words")
  }

  test("block tags split; short and link-dense blocks drop") {
    // two content paragraphs -> two lines
    assert(extractText(s"<p>$prose one</p><p>$prose two</p>") ===
      s"$prose one\n$prose two")
    // a short block (title/nav) drops on min-chars
    assert(extractText(s"<title>Doc 7</title><p>$prose</p>") === prose)
    // a long pure-anchor block drops on link DENSITY, not length
    val promo = "<div><a href=\"/buy\">buy now and save twenty percent " +
      "in the next thirty minutes</a></div>"
    assert(extractText(promo + s"<p>$prose</p>") === prose)
    // the same words NOT inside an anchor are kept
    val keep = "<div>buy now and save twenty percent in the next " +
      "thirty minutes</div>"
    assert(extractText(keep) ===
      "buy now and save twenty percent in the next thirty minutes")
    // an inline anchor inside prose is kept (density under 1/2)
    assert(extractText(s"<p>$prose <a href=x>link</a>.</p>") ===
      s"$prose link.")
  }

  test("script/style content skipped entirely, case-insensitive, with attrs") {
    val html = "<script>var x = 1; if (x < 99) { x = 2; }</script>" +
      "<SCRIPT src=\"a.js\">no < text > here</SCRIPT>" +
      "<style>p { margin: 0; } .x > .y { color: red; }</style>" +
      s"<p>$prose</p>"
    assert(extractText(html) === prose)
    // unterminated script swallows the tail rather than leaking code
    assert(extractText(s"<p>$prose</p><script>var t = 1;") === prose)
  }

  test("comments skipped; truncated comment degrades, never throws") {
    assert(extractText(s"<!-- c --><p>$prose</p><!-- tail") === prose)
    assert(extractText(s"<p>$prose <!-- mid --> end</p>") === s"$prose end")
  }

  test("entity decode: named, decimal, hex; unknown/malformed kept literally") {
    assert(extractText(s"<p>$prose &amp; &lt;b&gt; &quot;q&quot; &#65;&#x42;</p>")
      === s"""$prose & <b> "q" AB""")
    // &nbsp; is whitespace: collapses with neighbors
    assert(extractText(s"<p>$prose&nbsp;&nbsp; x</p>") === s"$prose x")
    // unknown entity and bare ampersand emitted literally
    assert(extractText(s"<p>$prose &unknown; &x</p>") === s"$prose &unknown; &x")
    // unterminated entity at end of input
    assert(extractText(s"<p>$prose &am</p>") === s"$prose &am")
    // out-of-range numeric entity literal
    assert(extractText(s"<p>$prose &#x110000;</p>") === s"$prose &#x110000;")
  }

  test("whitespace runs collapse, blocks trim") {
    assert(extractText(s"<p>  $prose \t\n  tail  </p>") === s"$prose tail")
  }

  test("malformed input degrades: unclosed tag, nested anchors, null") {
    assert(extractText(s"<p>$prose</p><div attr=") === prose)
    assert(extractText(null) == null)
    assert(extractText("") === "")
    // nested <a> tracked by depth; close underflow clamps at zero
    assert(extractText(s"</a></a><p>$prose <a><a>x</a></a> y</p>") ===
      s"$prose x y")
    // self-closed <br/> flushes a block; self-closed <a/> opens nothing
    assert(extractText(s"<p>$prose one<br/>$prose two</p>") ===
      s"$prose one\n$prose two")
    assert(extractText(s"<p><a/>$prose</p>") === prose)
  }

  test("link extraction: quoting styles, attr entities, skip rules, order") {
    import graft.functions.HtmlCodec.extractLinks
    // double-quoted, single-quoted, unquoted, extra attrs, case
    assert(extractLinks(
      """<a href="/a">x</a><a href='/b'>y</a><a href=/c>z</a>""" +
        """<A CLASS="l" HREF="/d" rel=nofollow>w</A>""").toSeq ===
      Seq("/a", "/b", "/c", "/d"))
    // &amp; decoded INSIDE the attribute value
    assert(extractLinks("""<a href="/p?a=1&amp;b=2">n</a>""").toSeq ===
      Seq("/p?a=1&b=2"))
    // anchors without href, script/comment content, closing tags: nothing
    assert(extractLinks("""<a name="top">t</a><script>var s = '<a href="/no">x</a>';
      </script><!-- <a href="/no2">c</a> --></a>""").toSeq === Seq.empty)
    // self-closed and malformed tags never throw
    assert(extractLinks("""<a href="/s"/><a href=""" ).toSeq === Seq("/s"))
    assert(extractLinks(null) == null)
  }

  test("resolve: absolute, protocol-relative, rooted, fragment, relative") {
    import graft.pipeline.Urls
    val cases = Seq(
      ("https://h.example.com/d/p?x=1#f", "https://o.example.com/q", "https://o.example.com/q"),
      ("https://h.example.com/d/p", "//o.example.com/q", "https://o.example.com/q"),
      ("HTTPS://www.H.example.com:443/d/p", "/r", "HTTPS://www.H.example.com:443/r"),
      ("https://h.example.com/d/p#old", "#new", "https://h.example.com/d/p#new"),
      ("https://h.example.com/d/p", "sib", "https://h.example.com/d/sib"),
      ("https://h.example.com/p", "sib", "https://h.example.com/sib"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(cases.map(c => org.apache.spark.sql.Row(c._1, c._2, c._3))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("base", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("href", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("want", org.apache.spark.sql.types.StringType))))
    val bad = df.withColumn("got", Urls.resolve(org.apache.spark.sql.functions.col("base"),
        org.apache.spark.sql.functions.col("href")))
      .filter(org.apache.spark.sql.functions.col("got") =!=
        org.apache.spark.sql.functions.col("want"))
      .collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("expr == batch parity on the generated page corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val pages = Html.withHtml(docs)
    val a = Html.extractQ.run(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val b = Html.extractBatch(pages).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(a.length === docs.count())
    assert(a.toSeq === b.toSeq)
    // every extract begins with the document text (content block kept)
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    a.foreach { case (id, ex, n) =>
      assert(ex.startsWith(texts(id)))
      assert(n === ex.length.toLong)
      assert(!ex.contains("Home About Contact")) // nav dropped
      assert(!ex.contains("Buy now"))            // promo dropped
      if (id % 5 == 0) assert(ex.endsWith("follows here."))
    }
  }
}
