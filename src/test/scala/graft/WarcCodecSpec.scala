package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.WarcCodec

/** WARC/1.0 contracts: capture-triplet roundtrip, byte-correct
  * Content-Length on multi-byte pages, the embedded-HTTP parse, and the
  * structural-corruption envelope (every violation nulls, never
  * throws). */
class WarcCodecSpec extends AnyFunSuite {

  private val uri = "http://w7.example/p42"
  private def file(html: String = "<html><body>hello world</body></html>") =
    WarcCodec.encode(42L, uri, html)

  test("capture triplet roundtrips: types, uris, lengths, status, body") {
    val html = "<html><body>hello world</body></html>"
    val rs = WarcCodec.parseRaw(file(html))
    assert(rs != null && rs.length == 3)
    assert(rs.map(_.recType).toSeq == Seq("warcinfo", "request", "response"))
    assert(rs(0).uri == "" && rs(1).uri == uri && rs(2).uri == uri)
    assert(rs(0).contentLength == WarcCodec.InfoBody.length)
    assert(rs(1).contentLength ==
      "GET /p42 HTTP/1.1\r\nHost: w7.example\r\n\r\n".length)
    assert(rs(2).contentLength ==
      WarcCodec.HttpRespPrefix.length + html.length)
    assert(rs(0).httpStatus == -1L && rs(1).httpStatus == -1L)
    assert(rs(2).httpStatus == 200L)
    assert(rs(2).body == html, "the HTTP payload must round-trip exactly")
    assert(rs(0).body == "" && rs(1).body == "")
  }

  test("Content-Length is BYTES: multi-byte pages frame correctly") {
    val html = "<html><body>héllo wörld — ünïcode</body></html>"
    val bytes = html.getBytes("UTF-8")
    assert(bytes.length > html.length, "the fixture must be multi-byte")
    val rs = WarcCodec.parseRaw(file(html))
    assert(rs != null && rs.length == 3)
    assert(rs(2).contentLength == WarcCodec.HttpRespPrefix.length + bytes.length)
    assert(rs(2).body == html, "body must decode back through UTF-8")
  }

  test("targeted structural violations null, never throw") {
    val ok = file()
    val text = new String(ok, "ISO-8859-1") // byte-transparent view
    def mutate(from: String, to: String): Array[Byte] =
      text.replaceFirst(java.util.regex.Pattern.quote(from),
        java.util.regex.Matcher.quoteReplacement(to)).getBytes("ISO-8859-1")
    val cases: Seq[(String, Array[Byte])] = Seq(
      "bad version" -> mutate("WARC/1.0", "WARC/2.0"),
      "missing type" -> mutate("WARC-Type: warcinfo", "X-Type: warcinfo"),
      "missing date" -> mutate("WARC-Date: ", "X-Date: "),
      "non-digit length" -> mutate("Content-Length: 39", "Content-Length: 3x"),
      "length off by one" -> mutate("Content-Length: 39", "Content-Length: 40"),
      "header without separator" -> mutate("WARC-Date: ", "WARC-Date:"),
      "trailing byte" -> (ok :+ 'x'.toByte),
      "non-http response block" -> mutate("HTTP/1.1 200 OK", "JUNK/1.1 200 X"))
    cases.foreach { case (name, b) =>
      val r = try WarcCodec.parseRaw(b)
      catch { case e: Throwable => fail(s"$name threw: $e") }
      assert(r == null, s"$name must null")
    }
    // response record with its WARC-Target-URI header dropped
    val noUri = text.replaceFirst(
      "WARC-Target-URI: http://w7\\.example/p42\r\nContent-Type: application/http;msgtype=response",
      "Content-Type: application/http;msgtype=response")
      .getBytes("ISO-8859-1")
    assert(WarcCodec.parseRaw(noUri) == null, "response without uri must null")
    // truncation at every 11th byte: null or parse, never throw
    (0 until ok.length by 11).foreach { n =>
      try WarcCodec.parseRaw(java.util.Arrays.copyOf(ok, n))
      catch { case e: Throwable => fail(s"truncation at $n threw: $e") }
    }
  }

  test("warc.gz: per-record members concatenate and decode to the plain file") {
    val plain = file()
    val gz = WarcCodec.encodeGz(42L, uri, "<html><body>hello world</body></html>")
    // three members: three gzip magics in the stream
    var magics = 0
    (0 until gz.length - 1).foreach { i =>
      if ((gz(i) & 0xFF) == 0x1F && (gz(i + 1) & 0xFF) == 0x8B) magics += 1
    }
    assert(magics == 3, s"expected 3 gzip members, saw $magics magics")
    assert(java.util.Arrays.equals(
      graft.functions.GzipCodec.gunzip(gz), plain),
      "multi-member gunzip must reproduce the plain WARC byte-for-byte")
  }

  test("status must be three digits and the block HTTP-led") {
    val ok = file()
    val text = new String(ok, "ISO-8859-1")
    val short = text.replaceFirst("HTTP/1.1 200 OK", "HTTP/1.1 2Z0 OK")
      .getBytes("ISO-8859-1")
    assert(WarcCodec.parseRaw(short) == null)
  }
}
