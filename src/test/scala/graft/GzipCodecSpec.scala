package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.functions.GzipCodec
import graft.pipeline.Multimodal

/** Gzip text codec: round trip over content classes, corruption modes
  * (CRC-backed trailer, magic, deflate stream), multi-member
  * concatenation, the zip-bomb cap, and expr == batch parity on the
  * documents corpus. */
class GzipCodecSpec extends SparkSpec {

  private def rt(s: String): String =
    new String(GzipCodec.gunzip(GzipCodec.gzip(s.getBytes(UTF_8))), UTF_8)

  test("round trip over content classes") {
    for (s <- Seq("", "a", "the quick brown fox jumps over the lazy dog",
      "héllo wörld ünïcode ✓",
      "ab" * 100000)) {
      assert(rt(s) === s)
    }
    assert(GzipCodec.gzip(null) == null)
    assert(GzipCodec.gunzip(null) == null)
  }

  test("corruption detected: magic/CM, deflate stream, CRC and ISIZE trailers") {
    val orig = "the quick brown fox jumps over the lazy dog".getBytes(UTF_8)
    val m = GzipCodec.gzip(orig)
    // magic bytes + compression method (header bytes 0-2)
    for (i <- 0 to 2) {
      val c = m.clone(); c(i) = (c(i) ^ 0x01).toByte
      assert(GzipCodec.gunzip(c) == null, s"header flip at $i not caught")
    }
    // a mid-stream deflate byte: either the huffman stream breaks or the
    // content changes — the CRC catches the latter
    val mid = 10 + (m.length - 18) / 2
    val cd = m.clone(); cd(mid) = (cd(mid) ^ 0x10).toByte
    assert(GzipCodec.gunzip(cd) == null, "deflate flip not caught")
    // every byte of the CRC32 + ISIZE trailer
    for (i <- (m.length - 8) until m.length) {
      val c = m.clone(); c(i) = (c(i) ^ 0x01).toByte
      assert(GzipCodec.gunzip(c) == null, s"trailer flip at $i not caught")
    }
    // truncation anywhere strictly inside the member
    assert(GzipCodec.gunzip(java.util.Arrays.copyOf(m, m.length - 1)) == null)
    assert(GzipCodec.gunzip(java.util.Arrays.copyOf(m, 9)) == null)
  }

  test("header metadata (MTIME/XFL/OS) is not content: flips still decode") {
    val orig = "metadata is not payload".getBytes(UTF_8)
    val m = GzipCodec.gzip(orig)
    for (i <- 4 to 9) { // MTIME(4) XFL OS
      val c = m.clone(); c(i) = (c(i) ^ 0x01).toByte
      val out = GzipCodec.gunzip(c)
      assert(out != null && java.util.Arrays.equals(out, orig),
        s"metadata flip at $i should not affect content")
    }
  }

  test("concatenated members decode to the concatenated payload (WARC shape)") {
    val a = GzipCodec.gzip("first ".getBytes(UTF_8))
    val b = GzipCodec.gzip("second".getBytes(UTF_8))
    val cat = a ++ b
    assert(new String(GzipCodec.gunzip(cat), UTF_8) === "first second")
  }

  test("zip-bomb cap: a member inflating past 64 MiB nulls, never balloons") {
    // 80 MiB of zeros compresses to ~80 KiB — a textbook decompression
    // bomb. The cap must refuse it during inflation.
    val bomb = GzipCodec.gzip(new Array[Byte](80 << 20))
    assert(bomb.length < (1 << 20))
    assert(GzipCodec.gunzip(bomb) == null)
  }

  test("gzip expression and batched decode agree on the documents table") {
    val docs = Tables.documents(spark, sf())
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), r.getLong(2))
    val a = Multimodal.gunzipTexts(Multimodal.withGzipContainers(docs))
      .collect().map(key).toSet
    val b = Multimodal.gunzipTextsBatch(Multimodal.withGzipContainers(docs))
      .collect().map(key).toSet
    assert(a === b)
    assert(a.size === docs.count())
  }
}
