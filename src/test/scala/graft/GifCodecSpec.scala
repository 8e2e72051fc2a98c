package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GifCodec

/** GIF87a codec contracts: planted-formula roundtrip over the corpus
  * geometry space, direct LZW properties (random streams, KwKwK runs,
  * the 4096-entry reset), and the corruption envelope. */
class GifCodecSpec extends AnyFunSuite {

  private def twin(w: Int, h: Int, palBits: Int, seed: Long): Array[Long] = {
    val p = 1 << palBits
    val sums = new Array[Long](3)
    val peaks = new Array[Long](3)
    for (y <- 0 until h; x <- 0 until w) {
      val i = GifCodec.pixelIndex(seed, x, y, p)
      val r = GifCodec.palR(seed, i); val g = GifCodec.palG(seed, i)
      val b = GifCodec.palB(seed, i)
      sums(0) += r; sums(1) += g; sums(2) += b
      peaks(0) = math.max(peaks(0), r)
      peaks(1) = math.max(peaks(1), g)
      peaks(2) = math.max(peaks(2), b)
    }
    Array[Long](w, h, p, w.toLong * h,
      sums(0), sums(1), sums(2), peaks(0), peaks(1), peaks(2))
  }

  test("full decode equals the planted-formula twin across the geometry grid") {
    for {
      (w, h) <- Seq((1, 1), (1, 19), (2, 7), (13, 9), (60, 40), (31, 1))
      pb <- Seq(2, 3, 4, 8)
      seed <- Seq(0L, 7L, 423L, 255L)
    } {
      val g = GifCodec.encode(w, h, pb, seed)
      assert(g != null, s"encode null at w=$w h=$h pb=$pb")
      val s = GifCodec.pixelStatsRaw(g)
      assert(s != null, s"decode null at w=$w h=$h pb=$pb seed=$seed")
      assert(s.toSeq == twin(w, h, pb, seed).toSeq,
        s"stats mismatch at w=$w h=$h pb=$pb seed=$seed")
      assert(GifCodec.parseHeaderRaw(g).toSeq ==
        Seq[Long](w, h, 1 << pb, w.toLong * h))
    }
  }

  test("LZW roundtrips arbitrary index streams (seeded random, all widths)") {
    val rnd = new scala.util.Random(42)
    for (minCode <- Seq(2, 4, 8); len <- Seq(1, 2, 100, 5000)) {
      val cap = 1 << minCode
      val in = Array.fill(len)(rnd.nextInt(cap))
      val enc = GifCodec.lzwEncode(in, minCode)
      val out = GifCodec.lzwDecode(enc, minCode, len)
      assert(out != null && out.toSeq == in.toSeq,
        s"roundtrip failed minCode=$minCode len=$len")
    }
  }

  test("LZW KwKwK: constant runs exercise the code==next path") {
    // aaaa... forces w=a, then (a,a) miss, then the decoder repeatedly
    // receives the code just being defined
    for (minCode <- Seq(2, 8); len <- Seq(3, 50, 1000)) {
      val in = Array.fill(len)(1)
      val enc = GifCodec.lzwEncode(in, minCode)
      val out = GifCodec.lzwDecode(enc, minCode, len)
      assert(out != null && out.toSeq == in.toSeq, s"KwKwK failed len=$len")
    }
  }

  test("LZW crosses the 4096-entry reset and stays exact") {
    // random 256-ary data compresses poorly: dictionary fills in ~4k
    // symbols, so 60k symbols cross several clear/reset cycles
    val rnd = new scala.util.Random(7)
    val in = Array.fill(60000)(rnd.nextInt(256))
    val enc = GifCodec.lzwEncode(in, 8)
    val out = GifCodec.lzwDecode(enc, 8, in.length)
    assert(out != null && out.toSeq == in.toSeq)
  }

  test("encode rejects out-of-contract inputs with null") {
    assert(GifCodec.encode(0, 5, 2, 1L) == null)
    assert(GifCodec.encode(5, 0, 2, 1L) == null)
    assert(GifCodec.encode(5, 5, 1, 1L) == null) // palette too small
    assert(GifCodec.encode(5, 5, 9, 1L) == null) // palette too large
    assert(GifCodec.encode(1 << 13, 1 << 13, 2, 1L) == null) // bomb cap
  }

  test("targeted structural violations null at the right level, never throw") {
    val g = GifCodec.encode(13, 9, 3, 42L)
    def mut(i: Int, v: Int): Array[Byte] = {
      val b = g.clone(); b(i) = v.toByte; b
    }
    // header-level violations
    assert(GifCodec.parseHeaderRaw(mut(0, 'X')) == null, "magic")
    assert(GifCodec.parseHeaderRaw(mut(4, '9')) == null, "version 97a")
    assert(GifCodec.parseHeaderRaw(mut(10, g(10) & 0x7F)) == null, "GCT flag off")
    assert(GifCodec.parseHeaderRaw(g.dropRight(1)) == null, "no trailer")
    assert(GifCodec.parseHeaderRaw(g :+ 0.toByte) == null, "trailing byte")
    // demux/decode split: corrupt a byte INSIDE the LZW stream — the
    // header walk (framing only) still passes, the full decode nulls
    // or, if the stream stays decodable, yields a different pixel sum
    val lzwPos = g.length - 6 // inside the last data sub-block
    val bad = mut(lzwPos, (g(lzwPos) ^ 0x5A) & 0xFF)
    assert(GifCodec.parseHeaderRaw(bad) != null, "framing intact")
    val s = GifCodec.pixelStatsRaw(bad)
    assert(s == null || s.toSeq != twin(13, 9, 3, 42L).toSeq,
      "a corrupted stream must not silently reproduce the clean stats")
    // truncation sweep never throws
    (0 until g.length by 5).foreach { n =>
      try {
        GifCodec.parseHeaderRaw(java.util.Arrays.copyOf(g, n))
        GifCodec.pixelStatsRaw(java.util.Arrays.copyOf(g, n))
      } catch { case e: Throwable => fail(s"truncation at $n threw: $e") }
    }
  }
}
