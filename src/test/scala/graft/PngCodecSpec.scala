package graft

import org.apache.spark.sql.functions._

import graft.functions.PngCodec
import graft.pipeline.Multimodal

/** PNG codec: big-endian round trip, CRC-verified parsing (the member
  * of the codec family the other two lack), structural corruption
  * modes, and expr == batch parity. */
class PngCodecSpec extends SparkSpec {

  test("encode/parseHeader round trip over dims and color types") {
    for (w <- Seq(1, 7, 255, 256, 4096);
         h <- Seq(1, 13, 300);
         ct <- Seq(0, 2, 3, 4, 6)) {
      val png = PngCodec.encode(w, h, ct, seed = w * 31L + h)
      val hd = PngCodec.parseHeaderRaw(png)
      assert(hd != null, s"($w,$h,$ct)")
      assert(hd.toSeq === Seq(w.toLong, h.toLong, 8L, ct.toLong))
    }
  }

  test("multi-byte BE dims parse from a hand-built header (encode cap-free)") {
    // the encoder refuses geometries it can't buffer (MaxEncodeSamples),
    // but the PARSER must still read any conformant header — build the
    // 33 bytes by hand with a true CRC
    val b = new Array[Byte](33)
    Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte).copyToArray(b)
    def putBE(off: Int, v: Int): Unit = {
      b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
      b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
    }
    putBE(8, 13)
    "IHDR".zipWithIndex.foreach { case (c, i) => b(12 + i) = c.toByte }
    putBE(16, 1 << 24) // width far past the encode cap
    putBE(20, 1 << 20)
    b(24) = 8; b(25) = 2; b(26) = 0; b(27) = 0; b(28) = 0
    val crc = new java.util.zip.CRC32(); crc.update(b, 12, 17)
    putBE(29, crc.getValue.toInt)
    assert(PngCodec.parseHeaderRaw(b).toSeq ===
      Seq((1L << 24), (1L << 20), 8L, 2L))
  }

  test("invalid encode inputs degrade to null") {
    assert(PngCodec.encode(0, 5, 2, 1L) == null)
    assert(PngCodec.encode(5, -1, 2, 1L) == null)
    assert(PngCodec.encode(5, 5, 1, 1L) == null) // illegal color type
    // over the documented sample cap: refuse, don't OOM
    assert(PngCodec.encode(1 << 13, (1 << 13) + 1, 6, 1L) == null)
  }

  test("a bit flip ANYWHERE in the CRC-covered IHDR nulls the parse") {
    val png = PngCodec.encode(64, 48, 2, 7L)
    // bytes 12..28 are type+data (CRC-covered), 29..32 the CRC itself
    for (i <- 12 to 32) {
      val c = png.clone()
      c(i) = (c(i) ^ 0x01).toByte
      assert(PngCodec.parseHeaderRaw(c) == null, s"flip at $i not caught")
    }
  }

  test("structural corruption modes parse to null, not garbage") {
    val png = PngCodec.encode(64, 48, 2, 7L)
    assert(PngCodec.parseHeaderRaw(null) == null)
    assert(PngCodec.parseHeaderRaw(png.take(32)) == null) // truncated
    val badSig = png.clone(); badSig(0) = 'X'
    assert(PngCodec.parseHeaderRaw(badSig) == null)
    // legality table: color type 2 requires depth 8/16 — depth 4 with a
    // RECOMPUTED CRC must still be rejected (field check, not CRC check)
    val badDepth = png.clone()
    badDepth(24) = 4
    val crc = new java.util.zip.CRC32()
    crc.update(badDepth, 12, 17)
    val v = crc.getValue.toInt
    badDepth(29) = (v >>> 24).toByte; badDepth(30) = (v >>> 16).toByte
    badDepth(31) = (v >>> 8).toByte; badDepth(32) = v.toByte
    assert(PngCodec.parseHeaderRaw(badDepth) == null)
  }

  test("expression and batched PNG decode agree on the documents table") {
    val docs = Tables.documents(spark, sf())
    val a = Multimodal.parsePngHeaders(Multimodal.withPngContainers(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val b = Multimodal.parsePngHeadersBatch(Multimodal.withPngContainers(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(a === b)
    assert(a.size === docs.count())
    // both color types present (doc_id parity)
    assert(a.map(_._5) === Set(2L, 6L))
  }

  // ---- full pixel decode (real zlib IDAT) --------------------------------

  /** Per-channel (sum, peak) computed from the documented pixel formula
    * — the independent arithmetic the decode must reproduce. */
  private def formulaStats(w: Int, h: Int, ch: Int, seed: Long): Seq[(Long, Long)] =
    (0 until 4).map { c =>
      if (c >= ch) (0L, 0L)
      else {
        val vs = for (y <- 0 until h; x <- 0 until w)
          yield PngCodec.pixelByte(seed, x, y, c).toLong
        (vs.sum, vs.max)
      }
    }

  test("pixel stats: inflate + unfilter reproduces the formula exactly") {
    for ((w, h, ct, ch) <- Seq((1, 1, 0, 1), (7, 5, 2, 3), (64, 48, 4, 2),
      (81, 60, 6, 4), (256, 3, 2, 3))) {
      val seed = w * 131L + h
      val s = PngCodec.pixelStatsRaw(PngCodec.encode(w, h, ct, seed))
      assert(s != null, s"($w,$h,$ct)")
      assert(s.take(4).toSeq === Seq(w.toLong, h.toLong, ch.toLong, w.toLong * h))
      val expect = formulaStats(w, h, ch, seed)
      assert(s.slice(4, 8).toSeq === expect.map(_._1), s"sums ($w,$h,$ct)")
      assert(s.slice(8, 12).toSeq === expect.map(_._2), s"peaks ($w,$h,$ct)")
    }
  }

  test("pixel stats: palette color type is out of stats scope -> null") {
    val png = PngCodec.encode(9, 4, 3, 5L)
    assert(PngCodec.parseHeaderRaw(png) != null) // header still parses
    assert(PngCodec.pixelStatsRaw(png) == null)
  }

  test("pixel stats: a bit flip ANYWHERE in the IDAT chunk nulls the decode") {
    val png = PngCodec.encode(16, 8, 2, 11L)
    // locate the IDAT chunk (after sig 8 + IHDR 25)
    val idatOff = 33
    assert(png(idatOff + 4) == 'I' && png(idatOff + 7) == 'T')
    val len = ((png(idatOff) & 0xFF) << 24) | ((png(idatOff + 1) & 0xFF) << 16) |
      ((png(idatOff + 2) & 0xFF) << 8) | (png(idatOff + 3) & 0xFF)
    // flip every byte of type+data+crc: the chunk CRC must catch each
    for (i <- (idatOff + 4) until (idatOff + 12 + len)) {
      val c = png.clone()
      c(i) = (c(i) ^ 0x01).toByte
      assert(PngCodec.pixelStatsRaw(c) == null, s"flip at $i not caught")
    }
  }

  test("pixel stats: IHDR geometry lying about the stream nulls the decode") {
    val png = PngCodec.encode(16, 8, 2, 11L)
    // claim one more row than the deflated stream holds, CRC recomputed
    val c = png.clone()
    c(23) = 9 // height LSB 8 -> 9
    val crc = new java.util.zip.CRC32()
    crc.update(c, 12, 17)
    val v = crc.getValue.toInt
    c(29) = (v >>> 24).toByte; c(30) = (v >>> 16).toByte
    c(31) = (v >>> 8).toByte; c(32) = v.toByte
    assert(PngCodec.parseHeaderRaw(c) != null) // header is self-consistent
    assert(PngCodec.pixelStatsRaw(c) == null) // but the stream is short
  }

  test("pixel stats: all five filter types unfilter correctly") {
    // Build a PNG by hand whose rows use filters 1-4 over KNOWN pixels,
    // then assert the decode matches the filter-0 encoding of the same
    // pixels — pinning Sub/Up/Average/Paeth against the spec formulas.
    val w = 5; val h = 4; val ch = 3
    val seed = 77L
    def px(x: Int, y: Int, c: Int) = PngCodec.pixelByte(seed, x, y, c)
    val stride = 1 + w * ch
    val raw = new Array[Byte](h * stride)
    val filters = Seq(1, 2, 3, 4)
    for (y <- 0 until h) {
      val ft = filters(y)
      raw(y * stride) = ft.toByte
      for (i <- 0 until w * ch) {
        val cur = px(i / ch, y, i % ch)
        val left = if (i >= ch) px((i - ch) / ch, y, i % ch) else 0
        val up = if (y > 0) px(i / ch, y - 1, i % ch) else 0
        val ul = if (y > 0 && i >= ch) px((i - ch) / ch, y - 1, i % ch) else 0
        val pred = ft match {
          case 1 => left
          case 2 => up
          case 3 => (left + up) >> 1
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
        }
        raw(y * stride + 1 + i) = ((cur - pred) & 0xFF).toByte
      }
    }
    // deflate + frame by reusing encode's chunk writer via a reference
    // image: take encode's container and swap the IDAT payload
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val buf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!defl.finished()) buf.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    val idat = buf.toByteArray
    val sigIhdr = PngCodec.encode(w, h, 2, seed).take(33)
    val out = new java.io.ByteArrayOutputStream()
    out.write(sigIhdr)
    def writeChunk(tpe: String, data: Array[Byte]): Unit = {
      val hdr = new Array[Byte](8)
      val l = data.length
      hdr(0) = (l >>> 24).toByte; hdr(1) = (l >>> 16).toByte
      hdr(2) = (l >>> 8).toByte; hdr(3) = l.toByte
      tpe.zipWithIndex.foreach { case (c, i) => hdr(4 + i) = c.toByte }
      out.write(hdr)
      out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(hdr, 4, 4); crc.update(data)
      val v = crc.getValue.toInt
      out.write(Array((v >>> 24).toByte, (v >>> 16).toByte,
        (v >>> 8).toByte, v.toByte))
    }
    writeChunk("IDAT", idat)
    writeChunk("IEND", Array.emptyByteArray)
    val got = PngCodec.pixelStatsRaw(out.toByteArray)
    val ref = PngCodec.pixelStatsRaw(PngCodec.encode(w, h, 2, seed))
    assert(got != null && ref != null)
    assert(got.toSeq === ref.toSeq,
      "filtered rows must decode to the same pixels as filter-0")
  }

  test("pixel expression and batched pixel decode agree on the documents table") {
    val docs = Tables.documents(spark, sf())
    def key(r: org.apache.spark.sql.Row) =
      (0 until 13).map(i => r.getLong(i)).toList
    val a = Multimodal.pngPixels(Multimodal.withPngContainers(docs))
      .collect().map(key).toSet
    val b = Multimodal.pngPixelsBatch(Multimodal.withPngContainers(docs))
      .collect().map(key).toSet
    assert(a === b)
    assert(a.size === docs.count())
    // both channel widths present (doc_id parity: truecolor / +alpha)
    assert(a.map(_(3)) === Set(3L, 4L))
  }

  // ---- perceptual aHash (image dedup) ------------------------------------

  test("aHash63: byte-path hash equals the formula recomputation") {
    for ((w, h) <- Seq((1, 1), (7, 5), (80, 60), (13, 44))) {
      val seed = w * 7L + h
      val got = PngCodec.aHash63(PngCodec.encode(w, h, 2, seed))
      assert(got != null)
      val vs = (0 until 63).map { k =>
        val x = (k % 8) * w / 8
        val y = (k / 8) * h / 8
        PngCodec.pixelByte(seed, x, y, 0).toLong
      }
      val mean = vs.sum / 63
      val expect = (0 until 63).filter(k => vs(k) > mean)
        .map(k => 1L << k).sum
      assert(got.longValue() === expect, s"($w,$h)")
      assert(got.longValue() >= 0L, "bit 63 must never be set")
    }
  }

  test("aHash63: identical content -> identical hash; corrupt bytes -> null") {
    val a = PngCodec.aHash63(PngCodec.encode(40, 30, 2, 123L))
    val b = PngCodec.aHash63(PngCodec.encode(40, 30, 2, 123L))
    assert(a != null && a == b)
    val png = PngCodec.encode(40, 30, 2, 123L)
    val c = png.clone(); c(40) = (c(40) ^ 0x01).toByte // inside IDAT region
    assert(PngCodec.aHash63(c) == null)
  }

  test("image near-dup banding is COMPLETE vs all-pairs on the corpus") {
    // pigeonhole: hamming <= 3 flips cannot touch all 4 of the 16-bit
    // bands — the banded join must find EXACTLY the all-pairs result
    val containers = Multimodal.withPngContentContainers(
      Tables.documents(spark, sf()))
    val banded = Multimodal.imageNearDups(containers)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hashes = Multimodal.imageAHashes(containers)
      .collect().collect { case r if !r.isNullAt(1) =>
        (r.getLong(0), r.getLong(1)) }
    val brute = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(banded === brute)
    assert(banded.nonEmpty, "planted same-content images must pair")
    assert(banded.exists(_._3 == 0L), "exact image dups must appear at hamming 0")
  }

  test("PNG decode stays inside whole-stage codegen") {
    // finalPlan: with the scan fan-out exchange in the plan, AQE only
    // finalizes stages (and wraps them in WholeStageCodegen) at run time
    val plan = finalPlan(Multimodal.parsePngHeaders(
      Multimodal.withPngContainers(Tables.documents(spark, sf()))))
    // the finalized tree renders codegen spans as `*(n)` prefixes
    assert(plan.contains("*("), s"expected codegen:\n$plan")
  }

  test("resample: grid formula exact; 8x8 grid reproduces aHash's samples") {
    for ((w, h) <- Seq((1, 1), (7, 5), (64, 48), (81, 60), (3, 256))) {
      val seed = w * 131L + h
      val png = PngCodec.encode(w, h, 2, seed)
      for ((w2, h2) <- Seq((1, 1), (4, 4), (8, 8), (16, 9), (64, 64))) {
        val r = PngCodec.resample(png, w2, h2)
        assert(r != null, s"($w,$h)->($w2,$h2)")
        val expect = for (j <- 0 until h2; i <- 0 until w2)
          yield PngCodec.pixelByte(seed, i * w / w2, j * h / h2, 0).toLong
        assert(r.toSeq === expect, s"($w,$h)->($w2,$h2)")
      }
      // the 8x8 resample IS aHash's sampling grid: recompute the hash
      val vs = PngCodec.resample(png, 8, 8).take(63)
      val mean = vs.sum / 63
      val hash = vs.zipWithIndex.collect { case (v, k) if v > mean => 1L << k }
        .foldLeft(0L)(_ | _)
      assert(hash === PngCodec.aHash63(png).longValue, s"($w,$h)")
    }
  }

  test("resample: invalid targets and corrupt payloads null, never throw") {
    val png = PngCodec.encode(16, 8, 2, 11L)
    assert(PngCodec.resample(png, 0, 4) == null)
    assert(PngCodec.resample(png, 4, -1) == null)
    assert(PngCodec.resample(png, 65, 64) == null) // 4160 > 4096 cap
    assert(PngCodec.resample(png, 64, 64) != null) // exactly at the cap
    val bad = png.clone(); bad(bad.length / 2) = (bad(bad.length / 2) ^ 1).toByte
    assert(PngCodec.resample(bad, 4, 4) == null)
    assert(PngCodec.resample(PngCodec.encode(9, 4, 3, 5L), 4, 4) == null) // palette
  }
}
