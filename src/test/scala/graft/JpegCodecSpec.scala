package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JpegCodec

/** JPEG baseline codec contracts: bit-exact roundtrip of the planted
  * constant-block corpus (gray and 4:2:0 color) against spec-twin
  * arithmetic that never touches bytes, the AC run/size/extend path
  * against an independent naive-IDCT twin, header/block arithmetic,
  * and the degrade-don't-throw corruption envelope. */
class JpegCodecSpec extends AnyFunSuite {

  // ---- spec twins (independent arithmetic) --------------------------------

  private def grayStats(w: Int, h: Int, seed: Long): (Long, Long) = {
    var sum = 0L
    var peak = 0L
    for (by <- 0 until (h + 7) / 8; bx <- 0 until (w + 7) / 8) {
      val v = JpegCodec.blockY(seed, bx, by).toLong
      val vis = math.min(8, w - bx * 8).toLong * math.min(8, h - by * 8)
      sum += v * vis
      if (vis > 0 && v > peak) peak = v
    }
    (sum, peak)
  }

  private def colorStats(w: Int, h: Int, seed: Long): (Array[Long], Array[Long]) = {
    val sums = new Array[Long](3)
    val peaks = new Array[Long](3)
    for (y <- 0 until h; x <- 0 until w) {
      val yv = JpegCodec.blockY(seed, x / 8, y / 8)
      val cb = JpegCodec.blockCb(seed, x / 16, y / 16)
      val cr = JpegCodec.blockCr(seed, x / 16, y / 16)
      val (r, g, b) = JpegCodec.ycbcrToRgb(yv, cb, cr)
      sums(0) += r; sums(1) += g; sums(2) += b
      if (r > peaks(0)) peaks(0) = r
      if (g > peaks(1)) peaks(1) = g
      if (b > peaks(2)) peaks(2) = b
    }
    (sums, peaks)
  }

  /** Naive non-separable double IDCT — deliberately a DIFFERENT
    * implementation from the decoder's separable one. */
  private def naiveIdct(coef: Array[Double]): Array[Int] = {
    val out = new Array[Int](64)
    for (y <- 0 until 8; x <- 0 until 8) {
      var acc = 0.0
      for (v <- 0 until 8; u <- 0 until 8) {
        val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
        val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
        acc += cu * cv * coef(v * 8 + u) *
          math.cos((2 * x + 1) * u * math.Pi / 16) *
          math.cos((2 * y + 1) * v * math.Pi / 16)
      }
      val s = math.round(acc / 4.0).toInt + 128
      out(y * 8 + x) = math.max(0, math.min(255, s))
    }
    out
  }

  // ---- exact roundtrips ----------------------------------------------------

  test("gray roundtrip is bit-exact vs the planted formula, edge blocks clipped") {
    for ((w, h, seed) <- Seq((17, 9, 5L), (8, 8, 0L), (1, 1, 200L), (80, 60, 42L))) {
      val jpg = JpegCodec.encode(w, h, 1, seed)
      assert(jpg != null)
      val s = JpegCodec.pixelStatsRaw(jpg)
      assert(s != null, s"decode failed for ${w}x$h seed=$seed")
      val (sum, peak) = grayStats(w, h, seed)
      assert(s.toSeq === Seq(w.toLong, h.toLong, 1L, w.toLong * h,
        sum, 0L, 0L, peak, 0L, 0L))
    }
  }

  test("4:2:0 color roundtrip is bit-exact: upsample alignment + fixed-point RGB") {
    for ((w, h, seed) <- Seq((37, 21, 7L), (16, 16, 0L), (33, 17, 129L), (80, 60, 3L))) {
      val jpg = JpegCodec.encode(w, h, 3, seed)
      assert(jpg != null)
      val s = JpegCodec.pixelStatsRaw(jpg)
      assert(s != null, s"decode failed for ${w}x$h seed=$seed")
      val (sums, peaks) = colorStats(w, h, seed)
      assert(s.toSeq === Seq(w.toLong, h.toLong, 3L, w.toLong * h,
        sums(0), sums(1), sums(2), peaks(0), peaks(1), peaks(2)))
    }
  }

  test("header parse: dims, channels, and the sampling block arithmetic") {
    assert(JpegCodec.parseHeaderRaw(JpegCodec.encode(17, 9, 1, 5L)).toSeq ===
      Seq(17L, 9L, 1L, 3L * 2L)) // ceil(17/8)*ceil(9/8) = 3*2
    assert(JpegCodec.parseHeaderRaw(JpegCodec.encode(33, 17, 3, 5L)).toSeq ===
      Seq(33L, 17L, 3L, 6L * 3L * 2L)) // 6 * ceil(33/16)*ceil(17/16)
  }

  test("AC path: planted run/size coefficient decodes within the IDCT rounding envelope") {
    // every block gets quantized AC +1 at zig-zag 1 (natural (0,1)),
    // dequantized to 16 — a real non-constant block through the
    // Huffman run/size/extend path
    val seed = 11L
    val jpg = JpegCodec.encode(16, 16, 1, seed, acPlant = true)
    assert(jpg != null)
    val s = JpegCodec.pixelStatsRaw(jpg)
    assert(s != null)
    var sum = 0L
    var peak = 0L
    for (by <- 0 until 2; bx <- 0 until 2) {
      val v = JpegCodec.blockY(seed, bx, by)
      val coef = new Array[Double](64)
      coef(0) = 8.0 * (v - 128)
      coef(1) = 16.0 // AC (u=1, v=0) dequantized
      val px = naiveIdct(coef)
      sum += px.map(_.toLong).sum
      peak = math.max(peak, px.max.toLong)
    }
    // two INDEPENDENT IDCTs may differ by 1 at exact rounding ties —
    // the JPEG conformance envelope; sums bound by 1 per pixel
    assert(math.abs(s(4) - sum) <= 256L, s"sum ${s(4)} vs twin $sum")
    assert(math.abs(s(7) - peak) <= 1L)
    // and the block is genuinely non-constant: the AC basis is
    // zero-mean (sums are unchanged by construction) but the PEAK
    // rises by the basis amplitude (~+3), beyond the ±1 envelope
    val (_, constPeak) = grayStats(16, 16, seed)
    assert(s(7) > constPeak + 1)
  }

  test("restart markers (DRI/RSTn) are transparent to content and strictly sequenced") {
    // identical decoded stats with and without restarts, across
    // intervals that hit mid-row, per-MCU, and multi-row boundaries
    for ((w, h, ch) <- Seq((33, 17, 3), (40, 24, 1), (17, 9, 1));
         interval <- Seq(1, 2, 5)) {
      val plain = JpegCodec.pixelStatsRaw(JpegCodec.encode(w, h, ch, 77L))
      val rst = JpegCodec.pixelStatsRaw(
        JpegCodec.encode(w, h, ch, 77L, restartInterval = interval))
      assert(rst != null, s"${w}x$h ch=$ch dri=$interval failed to decode")
      assert(rst.toSeq === plain.toSeq,
        s"restarts must be content-transparent at ${w}x$h ch=$ch dri=$interval")
    }
    // header parse sees the same geometry through a DRI stream
    assert(JpegCodec.parseHeaderRaw(
      JpegCodec.encode(33, 17, 3, 5L, restartInterval = 2)).toSeq ===
      Seq(33L, 17L, 3L, 36L))
    // an out-of-sequence restart marker is CORRUPT, not resynced: find
    // the first RST0 (FF D0 after SOS) and bump its index
    val jpg = JpegCodec.encode(33, 17, 3, 5L, restartInterval = 1)
    var i = 2
    var sos = -1
    while (sos < 0 && i + 1 < jpg.length) {
      if ((jpg(i) & 0xFF) == 0xFF && (jpg(i + 1) & 0xFF) == 0xDA) sos = i
      i += 1
    }
    var patched = false
    i = sos
    while (!patched && i + 1 < jpg.length) {
      if ((jpg(i) & 0xFF) == 0xFF && (jpg(i + 1) & 0xFF) == 0xD0) {
        jpg(i + 1) = 0xD5.toByte; patched = true
      }
      i += 1
    }
    assert(patched)
    assert(JpegCodec.pixelStatsRaw(jpg) == null)
  }

  test("corruption envelope: null, never throw") {
    val good = JpegCodec.encode(24, 16, 3, 9L)
    // truncations at every boundary class
    for (cut <- Seq(0, 1, 2, 10, 40, good.length / 2, good.length - 3))
      assert(JpegCodec.pixelStatsRaw(java.util.Arrays.copyOf(good, cut)) == null)
    assert(JpegCodec.pixelStatsRaw(null) == null)
    assert(JpegCodec.pixelStatsRaw(Array.emptyByteArray) == null)
    // bad SOI
    val badSoi = good.clone(); badSoi(1) = 0x00
    assert(JpegCodec.pixelStatsRaw(badSoi) == null)
    // progressive SOF2 instead of SOF0
    val prog = good.clone()
    var i = 2
    var patched = false
    while (i + 1 < prog.length && !patched) {
      if ((prog(i) & 0xFF) == 0xFF && (prog(i + 1) & 0xFF) == 0xC0) {
        prog(i + 1) = 0xC2.toByte; patched = true
      }
      i += 1
    }
    assert(patched && JpegCodec.pixelStatsRaw(prog) == null)
    // EOI stripped: scan never terminates cleanly
    assert(JpegCodec.pixelStatsRaw(
      java.util.Arrays.copyOf(good, good.length - 2)) == null)
    // fuzz: random byte soup never throws
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 200) {
      val junk = Array.fill(rnd.nextInt(400))(rnd.nextInt(256).toByte)
      JpegCodec.pixelStatsRaw(junk) // must not throw
      JpegCodec.parseHeaderRaw(junk)
    }
  }

  test("bomb caps and invalid geometry refuse with null") {
    assert(JpegCodec.encode(0, 5, 1, 1L) == null)
    assert(JpegCodec.encode(5, -1, 3, 1L) == null)
    assert(JpegCodec.encode(5, 5, 2, 1L) == null) // unsupported channels
    assert(JpegCodec.encode(4096, 4096, 1, 1L) == null) // 16M > 2^22 cap
  }
}
