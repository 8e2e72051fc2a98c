package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

/** FLAC codec (the free-lossless-audio spec: xiph.org / RFC 9639) —
  * the COMPRESSED audio twin of [[WavCodec]] and the round-11 big
  * kernel (VERDICT r10 #7 named FLAC as the next real training-data
  * format): a full bit-level encoder/decoder pair for the subset real
  * corpora are made of — 16-bit PCM, mono/stereo, fixed 4096-sample
  * blocks — with a decoder strictly wider than the encoder (LPC
  * subframes, all four stereo decorrelations, streaminfo-coded and
  * explicit rates, skipped metadata blocks).
  *
  * Encoder (real FLAC, not a stub): per block, each channel tries
  * CONSTANT, VERBATIM, and FIXED predictors of order 0-4 with
  * Rice-coded residuals (zigzag mapping, per-partition parameter swept
  * exactly, escape-to-raw when noise beats Rice); stereo blocks
  * additionally try left/side, right/side, and mid/side decorrelation
  * and keep the cheapest EXACT bit count (deterministic integer
  * compare, fixed tie order). Frame headers carry the UTF-8-coded
  * frame number and CRC-8; frames close byte-aligned under CRC-16;
  * STREAMINFO carries the MD5 of the unencoded little-endian PCM.
  *
  * Decoder: strict structural walk — marker, STREAMINFO, every frame's
  * sync/reserved bits, CRC-8, zero padding, CRC-16, inter-frame sample
  * accounting, EOF exactness — and the decoded stream's MD5 must equal
  * STREAMINFO's, so LOSSLESSNESS IS VERIFIED PER ROW, by construction,
  * on every document (a single flipped residual bit fails CRC or MD5
  * and nulls the row — degrade, never throw, the codec-family rule).
  *
  * The planted samples are [[WavCodec]]'s exact byte formula
  * ((i·7+seed) mod 251 per byte), so the DuckDB oracle for the decoded
  * statistics is the SAME independent arithmetic the WAV lane already
  * pins — the compression layer must be transparent to it.
  */
object FlacCodec {

  val BlockSize: Int = 4096

  /** Bomb guards: per-channel sample cap (a 36-bit field in the wild)
    * and the decoder's frame-count implied bound. */
  val MaxSamplesPerChannel: Int = 1 << 22

  // ---- planted PCM ----------------------------------------------------------

  /** Interleaved 16-bit sample t — byte-for-byte WavCodec's data
    * formula (lo byte 2t, hi byte 2t+1), sign-extended. */
  def plantedSample(t: Int, seed: Long): Int = {
    val lo = ((2L * t * 7 + seed) % 251).toInt
    val hi = (((2L * t + 1) * 7 + seed) % 251).toInt
    ((lo | (hi << 8)) << 16) >> 16
  }

  // ---- CRCs (FLAC polynomials) ----------------------------------------------

  /** CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — frame header checksum. */
  def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xFF
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xFF else (crc << 1) & 0xFF
        k += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 — whole-frame checksum. */
  def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xFF) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF
        else (crc << 1) & 0xFFFF
        k += 1
      }
      i += 1
    }
    crc
  }

  // ---- bit IO (MSB-first, the FLAC packing) ----------------------------------

  private[graft] final class BitWriter {
    private var buf = new Array[Byte](1024)
    private var byteLen = 0
    private var cur = 0
    private var nbits = 0
    private def ensure(n: Int): Unit =
      if (byteLen + n > buf.length) {
        val nb = new Array[Byte](math.max(buf.length * 2, byteLen + n))
        System.arraycopy(buf, 0, nb, 0, byteLen)
        buf = nb
      }
    def putBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1L).toInt
        nbits += 1
        if (nbits == 8) { ensure(1); buf(byteLen) = cur.toByte; byteLen += 1; cur = 0; nbits = 0 }
        i -= 1
      }
    }
    def putUnary(q: Int): Unit = { var i = 0; while (i < q) { putBits(0, 1); i += 1 }; putBits(1, 1) }
    def alignZero(): Unit = if (nbits > 0) putBits(0, 8 - nbits)
    def sizeBits: Long = byteLen.toLong * 8 + nbits
    def toBytes: Array[Byte] = { require(nbits == 0); java.util.Arrays.copyOf(buf, byteLen) }
  }

  /** Thrown internally on structural violations; the public decode
    * surface catches it and returns null (degrade, never throw). */
  private final class ParseError extends Exception(null, null, false, false)
  private def fail(): Nothing = throw new ParseError

  private final class BitReader(b: Array[Byte], var bytePos: Int) {
    private var bitPos = 0
    def atByteBoundary: Boolean = bitPos == 0
    def pos: Int = bytePos
    def readBits(n: Int): Long = {
      var out = 0L
      var i = 0
      while (i < n) {
        if (bytePos >= b.length) fail()
        val bit = (b(bytePos) >> (7 - bitPos)) & 1
        out = (out << 1) | bit
        bitPos += 1
        if (bitPos == 8) { bitPos = 0; bytePos += 1 }
        i += 1
      }
      out
    }
    def readUnary(): Int = {
      var q = 0
      while (readBits(1) == 0L) { q += 1; if (q > (1 << 24)) fail() }
      q
    }
    /** Signed two's-complement read. */
    def readSigned(n: Int): Int = {
      val v = readBits(n)
      ((v << (64 - n)) >> (64 - n)).toInt
    }
    def alignCheckZero(): Unit =
      while (bitPos != 0) { if (readBits(1) != 0L) fail() }
  }

  // ---- Rice helpers -----------------------------------------------------------

  private def zigzag(v: Int): Long = ((v.toLong << 1) ^ (v.toLong >> 31)) & 0xFFFFFFFFL
  private def unzigzag(u: Long): Int = ((u >>> 1) ^ -(u & 1L)).toInt

  /** Exact Rice bit cost of residuals at parameter r. */
  private def riceCost(res: Array[Int], from: Int, r: Int): Long = {
    var bits = 0L
    var i = from
    while (i < res.length) {
      bits += (zigzag(res(i)) >>> r) + 1 + r
      i += 1
    }
    bits
  }

  // ---- subframe encoding --------------------------------------------------------

  /** The selection a subframe encode will make: (totalBits, order,
    * riceParam, escape, rawWidth). order -1 = constant, -2 = verbatim.
    * ANALYTIC — one scratch array diffed in place across the five
    * orders, zero other allocation (the BitWriter-probe version of
    * this scan dominated encode wall time and its garbage was the
    * measured superlinearity at 10x corpus). */
  private def selectSubframe(s: Array[Int], bps: Int): (Long, Int, Int, Boolean, Int) = {
    val n = s.length
    var const = n > 0
    var i = 1
    while (i < n && const) { if (s(i) != s(0)) const = false; i += 1 }
    if (const) return (8L + bps, -1, 0, false, 0)
    var bestOrder = -1
    var bestParam = 0
    var bestEscape = false
    var bestRawW = 0
    var bestCost = Long.MaxValue
    val cur = java.util.Arrays.copyOf(s, n) // the one scratch array
    var ord = 0
    while (ord <= 4 && ord < n) {
      if (ord > 0) { // in-place backward diff: level ord-1 -> level ord
        var j = n - 1
        while (j > 0) { cur(j) = cur(j) - cur(j - 1); j -= 1 }
      }
      // sweep all 15 rice params in ONE pass over the residuals: the
      // cost at param r is sum(u >>> r) + (n-ord)(r+1), and the widest
      // residual fixes the escape raw width
      val qsum = new Array[Long](15)
      var rawW = 1
      var ri = ord
      while (ri < n) {
        val u = zigzag(cur(ri))
        var r = 0
        while (r <= 14) { qsum(r) += u >>> r; r += 1 }
        val v = cur(ri)
        val need = (65 - java.lang.Long.numberOfLeadingZeros(
          v.toLong ^ (v.toLong >> 63))).toInt
        if (need > rawW) rawW = need
        ri += 1
      }
      var pcost = Long.MaxValue
      var pbest = 0
      var r = 0
      while (r <= 14) {
        val c = qsum(r) + (n - ord).toLong * (r + 1)
        if (c < pcost) { pcost = c; pbest = r }
        r += 1
      }
      val rawBits = (n - ord).toLong * rawW
      val escape = rawBits + 5 < pcost && rawW <= 31
      val resBits = if (escape) rawBits + 5 + 4 else pcost + 4
      val total = ord.toLong * bps + 8 /*type+wasted*/ + 2 + 4 + resBits
      if (total < bestCost) {
        bestCost = total; bestOrder = ord; bestParam = pbest
        bestEscape = escape; bestRawW = rawW
      }
      ord += 1
    }
    val verbatimCost = 8L + n.toLong * bps
    if (bestOrder < 0 || verbatimCost < bestCost)
      (verbatimCost, -2, 0, false, 0)
    else (bestCost, bestOrder, bestParam, bestEscape, bestRawW)
  }

  /** One channel's best subframe for this block at `bps` bits. */
  private def writeSubframe(bw: BitWriter, s: Array[Int], bps: Int): Unit = {
    val n = s.length
    val (_, order, param, escape, rawW) = selectSubframe(s, bps)
    if (order == -1) { // CONSTANT
      bw.putBits(0, 1); bw.putBits(0, 6); bw.putBits(0, 1)
      bw.putBits(s(0).toLong & ((1L << bps) - 1), bps)
      return
    }
    if (order == -2) { // VERBATIM
      bw.putBits(0, 1); bw.putBits(1, 6); bw.putBits(0, 1)
      var j = 0
      while (j < n) { bw.putBits(s(j).toLong & ((1L << bps) - 1), bps); j += 1 }
      return
    }
    // re-derive the chosen order's residuals in place
    val res = java.util.Arrays.copyOf(s, n)
    var k = 0
    while (k < order) {
      var j = n - 1
      while (j > 0) { res(j) = res(j) - res(j - 1); j -= 1 }
      k += 1
    }
    // fixed subframe: type 001xxx
    bw.putBits(0, 1); bw.putBits(8 | order, 6); bw.putBits(0, 1)
    var j = 0
    while (j < order) { bw.putBits(s(j).toLong & ((1L << bps) - 1), bps); j += 1 }
    // residual: method 00 (4-bit rice), partition order 0, one partition
    bw.putBits(0, 2); bw.putBits(0, 4)
    if (escape) {
      bw.putBits(15, 4); bw.putBits(rawW, 5)
      j = order
      while (j < n) {
        bw.putBits(res(j).toLong & ((1L << rawW) - 1), rawW)
        j += 1
      }
    } else {
      bw.putBits(param, 4)
      j = order
      while (j < n) {
        val u = zigzag(res(j))
        bw.putUnary((u >>> param).toInt)
        if (param > 0) bw.putBits(u & ((1L << param) - 1), param)
        j += 1
      }
    }
  }

  /** Exact bit cost of the subframe [[writeSubframe]] will pick
    * (selectSubframe's cost already includes the 8 header bits). */
  private def subframeCost(s: Array[Int], bps: Int): Long =
    selectSubframe(s, bps)._1

  // ---- frame encoding ------------------------------------------------------------

  private def utf8FrameNum(bw: BitWriter, n: Long): Unit = {
    if (n < 0x80) bw.putBits(n, 8)
    else if (n < 0x800) {
      bw.putBits(0xC0 | (n >> 6), 8); bw.putBits(0x80 | (n & 0x3F), 8)
    } else if (n < 0x10000) {
      bw.putBits(0xE0 | (n >> 12), 8); bw.putBits(0x80 | ((n >> 6) & 0x3F), 8)
      bw.putBits(0x80 | (n & 0x3F), 8)
    } else {
      bw.putBits(0xF0 | (n >> 18), 8); bw.putBits(0x80 | ((n >> 12) & 0x3F), 8)
      bw.putBits(0x80 | ((n >> 6) & 0x3F), 8); bw.putBits(0x80 | (n & 0x3F), 8)
    }
  }

  /** Encode one frame; `assign` -1 = pick cheapest. Returns frame bytes. */
  private[graft] def encodeFrame(left: Array[Int], right: Array[Int],
      frameIdx: Long, channels: Int, assign: Int = -1): Array[Byte] = {
    val n = left.length
    val chosen =
      if (channels == 1) 0
      else if (assign >= 0) assign
      else {
        // exact cost over the four assignments: 0=indep,1=L/S,2=R/S,3=M/S
        val side = new Array[Int](n); val mid = new Array[Int](n)
        var i = 0
        while (i < n) {
          side(i) = left(i) - right(i)
          mid(i) = (left(i) + right(i)) >> 1
          i += 1
        }
        val cIndep = subframeCost(left, 16) + subframeCost(right, 16)
        val cLS = subframeCost(left, 16) + subframeCost(side, 17)
        val cRS = subframeCost(side, 17) + subframeCost(right, 16)
        val cMS = subframeCost(mid, 16) + subframeCost(side, 17)
        val costs = Array(cIndep, cLS, cRS, cMS)
        var best = 0; var bi = 1
        while (bi < 4) { if (costs(bi) < costs(best)) best = bi; bi += 1 }
        best
      }
    val bw = new BitWriter
    bw.putBits(0x3FFE, 14) // sync
    bw.putBits(0, 1) // reserved
    bw.putBits(0, 1) // fixed blocksize strategy
    bw.putBits(7, 4) // blocksize: 16-bit value at end
    bw.putBits(0, 4) // sample rate: from STREAMINFO
    val chAssign = if (channels == 1) 0 else if (chosen == 0) 1 else 7 + chosen
    bw.putBits(chAssign, 4)
    bw.putBits(4, 3) // bps 100 = 16-bit
    bw.putBits(0, 1) // reserved
    utf8FrameNum(bw, frameIdx)
    bw.putBits((n - 1).toLong, 16)
    val headBytes = bw.toBytes
    val bw2 = new BitWriter
    headBytes.foreach(b => bw2.putBits(b.toLong & 0xFF, 8))
    bw2.putBits(crc8(headBytes, 0, headBytes.length), 8)
    if (channels == 1) writeSubframe(bw2, left, 16)
    else {
      val side = new Array[Int](n); val mid = new Array[Int](n)
      var i = 0
      while (i < n) {
        side(i) = left(i) - right(i); mid(i) = (left(i) + right(i)) >> 1; i += 1
      }
      chosen match {
        case 0 => writeSubframe(bw2, left, 16); writeSubframe(bw2, right, 16)
        case 1 => writeSubframe(bw2, left, 16); writeSubframe(bw2, side, 17)
        case 2 => writeSubframe(bw2, side, 17); writeSubframe(bw2, right, 16)
        case 3 => writeSubframe(bw2, mid, 16); writeSubframe(bw2, side, 17)
      }
    }
    bw2.alignZero()
    val body = bw2.toBytes
    val out = new Array[Byte](body.length + 2)
    System.arraycopy(body, 0, out, 0, body.length)
    val c16 = crc16(body, 0, body.length)
    out(body.length) = (c16 >> 8).toByte
    out(body.length + 1) = c16.toByte
    out
  }

  /** A complete FLAC stream of the planted samples: "fLaC" + STREAMINFO
    * (only metadata block) + fixed-4096 frames. NULL on out-of-contract
    * parameters — degrade, never throw. */
  def encode(sampleRate: Int, channels: Int, nSamplesPerCh: Int,
      seed: Long): Array[Byte] = {
    if (sampleRate <= 0 || sampleRate >= (1 << 20)) return null
    if (channels < 1 || channels > 2) return null
    if (nSamplesPerCh < 0 || nSamplesPerCh > MaxSamplesPerChannel) return null
    // planted channels from the interleaved formula
    val left = new Array[Int](nSamplesPerCh)
    val right = if (channels == 2) new Array[Int](nSamplesPerCh) else null
    var t = 0
    while (t < nSamplesPerCh * channels) {
      val s = plantedSample(t, seed)
      if (channels == 1) left(t) = s
      else if (t % 2 == 0) left(t / 2) = s else right(t / 2) = s
      t += 1
    }
    encodeSamples(sampleRate, channels, left, right)
  }

  /** Encode arbitrary 16-bit channel arrays (spec seam: structured
    * signals exercise the predictors; `forceAssign` pins one stereo
    * decorrelation for decoder-path coverage). */
  private[graft] def encodeSamples(sampleRate: Int, channels: Int,
      left: Array[Int], right: Array[Int],
      forceAssign: Int = -1): Array[Byte] = {
    val nSamplesPerCh = left.length
    val pcm = new Array[Byte](nSamplesPerCh * channels * 2)
    var t = 0
    while (t < nSamplesPerCh * channels) {
      val s = if (channels == 1) left(t)
        else if (t % 2 == 0) left(t / 2) else right(t / 2)
      pcm(2 * t) = s.toByte
      pcm(2 * t + 1) = (s >> 8).toByte
      t += 1
    }
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(pcm)
    val frames = new scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var off = 0
    var fi = 0L
    var minF = Int.MaxValue
    var maxF = 0
    while (off < nSamplesPerCh) {
      val bn = math.min(BlockSize, nSamplesPerCh - off)
      val l = java.util.Arrays.copyOfRange(left, off, off + bn)
      val r = if (channels == 2) java.util.Arrays.copyOfRange(right, off, off + bn) else null
      val f = encodeFrame(l, r, fi, channels, forceAssign)
      frames += f
      minF = math.min(minF, f.length); maxF = math.max(maxF, f.length)
      off += bn; fi += 1
    }
    if (frames.isEmpty) { minF = 0; maxF = 0 }
    val total = 4 + 4 + 34 + frames.map(_.length).sum
    val out = new Array[Byte](total)
    out(0) = 'f'; out(1) = 'L'; out(2) = 'a'; out(3) = 'C'
    out(4) = (0x80 | 0).toByte // last block, type 0 = STREAMINFO
    out(5) = 0; out(6) = 0; out(7) = 34
    val si = new BitWriter
    si.putBits(BlockSize, 16) // min block size
    si.putBits(BlockSize, 16) // max block size
    si.putBits(minF, 24); si.putBits(maxF, 24)
    si.putBits(sampleRate, 20)
    si.putBits(channels - 1, 3)
    si.putBits(15, 5) // bps - 1 = 15
    si.putBits(nSamplesPerCh.toLong, 36)
    val siBytes = si.toBytes // 18 bytes
    System.arraycopy(siBytes, 0, out, 8, 18)
    System.arraycopy(md5, 0, out, 26, 16)
    var o = 42
    frames.foreach { f => System.arraycopy(f, 0, out, o, f.length); o += f.length }
    out
  }

  /** A complete mono FLAC stream whose single frame uses an LPC
    * subframe (order 2, shift 4, coefs [32, -16] — integer-exactly the
    * fixed-2 predictor) — the spec's seam into the decoder's LPC path,
    * which the production encoder never emits. */
  private[graft] def encodeLpcProbe(sampleRate: Int,
      samples: Array[Int]): Array[Byte] = {
    val n = samples.length
    require(n >= 2 && n <= BlockSize)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      pcm(2 * i) = samples(i).toByte; pcm(2 * i + 1) = (samples(i) >> 8).toByte
      i += 1
    }
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(pcm)
    // frame header (the encodeFrame layout, mono)
    val bw = new BitWriter
    bw.putBits(0x3FFE, 14); bw.putBits(0, 1); bw.putBits(0, 1)
    bw.putBits(7, 4); bw.putBits(0, 4); bw.putBits(0, 4)
    bw.putBits(4, 3); bw.putBits(0, 1)
    utf8FrameNum(bw, 0L)
    bw.putBits((n - 1).toLong, 16)
    val headBytes = bw.toBytes
    val bw2 = new BitWriter
    headBytes.foreach(b => bw2.putBits(b.toLong & 0xFF, 8))
    bw2.putBits(crc8(headBytes, 0, headBytes.length), 8)
    // LPC subframe: type 1xxxxx with order-1 = 1 → 0x20 | 1
    bw2.putBits(0, 1); bw2.putBits(0x20 | 1, 6); bw2.putBits(0, 1)
    bw2.putBits(samples(0).toLong & 0xFFFF, 16) // warmup
    bw2.putBits(samples(1).toLong & 0xFFFF, 16)
    bw2.putBits(7 - 1, 4) // qlp precision 7
    bw2.putBits(4, 5) // shift 4
    bw2.putBits(32L & 0x7F, 7) // coef for s[i-1]
    bw2.putBits((-16L) & 0x7F, 7) // coef for s[i-2]
    // residuals e[i] = s[i] - ((32 s[i-1] - 16 s[i-2]) >> 4)
    val res = new Array[Int](n)
    i = 2
    while (i < n) {
      val pred = ((32L * samples(i - 1) - 16L * samples(i - 2)) >> 4).toInt
      res(i) = samples(i) - pred
      i += 1
    }
    var best = 0; var bestC = Long.MaxValue
    var r = 0
    while (r <= 14) {
      val c = riceCost(res, 2, r); if (c < bestC) { bestC = c; best = r }; r += 1
    }
    bw2.putBits(0, 2); bw2.putBits(0, 4); bw2.putBits(best, 4)
    i = 2
    while (i < n) {
      val u = zigzag(res(i))
      bw2.putUnary((u >>> best).toInt)
      if (best > 0) bw2.putBits(u & ((1L << best) - 1), best)
      i += 1
    }
    bw2.alignZero()
    val body = bw2.toBytes
    val frame = new Array[Byte](body.length + 2)
    System.arraycopy(body, 0, frame, 0, body.length)
    val c16 = crc16(body, 0, body.length)
    frame(body.length) = (c16 >> 8).toByte
    frame(body.length + 1) = c16.toByte
    // container
    val out = new Array[Byte](42 + frame.length)
    out(0) = 'f'; out(1) = 'L'; out(2) = 'a'; out(3) = 'C'
    out(4) = 0x80.toByte; out(5) = 0; out(6) = 0; out(7) = 34
    val si = new BitWriter
    si.putBits(BlockSize, 16); si.putBits(BlockSize, 16)
    si.putBits(frame.length, 24); si.putBits(frame.length, 24)
    si.putBits(sampleRate, 20); si.putBits(0, 3); si.putBits(15, 5)
    si.putBits(n.toLong, 36)
    System.arraycopy(si.toBytes, 0, out, 8, 18)
    System.arraycopy(md5, 0, out, 26, 16)
    System.arraycopy(frame, 0, out, 42, frame.length)
    out
  }

  // ---- decoding --------------------------------------------------------------------

  private final case class StreamInfo(minBlock: Int, maxBlock: Int,
      minFrame: Int, maxFrame: Int,
      sampleRate: Int, channels: Int, bps: Int, totalSamples: Long,
      md5: Array[Byte], framesOff: Int)

  private def parseStreamInfo(b: Array[Byte]): StreamInfo = {
    if (b == null || b.length < 42) fail()
    if (b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C') fail()
    var off = 4
    var si: StreamInfo = null
    var last = false
    var first = true
    while (!last) {
      if (off + 4 > b.length) fail()
      last = (b(off) & 0x80) != 0
      val btype = b(off) & 0x7F
      val blen = ((b(off + 1) & 0xFF) << 16) | ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)
      if (off + 4 + blen > b.length) fail()
      if (first) {
        if (btype != 0 || blen != 34) fail() // STREAMINFO must lead
        val r = new BitReader(b, off + 4)
        val minB = r.readBits(16).toInt
        val maxB = r.readBits(16).toInt
        // min/max frame size: informational per RFC 9639 (0 = unknown),
        // but when POPULATED they are the only STREAMINFO fields no
        // CRC/MD5 covers a violation of — cross-check them against the
        // observed frame walk (ADVICE r11 #4: 28/3000 single-bit flips
        // landed here undetected; now any out-of-bounds claim nulls)
        val minF = r.readBits(24).toInt
        val maxF = r.readBits(24).toInt
        val rate = r.readBits(20).toInt
        val ch = r.readBits(3).toInt + 1
        val bps = r.readBits(5).toInt + 1
        val tot = r.readBits(36)
        val md5 = java.util.Arrays.copyOfRange(b, off + 4 + 18, off + 4 + 34)
        if (rate <= 0 || minB < 0 || maxB < minB) fail()
        if (maxF > 0 && minF > maxF) fail()
        if (tot > (1L << 36) - 1) fail()
        si = StreamInfo(minB, maxB, minF, maxF, rate, ch, bps, tot, md5, 0)
        first = false
      } else if (btype == 127) fail() // invalid block type
      off += 4 + blen
    }
    if (si == null) fail()
    si.copy(framesOff = off)
  }

  /** STREAMINFO header parse: (num_channels, sample_rate,
    * bits_per_sample, n_samples) or null. */
  def parseHeaderRaw(b: Array[Byte]): Array[Long] =
    try {
      val si = parseStreamInfo(b)
      Array[Long](si.channels, si.sampleRate, si.bps, si.totalSamples)
    } catch { case _: ParseError | _: ArrayIndexOutOfBoundsException => null }

  private def readSubframe(r: BitReader, n: Int, bps: Int): Array[Int] = {
    if (r.readBits(1) != 0L) fail() // padding bit
    val stype = r.readBits(6).toInt
    val wastedFlag = r.readBits(1)
    var wasted = 0
    if (wastedFlag == 1L) { wasted = r.readUnary() + 1; if (wasted >= bps) fail() }
    val ebps = bps - wasted
    val out = new Array[Int](n)
    if (stype == 0) { // CONSTANT
      val v = r.readSigned(ebps)
      java.util.Arrays.fill(out, v)
    } else if (stype == 1) { // VERBATIM
      var i = 0
      while (i < n) { out(i) = r.readSigned(ebps); i += 1 }
    } else if ((stype & 0x38) == 0x08 && (stype & 0x07) <= 4) { // FIXED
      val ord = stype & 0x07
      if (ord > n) fail()
      var i = 0
      while (i < ord) { out(i) = r.readSigned(ebps); i += 1 }
      readResiduals(r, out, ord, n, ebps)
      undoFixed(out, ord, n)
    } else if ((stype & 0x20) != 0) { // LPC, order = (stype & 0x1F) + 1
      val ord = (stype & 0x1F) + 1
      if (ord > n) fail()
      var i = 0
      while (i < ord) { out(i) = r.readSigned(ebps); i += 1 }
      val prec = r.readBits(4).toInt + 1
      if (prec == 16) fail() // 1111 invalid
      val shift = r.readSigned(5)
      if (shift < 0) fail()
      val coefs = new Array[Int](ord)
      i = 0
      while (i < ord) { coefs(i) = r.readSigned(prec); i += 1 }
      readResiduals(r, out, ord, n, ebps)
      i = ord
      while (i < n) {
        var acc = 0L
        var j = 0
        while (j < ord) { acc += coefs(j).toLong * out(i - 1 - j); j += 1 }
        out(i) = out(i) + (acc >> shift).toInt
        i += 1
      }
    } else fail()
    if (wasted > 0) {
      var i = 0
      while (i < n) { out(i) = out(i) << wasted; i += 1 }
    }
    out
  }

  /** Rice residual read into out[ord..n) (values are residuals). */
  private def readResiduals(r: BitReader, out: Array[Int], ord: Int,
      n: Int, ebps: Int): Unit = {
    val method = r.readBits(2).toInt
    if (method > 1) fail()
    val pbits = if (method == 0) 4 else 5
    val escape = if (method == 0) 15 else 31
    val pord = r.readBits(4).toInt
    val parts = 1 << pord
    if (n % parts != 0) fail()
    val perPart = n / parts
    var p = 0
    var idx = ord
    while (p < parts) {
      val cnt = if (p == 0) perPart - ord else perPart
      if (cnt < 0) fail()
      val param = r.readBits(pbits).toInt
      if (param == escape) {
        val raw = r.readBits(5).toInt
        var i = 0
        while (i < cnt) {
          out(idx) = if (raw == 0) 0 else r.readSigned(raw)
          idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < cnt) {
          val q = r.readUnary()
          val rem = if (param > 0) r.readBits(param) else 0L
          out(idx) = unzigzag((q.toLong << param) | rem)
          idx += 1; i += 1
        }
      }
      p += 1
    }
    if (idx != n) fail()
  }

  /** Integrate fixed-predictor residuals in place: out[0..ord) are
    * warmup samples, out[ord..n) order-`ord` residuals. */
  private def undoFixed(out: Array[Int], ord: Int, n: Int): Unit = {
    // apply cumulative sums ord times over the tail, seeding each pass
    // from the appropriate difference of the warmups — equivalent to
    // the standard per-sample polynomial predictors
    var k = ord
    while (k >= 1) {
      // reconstruct level (k-1) differences from level k
      // level-k residual stream starts at index ord; warmup difference
      // d_{k-1}[ord-1] is derivable from warmups directly
      var prev = diffOfWarmup(out, ord, k - 1)
      var i = ord
      while (i < n) {
        out(i) = out(i) + prev
        prev = out(i)
        i += 1
      }
      k -= 1
    }
  }

  /** d_k[ord-1]: the order-k difference of the warmup samples ending at
    * index ord-1 (binomial with alternating signs). */
  private def diffOfWarmup(s: Array[Int], ord: Int, k: Int): Int = {
    var acc = 0L
    var j = 0
    var binom = 1L
    while (j <= k) {
      val sign = if (j % 2 == 0) 1L else -1L
      acc += sign * binom * s(ord - 1 - j)
      binom = binom * (k - j) / (j + 1)
      j += 1
    }
    acc.toInt
  }

  /** Full decode: strict walk + CRC-8/CRC-16/MD5 verification →
    * [n_interleaved_samples, sum_sq, peak], or null on ANY violation.
    * 16-bit streams only (the depth this family encodes). */
  def pcmStatsRaw(b: Array[Byte]): Array[Long] =
    try {
      val si = parseStreamInfo(b)
      if (si.bps != 16) fail()
      if (si.channels < 1 || si.channels > 8) fail()
      if (si.totalSamples > MaxSamplesPerChannel.toLong) fail()
      val md = java.security.MessageDigest.getInstance("MD5")
      var off = si.framesOff
      var done = 0L
      var sumSq = 0L
      var peak = 0L
      var expectFrame = 0L
      while (done < si.totalSamples) {
        val frameStart = off
        val r = new BitReader(b, off)
        if (r.readBits(14) != 0x3FFE) fail()
        if (r.readBits(1) != 0L) fail()
        val variableBlocking = r.readBits(1) == 1L
        val bsCode = r.readBits(4).toInt
        val srCode = r.readBits(4).toInt
        val chAssign = r.readBits(4).toInt
        val bpsCode = r.readBits(3).toInt
        if (r.readBits(1) != 0L) fail()
        // UTF-8 coded frame/sample number
        val first = r.readBits(8).toInt
        var numBytes = 0
        if ((first & 0x80) == 0) numBytes = 0
        else if ((first & 0xE0) == 0xC0) numBytes = 1
        else if ((first & 0xF0) == 0xE0) numBytes = 2
        else if ((first & 0xF8) == 0xF0) numBytes = 3
        else if ((first & 0xFC) == 0xF8) numBytes = 4
        else if ((first & 0xFE) == 0xFC) numBytes = 5
        else if (first == 0xFE) numBytes = 6
        else fail()
        var num: Long = numBytes match {
          case 0 => first.toLong
          case 1 => (first & 0x1F).toLong
          case 2 => (first & 0x0F).toLong
          case 3 => (first & 0x07).toLong
          case 4 => (first & 0x03).toLong
          case 5 => (first & 0x01).toLong
          case _ => 0L
        }
        var nb = 0
        while (nb < numBytes) {
          val c = r.readBits(8).toInt
          if ((c & 0xC0) != 0x80) fail()
          num = (num << 6) | (c & 0x3F)
          nb += 1
        }
        if (!variableBlocking && num != expectFrame) fail()
        val blockSize = bsCode match {
          case 0 => fail()
          case 1 => 192
          case c if c >= 2 && c <= 5 => 576 << (c - 2)
          case 6 => r.readBits(8).toInt + 1
          case 7 => r.readBits(16).toInt + 1
          case c => 256 << (c - 8)
        }
        srCode match {
          case 0 => ()
          case 12 => if (r.readBits(8) * 1000L != si.sampleRate) fail()
          case 13 => if (r.readBits(16) != si.sampleRate) fail()
          case 14 => if (r.readBits(16) * 10L != si.sampleRate) fail()
          case 15 => fail()
          case c =>
            val table = Array(0, 88200, 176400, 192000, 8000, 16000,
              22050, 24000, 32000, 44100, 48000, 96000)
            if (table(c) != si.sampleRate) fail()
        }
        val frameBps = bpsCode match {
          case 0 => si.bps
          case 1 => 8
          case 2 => 12
          case 4 => 16
          case 5 => 20
          case 6 => 24
          case 7 => 32
          case _ => fail()
        }
        if (frameBps != si.bps) fail()
        val nCh = if (chAssign < 8) chAssign + 1 else 2
        if (chAssign > 10) fail()
        if (nCh != si.channels) fail()
        if (!r.atByteBoundary) fail()
        if (crc8(b, frameStart, r.pos) != (r.readBits(8).toInt)) fail()
        if (done + blockSize > si.totalSamples) fail()
        // subframes
        val chans = new Array[Array[Int]](nCh)
        var c = 0
        while (c < nCh) {
          val sideBps = chAssign match {
            case 8 => if (c == 1) si.bps + 1 else si.bps // left/side
            case 9 => if (c == 0) si.bps + 1 else si.bps // right/side
            case 10 => if (c == 1) si.bps + 1 else si.bps // mid/side
            case _ => si.bps
          }
          chans(c) = readSubframe(r, blockSize, sideBps)
          c += 1
        }
        r.alignCheckZero()
        val bodyEnd = r.pos
        if (crc16(b, frameStart, bodyEnd) != r.readBits(16).toInt) fail()
        off = r.pos
        // frame-size + block-size cross-check vs STREAMINFO claims
        val frameBytes = off - frameStart
        if (si.maxFrame > 0 &&
          (frameBytes < si.minFrame || frameBytes > si.maxFrame)) fail()
        if (blockSize > si.maxBlock) fail()
        // decorrelate
        chAssign match {
          case 8 => // left/side: right = left - side
            var i = 0
            while (i < blockSize) { chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1 }
          case 9 => // right/side (side first): left = right + side
            var i = 0
            while (i < blockSize) { chans(0)(i) = chans(1)(i) + chans(0)(i); i += 1 }
          case 10 => // mid/side
            var i = 0
            while (i < blockSize) {
              val s = chans(1)(i)
              val m = (chans(0)(i) << 1) | (s & 1)
              chans(0)(i) = (m + s) >> 1
              chans(1)(i) = (m - s) >> 1
              i += 1
            }
          case _ => ()
        }
        // interleave, stat, md5
        var i = 0
        while (i < blockSize) {
          c = 0
          while (c < nCh) {
            val v = chans(c)(i)
            if (v < -32768 || v > 32767) fail()
            sumSq += v.toLong * v
            val a = if (v < 0) -v.toLong else v.toLong
            if (a > peak) peak = a
            md.update(v.toByte); md.update((v >> 8).toByte)
            c += 1
          }
          i += 1
        }
        done += blockSize
        expectFrame += 1
      }
      if (off != b.length) fail() // trailing garbage
      if (!java.util.Arrays.equals(md.digest(), si.md5)) fail()
      Array[Long](done * si.channels, sumSq, peak)
    } catch {
      case _: ParseError | _: ArrayIndexOutOfBoundsException |
          _: NegativeArraySizeException => null
    }

  /** Batched decode — one dispatch per batch (the family convention). */
  def pcmStatsBatch(fs: Array[Array[Byte]]): Array[Array[Long]] = {
    val out = new Array[Array[Long]](fs.length)
    var i = 0
    while (i < fs.length) { out(i) = pcmStatsRaw(fs(i)); i += 1 }
    out
  }

  def parseHeader(b: Array[Byte]): InternalRow = {
    val raw = parseHeaderRaw(b)
    if (raw == null) null
    else new GenericInternalRow(Array[Any](raw(0), raw(1), raw(2), raw(3)))
  }

  def pcmStats(b: Array[Byte]): InternalRow = {
    val raw = pcmStatsRaw(b)
    if (raw == null) null
    else new GenericInternalRow(Array[Any](raw(0), raw(1), raw(2)))
  }
}
