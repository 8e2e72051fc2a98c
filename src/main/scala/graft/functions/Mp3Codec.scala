package graft.functions

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** MP3 container codec (VERDICT r12 #8, modality 10): ID3v2.3 tag +
  * MPEG-1 Layer III frame-header walk — the ingest surface an audio
  * crawl needs (validate, measure, dedup-key) written from the public
  * MPEG-1 (ISO 11172-3) header layout and the ID3v2.3 informal spec.
  * Honest scope, whole-at-that-scope: this parses and validates the
  * CONTAINER exactly (sync, version/layer bits, bitrate/samplerate
  * tables, frame-size arithmetic, Xing/VBR detection, ID3 text
  * frames) and walks every byte; it does NOT synthesize PCM (the
  * hybrid filterbank) — audio SAMPLE work stays on the WAV/FLAC
  * lanes, which decode to PCM for real.
  *
  * Encode layout (deterministic from (seed, nFrames) — the planted
  * arithmetic the DuckDB oracles replay):
  *   - ID3v2.3: "ID3" 03 00, flags 0, syncsafe size; one TIT2 frame
  *     (ISO-8859-1) holding "doc<seed>".
  *   - nFrames MPEG-1 Layer III frames, padding 0 (seed%5 == 2 docs
  *     use the CRC-PROTECTED form: prot bit 0 + the ISO 11172-3
  *     CRC-16 (poly 0x8005, init 0xFFFF) over header bytes 2-3 and
  *     the side info region, payload shifted 2 bytes):
  *     sample rate from seed%3 in {44100, 48000, 32000}; channels
  *     mono when seed%7 < 3, else stereo; CBR when seed%2 == 0 at
  *     kbps {128,160,192,224}[seed%4], else VBR cycling frame i over
  *     kbps {112,160,224}[i%3] with a Xing block in frame 0 at the
  *     side-info offset (17 bytes mono / 32 stereo, MPEG-1).
  *   - frame size = 144000 * kbps / rate (Layer III, padding 0);
  *     payload byte j of frame i = (seed*31 + i*7 + j*3) mod 256.
  */
object Mp3Codec {

  /** MPEG-1 Layer III bitrate table (kbps), index 1-14. */
  private val V1L3Kbps = Array(0, 32, 40, 48, 56, 64, 80, 96, 112,
    128, 160, 192, 224, 256, 320)
  /** MPEG-1 sample rates by 2-bit index. */
  private val V1Rates = Array(44100, 48000, 32000, -1)

  private val CbrKbps = Array(128, 160, 192, 224)
  private val VbrKbps = Array(112, 160, 224)

  private def kbpsToIndex(kbps: Int): Int = {
    var i = 1
    while (i < V1L3Kbps.length && V1L3Kbps(i) != kbps) i += 1
    i
  }

  /** ISO 11172-3 frame CRC-16: polynomial 0x8005, init 0xFFFF,
    * MSB-first (non-reflected), over header bytes 2-3 and the side
    * info region. */
  private def crc16Update(crc0: Int, b: Int): Int = {
    var crc = (crc0 ^ ((b & 0xFF) << 8)) & 0xFFFF
    var k = 0
    while (k < 8) {
      crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF
      else (crc << 1) & 0xFFFF
      k += 1
    }
    crc
  }

  /** CRC over frame at `p`: bytes p+2, p+3, then the side info at
    * p+6 .. p+6+si-1 (the 2 CRC bytes themselves are excluded). */
  private def frameCrc(b: Array[Byte], p: Int, si: Int): Int = {
    var crc = crc16Update(crc16Update(0xFFFF, b(p + 2)), b(p + 3))
    var i = 0
    while (i < si) { crc = crc16Update(crc, b(p + 6 + i)); i += 1 }
    crc
  }

  private def sideInfoLen(mono: Boolean): Int = if (mono) 17 else 32

  private def frameSize(kbps: Int, rate: Int): Int =
    144000 * kbps / rate

  /** Deterministic stream; null on out-of-range parameters. */
  def encode(seed: Long, nFrames: Int): Array[Byte] = {
    if (nFrames <= 0 || nFrames > (1 << 16) || seed < 0) return null
    val rate = V1Rates((seed % 3).toInt)
    val rateIdx = (seed % 3).toInt
    val mono = seed % 7 < 3
    val vbr = seed % 2 == 1
    val cbrKbps = CbrKbps((seed % 4).toInt)
    val title = "doc" + seed
    val titleB = title.getBytes("ISO-8859-1")
    // ---- ID3v2.3 ----
    val tagBody = 10 + 1 + titleB.length // TIT2 header + encoding + text
    val out = new java.io.ByteArrayOutputStream(256)
    out.write('I'); out.write('D'); out.write('3')
    out.write(3); out.write(0); out.write(0) // v2.3.0, flags 0
    // syncsafe size (7 bits per byte)
    out.write((tagBody >>> 21) & 0x7F); out.write((tagBody >>> 14) & 0x7F)
    out.write((tagBody >>> 7) & 0x7F); out.write(tagBody & 0x7F)
    out.write('T'); out.write('I'); out.write('T'); out.write('2')
    val fsz = 1 + titleB.length // v2.3: plain u32be frame size
    out.write((fsz >>> 24) & 0xFF); out.write((fsz >>> 16) & 0xFF)
    out.write((fsz >>> 8) & 0xFF); out.write(fsz & 0xFF)
    out.write(0); out.write(0) // frame flags
    out.write(0) // text encoding: ISO-8859-1
    out.write(titleB, 0, titleB.length)
    // ---- frames ----
    // seed%5 == 2 docs carry the CRC-PROTECTED form (prot bit 0): a
    // 2-byte ISO 11172-3 CRC-16 sits right after the header, covering
    // header bytes 2-3 + the side info region; the planted payload
    // starts 2 bytes later
    val prot = seed % 5 == 2
    var i = 0
    while (i < nFrames) {
      val kbps = if (vbr) VbrKbps(i % 3) else cbrKbps
      val size = frameSize(kbps, rate)
      val frame = new Array[Byte](size)
      frame(0) = 0xFF.toByte
      // 111 | version 11 (MPEG1) | layer 01 (III) | prot (1 = no CRC)
      frame(1) = (if (prot) 0xFA else 0xFB).toByte
      // bitrateIdx(4) | rateIdx(2) | padding 0 | private 0
      frame(2) = ((kbpsToIndex(kbps) << 4) | (rateIdx << 2)).toByte
      // channel mode (mono 11 / stereo 00) | modeExt 00 | (c)0 orig 1 emph 00
      frame(3) = (((if (mono) 3 else 0) << 6) | 0x04).toByte
      val dataOff = if (prot) 6 else 4
      var j = 0
      val pay = size - dataOff
      while (j < pay) {
        frame(dataOff + j) = ((seed * 31 + i * 7 + j * 3) % 256).toByte
        j += 1
      }
      if (prot) {
        // side info (bytes dataOff..dataOff+si-1) is planted above and
        // sits entirely BEFORE the Xing region, so compute order is
        // irrelevant
        val c = frameCrc(frame, 0, sideInfoLen(mono))
        frame(4) = ((c >>> 8) & 0xFF).toByte
        frame(5) = (c & 0xFF).toByte
      }
      if (vbr && i == 0) {
        // Xing block at the MPEG-1 side-info offset (after the CRC
        // when present)
        val off = dataOff + sideInfoLen(mono)
        frame(off) = 'X'; frame(off + 1) = 'i'
        frame(off + 2) = 'n'; frame(off + 3) = 'g'
        frame(off + 4) = 0; frame(off + 5) = 0
        frame(off + 6) = 0; frame(off + 7) = 1 // flags: frames present
        frame(off + 8) = ((nFrames >>> 24) & 0xFF).toByte
        frame(off + 9) = ((nFrames >>> 16) & 0xFF).toByte
        frame(off + 10) = ((nFrames >>> 8) & 0xFF).toByte
        frame(off + 11) = (nFrames & 0xFF).toByte
      }
      out.write(frame, 0, size)
      i += 1
    }
    out.toByteArray
  }

  /** Strict parse: struct(title, sample_rate, channels, n_frames,
    * duration_ms, bitrate_mode, audio_bytes, id3_bytes, has_xing,
    * pay_sum) or null on ANY structural violation (bad sync, reserved
    * version/layer/bitrate/rate bits, inconsistent rate or channel
    * mode across frames, truncated tail, malformed ID3). pay_sum sums
    * the payload bytes of frames 1..n-1 (frame 0 excluded — a Xing
    * block may overwrite its plant), pinning the byte walk. */
  def parse(b: Array[Byte]): GenericInternalRow = {
    if (b == null || b.length < 21) return null
    // ---- ID3v2 ----
    if (b(0) != 'I' || b(1) != 'D' || b(2) != '3') return null
    if ((b(3) & 0xFF) != 3 || b(4) != 0 || b(5) != 0) return null
    if (((b(6) | b(7) | b(8) | b(9)) & 0x80) != 0) return null
    val tagBody = ((b(6) & 0x7F) << 21) | ((b(7) & 0x7F) << 14) |
      ((b(8) & 0x7F) << 7) | (b(9) & 0x7F)
    val id3Bytes = 10 + tagBody
    if (id3Bytes + 4 > b.length) return null
    // one TIT2 text frame fills the whole tag body
    if (tagBody < 11) return null
    if (b(10) != 'T' || b(11) != 'I' || b(12) != 'T' || b(13) != '2')
      return null
    val fsz = ((b(14) & 0xFF) << 24) | ((b(15) & 0xFF) << 16) |
      ((b(16) & 0xFF) << 8) | (b(17) & 0xFF)
    if (fsz != tagBody - 10 || b(18) != 0 || b(19) != 0) return null
    if (b(20) != 0) return null // ISO-8859-1 only
    val title = new String(b, 21, fsz - 1, "ISO-8859-1")
    // ---- frame walk ----
    var p = id3Bytes
    var rate = -1
    var mono = false
    var crcForm = false
    var nFrames = 0L
    var paySum = 0L
    var hasXing = false
    var loKbps = Int.MaxValue
    var hiKbps = 0
    while (p < b.length) {
      if (p + 4 > b.length) return null
      if ((b(p) & 0xFF) != 0xFF) return null
      val h1 = b(p + 1) & 0xFF
      if ((h1 & 0xE0) != 0xE0) return null
      if (((h1 >> 3) & 3) != 3) return null // MPEG-1 only
      if (((h1 >> 1) & 3) != 1) return null // Layer III only
      val frCrc = (h1 & 1) == 0 // prot bit 0 = CRC-protected form
      val h2 = b(p + 2) & 0xFF
      val brIdx = h2 >> 4
      if (brIdx == 0 || brIdx == 15) return null // free/bad
      val rIdx = (h2 >> 2) & 3
      if (rIdx == 3) return null // reserved
      val pad = (h2 >> 1) & 1
      val h3 = b(p + 3) & 0xFF
      val chMode = h3 >> 6
      val frMono = chMode == 3
      val frRate = V1Rates(rIdx)
      if (rate < 0) { rate = frRate; mono = frMono; crcForm = frCrc }
      else if (rate != frRate || mono != frMono || crcForm != frCrc)
        return null
      val kbps = V1L3Kbps(brIdx)
      if (kbps < loKbps) loKbps = kbps
      if (kbps > hiKbps) hiKbps = kbps
      val size = frameSize(kbps, rate) + pad
      if (p + size > b.length) return null
      val dataOff = if (frCrc) 6 else 4
      if (frCrc) {
        // ISO 11172-3: the CRC-16 right after the header covers header
        // bytes 2-3 + the side info region — verify, null on mismatch
        if (dataOff + sideInfoLen(frMono) > size) return null
        val want = ((b(p + 4) & 0xFF) << 8) | (b(p + 5) & 0xFF)
        if (frameCrc(b, p, sideInfoLen(frMono)) != want) return null
      }
      if (nFrames == 0) {
        val off = p + dataOff + sideInfoLen(frMono)
        if (off + 4 <= p + size &&
          b(off) == 'X' && b(off + 1) == 'i' &&
          b(off + 2) == 'n' && b(off + 3) == 'g') hasXing = true
      } else {
        var j = p + dataOff
        val end = p + size
        while (j < end) { paySum += (b(j) & 0xFF); j += 1 }
      }
      nFrames += 1
      p += size
    }
    if (nFrames == 0 || rate < 0) return null
    val durationMs = nFrames * 1152L * 1000L / rate
    val mode = if (hiKbps > loKbps) "vbr" else "cbr"
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(title),
      rate.toLong,
      (if (mono) 1 else 2).toLong,
      nFrames,
      durationMs,
      UTF8String.fromString(mode),
      (b.length - id3Bytes).toLong,
      id3Bytes.toLong,
      hasXing,
      paySum,
      crcForm))
  }
}
