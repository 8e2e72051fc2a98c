package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Mp3Codec

/** MP3 container codec units (VERDICT r12 #8, modality 10): ID3v2.3
  * walk, MPEG-1 Layer III header tables and frame-size arithmetic,
  * Xing detection at both side-info offsets, CBR/VBR classification,
  * and the strict-null contract on every corruption class. The
  * hash-green m_mp3_parse / m_sniff_dispatch / m_dedup_mixed queries
  * pin engine parity; this pins the codec directly. */
class Mp3CodecSpec extends AnyFunSuite {

  private def row(seed: Long, n: Int) = {
    val b = Mp3Codec.encode(seed, n)
    assert(b != null, s"encode null for seed=$seed n=$n")
    val r = Mp3Codec.parse(b)
    assert(r != null, s"parse null for seed=$seed n=$n")
    (b, r)
  }

  test("CBR round-trip: every derived field matches the plant arithmetic") {
    // seed 6: rate 44100 (6%3=0), cbr (even), 192 kbps (6%4=2), stereo
    // (6%7=6 >= 3), 7 frames
    val (b, r) = row(6L, 7)
    assert(r.getUTF8String(0).toString === "doc6")
    assert(r.getLong(1) === 44100L)
    assert(r.getLong(2) === 2L)
    assert(r.getLong(3) === 7L)
    assert(r.getLong(4) === 7L * 1152 * 1000 / 44100)
    assert(r.getUTF8String(5).toString === "cbr")
    val fs = 144000 * 192 / 44100
    assert(r.getLong(6) === 7L * fs)
    assert(r.getLong(7) === 21L + 4) // 'doc6' is 4 chars
    assert(!r.getBoolean(8)) // no Xing on CBR
    assert(b.length === r.getLong(6) + r.getLong(7))
    // pay_sum replays the plant over frames 1..6
    var want = 0L
    for (i <- 1 until 7; j <- 0 until fs - 4)
      want += (6L * 31 + i * 7 + j * 3) % 256
    assert(r.getLong(9) === want)
  }

  test("VBR round-trip: cycle sizes, Xing present, mode classified vbr") {
    // seed 1: rate 48000 (1%3=1), vbr (odd), mono (1%7=1 < 3)
    val (_, r) = row(1L, 8)
    assert(r.getUTF8String(5).toString === "vbr")
    assert(r.getBoolean(8), "VBR stream must carry its Xing block")
    assert(r.getLong(2) === 1L)
    val szs = Seq(112, 160, 224).map(k => 144000 * k / 48000)
    val want = (0 until 8).map(i => szs(i % 3)).sum
    assert(r.getLong(6) === want)
  }

  test("Xing sits at the STEREO side-info offset too") {
    // seed 5: vbr (odd), stereo (5%7=5 >= 3) — offset 4+32, not 4+17
    val (_, r) = row(5L, 4)
    assert(r.getLong(2) === 2L)
    assert(r.getBoolean(8))
  }

  test("single-frame stream: pay_sum is 0 (frame 0 excluded)") {
    val (_, r) = row(2L, 1)
    assert(r.getLong(3) === 1L && r.getLong(9) === 0L)
  }

  test("CRC-protected form: round-trip, has_crc, side-info flip nulls") {
    // seed 2: protected (2%5=2), rate 32000 (2%3=2), cbr 192 (2%4=2),
    // mono (2%7=2 < 3)
    val (b, r) = row(2L, 6)
    assert(r.getBoolean(10), "seed%5==2 docs must report has_crc")
    assert(r.getLong(1) === 32000L && r.getLong(2) === 1L)
    val fs = 144000 * 192 / 32000
    assert(r.getLong(6) === 6L * fs)
    // pay_sum starts after header + CRC: 2 fewer bytes per frame
    var want = 0L
    for (i <- 1 until 6; j <- 0 until fs - 6)
      want += (2L * 31 + i * 7 + j * 3) % 256
    assert(r.getLong(9) === want)
    val id3 = 21 + 4 // 'doc2'
    // flip a SIDE INFO byte (covered by the CRC) -> null
    val c1 = b.clone(); c1(id3 + 10) = (c1(id3 + 10) ^ 1).toByte
    assert(Mp3Codec.parse(c1) == null, "side-info flip must fail the CRC")
    // flip a CRC byte itself -> null
    val c2 = b.clone(); c2(id3 + 4) = (c2(id3 + 4) ^ 1).toByte
    assert(Mp3Codec.parse(c2) == null)
    // flip a PAYLOAD byte past the side info: NOT CRC-covered (the
    // spec's CRC protects only header+side info) -> still parses,
    // with a different pay_sum
    val si = 17 // mono
    val c3 = b.clone()
    c3(id3 + fs + 6 + si + 40) = (c3(id3 + fs + 6 + si + 40) ^ 1).toByte
    val r3 = Mp3Codec.parse(c3)
    assert(r3 != null && r3.getLong(9) != want)
    // unprotected docs report has_crc = false
    assert(!row(6L, 5)._2.getBoolean(10))
  }

  test("corruption nulls: sync, version, layer, bitrate, rate, truncation, ID3") {
    val b = Mp3Codec.encode(6L, 5)
    val id3 = 25 // 21 + len("doc6")
    def flip(off: Int, v: Int): Array[Byte] = {
      val c = b.clone(); c(off) = v.toByte; c
    }
    assert(Mp3Codec.parse(flip(id3, 0xFE)) == null)          // broken sync
    assert(Mp3Codec.parse(flip(id3 + 1, 0xF3)) == null)      // MPEG-2 bits
    assert(Mp3Codec.parse(flip(id3 + 1, 0xFD)) == null)      // Layer II
    assert(Mp3Codec.parse(flip(id3 + 2, 0xF0)) == null)      // bitrate 15
    assert(Mp3Codec.parse(flip(id3 + 2, 0x0C)) == null)      // rate reserved
    assert(Mp3Codec.parse(java.util.Arrays.copyOf(b, b.length - 1)) == null)
    assert(Mp3Codec.parse(java.util.Arrays.copyOf(b, b.length + 1)) == null)
    val noId3 = b.clone(); noId3(0) = 'X'.toByte
    assert(Mp3Codec.parse(noId3) == null)
    assert(Mp3Codec.parse(null) == null)
    assert(Mp3Codec.parse(Array.emptyByteArray) == null)
  }

  test("rate/channel-mode inconsistency across frames nulls") {
    // concatenate two VALID streams with different rates: the walk
    // must reject the second stream's first header (rate changed)
    val a = Mp3Codec.encode(3L, 2) // rate 44100 (3%3=0)
    val c = Mp3Codec.encode(1L, 2) // rate 48000
    // strip c's ID3 (21 + len("doc1") = 25) and splice its frames in
    val cFrames = java.util.Arrays.copyOfRange(c, 25, c.length)
    val spliced = new Array[Byte](a.length + cFrames.length)
    System.arraycopy(a, 0, spliced, 0, a.length)
    System.arraycopy(cFrames, 0, spliced, a.length, cFrames.length)
    assert(Mp3Codec.parse(spliced) == null)
  }

  test("deterministic: same (seed, n) encodes byte-identical streams") {
    assert(java.util.Arrays.equals(Mp3Codec.encode(77L, 11),
      Mp3Codec.encode(77L, 11)))
    assert(!java.util.Arrays.equals(Mp3Codec.encode(77L, 11),
      Mp3Codec.encode(78L, 11)))
  }
}
