package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.OggCodec

/** Ogg container codec units (round 13, modality 11): the RFC 3533
  * page CRC-32 (0x04C11DB7, non-reflected — NOT the zlib CRC), page
  * walk bookkeeping (BOS/EOS placement, serial/sequence continuity),
  * lacing-value packet reassembly including hand-crafted 255-spans
  * the generator never emits, and the strict-null contract on every
  * corruption class. The hash-green m_ogg_parse / m_sniff_dispatch /
  * m_dedup_mixed queries pin engine parity; this pins the codec. */
class OggCodecSpec extends AnyFunSuite {

  private def row(seed: Long, n: Int) = {
    val b = OggCodec.encode(seed, n)
    assert(b != null)
    val r = OggCodec.parse(b)
    assert(r != null, s"parse null for seed=$seed n=$n")
    (b, r)
  }

  test("round-trip: pages, packets, serial, granule, payload sums") {
    val (b, r) = row(42L, 19) // 19 packets -> 3 pages of 8/8/3
    assert(r.getLong(0) === 3L)
    assert(r.getLong(1) === 19L)
    assert(r.getLong(2) === 42L % 1000000000L)
    assert(r.getLong(3) === 19L)
    val lens = (0 until 19).map(k => 100 + ((42L * 7 + k * 13) % 155).toInt)
    assert(r.getLong(4) === lens.sum.toLong)
    var want = 0L
    for (k <- 0 until 19; j <- 0 until lens(k))
      want += (42L * 17 + k * 11 + j * 5) % 256
    assert(r.getLong(5) === want)
    // total size = pages' headers + lacing + payload
    assert(b.length === 3 * 27 + 19 + lens.sum)
  }

  test("single-packet stream is one BOS+EOS page") {
    val (_, r) = row(7L, 1)
    assert(r.getLong(0) === 1L && r.getLong(1) === 1L)
  }

  test("every generated page's CRC verifies; any payload flip nulls") {
    val b = OggCodec.encode(5L, 10)
    assert(OggCodec.parse(b) != null)
    // flip one byte in each page region: header, lacing, payload
    for (off <- Seq(6, 27, 40, b.length / 2, b.length - 3)) {
      val c = b.clone(); c(off) = (c(off) ^ 0x01).toByte
      assert(OggCodec.parse(c) == null, s"flip at $off must null (CRC)")
    }
  }

  test("placement violations null: BOS elsewhere, EOS missing, pages after EOS") {
    val a = OggCodec.encode(9L, 12) // 2 pages
    // drop the final page -> stream ends without EOS
    // page 1 length: 27 + 8 + sum(lens 0..7)
    val lens = (0 until 12).map(k => 100 + ((9L * 7 + k * 13) % 155).toInt)
    val p1 = 27 + 8 + lens.take(8).sum
    assert(OggCodec.parse(java.util.Arrays.copyOf(a, p1)) == null)
    // concatenate two complete streams -> a BOS page mid-stream
    // (and pages after EOS): null either way
    val b2 = OggCodec.encode(9L, 4)
    val cat = new Array[Byte](a.length + b2.length)
    System.arraycopy(a, 0, cat, 0, a.length)
    System.arraycopy(b2, 0, cat, a.length, b2.length)
    assert(OggCodec.parse(cat) == null)
  }

  test("hand-crafted 255-lacing span reassembles as ONE packet") {
    // one page, a 300-byte packet = lacing [255, 45]: the generator
    // never emits spans, but the parser must reassemble them
    val body = Array.tabulate[Byte](300)(i => (i % 251).toByte)
    val header = new Array[Byte](27 + 2)
    header(0) = 'O'; header(1) = 'g'; header(2) = 'g'; header(3) = 'S'
    header(5) = (2 | 4).toByte // BOS + EOS
    header(6) = 1 // granule 1
    header(26) = 2
    header(27) = 255.toByte
    header(28) = 45
    val page = header ++ body
    val crc = OggCodec.crc32(page, 0, page.length)
    page(22) = (crc & 0xFF).toByte; page(23) = ((crc >>> 8) & 0xFF).toByte
    page(24) = ((crc >>> 16) & 0xFF).toByte; page(25) = ((crc >>> 24) & 0xFF).toByte
    val r = OggCodec.parse(page)
    assert(r != null)
    assert(r.getLong(1) === 1L, "255+45 lacing is ONE packet")
    assert(r.getLong(4) === 300L)
    // an OPEN span at EOS (lone 255 lacing value) must null
    val open = new Array[Byte](27 + 1 + 255)
    open(0) = 'O'; open(1) = 'g'; open(2) = 'g'; open(3) = 'S'
    open(5) = (2 | 4).toByte
    open(26) = 1
    open(27) = 255.toByte
    val c2 = OggCodec.crc32(open, 0, open.length)
    open(22) = (c2 & 0xFF).toByte; open(23) = ((c2 >>> 8) & 0xFF).toByte
    open(24) = ((c2 >>> 16) & 0xFF).toByte; open(25) = ((c2 >>> 24) & 0xFF).toByte
    assert(OggCodec.parse(open) == null)
  }

  test("the Ogg CRC is NOT the zlib CRC (known-vector pin)") {
    // RFC 3533's CRC has no reflection and init 0: on "OggS" it must
    // differ from java.util.zip.CRC32 (reflected, init ~0)
    val v = "OggS".getBytes("US-ASCII")
    val ours = OggCodec.crc32(v, 0, v.length)
    val z = new java.util.zip.CRC32()
    z.update(v)
    assert((ours.toLong & 0xFFFFFFFFL) !== z.getValue)
    // and a fixed regression vector so the table can't silently change
    assert((OggCodec.crc32(Array[Byte](0), 0, 1).toLong & 0xFFFFFFFFL) === 0L)
    assert((OggCodec.crc32(Array[Byte](1), 0, 1).toLong & 0xFFFFFFFFL)
      === 0x04C11DB7L)
  }

  test("deterministic and parameter-sensitive") {
    assert(java.util.Arrays.equals(OggCodec.encode(3L, 9), OggCodec.encode(3L, 9)))
    assert(!java.util.Arrays.equals(OggCodec.encode(3L, 9), OggCodec.encode(4L, 9)))
    assert(OggCodec.parse(null) == null)
    assert(OggCodec.parse(Array.emptyByteArray) == null)
  }
}
