package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZstdCodec

/** RFC 8878 codec units. The decisive tests are the INTEROP pair: our
  * frames decoded by the reference `zstd` CLI, and CLI frames (which
  * use FSE-compressed Huffman weights, FSE_Compressed/Repeat sequence
  * tables, repeat offsets, treeless literals — the paths our encoder
  * deliberately doesn't emit) decoded by us. Both directions passing
  * pins the wire format against the reference implementation, not
  * just against our own round-trip. CLI tests are availability-guarded
  * (assume()) so the suite stays green on hosts without the binary. */
class ZstdCodecSpec extends AnyFunSuite {

  // deterministic pseudo-random bytes (no Random: spec stability)
  private def detBytes(n: Int, seed: Long): Array[Byte] = {
    val out = new Array[Byte](n)
    var x = seed | 1
    var i = 0
    while (i < n) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      out(i) = (x & 0xFF).toByte
      i += 1
    }
    out
  }

  /** Compressible text-like corpus: repeated phrases + per-doc noise. */
  private def page(i: Int): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("<html><head><title>Doc ").append(i).append("</title></head><body>")
    var k = 0
    while (k < 40 + i % 13) {
      sb.append("<p>The quick brown fox jumps over the lazy dog ")
        .append(i * 31 + k).append(" and the archive keeps a copy.</p>")
      k += 1
    }
    sb.append("</body></html>")
    sb.toString.getBytes("UTF-8")
  }

  private val zstdBin: Option[String] =
    Seq("/root/miniconda/bin/zstd", "/usr/bin/zstd", "/usr/local/bin/zstd")
      .find(p => new java.io.File(p).canExecute)

  private def cli(args: Seq[String], in: Array[Byte]): (Int, Array[Byte]) = {
    val pb = new ProcessBuilder((zstdBin.get +: args): _*)
    pb.redirectErrorStream(false)
    val proc = pb.start()
    val out = new java.io.ByteArrayOutputStream()
    val writer = new Thread(() => {
      try { proc.getOutputStream.write(in); proc.getOutputStream.close() }
      catch { case _: Throwable => () }
    })
    writer.start()
    val is = proc.getInputStream
    val buf = new Array[Byte](65536)
    var r = is.read(buf)
    while (r >= 0) { out.write(buf, 0, r); r = is.read(buf) }
    writer.join()
    val code = proc.waitFor()
    (code, out.toByteArray)
  }

  // ---- round-trip -----------------------------------------------------------

  test("round-trip: text pages, random bytes, empty, 1 byte, uniform") {
    val cases = Seq(
      page(1), page(2), page(77),
      detBytes(10000, 42L),       // incompressible → raw block fallback
      Array.empty[Byte],
      Array[Byte](7),
      Array.fill[Byte](5000)(65), // uniform → RLE block
      detBytes(3, 9L), detBytes(255, 5L), detBytes(256, 6L))
    for (c <- cases) {
      val z = ZstdCodec.compress(c)
      assert(z != null, s"compress null for len=${c.length}")
      val back = ZstdCodec.decompress(z)
      assert(back != null, s"decompress null for len=${c.length}")
      assert(java.util.Arrays.equals(back, c), s"mismatch for len=${c.length}")
    }
  }

  test("round-trip: multi-block (> 128 KiB) with cross-block matches") {
    val one = page(3)
    val big = new java.io.ByteArrayOutputStream()
    while (big.size < 300 * 1024) big.write(one)
    val data = big.toByteArray
    val z = ZstdCodec.compress(data)
    assert(z != null)
    assert(z.length < data.length / 3, "repetitive input must compress well")
    assert(java.util.Arrays.equals(ZstdCodec.decompress(z), data))
  }

  test("round-trip: worst-case sequence count (3-byte nbSeq form)") {
    // back-to-back 4-byte matches: abcdabcdabcd... yields one sequence
    // per 4 bytes after the first literals run → nbSeq > 0x7EFF needs
    // the 255-prefixed 3-byte count encoding
    val unit = "abcdefgh".getBytes("UTF-8") // period 8, matches length 8*
    val data = new Array[Byte](130 * 1024)
    var i = 0
    while (i < data.length) { data(i) = unit(i % 4); i += 1 }
    val z = ZstdCodec.compress(data)
    assert(z != null)
    assert(java.util.Arrays.equals(ZstdCodec.decompress(z), data))
  }

  test("concatenated frames decode as one stream (the .zst member layout)") {
    val a = page(10); val b = page(11)
    val out = new java.io.ByteArrayOutputStream()
    out.write(ZstdCodec.compress(a)); out.write(ZstdCodec.compress(b))
    val back = ZstdCodec.decompress(out.toByteArray)
    assert(back != null && back.length === a.length + b.length)
    assert(java.util.Arrays.equals(java.util.Arrays.copyOfRange(back, 0, a.length), a))
  }

  test("skippable frames are skipped") {
    val a = page(12)
    val out = new java.io.ByteArrayOutputStream()
    // skippable: magic 0x184D2A50 LE + u32 size + payload
    out.write(0x50); out.write(0x2A); out.write(0x4D); out.write(0x18)
    out.write(5); out.write(0); out.write(0); out.write(0)
    out.write("junk!".getBytes)
    out.write(ZstdCodec.compress(a))
    assert(java.util.Arrays.equals(ZstdCodec.decompress(out.toByteArray), a))
    // a stream of ONLY skippable frames decodes nothing → null
    val onlySkip = java.util.Arrays.copyOfRange(out.toByteArray, 0, 13)
    assert(ZstdCodec.decompress(onlySkip) == null)
  }

  // ---- interop with the reference implementation ---------------------------

  test("INTEROP: reference zstd CLI decodes our frames byte-exactly") {
    assume(zstdBin.isDefined, "zstd binary not on this host")
    for (data <- Seq(page(5), detBytes(4096, 77L),
      ("x" * 70000).getBytes("UTF-8"), Array.empty[Byte])) {
      val z = ZstdCodec.compress(data)
      val (code, out) = cli(Seq("-d", "-c"), z)
      assert(code === 0, "CLI rejected our frame")
      assert(java.util.Arrays.equals(out, data))
    }
  }

  test("INTEROP: we decode reference zstd CLI frames (all levels + long)") {
    assume(zstdBin.isDefined, "zstd binary not on this host")
    // level sweep exercises FSE-compressed weights, FSE_Compressed and
    // Repeat sequence tables, repeat offsets, treeless literals, and
    // multi-block frames — the decode-only paths our encoder never emits
    val corpus = {
      val b = new java.io.ByteArrayOutputStream()
      var i = 0
      while (i < 60) { b.write(page(i)); i += 1 }
      b.write(detBytes(8192, 123L))
      b.toByteArray
    }
    for (level <- Seq("-1", "-3", "-9", "-19")) {
      val (code, z) = cli(Seq(level, "-c"), corpus)
      assert(code === 0)
      val back = ZstdCodec.decompress(z)
      assert(back != null, s"our decoder nulled a CLI level $level frame")
      assert(java.util.Arrays.equals(back, corpus), s"mismatch at $level")
    }
    // --no-check (no content checksum) must also decode
    val (c2, z2) = cli(Seq("-3", "--no-check", "-c"), corpus)
    assert(c2 === 0)
    assert(java.util.Arrays.equals(ZstdCodec.decompress(z2), corpus))
  }

  // ---- strictness / fuzz ----------------------------------------------------

  test("checksum flip, truncation, reserved block type all null (never throw)") {
    val data = page(9)
    val z = ZstdCodec.compress(data)
    // flip one checksum byte (last 4 bytes)
    val zc = z.clone(); zc(z.length - 2) = (zc(z.length - 2) ^ 0x40).toByte
    assert(ZstdCodec.decompress(zc) == null, "checksum flip must null")
    // truncations at every prefix length of the small frame
    val small = ZstdCodec.compress(detBytes(64, 4L))
    var k = 0
    while (k < small.length) {
      ZstdCodec.decompress(java.util.Arrays.copyOfRange(small, 0, k)) // no throw
      k += 1
    }
    // garbage magic
    assert(ZstdCodec.decompress(detBytes(100, 8L)) == null)
  }

  test("fuzz: 3000 single-bit corruptions decode correct-or-null, never throw") {
    val data = page(21)
    val z = ZstdCodec.compress(data)
    var x = 0x12345L
    var undetected = 0
    var i = 0
    while (i < 3000) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      val pos = math.floorMod(x, z.length * 8L).toInt
      val zc = z.clone()
      zc(pos / 8) = (zc(pos / 8) ^ (1 << (pos % 8))).toByte
      val back = ZstdCodec.decompress(zc) // must not throw / hang
      if (back != null && !java.util.Arrays.equals(back, data)) undetected += 1
      i += 1
    }
    // the checksum covers the payload: a corruption that decodes to
    // DIFFERENT bytes must be caught; only flips that leave the
    // regenerated content identical (e.g. inside unused header slack)
    // may pass — there is no such slack in our frames
    assert(undetected === 0, s"$undetected corruptions decoded to wrong bytes")
  }

  test("decompression bomb: output cap nulls, caps respected") {
    // an RLE block claiming near the 128K max, repeated via frames,
    // against a small cap
    val z = ZstdCodec.compress(Array.fill[Byte](100000)(66))
    assert(ZstdCodec.decompress(z, cap = 1000) == null)
    assert(ZstdCodec.decompress(z, cap = 100000) != null)
  }

  test("dictionary frames are out of contract (null, not throw)") {
    val z = ZstdCodec.compress(page(2))
    val zc = z.clone()
    zc(4) = (zc(4) | 0x01).toByte // Dictionary_ID_Flag = 1
    assert(ZstdCodec.decompress(zc) == null)
  }

  test("window-size bound: out-of-window offsets null under the declared window") {
    // ADVICE r12 #2: offsets were bounded by full frame history, not
    // by the frame's declared Window_Size. Build an input whose greedy
    // parse emits a ~190 KB-distance match: pattern A at 0, a
    // short-period tile between (its grams touch ~509 hash slots, so
    // A's anchors survive the table), A again at the tail.
    val a = detBytes(1024, 101L)
    val tile = detBytes(509, 202L)
    val buf = new java.io.ByteArrayOutputStream()
    buf.write(a)
    while (buf.size < 190 * 1024) buf.write(tile)
    buf.write(a)
    val data = buf.toByteArray
    // plain compress() floors each block's history at the block start
    // (offsets never exceed 128 KiB), so the far match needs the dict
    // path: compressWithDict parses with history floor 0, letting
    // block 2 reach the pattern-A copy back in block 1.
    val dict = detBytes(1024, 303L)
    val z = ZstdCodec.compressWithDict(data, dict)
    assert(z != null)
    assert(java.util.Arrays.equals(
      ZstdCodec.decompressWithDict(z, dict, ZstdCodec.MaxOutBytes), data))
    // layout: magic(4) + windowed FHD(1) + window descriptor(1) + FCS;
    // rewrite ONLY the declared window, blocks + checksum untouched
    assert((z(4) & 0xFF) === ((2 << 6) | 0x04))
    def windowed(windowLog: Int): Array[Byte] = {
      val w = z.clone()
      w(5) = ((windowLog - 10) << 3).toByte // mantissa 0
      w
    }
    // 2^18 + dict covers every emitted offset → decodes: the header
    // rewrite itself is sound, only the bound below differs
    assert(java.util.Arrays.equals(
      ZstdCodec.decompressWithDict(windowed(18), dict, ZstdCodec.MaxOutBytes),
      data))
    // 2^17 + 1 KiB dict = 132096 < the ~194 KB cross-block offset, yet
    // frame history covers it — the strict contract must null, not decode
    assert(ZstdCodec.decompressWithDict(windowed(17), dict,
      ZstdCodec.MaxOutBytes) == null)
  }

  test("xxh64Range over an interior slice equals xxh64 over the copy") {
    val b = detBytes(4096, 314L)
    for ((off, len) <- Seq((0, 4096), (1, 31), (7, 64), (100, 1000), (4000, 96), (5, 0)))
      assert(ZstdCodec.xxh64Range(b, off, len) ===
        ZstdCodec.xxh64(java.util.Arrays.copyOfRange(b, off, off + len), len))
  }

  test("xxh64 matches the reference CLI's frame checksum") {
    assume(zstdBin.isDefined, "zstd binary not on this host")
    // the CLI writes XXH64(content) low 32 bits as the frame checksum;
    // decode of a CLI frame already verifies ours (decompress checks
    // it) — here we additionally pin the raw function on fixed vectors
    // produced by compressing with checksum and reading the field.
    val data = page(33)
    val (code, z) = cli(Seq("-3", "-c"), data)
    assert(code === 0)
    val want = ((z(z.length - 4) & 0xFFL)) | ((z(z.length - 3) & 0xFFL) << 8) |
      ((z(z.length - 2) & 0xFFL) << 16) | ((z(z.length - 1) & 0xFFL) << 24)
    assert((ZstdCodec.xxh64(data, data.length) & 0xFFFFFFFFL) === want)
  }
}
