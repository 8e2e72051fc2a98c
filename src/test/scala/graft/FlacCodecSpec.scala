package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FlacCodec

/** FLAC codec contracts: lossless round-trip against the planted-
  * formula twin over a geometry grid, every stereo decorrelation
  * decoded, the LPC subframe path, real compression on structured
  * signal (and the honest noise non-compression number), and the
  * structural-corruption envelope (every violation nulls, nothing
  * throws). */
class FlacCodecSpec extends AnyFunSuite {

  /** Planted-formula stats twin — never touches bytes. */
  private def twin(channels: Int, nPerCh: Int, seed: Long): Array[Long] = {
    var sumSq = 0L
    var peak = 0L
    var t = 0
    while (t < nPerCh * channels) {
      val s = FlacCodec.plantedSample(t, seed)
      sumSq += s.toLong * s
      val a = math.abs(s.toLong)
      if (a > peak) peak = a
      t += 1
    }
    Array(nPerCh.toLong * channels, sumSq, peak)
  }

  test("round trip == planted twin over the geometry grid (incl. multi-frame and empty)") {
    for {
      rate <- Seq(8000, 16000, 24000)
      ch <- Seq(1, 2)
      n <- Seq(0, 1, 5, 100, 4096, 4097, 9000)
    } {
      val seed = 31L * n + 7 * ch + rate
      val flac = FlacCodec.encode(rate, ch, n, seed)
      assert(flac != null, s"encode($rate,$ch,$n)")
      val stats = FlacCodec.pcmStatsRaw(flac)
      assert(stats != null, s"decode($rate,$ch,$n)")
      assert(stats.toSeq === twin(ch, n, seed).toSeq, s"stats($rate,$ch,$n)")
      val h = FlacCodec.parseHeaderRaw(flac)
      assert(h.toSeq === Seq(ch.toLong, rate.toLong, 16L, n.toLong))
    }
  }

  test("every forced stereo decorrelation decodes identically (indep, L/S, R/S, M/S)") {
    val n = 700
    val left = Array.tabulate(n)(i => FlacCodec.plantedSample(2 * i, 99L))
    val right = Array.tabulate(n)(i => FlacCodec.plantedSample(2 * i + 1, 99L))
    val want = FlacCodec.pcmStatsRaw(
      FlacCodec.encodeSamples(8000, 2, left, right)).toSeq
    for (assign <- 0 to 3) {
      val flac = FlacCodec.encodeSamples(8000, 2, left, right, assign)
      val got = FlacCodec.pcmStatsRaw(flac)
      assert(got != null, s"assign $assign")
      assert(got.toSeq === want, s"assign $assign")
    }
  }

  test("LPC subframe path: the probe stream decodes to its exact samples") {
    // a gentle quadratic — fixed-2/LPC residuals are tiny, the seam the
    // production encoder never emits (it only writes fixed predictors)
    val samples = Array.tabulate(600)(i => (i * i) % 1200 - 600)
    val flac = FlacCodec.encodeLpcProbe(16000, samples)
    val stats = FlacCodec.pcmStatsRaw(flac)
    assert(stats != null)
    var sumSq = 0L; var peak = 0L
    samples.foreach { s =>
      sumSq += s.toLong * s; peak = math.max(peak, math.abs(s.toLong))
    }
    assert(stats.toSeq === Seq(600L, sumSq, peak))
  }

  test("structured signal genuinely compresses; planted noise honestly does not") {
    val n = 4096
    // linear ramp: fixed-2 residuals are all zero — near-total collapse
    val ramp = Array.tabulate(n)(i => i % 8192 - 4096)
    val rampFlac = FlacCodec.encodeSamples(8000, 1, ramp, null)
    assert(rampFlac != null && FlacCodec.pcmStatsRaw(rampFlac) != null)
    assert(rampFlac.length < n * 2 / 4,
      s"ramp should compress at least 4x: ${rampFlac.length} vs ${n * 2}")
    // planted modular "noise": measured 7681 bytes vs 8192 raw — a ~6%
    // saving, NOT incompressible, because (i·7+seed) mod 251 never
    // emits bytes 251-255, so sample entropy is slightly under 16
    // bits and Rice at a high parameter collects it. The honest
    // numbers, pinned: marginal on near-noise, >4x on structure.
    val noise = FlacCodec.encode(8000, 1, n, 12345L)
    assert(noise.length > n * 2 * 9 / 10,
      s"planted noise compresses only marginally: ${noise.length} vs ${n * 2}")
    assert(noise.length <= n * 2 + 2048, "overhead stays bounded")
  }

  test("encode rejects out-of-contract inputs with null, never throws") {
    assert(FlacCodec.encode(0, 1, 10, 1L) == null)
    assert(FlacCodec.encode(1 << 20, 1, 10, 1L) == null)
    assert(FlacCodec.encode(8000, 0, 10, 1L) == null)
    assert(FlacCodec.encode(8000, 3, 10, 1L) == null)
    assert(FlacCodec.encode(8000, 1, -1, 1L) == null)
    assert(FlacCodec.encode(8000, 1, FlacCodec.MaxSamplesPerChannel + 1, 1L) == null)
  }

  test("structural violations null at the exact checkpoint, nothing throws") {
    val good = FlacCodec.encode(8000, 2, 5000, 77L)
    assert(FlacCodec.pcmStatsRaw(good) != null)
    def mutated(f: Array[Byte] => Unit): Array[Byte] = {
      val c = good.clone(); f(c); c
    }
    // marker
    assert(FlacCodec.pcmStatsRaw(mutated(b => b(0) = 'g')) == null)
    // STREAMINFO md5 byte -> decoded-stream MD5 mismatch
    assert(FlacCodec.pcmStatsRaw(mutated(b => b(30) = (b(30) ^ 1).toByte)) == null)
    // frame sync first byte
    assert(FlacCodec.pcmStatsRaw(mutated(b => b(42) = 0)) == null)
    // header CRC-8 region: flip a bit in the frame header
    assert(FlacCodec.pcmStatsRaw(mutated(b => b(45) = (b(45) ^ 4).toByte)) == null)
    // residual bits mid-frame: CRC-16 or MD5 must catch it
    assert(FlacCodec.pcmStatsRaw(mutated(b => b(200) = (b(200) ^ 16).toByte)) == null)
    // truncation and trailing garbage
    assert(FlacCodec.pcmStatsRaw(java.util.Arrays.copyOf(good, good.length - 3)) == null)
    assert(FlacCodec.pcmStatsRaw(java.util.Arrays.copyOf(good, good.length + 3)) == null)
    // declared total samples lies
    assert(FlacCodec.pcmStatsRaw(mutated { b =>
      // last byte of the 36-bit total (ends at bit 144+ of STREAMINFO)
      b(25) = (b(25) ^ 1).toByte
    }) == null)
    assert(FlacCodec.pcmStatsRaw(null) == null)
    assert(FlacCodec.pcmStatsRaw(Array[Byte](1, 2, 3)) == null)
    // STREAMINFO min/max FRAME size: informational per RFC 9639 and
    // outside CRC/MD5 coverage — the one field class the r11 fuzz
    // found silently corruptible (ADVICE r11 #4). Now cross-checked
    // against the observed frame walk: a maxFrame claim BELOW any real
    // frame (byte 15..17, big-endian 24-bit) nulls...
    assert(FlacCodec.pcmStatsRaw(mutated { b =>
      b(12 + 3) = 0; b(13 + 3) = 0; b(14 + 3) = 1
    }) == null)
    // ...and a minFrame claim ABOVE any real frame nulls too
    assert(FlacCodec.pcmStatsRaw(mutated { b =>
      b(12) = 0x7F.toByte; b(13) = 0xFF.toByte; b(14) = 0xFF.toByte
    }) == null)
    // while the 0 = "unknown" convention stays decodable
    assert(FlacCodec.pcmStatsRaw(mutated { b =>
      b(12) = 0; b(13) = 0; b(14) = 0; b(15) = 0; b(16) = 0; b(17) = 0
    }) != null)
  }

  test("random bit-flip fuzz: decode nulls or survives, never throws (200 trials)") {
    val good = FlacCodec.encode(16000, 2, 3000, 5L)
    val want = FlacCodec.pcmStatsRaw(good).toSeq
    val rnd = new scala.util.Random(42)
    var i = 0
    while (i < 200) {
      val c = good.clone()
      val pos = rnd.nextInt(c.length)
      c(pos) = (c(pos) ^ (1 << rnd.nextInt(8))).toByte
      val out = FlacCodec.pcmStatsRaw(c) // must not throw
      // a flip that decodes must decode to the TRUTH (CRC+MD5 make a
      // silently-wrong decode practically impossible; flips in the
      // ignored min/max-frame-size info fields decode fine)
      if (out != null) assert(out.toSeq === want)
      i += 1
    }
  }
}
