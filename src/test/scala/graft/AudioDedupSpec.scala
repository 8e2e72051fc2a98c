package graft

import graft.functions.WavCodec
import graft.pipeline.Multimodal

/** Audio fingerprint + mixed-modality dispatch contracts: audioFp63
  * equals an independent recomputation from the sample formula, the
  * banded audio near-dup join is COMPLETE vs all-pairs, and the
  * magic-byte sniffer routes every payload of a mixed corpus to the
  * decoder its generator used — from the bytes alone. */
class AudioDedupSpec extends SparkSpec {

  /** Independent model of WavCodec.audioFp63 over the encode formula:
    * data byte i = (i·7 + seed) mod 251, 16-bit LE sign-extended
    * samples, 63 integer-index windows, integer mean threshold. */
  private def fpModel(nSamples: Int, channels: Int, seed: Long): Long = {
    val n = nSamples * channels
    def sample(k: Int): Long = {
      val lo = (2L * k * 7 + seed) % 251
      val hi = ((2L * k + 1) * 7 + seed) % 251
      val raw = (lo + 256 * hi).toInt
      (if (raw >= 32768) raw - 65536 else raw).toLong
    }
    val e = (0 until 63).map { w =>
      val lo = (w.toLong * n / 63).toInt
      val hi = ((w + 1).toLong * n / 63).toInt
      (lo until hi).map(k => sample(k) * sample(k)).sum
    }
    val mean = e.sum / 63
    (0 until 63).filter(w => e(w) > mean).map(w => 1L << w).sum
  }

  test("audioFp63: byte-path fp equals the formula recomputation") {
    for ((n, ch, seed) <- Seq((1, 1, 0L), (63, 1, 7L), (100, 2, 42L),
      (997, 1, 123L), (5000, 2, 9L))) {
      val got = WavCodec.audioFp63(WavCodec.encode(8000, ch, n, seed))
      assert(got != null, s"n=$n ch=$ch")
      assert(got.longValue() === fpModel(n, ch, seed), s"n=$n ch=$ch seed=$seed")
      assert(got.longValue() >= 0L, "bit 63 must never be set")
    }
  }

  test("audioFp63: silence, determinism, and header-violation null") {
    // 0-sample stream fingerprints to 0 (valid silence, not null)
    assert(WavCodec.audioFp63(WavCodec.encode(8000, 1, 0, 5L)).longValue() === 0L)
    // identical content -> identical fp
    val a = WavCodec.audioFp63(WavCodec.encode(8000, 1, 200, 11L))
    val b = WavCodec.audioFp63(WavCodec.encode(8000, 1, 200, 11L))
    assert(a != null && a == b)
    // header corruption nulls (WAV has no payload CRC — only the
    // header geometry is checkable, same contract as pcmStatsRaw)
    val wav = WavCodec.encode(8000, 1, 200, 11L)
    val c = wav.clone(); c(0) = 'X'
    assert(WavCodec.audioFp63(c) == null)
    // truncated payload nulls (declared dataSize unmet)
    assert(WavCodec.audioFp63(java.util.Arrays.copyOf(wav, wav.length - 2)) == null)
    // trailing garbage nulls
    assert(WavCodec.audioFp63(java.util.Arrays.copyOf(wav, wav.length + 1)) == null)
    assert(WavCodec.audioFp63(null) == null)
  }

  test("audio near-dup banding is COMPLETE vs all-pairs on the corpus") {
    // pigeonhole: hamming <= 3 flips cannot touch all 4 of the 16-bit
    // bands — the banded join must find EXACTLY the all-pairs result
    val containers = Multimodal.withWavContentContainers(
      Tables.documents(spark, sf()))
    val banded = Multimodal.audioNearDups(containers)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fps = Multimodal.audioFps(containers)
      .collect().collect { case r if !r.isNullAt(1) =>
        (r.getLong(0), r.getLong(1)) }
    val brute = (for {
      (a, ha) <- fps; (b, hb) <- fps if a < b
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(banded === brute)
    assert(banded.nonEmpty, "planted same-content streams must pair")
    assert(banded.exists(_._3 == 0L), "exact audio dups must appear at hamming 0")
  }

  test("sniff dispatch routes every mixed payload to its generator's kind") {
    val out = Multimodal.sniffDispatch(Multimodal.withMixedContainers(
      Tables.documents(spark, sf()))).collect()
    assert(out.nonEmpty)
    val expectKind = Map(0 -> "image/png", 1 -> "image/bmp",
      2 -> "audio/wav", 3 -> "text/gzip", 4 -> "image/jpeg",
      5 -> "video/avi", 6 -> "image/gif", 7 -> "audio/flac",
      8 -> "application/zstd", 9 -> "audio/mpeg", 10 -> "audio/ogg")
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) === expectKind((id % 11).toInt), s"doc $id")
      assert(r.getLong(2) >= 0L, s"doc $id decoded stat must be valid")
    }
    // the round-10/11/12/13 kinds are actually present in the routed corpus
    assert(out.exists(_.getString(1) == "image/jpeg"))
    assert(out.exists(_.getString(1) == "video/avi"))
    assert(out.exists(_.getString(1) == "image/gif"))
    assert(out.exists(_.getString(1) == "audio/flac"))
    assert(out.exists(_.getString(1) == "application/zstd"))
    assert(out.exists(_.getString(1) == "audio/mpeg"))
    assert(out.exists(_.getString(1) == "audio/ogg"))
  }

  test("mixed dedup: survivor election is consistent, kind-scoped, and layout-stable") {
    val docs = Tables.documents(spark, sf())
    val out = Multimodal.mixedDedupSurvivors(
      Multimodal.withMixedContentContainers(docs)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    assert(out.length.toLong === docs.count(), "every doc gets a verdict")
    // keeper is the min id of its class; keepers are never dups
    out.foreach { case (id, _, keeper, isDup) =>
      assert(keeper <= id)
      assert(isDup === (id > keeper))
    }
    // every keeper_id is itself a row whose keeper is itself
    val keepers = out.filter(!_._4).map(_._1).toSet
    assert(out.forall(r => keepers.contains(r._3)), "keepers must be surviving rows")
    // dup classes never cross kinds: a keeper carries its member's kind
    val kindOf = out.map(r => r._1 -> r._2).toMap
    out.foreach(r => assert(kindOf(r._3) === r._2, s"doc ${r._1}"))
    // planted pairs exist (content-seeded payloads collide on content)
    assert(out.exists(_._4), "the corpus must contain mixed-modality dups")
    // pure function of content+id, not layout
    val b = Multimodal.mixedDedupSurvivors(
      Multimodal.withMixedContentContainers(docs.repartition(13))).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(out.toSet === b)
  }

  test("sniff dispatch quarantines a corrupt payload as unknown/-1") {
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions.pack_frames
    // a framed blob that matches no magic: the row must survive with
    // kind 'unknown' and stat -1, never abort the scan
    val junk = Tables.documents(spark, sf()).limit(3)
      .select(col("doc_id"),
        pack_frames(encode(col("text"), "UTF-8"), lit(16)).as("container"))
    val out = Multimodal.sniffDispatch(junk).collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(r.getString(1) === "unknown")
      assert(r.getLong(2) === -1L)
    }
  }
}
