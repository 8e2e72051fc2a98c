package graft

import org.apache.spark.sql.functions._

import graft.functions.WavCodec
import graft.pipeline.Multimodal

/** WAV codec contracts: the 44-byte RIFF/PCM header round-trips, every
  * consistency rule rejects its corruption mode with null (never an
  * exception), a header parse needs only the first frame's bytes, and
  * the expression and batched decode paths agree. */
class WavCodecSpec extends SparkSpec {

  test("round trip: parse(encode(...)) recovers every header field") {
    for {
      (rate, ch, n) <- Seq((8000, 1, 0), (16000, 2, 1), (44100, 2, 997),
        (24000, 8, 64))
    } {
      val wav = WavCodec.encode(rate, ch, n, seed = 42L)
      assert(wav != null, s"rate=$rate ch=$ch n=$n")
      assert(wav.length == WavCodec.HeaderLen + n * ch * 2)
      val h = WavCodec.parseHeaderRaw(wav)
      assert(h != null)
      assert(h.toSeq == Seq[Long](ch, rate, 16, n, rate.toLong * ch * 2))
    }
  }

  test("encode degrades to null on out-of-range parameters") {
    assert(WavCodec.encode(0, 1, 10, 0L) == null) // rate
    assert(WavCodec.encode(-8000, 1, 10, 0L) == null)
    assert(WavCodec.encode(8000, 0, 10, 0L) == null) // channels
    assert(WavCodec.encode(8000, 9, 10, 0L) == null)
    assert(WavCodec.encode(8000, 1, -1, 0L) == null) // samples
    assert(WavCodec.encode(8000, 2, Int.MaxValue / 2, 0L) == null) // size
  }

  test("header parse needs only the first 44 bytes") {
    val wav = WavCodec.encode(16000, 2, 500, 7L)
    val h = WavCodec.parseHeaderRaw(java.util.Arrays.copyOf(wav, 44))
    assert(h != null && h(3) == 500L)
    // but 43 bytes is structurally short
    assert(WavCodec.parseHeaderRaw(java.util.Arrays.copyOf(wav, 43)) == null)
    assert(WavCodec.parseHeaderRaw(null) == null)
  }

  test("every corruption mode parses to null, not garbage") {
    def corrupt(f: Array[Byte] => Unit): Array[Byte] = {
      val b = WavCodec.encode(16000, 2, 100, 7L)
      f(b); b
    }
    // magic tags
    assert(WavCodec.parseHeaderRaw(corrupt(_(0) = 'X')) == null) // RIFF
    assert(WavCodec.parseHeaderRaw(corrupt(_(8) = 'X')) == null) // WAVE
    assert(WavCodec.parseHeaderRaw(corrupt(_(12) = 'X')) == null) // fmt
    assert(WavCodec.parseHeaderRaw(corrupt(_(36) = 'X')) == null) // data
    // non-canonical fmt chunk size
    assert(WavCodec.parseHeaderRaw(corrupt(_(16) = 18)) == null)
    // non-PCM audio format
    assert(WavCodec.parseHeaderRaw(corrupt(_(20) = 3)) == null)
    // channel count out of range (0 and 9)
    assert(WavCodec.parseHeaderRaw(corrupt(_(22) = 0)) == null)
    assert(WavCodec.parseHeaderRaw(corrupt(_(22) = 9)) == null)
    // zero sample rate
    assert(WavCodec.parseHeaderRaw(corrupt { b =>
      b(24) = 0; b(25) = 0; b(26) = 0; b(27) = 0
    }) == null)
    // byteRate inconsistent with rate * blockAlign
    assert(WavCodec.parseHeaderRaw(corrupt(_(28) = 1)) == null)
    // blockAlign inconsistent with channels * bps/8
    assert(WavCodec.parseHeaderRaw(corrupt(_(32) = 3)) == null)
    // unsupported bit depth
    assert(WavCodec.parseHeaderRaw(corrupt(_(34) = 12)) == null)
    // chunkSize inconsistent with dataSize
    assert(WavCodec.parseHeaderRaw(corrupt(_(4) = 1)) == null)
    // dataSize not a multiple of blockAlign
    assert(WavCodec.parseHeaderRaw(corrupt(_(40) = 1)) == null)
  }

  test("expression and batched WAV decode agree on real documents") {
    val docs = Tables.documents(spark, sf())
    val containers = Multimodal.withWavContainers(docs)
    val viaExpr = Multimodal.parseWavHeaders(containers)
      .orderBy(col("doc_id")).collect().map(_.toSeq)
    val viaBatch = Multimodal.parseWavHeadersBatch(containers, batchSize = 7)
      .orderBy(col("doc_id")).collect().map(_.toSeq)
    assert(viaExpr.nonEmpty)
    assert(viaExpr.toSeq == viaBatch.toSeq)
  }

  test("a corrupt container drops its row on both decode paths") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf()).limit(8)
    val withBad = Multimodal.withWavContainers(docs)
      .withColumn("container",
        when(col("doc_id") === 3,
          // flip the 'R' of RIFF: first frame payload starts at 1-indexed
          // position 12 (7B GRFT1 header + 4B length prefix), so this is
          // still a structurally-valid GRFT1 container whose embedded WAV
          // header the inner parse must reject
          expr("concat(substring(container, 1, 11), X'58'," +
            " substring(container, 13))").cast("binary"))
          .otherwise(col("container")))
    val exprIds = Multimodal.parseWavHeaders(withBad)
      .filter(col("num_channels").isNotNull)
      .select("doc_id").as[Long].collect().toSet
    val batchIds = Multimodal.parseWavHeadersBatch(withBad)
      .select("doc_id").as[Long].collect().toSet
    assert(exprIds == batchIds)
    assert(!exprIds.contains(3L))
    assert(exprIds.nonEmpty)
  }
}
