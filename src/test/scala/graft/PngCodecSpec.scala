package graft

import org.apache.spark.sql.functions._

import graft.functions.PngCodec
import graft.pipeline.Multimodal

/** PNG codec: big-endian round trip, CRC-verified parsing (the member
  * of the codec family the other two lack), structural corruption
  * modes, and expr == batch parity. */
class PngCodecSpec extends SparkSpec {

  test("encode/parseHeader round trip over dims and color types") {
    for (w <- Seq(1, 7, 255, 256, 1 << 20);
         h <- Seq(1, 13, 300);
         ct <- Seq(0, 2, 3, 4, 6)) {
      val png = PngCodec.encode(w, h, ct, seed = w * 31L + h)
      val hd = PngCodec.parseHeaderRaw(png)
      assert(hd != null, s"($w,$h,$ct)")
      assert(hd.toSeq === Seq(w.toLong, h.toLong, 8L, ct.toLong))
    }
  }

  test("invalid encode inputs degrade to null") {
    assert(PngCodec.encode(0, 5, 2, 1L) == null)
    assert(PngCodec.encode(5, -1, 2, 1L) == null)
    assert(PngCodec.encode(5, 5, 1, 1L) == null) // illegal color type
  }

  test("a bit flip ANYWHERE in the CRC-covered IHDR nulls the parse") {
    val png = PngCodec.encode(64, 48, 2, 7L)
    // bytes 12..28 are type+data (CRC-covered), 29..32 the CRC itself
    for (i <- 12 to 32) {
      val c = png.clone()
      c(i) = (c(i) ^ 0x01).toByte
      assert(PngCodec.parseHeaderRaw(c) == null, s"flip at $i not caught")
    }
  }

  test("structural corruption modes parse to null, not garbage") {
    val png = PngCodec.encode(64, 48, 2, 7L)
    assert(PngCodec.parseHeaderRaw(null) == null)
    assert(PngCodec.parseHeaderRaw(png.take(32)) == null) // truncated
    val badSig = png.clone(); badSig(0) = 'X'
    assert(PngCodec.parseHeaderRaw(badSig) == null)
    // legality table: color type 2 requires depth 8/16 — depth 4 with a
    // RECOMPUTED CRC must still be rejected (field check, not CRC check)
    val badDepth = png.clone()
    badDepth(24) = 4
    val crc = new java.util.zip.CRC32()
    crc.update(badDepth, 12, 17)
    val v = crc.getValue.toInt
    badDepth(29) = (v >>> 24).toByte; badDepth(30) = (v >>> 16).toByte
    badDepth(31) = (v >>> 8).toByte; badDepth(32) = v.toByte
    assert(PngCodec.parseHeaderRaw(badDepth) == null)
  }

  test("expression and batched PNG decode agree on the documents table") {
    val docs = Tables.documents(spark, sf())
    val a = Multimodal.parsePngHeaders(Multimodal.withPngContainers(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val b = Multimodal.parsePngHeadersBatch(Multimodal.withPngContainers(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(a === b)
    assert(a.size === docs.count())
    // both color types present (doc_id parity)
    assert(a.map(_._5) === Set(2L, 6L))
  }

  test("PNG decode stays inside whole-stage codegen") {
    val plan = Multimodal.parsePngHeaders(
      Multimodal.withPngContainers(Tables.documents(spark, sf())))
      .queryExecution.executedPlan
    val codegenStages = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenStages.nonEmpty, s"expected codegen:\n$plan")
  }
}
