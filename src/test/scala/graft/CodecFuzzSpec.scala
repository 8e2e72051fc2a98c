package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{BmpCodec, FrameCodec, JpegCodec, PngCodec, WavCodec}

/** Fuzz the binary codecs' never-throw contract: for ARBITRARY bytes —
  * random blobs, random mutations of valid files, random truncations —
  * every parse either returns null or a structurally-consistent result,
  * and never throws. This is the property a 100-TB scan depends on: one
  * corrupt blob in a trillion rows filters out; it cannot kill a task.
  * Generators are driven with fixed seeds (PropertySpec's discipline) so
  * failures reproduce. */
class CodecFuzzSpec extends SparkSpec {

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val byteGen: Gen[Byte] = Gen.chooseNum(-128, 127).map(_.toByte)

  private val blob: Gen[Array[Byte]] =
    Gen.chooseNum(0, 200).flatMap(n => Gen.listOfN(n, byteGen).map(_.toArray))

  private def parsers: Seq[(String, Array[Byte] => Any)] = Seq(
    "grft1" -> (b => FrameCodec.parseRaw(b)),
    "bmp" -> (b => BmpCodec.parseHeaderRaw(b)),
    "wav" -> (b => WavCodec.parseHeaderRaw(b)),
    "png" -> (b => PngCodec.parseHeaderRaw(b)),
    // the round-8 full-payload decoders cross compressed boundaries —
    // the never-throw contract matters MOST where zlib is in the loop
    "png_pixels" -> (b => PngCodec.pixelStatsRaw(b)),
    "png_ahash" -> (b => PngCodec.aHash63(b)),
    "bmp_pixels" -> (b => BmpCodec.pixelStatsRaw(b)),
    "wav_audio_fp" -> (b => WavCodec.audioFp63(b)),
    "gunzip" -> (b => graft.functions.GzipCodec.gunzip(b)),
    // round 10: the JPEG path crosses an ENTROPY-CODED boundary — the
    // bit-level Huffman walk is the family's most corruption-sensitive
    "jpeg" -> (b => JpegCodec.parseHeaderRaw(b)),
    "jpeg_pixels" -> (b => JpegCodec.pixelStatsRaw(b)),
    // round 10 continuation: the AVI walk composes RIFF structure over
    // the JPEG entropy path — two failure surfaces in one parse
    "avi" -> (b => graft.functions.AviCodec.parseHeaderRaw(b)),
    "avi_frames" -> (b => graft.functions.AviCodec.frameStatsRaw(b, 1)),
    // WARC: text framing (CRLF headers + byte-counted blocks) rather
    // than binary framing — a different corruption surface
    "warc" -> (b => graft.functions.WarcCodec.parseRaw(b)),
    // GIF: the hand-rolled LZW boundary — bit-level corruption must
    // surface as null, never a crash or a silent wrong decode length
    "gif" -> (b => graft.functions.GifCodec.parseHeaderRaw(b)),
    "gif_pixels" -> (b => graft.functions.GifCodec.pixelStatsRaw(b)),
    // tar: block framing + header checksums (the WebDataset shard walk)
    "tar" -> (b => graft.functions.TarCodec.parseRaw(b)),
    // round 11 FLAC: MSB-first bit-level Rice/LPC decode — unary runs
    // and partition walks over arbitrary bytes are the family's
    // longest corruption-sensitive path
    "flac" -> (b => graft.functions.FlacCodec.parseHeaderRaw(b)),
    "flac_pcm" -> (b => graft.functions.FlacCodec.pcmStatsRaw(b)))

  test("random blobs never throw through any codec parse (200 seeded cases)") {
    (1L to 200L).foreach { seed =>
      val b = sample(blob, seed)
      parsers.foreach { case (name, p) =>
        try p(b)
        catch { case e: Throwable =>
          fail(s"$name threw on seed=$seed len=${b.length}: $e")
        }
      }
    }
  }

  test("random single-byte mutations of valid files never throw; accepted parses stay consistent") {
    val valids = Seq(
      FrameCodec.pack("the quick brown fox jumps over it".getBytes("UTF-8"), 7),
      BmpCodec.encode(13, 9, 42L),
      WavCodec.encode(16000, 2, 50, 7L),
      PngCodec.encode(13, 9, 2, 42L),
      JpegCodec.encode(13, 9, 3, 42L),
      graft.functions.GzipCodec.gzip("fuzz this member".getBytes("UTF-8")),
      graft.functions.AviCodec.encode(13, 9, 3, 25, 42L),
      graft.functions.WarcCodec.encode(42L, "http://w7.example/p42",
        "<html><body>fuzz page</body></html>"),
      graft.functions.GifCodec.encode(13, 9, 3, 42L),
      graft.functions.TarCodec.packSample(42L, "fuzz this shard", "en"),
      graft.functions.FlacCodec.encode(8000, 2, 300, 42L))
    (1L to 300L).foreach { seed =>
      val v = valids((seed % valids.length).toInt)
      val pos = sample(Gen.chooseNum(0, v.length - 1), seed)
      val nb = sample(byteGen, seed + 1000)
      val mutated = v.clone(); mutated(pos) = nb
      parsers.foreach { case (name, p) =>
        val r = try p(mutated)
        catch { case e: Throwable =>
          fail(s"$name threw on mutation seed=$seed pos=$pos: $e")
        }
        // WAV accepts only if the header stays consistent: sample count
        // must still be non-negative etc. — spot-check the one parser
        // whose output we can sanity-bound without re-deriving it
        r match {
          case a: Array[Long] if name == "wav" =>
            assert(a(0) >= 1 && a(0) <= 8 && a(1) > 0 && a(3) >= 0)
          case _ => ()
        }
      }
    }
  }

  test("random truncations of valid files never throw") {
    val valids = Seq(
      FrameCodec.pack("a slightly longer payload for frames".getBytes("UTF-8"), 5),
      BmpCodec.encode(7, 5, 3L),
      WavCodec.encode(8000, 1, 20, 1L),
      PngCodec.encode(7, 5, 6, 3L),
      JpegCodec.encode(7, 5, 1, 3L),
      graft.functions.GzipCodec.gzip("truncate this member".getBytes("UTF-8")))
    (1L to 150L).foreach { seed =>
      val v = valids((seed % valids.length).toInt)
      val cut = sample(Gen.chooseNum(0, v.length), seed)
      val t = java.util.Arrays.copyOf(v, cut)
      parsers.foreach { case (name, p) =>
        try p(t)
        catch { case e: Throwable =>
          fail(s"$name threw on truncation seed=$seed cut=$cut: $e")
        }
      }
      // a truncation strictly inside the file must REJECT (the declared
      // sizes no longer fit), except GRFT1's 0-frame prefix case is
      // still covered by its trailing-byte check — all three are strict
      if (cut < v.length) {
        assert(BmpCodec.parseHeaderRaw(java.util.Arrays.copyOf(valids(1), math.min(cut, valids(1).length))) == null
          || math.min(cut, valids(1).length) >= BmpCodec.HeaderLen)
      }
    }
  }
}
