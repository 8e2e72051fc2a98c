package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{AviCodec, JpegCodec}

/** AVI MJPEG container contracts: header roundtrip against pure
  * arithmetic, per-frame decode against the planted-formula twin,
  * stride sampling arithmetic, DRI transparency through the container,
  * the demuxer-vs-decoder failure split, and the structural-corruption
  * envelope (every targeted violation nulls, nothing throws). */
class AviCodecSpec extends AnyFunSuite {

  /** Planted-formula twin for one frame (never touches bytes):
    * exact (sum_r, sum_g, sum_b, peak_r, peak_g, peak_b). */
  private def frameTwin(w: Int, h: Int, fs: Long): Array[Long] = {
    val out = new Array[Long](6)
    for (y <- 0 until h; x <- 0 until w) {
      val yv = JpegCodec.blockY(fs, x / 8, y / 8)
      val cb = JpegCodec.blockCb(fs, x / 16, y / 16)
      val cr = JpegCodec.blockCr(fs, x / 16, y / 16)
      val (r, g, b) = JpegCodec.ycbcrToRgb(yv, cb, cr)
      out(0) += r; out(1) += g; out(2) += b
      out(3) = math.max(out(3), r)
      out(4) = math.max(out(4), g)
      out(5) = math.max(out(5), b)
    }
    out
  }

  test("header roundtrip over a geometry/rate/dri grid") {
    for {
      (w, h) <- Seq((8, 8), (13, 9), (16, 16), (31, 26), (1, 1), (24, 17))
      nf <- Seq(1, 2, 7)
      fps <- Seq(10, 20, 25, 50)
      dri <- Seq(0, 2)
    } {
      val avi = AviCodec.encode(w, h, nf, fps, seed = 42L, dri)
      assert(avi != null, s"encode null for w=$w h=$h nf=$nf fps=$fps")
      val hd = AviCodec.parseHeaderRaw(avi)
      assert(hd != null, s"parse null for w=$w h=$h nf=$nf fps=$fps dri=$dri")
      assert(hd.toSeq == Seq[Long](w, h, nf, fps, nf.toLong * (1000 / fps)))
    }
  }

  test("encode rejects out-of-contract inputs with null, never throws") {
    assert(AviCodec.encode(8, 8, 0, 25, 1L) == null)   // no frames
    assert(AviCodec.encode(8, 8, AviCodec.MaxFrames + 1, 25, 1L) == null)
    assert(AviCodec.encode(8, 8, 2, 30, 1L) == null)   // 30 ∤ 1e6
    assert(AviCodec.encode(8, 8, 2, 0, 1L) == null)
    assert(AviCodec.encode(0, 8, 2, 25, 1L) == null)   // bad geometry
  }

  test("container-size cap degrades to null, never a negative allocation (ADVICE r10 #1)") {
    // An in-contract 4096-frame ask of ~550 KB JPEGs totals >2 GiB: the
    // old Int accumulator wrapped negative and ByteArrayOutputStream
    // threw IllegalArgumentException — violating nulls-never-throws.
    // The Long accumulator + MaxContainerBytes cap must yield null.
    // Driven through `assemble` with synthetic frame bytes (forcing the
    // cap through real encodes costs ~a minute); `encode` itself holds
    // the same cap via its in-loop early bail.
    val big = new Array[Byte](1 << 20) // 1 MiB frame
    val over = Array.fill(300)(big)    // 300 MiB > 256 MiB cap
    assert(AviCodec.assemble(over, 16, 16, 25) == null)
    // under the cap, assemble still frames a parseable container
    val small = AviCodec.encode(16, 16, 2, 25, 7L)
    assert(small != null)
  }

  test("frame stats equal the planted-formula twin, every frame, stride 1") {
    val (w, h, nf, seed) = (19, 11, 5, 77L)
    val avi = AviCodec.encode(w, h, nf, 25, seed)
    val rows = AviCodec.frameStatsRaw(avi, 1)
    assert(rows != null && rows.length == nf)
    rows.zipWithIndex.foreach { case (r, f) =>
      assert(r(0) == f)
      assert(r.drop(1).toSeq == frameTwin(w, h, seed * 1000L + f).toSeq,
        s"frame $f stats mismatch")
    }
  }

  test("stride sampling takes frames 0, s, 2s, ... (ceil(nf/s) rows)") {
    val avi = AviCodec.encode(10, 10, 7, 10, 3L)
    for (s <- 1 to 8) {
      val rows = AviCodec.frameStatsRaw(avi, s)
      assert(rows.length == (7 + s - 1) / s, s"stride $s count")
      assert(rows.map(_(0)).toSeq == (0 until 7 by s).map(_.toLong))
    }
    assert(AviCodec.frameStatsRaw(avi, 0) == null)
  }

  test("restart markers are transparent: same frame stats, different bytes") {
    val a = AviCodec.encode(17, 13, 4, 20, 9L, restartInterval = 0)
    val b = AviCodec.encode(17, 13, 4, 20, 9L, restartInterval = 2)
    assert(!java.util.Arrays.equals(a, b))
    assert(AviCodec.frameStatsRaw(a, 1).map(_.toSeq).toSeq ==
      AviCodec.frameStatsRaw(b, 1).map(_.toSeq).toSeq)
  }

  test("seeds congruent mod 256 re-encode to bit-identical containers") {
    // the mirror-dedup premise: content is seed-mod-256 determined
    val a = AviCodec.encode(12, 9, 3, 50, 7L)
    val b = AviCodec.encode(12, 9, 3, 50, 7L + 256L)
    // frame seeds differ by 256*1000 ≡ 0 (mod 256) → same planted blocks
    assert(java.util.Arrays.equals(a, b))
  }

  test("demuxer/decoder failure split: corrupt EOI fails frames, not header") {
    val avi = AviCodec.encode(9, 9, 3, 25, 5L)
    // find the LAST frame's EOI (the container's final 0xFFD9 inside movi)
    val hd = AviCodec.parseHeaderRaw(avi)
    assert(hd != null)
    // idx1 is 16*3 bytes at the tail; last frame payload ends just before
    // (plus possible pad). Zero the last 0xFFD9 pair found before idx1.
    val idxStart = avi.length - 8 - 16 * 3
    var i = idxStart - 2
    while (!((avi(i) & 0xFF) == 0xFF && (avi(i + 1) & 0xFF) == 0xD9)) i -= 1
    val bad = avi.clone()
    bad(i) = 0; bad(i + 1) = 0
    assert(AviCodec.parseHeaderRaw(bad) != null,
      "container structure is intact — the demuxer level must still pass")
    assert(AviCodec.frameStatsRaw(bad, 1) == null,
      "the decode level must fail on the corrupted frame")
  }

  test("targeted structural violations null at the header level") {
    val avi = AviCodec.encode(11, 8, 2, 25, 13L)
    def mutated(f: Array[Byte] => Unit): Array[Byte] = {
      val b = avi.clone(); f(b); b
    }
    val cases: Seq[(String, Array[Byte])] = Seq(
      "magic" -> mutated(b => b(0) = 'X'),
      "riff size" -> mutated(b => b(4) = (b(4) + 1).toByte),
      "form type" -> mutated(b => b(9) = 'X'),
      "handler fcc" -> mutated { b =>
        // strh fccHandler at offset 100+8+4 = 112
        b(112) = 'X'
      },
      "scale" -> mutated { b =>
        b(128) = 2 // strh scale field (offset 100+8+20)
      },
      "strf compression" -> mutated { b =>
        b(188) = 'X' // biCompression (layout pinned below)
      },
      "idx1 offset" -> mutated { b =>
        b(b.length - 8) = (b(b.length - 8) + 1).toByte
      },
      "idx1 size" -> mutated { b =>
        b(b.length - 4) = (b(b.length - 4) + 1).toByte
      },
      "truncated" -> avi.dropRight(1),
      "trailing byte" -> (avi :+ 0.toByte),
      "frame SOI" -> mutated { b =>
        // first movi chunk payload starts at 212+12+8 = 232
        b(232) = 0
      })
    cases.foreach { case (name, b) =>
      val r = try AviCodec.parseHeaderRaw(b)
      catch { case e: Throwable => fail(s"$name threw: $e") }
      assert(r == null, s"$name must null")
    }
    // and truncation at EVERY length nulls or parses, never throws
    (0 until avi.length by 7).foreach { n =>
      try AviCodec.parseHeaderRaw(java.util.Arrays.copyOf(avi, n))
      catch { case e: Throwable => fail(s"truncation at $n threw: $e") }
    }
  }

  test("library-stride frame keys: overlapping windows share exactly their intersection") {
    // stride 1: frame seeds are library indices — doc A carries [5, 10),
    // doc B [7, 12): the byte-identity keys must intersect on {7, 8, 9}
    val a = AviCodec.encode(16, 12, 5, 25, 5L, 0, seedStride = 1L)
    val b = AviCodec.encode(16, 12, 5, 25, 7L, 0, seedStride = 1L)
    val ka = AviCodec.frameKeysRaw(a).map(_._2)
    val kb = AviCodec.frameKeysRaw(b).map(_._2)
    assert(ka.distinct.length == 5 && kb.distinct.length == 5,
      "library frames must be byte-distinct")
    assert(ka.toSet.intersect(kb.toSet).size == 3)
    // and the shared keys are exactly A's frames 2,3,4 == B's 0,1,2
    assert(ka.drop(2).toSeq == kb.take(3).toSeq)
  }

  test("frame keys are md5 of the exact frame bytes (re-encode changes them)") {
    val plain = AviCodec.encode(16, 12, 3, 25, 9L, 0, seedStride = 1L)
    val keys = AviCodec.frameKeysRaw(plain)
    // independent demux: extract frame 0 via stats-path offsets is not
    // exposed, so re-encode the same frame standalone and hash it
    val frame0 = JpegCodec.encode(16, 12, 3, 9L)
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = md.digest(frame0).map(x => f"$x%02x").mkString
    assert(keys(0)._2 == expect)
    // a re-encode with restart markers has identical CONTENT but
    // different bytes — byte-identity keys must differ (the documented
    // boundary between this op and the decoded-content dedup)
    val dri = AviCodec.encode(16, 12, 3, 25, 9L, 2, seedStride = 1L)
    val keysDri = AviCodec.frameKeysRaw(dri)
    assert(keys.map(_._2).toSeq != keysDri.map(_._2).toSeq)
    assert(AviCodec.frameStatsRaw(plain, 1).map(_.toSeq).toSeq ==
      AviCodec.frameStatsRaw(dri, 1).map(_.toSeq).toSeq,
      "decoded content must still agree")
  }

  test("fixed layout offsets used by the corruption cases are real") {
    // pin the layout arithmetic the mutation offsets above rely on
    val avi = AviCodec.encode(11, 8, 2, 25, 13L)
    def fcc(i: Int) = new String(avi.slice(i, i + 4), "US-ASCII")
    assert(fcc(0) == "RIFF" && fcc(8) == "AVI ")
    assert(fcc(12) == "LIST" && fcc(20) == "hdrl")
    assert(fcc(24) == "avih")
    assert(fcc(88) == "LIST" && fcc(96) == "strl")
    assert(fcc(100) == "strh" && fcc(108) == "vids" && fcc(112) == "MJPG")
    assert(fcc(164) == "strf")
    assert(fcc(188) == "MJPG") // biCompression
    assert(fcc(212) == "LIST" && fcc(220) == "movi")
    assert(fcc(224) == "00dc")
    assert((avi(232) & 0xFF) == 0xFF && (avi(233) & 0xFF) == 0xD8) // SOI
  }
}
