package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TarCodec

/** ustar codec contracts: member roundtrip, header-checksum
  * enforcement, octal/padding/end-block framing, and the WebDataset
  * sample convention. */
class TarCodecSpec extends AnyFunSuite {

  private def sample(): Array[Byte] =
    TarCodec.packSample(42L, "hello webdataset world", "en")

  test("sample shard roundtrips: names, sizes, byte-exact data") {
    val t = sample()
    val ms = TarCodec.parseRaw(t)
    assert(ms != null && ms.length == 3)
    assert(ms.map(_.name).toSeq == Seq("42.txt", "42.bmp", "42.json"))
    assert(ms(0).len == "hello webdataset world".length)
    val txt = new String(t, ms(0).off, ms(0).len, "UTF-8")
    assert(txt == "hello webdataset world")
    val json = new String(t, ms(2).off, ms(2).len, "UTF-8")
    assert(json == """{"id":42,"lang":"en"}""")
    // the bmp member is a REAL decodable BMP of the planted formulas
    val bmp = java.util.Arrays.copyOfRange(t, ms(1).off, ms(1).off + ms(1).len)
    val st = graft.functions.BmpCodec.pixelStatsRaw(bmp)
    assert(st != null && st(0) == 22 % 64 + 1 && st(1) == 22 % 48 + 1)
  }

  test("pack rejects out-of-contract member lists") {
    assert(TarCodec.pack(null) == null)
    assert(TarCodec.pack(Array.empty) == null)
    assert(TarCodec.pack(Array(("x" * 101) -> Array[Byte](1))) == null)
    assert(TarCodec.pack(Array("" -> Array[Byte](1))) == null)
  }

  test("header checksum is enforced: any header byte flip nulls") {
    val t = sample()
    // flip bytes across the FIRST header (name, mode, size, magic):
    // every one must break the recomputed checksum or a field check
    Seq(0, 50, 101, 125, 157, 258, 300).foreach { i =>
      val b = t.clone(); b(i) = (b(i) ^ 0x11).toByte
      assert(TarCodec.parseRaw(b) == null, s"header flip at $i must null")
    }
  }

  test("framing violations null: padding, end blocks, truncation, trailing") {
    val t = sample()
    val ms = TarCodec.parseRaw(t)
    // nonzero pad byte after the txt member data
    val padPos = ms(0).off + ms(0).len // first pad byte (txt < 512)
    val badPad = t.clone(); badPad(padPos) = 1
    assert(TarCodec.parseRaw(badPad) == null, "nonzero padding must null")
    // drop one end block
    assert(TarCodec.parseRaw(t.dropRight(512)) == null)
    // a third trailing zero block
    assert(TarCodec.parseRaw(t ++ new Array[Byte](512)) == null)
    // non-block-aligned length
    assert(TarCodec.parseRaw(t.dropRight(1)) == null)
    // truncation sweep never throws
    (0 until t.length by 97).foreach { n =>
      try TarCodec.parseRaw(java.util.Arrays.copyOf(t, n))
      catch { case e: Throwable => fail(s"truncation at $n threw: $e") }
    }
  }

  test("data corruption inside a member does NOT null the walk (framing-only contract)") {
    // the tar layer frames; member integrity belongs to the routed
    // decoder (the bmp parse, the json extract) — mirror of the
    // demux/decode split in AVI and GIF
    val t = sample()
    val ms = TarCodec.parseRaw(t)
    val b = t.clone(); b(ms(0).off) = 'X'
    val reparsed = TarCodec.parseRaw(b)
    assert(reparsed != null && reparsed.length == 3)
  }
}
