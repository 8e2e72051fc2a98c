package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.EncodingUtil

/** Strict-UTF-8 kernel contracts: the full sequence-class envelope
  * (valid 1-4 byte forms, overlongs, surrogates, the U+10FFFF ceiling,
  * truncations, lone continuations) and the maximal-subpart error
  * accounting the query's planted counts lean on. */
class EncodingSpec extends AnyFunSuite {

  private def stats(bs: Int*): Seq[Long] =
    EncodingUtil.utf8StatsRaw(bs.map(_.toByte).toArray).toSeq

  test("valid sequences of every width decode as one char each") {
    assert(stats(0x41) === Seq(1, 1, 0, -1)) // 'A'
    assert(stats(0xC3, 0xA9) === Seq(2, 1, 0, -1)) // é
    assert(stats(0xE2, 0x82, 0xAC) === Seq(3, 1, 0, -1)) // €
    assert(stats(0xF0, 0x9F, 0x98, 0x80) === Seq(4, 1, 0, -1)) // emoji
    assert(stats(0xED, 0x9F, 0xBF) === Seq(3, 1, 0, -1)) // U+D7FF (below surrogates)
    assert(stats(0xF4, 0x8F, 0xBF, 0xBF) === Seq(4, 1, 0, -1)) // U+10FFFF
    assert(stats() === Seq(0, 0, 0, -1)) // empty input is clean
  }

  test("overlong forms are invalid at the lead or floor byte") {
    assert(stats(0xC0, 0xAF) === Seq(2, 0, 2, 0)) // C0 heads nothing; AF lone
    assert(stats(0xC1, 0x80) === Seq(2, 0, 2, 0))
    assert(stats(0xE0, 0x80, 0x80) === Seq(3, 0, 3, 0)) // E0 floor is A0
    assert(stats(0xF0, 0x80, 0x80, 0x80) === Seq(4, 0, 4, 0)) // F0 floor is 90
  }

  test("surrogate range and the U+10FFFF ceiling are invalid") {
    assert(stats(0xED, 0xA0, 0x80) === Seq(3, 0, 3, 0)) // U+D800
    assert(stats(0xF4, 0x90, 0x80, 0x80) === Seq(4, 0, 4, 0)) // U+110000
    assert(stats(0xF5, 0x80, 0x80, 0x80) === Seq(4, 0, 4, 0)) // F5-FF lead
  }

  test("maximal subpart: a truncated sequence counts ONE error spanning its valid prefix") {
    // E2 82 at EOF: lead + one good continuation = one maximal subpart
    assert(stats(0xE2, 0x82) === Seq(2, 0, 1, 0))
    // ... and mid-stream: the following ASCII byte still decodes
    assert(stats(0xE2, 0x82, 0x41) === Seq(3, 1, 1, 0))
    // 4-byte lead with two good continuations then a bad one: one error,
    // resync at the bad byte (which is ASCII and decodes)
    assert(stats(0xF0, 0x9F, 0x98, 0x41) === Seq(4, 1, 1, 0))
    // lone continuation between ASCII: one error, neighbors decode
    assert(stats(0x41, 0x80, 0x42) === Seq(3, 2, 1, 1))
  }

  test("first_bad reports the FIRST error's offset; later errors still count") {
    assert(stats(0x41, 0x80, 0x42, 0xFF) === Seq(4, 2, 2, 1))
  }

  test("query-planted classes produce exactly the oracle's counts") {
    val ascii = "hello world".getBytes("UTF-8")
    def planted(at: Int, bad: Int*): Array[Byte] =
      ascii.take(at) ++ bad.map(_.toByte) ++ ascii.drop(at)
    // lone continuation: 1 error at the offset
    assert(EncodingUtil.utf8StatsRaw(planted(4, 0x80)).toSeq ===
      Seq(12, 11, 1, 4))
    // overlong pair: 2 errors, first at the offset
    assert(EncodingUtil.utf8StatsRaw(planted(4, 0xC0, 0xAF)).toSeq ===
      Seq(13, 11, 2, 4))
    // truncated 3-byte at EOF: 1 error at old length
    assert(EncodingUtil.utf8StatsRaw(ascii ++ Array(0xE2.toByte, 0x82.toByte)).toSeq ===
      Seq(13, 11, 1, 11))
  }
}
