package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

/** Strict UTF-8 validation over raw BYTES — the encoding gate a crawl
  * corpus runs before any text operator (a decoded String can no
  * longer see mojibake; the check must happen on the wire bytes).
  * Implements the Unicode/WHATWG strict envelope: overlong forms
  * (C0/C1 leads, E0 A0 / F0 90 floor bytes), the surrogate range (ED
  * A0-BF), the U+10FFFF ceiling (F4 90+, F5-FF leads), truncated
  * sequences (mid-stream and at EOF), and lone continuation bytes are
  * all invalid. Error accounting follows the Unicode-recommended
  * MAXIMAL SUBPART policy: a failed sequence counts ONE invalid and
  * the walk resumes at the first byte that could not extend it — so
  * `E2 82` at EOF is one error, while `C0 AF` is two (C0 can head
  * nothing; AF is then a lone continuation).
  */
object EncodingUtil {

  /** [n_bytes, n_chars, n_invalid, first_bad] — first_bad is the
    * 0-based byte offset of the first invalid sequence, -1 if clean. */
  def utf8StatsRaw(b: Array[Byte]): Array[Long] = {
    val n = b.length
    var i = 0
    var chars = 0L
    var invalid = 0L
    var firstBad = -1L
    def bad(at: Int, resume: Int): Int = {
      invalid += 1
      if (firstBad < 0) firstBad = at
      resume
    }
    while (i < n) {
      val b0 = b(i) & 0xFF
      if (b0 < 0x80) { chars += 1; i += 1 }
      else if (b0 < 0xC2) i = bad(i, i + 1) // lone continuation, C0, C1
      else if (b0 < 0xE0) { // 2-byte
        if (i + 1 < n && (b(i + 1) & 0xC0) == 0x80) { chars += 1; i += 2 }
        else i = bad(i, i + 1)
      } else if (b0 < 0xF0) { // 3-byte
        val lo = if (b0 == 0xE0) 0xA0 else 0x80 // overlong floor
        val hi = if (b0 == 0xED) 0x9F else 0xBF // surrogate ceiling
        if (i + 1 >= n || (b(i + 1) & 0xFF) < lo || (b(i + 1) & 0xFF) > hi)
          i = bad(i, i + 1)
        else if (i + 2 >= n || (b(i + 2) & 0xC0) != 0x80)
          i = bad(i, i + 2) // maximal subpart: lead + 1 good continuation
        else { chars += 1; i += 3 }
      } else if (b0 < 0xF5) { // 4-byte
        val lo = if (b0 == 0xF0) 0x90 else 0x80 // overlong floor
        val hi = if (b0 == 0xF4) 0x8F else 0xBF // U+10FFFF ceiling
        if (i + 1 >= n || (b(i + 1) & 0xFF) < lo || (b(i + 1) & 0xFF) > hi)
          i = bad(i, i + 1)
        else if (i + 2 >= n || (b(i + 2) & 0xC0) != 0x80)
          i = bad(i, i + 2)
        else if (i + 3 >= n || (b(i + 3) & 0xC0) != 0x80)
          i = bad(i, i + 3)
        else { chars += 1; i += 4 }
      } else i = bad(i, i + 1) // F5-FF
    }
    Array[Long](n.toLong, chars, invalid, firstBad)
  }

  /** Expression adapter: struct(n_bytes, n_chars, n_invalid,
    * first_bad) as an InternalRow. Called from generated code. */
  def utf8Stats(b: Array[Byte]): InternalRow = {
    val r = utf8StatsRaw(b)
    new GenericInternalRow(Array[Any](r(0), r(1), r(2), r(3)))
  }
}
