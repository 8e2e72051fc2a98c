package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{SketchFunctions, SketchUtil}
import graft.pipeline.LangIdModel

/** The non-ASCII lane's pins (VERDICT r12 #1): charNgramsArray slides
  * by Unicode CODE POINT — not UTF-16 code unit — so gram windows on
  * non-BMP text match DuckDB's code-point substr, never split a
  * surrogate pair, and count length(text)-2 windows by code points.
  * The hash-green t_lang_id_unicode query proves engine parity; this
  * spec proves the lane demonstrates what it claims (separation on
  * the unicode marker corpus) and pins the kernel semantics directly
  * so a UTF-16 regression fails HERE, not just in the oracle diff. */
class LangIdUnicodeSpec extends SparkSpec {

  // "a\uD835\uDCC6\u00E9\u4E2Db" — 5 code points, 6 UTF-16 units (\uD835\uDCC6 = U+1D4C6 is a
  // surrogate pair). Escapes keep the source ASCII.
  private val s = "a\uD835\uDCC6\u00E9\u4E2Db"

  test("charNgramsArray windows are code-point windows (non-BMP input)") {
    val arr = SketchUtil.charNgramsArray(UTF8String.fromString(s), 3)
    val got = (0 until arr.numElements())
      .map(i => arr.getUTF8String(i).toString)
    // code-point trigrams of the 5-cp string: 3 windows
    val expected = Seq(
      "a\uD835\uDCC6\u00E9",
      "\uD835\uDCC6\u00E9\u4E2D",
      "\u00E9\u4E2Db")
    assert(got === expected,
      "a UTF-16 walk would yield 4 windows and split the surrogate pair")
  }

  test("no emitted gram ever holds a lone surrogate") {
    val arr = SketchUtil.charNgramsArray(UTF8String.fromString(s * 3), 3)
    (0 until arr.numElements()).foreach { i =>
      val g = arr.getUTF8String(i).toString
      g.zipWithIndex.foreach { case (c, j) =>
        if (Character.isHighSurrogate(c))
          assert(j + 1 < g.length && Character.isLowSurrogate(g(j + 1)),
            s"gram $i splits a surrogate pair: ${g.map(_.toInt.toHexString)}")
        if (Character.isLowSurrogate(c))
          assert(j > 0 && Character.isHighSurrogate(g(j - 1)),
            s"gram $i starts mid-pair: ${g.map(_.toInt.toHexString)}")
      }
    }
  }

  test("gram count is codePoints - 2, matching the oracle's length(text) - 2") {
    import spark.implicits._
    val texts = Seq(s, s * 4, "\uD835\uDCC6\uD835\uDCC6\uD835\uDCC6\uD835\uDCC6")
    val df = texts.toDF("text")
      .select(size(SketchFunctions.char_ngrams(col("text"), 3)).as("n"))
    val got = df.collect().map(_.getInt(0)).toSeq
    val want = texts.map(t => t.codePointCount(0, t.length) - 2)
    assert(got === want,
      s"UTF-16 counting would give ${texts.map(_.length - 2)}")
  }

  test("unicode marker corpus: the trained model classifies every doc correctly") {
    val docs = Tables.documents(spark, sf())
    val scored = LangIdModel.scoreOf(LangIdModel.withUnicodeMarkers(docs))
    val n = scored.count()
    val ok = scored.filter(col("correct")).count()
    assert(n > 0)
    assert(ok === n, s"unicode marker corpus must fully separate: $ok/$n")
  }

  test("unicode markers change only the text suffix, never ids or labels") {
    val docs = Tables.documents(spark, sf())
    val marked = LangIdModel.withUnicodeMarkers(docs)
    assert(marked.count() === docs.count())
    val joined = docs.select(col("doc_id"), col("lang").as("l0"), col("text").as("t0"))
      .join(marked, Seq("doc_id"))
    assert(joined.filter(col("l0") =!= col("lang")).count() === 0)
    assert(joined.filter(!col("text").startsWith(col("t0"))).count() === 0)
  }
}
