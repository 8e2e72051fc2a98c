package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Novelty

/** N-gram novelty: first-occurrence attribution by doc order, the
  * dup-span complement law, and short-doc degenerates. */
class NoveltySpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def run(rows: (Long, String)*): Map[Long, (Long, Long, Long)] =
    Novelty.noveltyOf(docs(rows: _*)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  private val eight = (1 to 8).map(i => s"t$i").mkString(" ")
  private val nine = (1 to 9).map(i => s"t$i").mkString(" ")

  test("a fully original doc scores 1e6; its later copy scores 0") {
    val m = run(1L -> nine, 2L -> nine)
    assert(m(1L) === ((2L, 2L, 1000000L)))
    assert(m(2L) === ((2L, 0L, 0L)))
  }

  test("first-occurrence goes to the SMALLEST doc_id, not row order") {
    val m = run(5L -> eight, 3L -> eight)
    assert(m(3L)._3 === 1000000L)
    assert(m(5L)._3 === 0L)
  }

  test("partial overlap scores partially") {
    // doc 2 = doc 1's 9 tokens + 1 new token: 3 grams, the last one new
    val m = run(1L -> nine, 2L -> (nine + " t10"))
    assert(m(2L) === ((3L, 1L, 333333L)))
  }

  test("docs under 8 tokens report 0 grams, novelty 0") {
    val m = run(1L -> "a b c", 2L -> eight)
    assert(m(1L) === ((0L, 0L, 0L)))
    assert(m(2L)._3 === 1000000L)
  }

  test("within-doc repeats of a doc's own new gram count as novel") {
    val rep = eight + " " + eight
    val m = run(1L -> rep)
    // 16 tokens -> 9 grams; every gram first occurs in doc 1
    assert(m(1L)._1 === 9L)
    assert(m(1L)._2 === 9L)
  }

  test("corpus law: novel + duplicated-across-docs <= total, every doc present") {
    val d = Tables.documents(spark, sf())
    val out = Novelty.noveltyOf(d)
    assert(out.count() === d.count())
    val bad = out.filter(col("novel_grams") > col("n_grams") ||
      col("novelty_ppm") > 1000000L || col("novelty_ppm") < 0L)
    assert(bad.count() === 0)
    // the corpus-level complement: total novel grams across docs equals
    // the number of DISTINCT grams' first occurrences weighted by their
    // in-first-doc multiplicity — at minimum, sum(novel) >= distinct gram count
    val sumNovel = out.agg(sum("novel_grams")).head.getLong(0)
    assert(sumNovel > 0)
  }

  test("word_ngrams kernel == the higher-order transform build it replaced") {
    // the round-8 kernel swap (SketchUtil.ngramsArray scaladoc) must be
    // a pure performance change: same grams, same order, same row set —
    // including the edge docs (exactly 8 tokens, under 8, empty, messy
    // whitespace, duplicate grams kept positionally)
    import graft.functions.SketchFunctions.word_ngrams
    val corpus = docs(
      1L -> "a b c d e f g h i j",
      2L -> "a b c d e f g h", // exactly 8
      3L -> "too short",
      4L -> "",
      5L -> "  x  y\tz q r s t u v  ", // messy whitespace
      6L -> "a a a a a a a a a a") // duplicate grams, kept per position
    def transformBuild(c: org.apache.spark.sql.Column) =
      transform(sequence(lit(0), size(c) - 8),
        i => concat_ws(" ", (0 to 7).map(k => get(c, i + k)): _*))
    val viaTransform = corpus
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 8)
      .select(col("doc_id"), posexplode(transformBuild(col("toks"))))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val viaKernel = corpus
      .select(col("doc_id"), posexplode(word_ngrams(col("text"), 8)))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(viaKernel === viaTransform)
    assert(viaKernel.exists(_._1 == 6L)) // duplicate grams present
    // distinct mode matches array_distinct of the positional build
    val distTransform = corpus
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 8)
      .select(col("doc_id"), posexplode(array_distinct(transformBuild(col("toks")))))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val distKernel = corpus
      .select(col("doc_id"), posexplode(word_ngrams(col("text"), 8, distinct = true)))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(distKernel === distTransform)
  }
}
