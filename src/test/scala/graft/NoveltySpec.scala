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
}
