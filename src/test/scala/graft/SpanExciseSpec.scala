package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.{PipelineQueries, SpanExcise}

/** Duplicate-span excision (d_dup_span_excise): exact toy rewrites
  * (covered positions removed, boundary tokens survive, within-doc
  * repeats untouched), agreement with d_dup_span's detection counts,
  * and idempotency — excise∘excise = excise — on the planted corpus
  * (provable) AND the real documents corpus (checked). */
class SpanExciseSpec extends SparkSpec {

  import spark.implicits._

  private def excise(df: DataFrame): DataFrame =
    SpanExcise.dupSpanExciseOf(df)

  private def asMap(df: DataFrame): Map[Long, (String, Long)] =
    df.collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap

  test("toy corpus: exact rewrites") {
    val toy = Seq(
      // docs 0/1 share exactly the 8-gram [w1..w8]; the tails differ.
      // Covered positions = the one gram start -> tokens 0..7 removed.
      (0L, "w1 w2 w3 w4 w5 w6 w7 w8 tail0"),
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 tail1"),
      (2L, "short doc"),                       // no grams: unchanged
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9"),      // unique: unchanged
      (4L, "a b c d e f g h a b c d e f g h")  // self-repeat only: unchanged
    ).toDF("doc_id", "text")
    val m = asMap(excise(toy))
    assert(m(0L) === (("tail0", 8L)))
    assert(m(1L) === (("tail1", 8L)))
    assert(m(2L) === (("short doc", 0L)))
    assert(m(3L) === (("u1 u2 u3 u4 u5 u6 u7 u8 u9", 0L)))
    assert(m(4L) === (("a b c d e f g h a b c d e f g h", 0L)))
    assert(m.size === 5)
  }

  test("overlapping duplicated grams merge into one excised span") {
    // docs share a 10-token run -> 3 duplicated gram starts (0,1,2);
    // covered union = tokens 0..9, prefix/suffix survive intact
    val toy = Seq(
      (0L, "p0 s1 s2 s3 s4 s5 s6 s7 s8 s9 s10 q0"),
      (1L, "r0 s1 s2 s3 s4 s5 s6 s7 s8 s9 s10 t0")
    ).toDF("doc_id", "text")
    val m = asMap(excise(toy))
    assert(m(0L) === (("p0 q0", 10L)))
    assert(m(1L) === (("r0 t0", 10L)))
  }

  test("planted corpus: exactly the planted tokens removed; counts agree with detection") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val planted = SpanExcise.withPlantedSpans(docs)
    val m = asMap(excise(planted))
    docs.select("doc_id", "n_chars").collect().foreach { r =>
      val (id, n) = (r.getLong(0), 16 + r.getLong(1) % 9)
      val expect = (0L until n).map(i => s"d${id}w$i").mkString(" ")
      val removed = (if (id % 3 == 0) 12L else 0L) + (if (id % 4 == 0) 9L else 0L)
      assert(m(id) === ((expect, removed)), s"doc $id")
    }
    // detection agreement: n_removed > 0 exactly where d_dup_span flags
    val flagged = PipelineQueries.dupSpanOf(planted)
      .filter(col("flagged")).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(m.filter(_._2._2 > 0).keySet === flagged)
  }

  test("winnow: guarantee on long shared runs, subset of exact, density, short docs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val planted = SpanExcise.withPlantedSpans(docs)
    def report(df: DataFrame) = SpanExcise.dupSpanWinnowOf(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))).toMap
    val w = report(planted)
    // winnowing GUARANTEE: span A is 12 tokens = 5 shared gram
    // positions >= WinnowW, so every %3 doc shares a minimizer and
    // MUST be flagged (span B at 2 gram positions carries no guarantee)
    w.foreach { case (id, (_, _, _, fl)) =>
      if (id % 3 == 0) assert(fl, s"doc $id: guarantee violated")
    }
    // winnow-flagged is a SUBSET of exact span-flagged (a duplicated
    // minimizer is a duplicated gram)
    val exact = PipelineQueries.dupSpanOf(planted).collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    w.foreach { case (id, (_, _, nd, fl)) =>
      if (fl) assert(exact(id), s"doc $id: winnow flagged but exact not")
      assert((nd > 0) === fl)
    }
    // density: expected 2/(w+1) of gram positions become minimizers;
    // allow a generous band around it
    val (sumG, sumM) = w.values.foldLeft((0L, 0L)) {
      case ((a, b), (g, m, _, _)) => (a + g, b + m)
    }
    val density = sumM.toDouble / sumG
    assert(density > 0.2 && density < 0.6, s"density $density")
    // short docs (1..3 grams) still fingerprint via their global min
    import spark.implicits._
    val shorts = Seq(
      (0L, "a b c d e f g h i"),          // 2 grams, shared with doc 1
      (1L, "a b c d e f g h i"),
      (2L, "u1 u2 u3 u4 u5 u6 u7 u8")     // 1 gram, unique
    ).toDF("doc_id", "text")
    val sr = report(shorts)
    assert(sr(0L)._4 && sr(1L)._4) // the single-window minimizer matches
    assert(sr(2L) === ((1L, 1L, 0L, false)))
  }

  test("idempotent: excise(excise(x)) = excise(x) on planted AND real corpora") {
    for (src <- Seq(
        SpanExcise.withPlantedSpans(Tables.documents(spark, "/root/testdata/sf0.001")),
        Tables.documents(spark, "/root/testdata/sf0.001").select("doc_id", "text"))) {
      val once = excise(src)
      val cleaned = once.select(col("doc_id"), col("text_clean").as("text"))
      val twice = asMap(excise(cleaned))
      asMap(once).foreach { case (id, (txt, _)) =>
        assert(twice(id) === ((txt, 0L)), s"doc $id not a fixpoint")
      }
    }
  }
}
