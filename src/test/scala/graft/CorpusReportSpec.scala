package graft

import org.apache.spark.sql.functions._

import graft.pipeline.CorpusReport

/** Corpus health report: component consistency (each number must agree
  * with the operator that owns it) and crafted-corpus arithmetic. */
class CorpusReportSpec extends SparkSpec {

  private def metrics(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    CorpusReport.report(df).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("crafted corpus: every metric hand-checkable") {
    import spark.implicits._
    val nine = (1 to 9).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, nine, "en", 10L),            // novel
      (2L, nine, "en", 10L),            // exact dup of 1, novelty 0
      (3L, "a b c", "de", 5L),          // short (0 grams)
      (4L, "x y", "de", 500L)           // length outlier in de? mad=0 path
    ).toDF("doc_id", "text", "lang", "n_chars")
    val m = metrics(docs)
    assert(m("n_docs") === 4L)
    assert(m("n_tokens") === 9L + 9L + 3L + 2L)
    assert(m("mean_doc_tokens") === 23L / 4L)
    assert(m("langs") === 2L)
    assert(m("en_ppm") === 500000L)
    assert(m("exact_dup_doc_ppm") === 500000L) // docs 1+2 both dup
    // novelty: doc1 1e6, doc2 0, docs 3-4 0 grams -> mean = 1e6/4
    assert(m("novelty_mean_ppm") === 250000L)
    // de medians: n_chars {5,500} -> med 5, mad 0; 500 deviates -> 1
    // en: {10,10} -> no outliers
    assert(m("len_outlier_ppm") === 250000L)
  }

  test("corpus: metrics agree with the owning operators") {
    val docs = Tables.documents(spark, sf())
    val m = metrics(docs)
    assert(m("n_docs") === docs.count())
    val outl = graft.operators.RobustStats
      .madOutliers(docs.select(col("doc_id"), col("lang"), col("n_chars")),
        "doc_id", "lang", "n_chars")
      .agg(sum("outlier")).head.getLong(0)
    assert(m("len_outlier_ppm") === 1000000L * outl / docs.count())
    val nv = graft.pipeline.Novelty.noveltyOf(docs)
      .agg(sum("novelty_ppm"), count(lit(1))).head
    assert(m("novelty_mean_ppm") === nv.getLong(0) / nv.getLong(1))
    assert(m.values.forall(_ >= 0L))
  }
}
