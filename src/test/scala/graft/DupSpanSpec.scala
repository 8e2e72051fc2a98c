package graft

import org.apache.spark.sql.functions._

import graft.pipeline.PipelineQueries

/** Intra-corpus duplicated 8-gram span fraction (d_dup_span): exact toy
  * values, distinct-DOC duplication semantics (within-doc repetition
  * does not count), every doc reported, and the real-data implication
  * exact-copy docs => flagged. */
class DupSpanSpec extends SparkSpec {

  import spark.implicits._

  private val toy = Seq(
    (0L, "w1 w2 w3 w4 w5 w6 w7 w8 tail0"), // shares gram [w1..w8] with doc 1
    (1L, "w1 w2 w3 w4 w5 w6 w7 w8 tail1"),
    (2L, "short doc"), // < 8 tokens: zero grams, still reported
    (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9"), // unique text: zero dup grams
    (4L, "a b c d e f g h a b c d e f g h") // self-repeat only: NOT duplicated
  ).toDF("doc_id", "text")

  test("toy corpus: exact span counts, ppm arithmetic, self-repeats excluded") {
    val rows = PipelineQueries.dupSpanOf(toy).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    // 9 tokens -> 2 grams; exactly the first gram is shared
    assert(rows(0L) === ((2L, 1L, 500000L, true)))
    assert(rows(1L) === ((2L, 1L, 500000L, true)))
    // short doc: zero grams, zero ppm, present in the report
    assert(rows(2L) === ((0L, 0L, 0L, false)))
    assert(rows(3L) === ((2L, 0L, 0L, false)))
    // 16 tokens -> 9 grams; [a..h] occurs twice IN THE SAME doc only,
    // which is t_repetition's business, not corpus duplication
    assert(rows(4L) === ((9L, 0L, 0L, false)))
    assert(rows.size === 5)
  }

  test("real corpus: every doc reported; counts match a join-based recomputation") {
    val span = PipelineQueries.dupSpan.run(spark, sf())
    val docs = Tables.documents(spark, sf())
    assert(span.count() === docs.count(), "one report row per corpus doc")
    // the testdata's planted near-dups share >= 8-word spans
    assert(span.filter(col("flagged")).count() > 0)
    // internal consistency of the report
    assert(span.filter(col("n_dup_grams") > col("n_grams")).count() === 0)
    assert(span.filter(col("flagged") =!= (col("n_dup_grams") > 0)).count() === 0)
    assert(span.filter(col("dup_ppm") > 1000000L).count() === 0)
    // independent JOIN-shaped recomputation (the operator is agg-shaped):
    // per (doc, gram) position counts; a gram is duplicated iff some
    // OTHER doc carries it; per-doc dup positions = sum of counts
    val toksC = split(trim(col("text")), "\\s+")
    val grams = transform(sequence(lit(0), size(toksC) - 8),
      i => concat_ws(" ", (0 to 7).map(k => get(toksC, i + k)): _*))
    val pos = docs.filter(size(toksC) >= 8)
      .select(col("doc_id"), explode(grams).as("gram"))
    val pg = pos.groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("c"))
    val dup2 = pg
      .join(pg.select(col("gram"), col("doc_id").as("od")), Seq("gram"))
      .filter(col("doc_id") =!= col("od"))
      .select(col("doc_id"), col("gram"), col("c")).distinct()
      .groupBy(col("doc_id")).agg(sum(col("c")).as("n_dup2"))
    val mismatch = span.join(dup2, Seq("doc_id"), "left")
      .filter(coalesce(col("n_dup2"), lit(0L)) =!= col("n_dup_grams")).count()
    assert(mismatch === 0, "agg-shaped and join-shaped dup counts must agree")
  }

  test("plan shape: no cartesian products, aggregation-based dup detection") {
    val plan = PipelineQueries.dupSpan.run(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), "no cartesian product in the span plan")
    assert(!plan.contains("BroadcastNestedLoop"), "no BNLJ in the span plan")
  }
}
