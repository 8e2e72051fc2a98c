package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{PipelineQueries, Sketches}

/** Sketch/dedup operator properties at sf0.001 (same 500-doc corpus). */
class DedupSpec extends SparkSpec {

  private lazy val sketches =
    Sketches.sketchTable(Tables.documents(spark, sf())).cache()

  test("minhash signature: 32 values, stable across evaluations") {
    val sigs1 = sketches.select("doc_id", "sig").collect()
    val sigs2 = Sketches.sketchTable(Tables.documents(spark, sf()))
      .select("doc_id", "sig").collect()
    assert(sigs1.map(_.getSeq[Long](1).size).forall(_ == 32))
    assert(sigs1.map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      === sigs2.map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap)
  }

  test("identical texts get identical sketches; sketch of self has hamming 0") {
    import spark.implicits._
    val two = Seq((1L, "a b c a"), (2L, "a b c a"), (3L, "x y z w"))
      .toDF("doc_id", "text")
    val sk = Sketches.sketchTable(two).collect()
      .map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getLong(2))).toMap
    assert(sk(1L) === sk(2L))
    assert(sk(1L) !== sk(3L))
  }

  test("minhash similarity estimates Jaccard for near-identical docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w11"), // J = 9/11 ≈ 0.82
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10")) // J = 0
      .toDF("doc_id", "text")
    val sk = Sketches.sketchTable(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def est(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.size
    assert(est(sk(1L), sk(2L)) > 0.5)
    assert(est(sk(1L), sk(3L)) === 0.0)
  }

  test("LSH candidates cover every true near-dup pair (recall check)") {
    val exact = PipelineQueries.dedupNgram.run(spark, sf())
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = PipelineQueries.dedupMinhashLsh.run(spark, sf())
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact === lsh) // verified-candidate output == exact output
    assert(exact.nonEmpty)  // the corpus has planted near-dups
  }

  test("LSH recall holds at bench scale too (sf0.1, 5000 docs)") {
    val exact = PipelineQueries.dedupNgram.run(spark, sf("0.1"))
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = PipelineQueries.dedupMinhashLsh.run(spark, sf("0.1"))
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact === lsh)
    assert(exact.nonEmpty)
  }

  test("simhash hamming pairs: threshold respected and canonical order") {
    val rows = PipelineQueries.dedupSimhash.run(spark, sf()).collect()
    assert(rows.forall(r => r.getLong(2) <= 3))
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
  }
}
