package graft

import org.apache.spark.sql.functions._

import graft.pipeline.BpeTrain

/** BPE merge-round training: word-type weighting, adjacency counting,
  * and the deterministic top-k order. */
class BpeTrainSpec extends SparkSpec {

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  private def run(df: org.apache.spark.sql.DataFrame, k: Int = 20) =
    BpeTrain.mergeCandidates(df, k).collect()
      .map(r => r.getString(0) -> r.getLong(1))

  test("pair counts are word-frequency weighted over types") {
    // "aa" occurs 3x (pair 'a a' x3), "ab" 1x -> 'a a':3, 'a b':1
    val m = run(docs("aa aa ab", "aa")).toMap
    assert(m === Map("a a" -> 3L, "a b" -> 1L))
  }

  test("within-word adjacency only — no pair across the space") {
    // "ab cd": pairs 'a b' and 'c d', never 'b c'
    val m = run(docs("ab cd")).toMap
    assert(m === Map("a b" -> 1L, "c d" -> 1L))
  }

  test("multiple occurrences inside one word all count") {
    // "aaa" has two 'a a' adjacencies
    val m = run(docs("aaa")).toMap
    assert(m === Map("a a" -> 2L))
  }

  test("single-char words contribute nothing") {
    val m = run(docs("a b c ab")).toMap
    assert(m === Map("a b" -> 1L))
  }

  test("rank 1 is the dominant pair; ties break on pair text") {
    val out = run(docs("zz zz zz", "aa bb", "aa"))
    // 'z z':3 first; 'a a':2; 'b b':1
    assert(out.head === ("z z" -> 3L))
    // tie case: 'x y' vs 'a b' at equal count -> 'a b' first
    val tied = run(docs("xy ab"))
    assert(tied.map(_._1).toSeq === Seq("a b", "x y"))
  }

  test("corpus: k rows, counts positive and non-increasing, layout-independent") {
    val d = Tables.documents(spark, sf())
    val out = run(d)
    assert(out.length === BpeTrain.TopK)
    assert(out.forall(_._2 > 0))
    assert(out.map(_._2).sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    val out2 = run(d.repartition(13))
    assert(out.toSeq === out2.toSeq)
  }
}
