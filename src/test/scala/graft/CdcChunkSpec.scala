package graft

import org.apache.spark.sql.functions._

import graft.pipeline.CdcChunk

/** Content-defined chunking: lossless reassembly, determinism, the
  * boundary-resynchronization property fixed-size chunking lacks, and
  * corpus invariants. */
class CdcChunkSpec extends SparkSpec {

  private def docsOf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // deterministic ~200-token text with enough variety to gate boundaries
  private val baseText: String =
    (1 to 200).map(i => s"w${i * 7 % 101}x$i").mkString(" ")

  test("chunks partition the token stream: counts add up, cids contiguous from 0") {
    val docs = docsOf(Seq((1L, baseText)))
    val ch = CdcChunk.chunks(docs).collect()
    assert(ch.map(_.getLong(3)).sum === 200L)
    val cids = ch.map(_.getLong(1)).sorted
    assert(cids === (0L until cids.length).toArray)
  }

  test("deterministic across runs and layouts") {
    val docs = docsOf(Seq((1L, baseText), (2L, baseText.toUpperCase)))
    val a = CdcChunk.chunks(docs).collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val b = CdcChunk.chunks(docs.repartition(7)).collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(a === b)
  }

  test("boundaries resynchronize after a prefix edit (the CDC property)") {
    // doc 2 = doc 1 with 3 tokens prepended: fixed-size chunking would
    // shift every chunk; CDC re-syncs at the next content boundary, so
    // the two docs share most chunk hashes.
    val docs = docsOf(Seq((1L, baseText), (2L, "zz0 zz1 zz2 " + baseText)))
    val stats = CdcChunk.chunkStats(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    val (n1, dup1) = stats(1L)
    assert(dup1 * 2 > n1, s"expected most of doc 1's $n1 chunks shared, got $dup1")
  }

  test("identical docs share every chunk; a lone doc shares none") {
    val docs = docsOf(Seq((1L, baseText), (2L, baseText),
      (3L, (1 to 50).map(i => s"q$i").mkString(" "))))
    val stats = CdcChunk.chunkStats(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(stats(1L)._1 === stats(1L)._2)
    assert(stats(1L)._3 === 1000000L)
    assert(stats(3L)._2 === 0L)
  }

  test("within-doc repetition alone is not duplication") {
    // one doc made of the same 30 tokens repeated: identical chunk
    // hashes WITHIN the doc must not count as dup (>= 2 DISTINCT docs)
    val rep = ((1 to 30).map(i => s"r$i").mkString(" ") + " ") * 5
    val stats = CdcChunk.chunkStats(docsOf(Seq((1L, rep.trim)))).collect()
    assert(stats.head.getLong(3) === 0L)
  }

  test("corpus: every doc reported, mean chunk length near the 8-token gate") {
    val docs = Tables.documents(spark, sf())
    val out = CdcChunk.chunkStats(docs)
    assert(out.count() === docs.count())
    val agg = out.agg(sum("n_tokens").cast("double").as("t"),
      sum("n_chunks").cast("double").as("c")).head
    val mean = agg.getDouble(0) / agg.getDouble(1)
    assert(mean > 3.0 && mean < 20.0, s"mean chunk length $mean")
  }
}
