package graft

import graft.pipeline.PipelineQueries

/** Approximate-nearest-neighbor quality: multi-probe (nprobe=2) must
  * recover at least the recall of single-probe LSH against the exact
  * brute-force baseline. Candidate sets are supersets (own bucket plus
  * the least-confident-bit flip), and with tie-free deterministic
  * ranking a superset of candidates can only improve top-k recall. */
class AnnSpec extends SparkSpec {

  private def topk(q: org.apache.spark.sql.DataFrame, k: Int): Set[(Long, Long)] =
    q.collect()
      .filter(_.getLong(3) <= k)
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("multiprobe recall vs exact >= single-probe recall") {
    val exact = topk(PipelineQueries.annTopk.run(spark, sf()), 3)
    val lsh = topk(PipelineQueries.annLsh.run(spark, sf()), 3)
    val mp = topk(PipelineQueries.annMultiprobe.run(spark, sf()), 3)
    assert(exact.nonEmpty && mp.nonEmpty)

    val rLsh = (exact intersect lsh).size.toDouble / exact.size
    val rMp = (exact intersect mp).size.toDouble / exact.size
    info(f"recall@3: lsh=$rLsh%.3f multiprobe=$rMp%.3f")
    assert(rMp >= rLsh)
  }

  test("embedding decontamination: verdicts equal the exact pair set restricted to the eval boundary") {
    import org.apache.spark.sql.functions.col
    // ground truth: the exact all-pairs near-dup set (>=0.45) — a
    // corpus vec is contaminated iff it pairs with an eval vec (<25)
    val pairs = graft.pipeline.ExactBaselines.ndPairs(spark, sf("0.01"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val contaminatedTruth = pairs.collect {
      case (a, b) if a < 25 && b >= 25 => b
      case (a, b) if b < 25 && a >= 25 => a
    }.toSet
    val out = graft.registry.Registry.byName("d_decontaminate_embedding")
      .run(spark, sf("0.01")).collect()
      .map(r => (r.getLong(0), r.getBoolean(2)))
    assert(out.count(_._2) === contaminatedTruth.size)
    assert(out.filter(_._2).map(_._1).toSet === contaminatedTruth)
    // the report covers EVERY corpus vector, verdict or not
    val nCorpus = graft.Tables.embeddings(spark, sf("0.01"))
      .filter(col("vec_id") >= 25).count()
    assert(out.length.toLong === nCorpus)
    assert(contaminatedTruth.nonEmpty, "the corpus must plant >=1 leak")
  }

  test("multiprobe ranks reflect a candidate superset per query") {
    // multiprobe sees every nprobe=1 candidate plus the flipped-bit
    // bucket, so a pair appearing in both top-3 lists can only move DOWN
    // in rank under multiprobe (more competition), never up
    val lsh = PipelineQueries.annLsh.run(spark, sf()).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3))).toMap
    val mp = PipelineQueries.annMultiprobe.run(spark, sf()).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3))).toMap
    for (((pair, rnk)) <- mp; lr <- lsh.get(pair))
      assert(rnk >= lr, s"pair $pair ranked better under multiprobe than single-probe")
  }
}
