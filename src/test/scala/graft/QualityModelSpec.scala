package graft

import graft.pipeline.QualityModel

/** Learned-quality-filter contracts on a PLANTED corpus whose token
  * distributions make the naive-Bayes posterior hand-computable: the
  * spec re-derives the fixed-point arithmetic from the construction
  * (its own ilog twin), pins the exact score at the decision boundary,
  * and pins the case that makes a learned filter worth having — the
  * model overriding its own weak label on distribution evidence. */
class QualityModelSpec extends SparkSpec {

  // the spec's independent twin of the fixed-point base-2 log
  private def ilog(x: Long): Long = {
    require(x >= 1)
    val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
    1024L * e + ((x * 1024L) >> e) - 1024L
  }

  // Planted corpus. Weak rule: 16 * stop_hits >= n_tokens.
  //  - docs 0-3 (pos):  "the the the gold gold"      (sh=3, n=5 -> pos)
  //  - docs 4-7 (neg):  "junk junk junk junk junk junk" (sh=0 -> neg)
  //  - doc  8  (probe A): "gold gold gold gold"       (sh=0 -> weak NEG,
  //    but its tokens are the POS class's signature word)
  //  - doc  9  (probe B): "junk junk junk"            (sh=0 -> neg)
  private def corpus = {
    import spark.implicits._
    ((0L to 3L).map(i => (i, "the the the gold gold")) ++
      (4L to 7L).map(i => (i, "junk junk junk junk junk junk")) ++
      Seq((8L, "gold gold gold gold"), (9L, "junk junk junk")))
      .toDF("doc_id", "text")
  }

  // class counts DERIVED from the construction (never from the model):
  //   pos docs: 4x(the*3 + gold*2) -> the=12, gold=8, N_pos=20, D_pos=4
  //   neg docs: 4x junk*6 + probeA gold*4 + probeB junk*3
  //          -> junk=27, gold=4, N_neg=31, D_neg=6; V=3
  private val V = 3L
  private val (nPos, nNeg, dPos, dNeg) = (20L, 31L, 4L, 6L)
  private def llr(cp: Long, cn: Long): Long =
    (ilog(cp + 1) - ilog(nPos + V)) - (ilog(cn + 1) - ilog(nNeg + V))
  private val prior = ilog(dPos) - ilog(dNeg)

  test("posterior is exactly the fixed-point NB arithmetic of the construction") {
    val got = QualityModel.scoreOf(corpus).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2), r.getLong(3),
        r.getBoolean(4))).toMap
    val llrThe = llr(12, 0)
    val llrGold = llr(8, 4)
    val llrJunk = llr(0, 27)
    // every doc's score re-derived from planted counts
    assert(got(0L) === ((5L, true, prior + 3 * llrThe + 2 * llrGold,
      prior + 3 * llrThe + 2 * llrGold > 0)))
    assert(got(4L) === ((6L, false, prior + 6 * llrJunk,
      prior + 6 * llrJunk > 0)))
    assert(got(8L) === ((4L, false, prior + 4 * llrGold,
      prior + 4 * llrGold > 0)))
    assert(got(9L) === ((3L, false, prior + 3 * llrJunk,
      prior + 3 * llrJunk > 0)))
  }

  test("decision boundary: evidence overrides the weak label, sign decides the gate") {
    val got = QualityModel.scoreOf(corpus).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(2), r.getBoolean(4))).toMap
    // probe A: weak-labeled NEG, predicted POS purely on distribution
    assert(got(8L) === ((false, true)))
    // signature docs classify with their class
    (0L to 3L).foreach(i => assert(got(i) === ((true, true))))
    (4L to 7L).foreach(i => assert(got(i) === ((false, false))))
    assert(got(9L) === ((false, false)))
    // and the d_* gate keeps exactly the predicted-positive set
    val kept = QualityModel.scoreOf(corpus)
      .filter(org.apache.spark.sql.functions.col("predicted"))
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(0L, 1L, 2L, 3L, 8L))
  }

  test("split training: unseen tokens take the Laplace fallback; artifact scorer agrees exactly") {
    import spark.implicits._
    val (w, consts) = QualityModel.train(corpus)
    val (wm, prior, unseen) = QualityModel.trainArtifact(corpus)
    // a batch doc whose tokens the training corpus never saw
    val probe = Seq((100L, "neverseen neverseen"),
      (101L, "gold neverseen")).toDF("doc_id", "text")
    val got = QualityModel.scoreWith(w, consts, probe).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got(100L) === prior + 2 * unseen)
    assert(got(101L) === prior + wm("gold") + unseen)
    // the stateless literal-map scorer (the streaming form) computes
    // the IDENTICAL integers
    val rowGot = QualityModel.scoreRows(probe, wm, prior, unseen).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rowGot === got)
  }

  test("incremental update: merged sufficient statistics equal a full retrain exactly") {
    import org.apache.spark.sql.functions.col
    val standing = corpus.filter(col("doc_id") < 8)
    val batch = corpus.filter(col("doc_id") >= 8)
    val merged = QualityModel.mergeCounts(
      QualityModel.trainCounts(standing), QualityModel.trainCounts(batch))
    val full = QualityModel.trainCounts(corpus)
    def cntMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(cntMap(merged._1) === cntMap(full._1))
    assert(merged._2.head() === full._2.head())
    // an empty batch is a no-op fold
    val noop = QualityModel.mergeCounts(
      QualityModel.trainCounts(corpus),
      QualityModel.trainCounts(corpus.filter(col("doc_id") < 0)))
    assert(cntMap(noop._1) === cntMap(full._1))
    // and the merged MODEL scores identically to the self-trained one
    val (w, c) = QualityModel.modelFromCounts(merged)
    val a = QualityModel.scoreWith(w, c, corpus).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val b = QualityModel.scoreOf(corpus).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(a === b)
  }

  test("ilog twin sanity: exact at powers of two, monotone between") {
    assert(ilog(1) === 0L)
    assert(ilog(2) === 1024L)
    assert(ilog(4) === 2048L)
    assert(ilog(1024) === 10240L)
    val vals = (1L to 4096L).map(ilog)
    assert(vals.zip(vals.tail).forall { case (a, b) => a <= b })
  }

  test("gopher rules: constructed docs pin every rule's boundary; corpus exercises both outcomes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val fifty = (1 to 50).map(_ => "word").mkString(" ")
    val docs = Seq(
      // 0: 50 words, mean 4, all alpha, has the+a -> pass
      (0L, "the a " + (1 to 48).map(_ => "word").mkString(" ")),
      // 1: 49 words -> r_word_count fails alone
      (1L, "the a " + (1 to 47).map(_ => "word").mkString(" ")),
      // 2: mean word length < 3 (all "ab") -> r_mean_len fails
      (2L, "the a " + (1 to 48).map(_ => "ab").mkString(" ")),
      // 3: only one stopword kind -> r_stopwords fails
      (3L, "the " + (1 to 49).map(_ => "word").mkString(" ")),
      // 4: >20% non-alpha tokens -> r_alpha fails
      (4L, "the a " + (1 to 36).map(_ => "word").mkString(" ") + " " +
        (1 to 12).map(_ => "123").mkString(" "))
    ).toDF("doc_id", "text")
    val out = graft.pipeline.PipelineQueries.gopherRulesOf(docs)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getBoolean(3), r.getBoolean(4),
        r.getBoolean(5), r.getBoolean(6), r.getBoolean(7)))
    assert(out(0) === ((0L, true, true, true, true, true)))
    assert(out(1) === ((1L, false, true, true, true, false)))
    assert(out(2)._1 === 2L); assert(!out(2)._3 && !out(2)._6) // mean len
    assert(out(3) === ((3L, true, true, true, false, false)))
    assert(out(4)._1 === 4L); assert(!out(4)._4 && !out(4)._6) // alpha
    // the real corpus must exercise pass AND fail (the gate is live)
    val corpus = graft.pipeline.PipelineQueries.gopherRulesOf(
      Tables.documents(spark, sf())).collect().map(_.getBoolean(7))
    assert(corpus.exists(identity) && corpus.exists(!_))
  }
}
