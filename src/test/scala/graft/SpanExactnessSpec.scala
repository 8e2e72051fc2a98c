package graft

import org.apache.spark.sql.DataFrame

import graft.pipeline.SpanExcise

/** Exactness contracts for the duplicated-substring lane (VERDICT r10
  * #3):
  *
  * 1. d_dup_span_exact's theorem, pinned at the boundaries: every
  *    duplicated token run of length T >= L = 8 is detected with its
  *    maximal extent reported EXACTLY (T = 8 and T = 20 planted,
  *    extents 8 and 20 recovered); T = 7 is provably invisible (no
  *    shared 8-gram exists) — the contract's tight lower edge.
  *
  * 2. The winnowing guarantee (Schleimer et al. 2003 Thm. invoked by
  *    d_dup_span_winnow): any shared run of >= WinnowW + 7 tokens
  *    (>= WinnowW consecutive shared gram positions) is ALWAYS
  *    detected, whatever the surrounding context — property-tested
  *    over randomized adversarial contexts at the exact boundary
  *    length. And the bound is TIGHT: at one token shorter a context
  *    exists that evades detection entirely (exhibited by search).
  *
  * All corpora are planted with doc-unique base vocabularies
  * (`d<id>w<i>`), so the ONLY cross-document grams are the planted
  * shared runs — detection output is fully predictable. */
class SpanExactnessSpec extends SparkSpec {

  private def corpus(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Doc text: `pre` doc-unique tokens, the shared run, `post`
    * doc-unique tokens. */
  private def doc(id: Long, shared: Seq[String], pre: Int, post: Int): (Long, String) =
    (id, ((0 until pre).map(i => s"d${id}p$i") ++ shared ++
      (0 until post).map(i => s"d${id}s$i")).mkString(" "))

  private def exact(rows: Seq[(Long, String)]): Map[Long, (Long, Long, Boolean)] =
    SpanExcise.dupSpanExactOf(corpus(rows)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap

  test("T=8 (the boundary): detected in both docs with extent exactly 8") {
    val s = (0 until 8).map(i => s"sh$i")
    val out = exact(Seq(doc(1, s, 5, 6), doc(2, s, 9, 3), doc(3, Nil, 12, 0)))
    assert(out(1L) === ((1L, 8L, true)))
    assert(out(2L) === ((1L, 8L, true)))
    assert(out(3L) === ((0L, 0L, false)))
  }

  test("T=7 (one below L): provably invisible — no shared 8-gram exists") {
    val s = (0 until 7).map(i => s"sh$i")
    val out = exact(Seq(doc(1, s, 5, 6), doc(2, s, 9, 3)))
    assert(out(1L) === ((0L, 0L, false)))
    assert(out(2L) === ((0L, 0L, false)))
  }

  test("T=20: maximal extent recovered exactly, one island, both docs") {
    val s = (0 until 20).map(i => s"sh$i")
    val out = exact(Seq(doc(1, s, 3, 4), doc(2, s, 11, 2)))
    assert(out(1L) === ((1L, 20L, true)))
    assert(out(2L) === ((1L, 20L, true)))
  }

  test("two disjoint planted runs stay two islands; max is the longer") {
    val a = (0 until 9).map(i => s"shA$i")
    val b = (0 until 14).map(i => s"shB$i")
    // doc 1 carries both runs separated by unique filler; partners 2/3
    // each carry one
    val mid = (0 until 10).map(i => s"d1m$i")
    val t1 = (1L, ((0 until 4).map(i => s"d1p$i") ++ a ++ mid ++ b ++
      (0 until 4).map(i => s"d1s$i")).mkString(" "))
    val out = exact(Seq(t1, doc(2, a, 6, 5), doc(3, b, 2, 8)))
    assert(out(1L) === ((2L, 14L, true)))
    assert(out(2L) === ((1L, 9L, true)))
    assert(out(3L) === ((1L, 14L, true)))
  }

  test("within-doc-only repetition is NOT this operator's signal (>=2 distinct docs)") {
    val s = (0 until 12).map(i => s"rep$i")
    val t1 = (1L, (s ++ Seq("d1x0", "d1x1") ++ s).mkString(" "))
    val out = exact(Seq(t1, doc(2, Nil, 15, 0)))
    assert(out(1L) === ((0L, 0L, false)))
  }

  test("incremental probe: cross-corpus and intra-batch spans detected, exact extents, batch-only report") {
    val sStand = (0 until 12).map(i => s"std$i")   // lives in standing + batch doc 100
    val sBatch = (0 until 9).map(i => s"bat$i")    // shared by batch docs 101/102
    val standing = Seq(
      doc(1, sStand, 4, 6),
      doc(2, Nil, 14, 0),
      // a run duplicated ONLY within standing must not leak into the
      // batch report (no batch doc carries it)
      doc(3, (0 until 10).map(i => s"soq$i"), 3, 3),
      doc(4, (0 until 10).map(i => s"soq$i"), 7, 1))
    val batch = Seq(
      doc(100, sStand, 2, 7),   // duplicated against the STANDING index
      doc(101, sBatch, 5, 4),   // duplicated intra-batch
      doc(102, sBatch, 1, 9),
      doc(103, Nil, 15, 0))     // clean
    val out = SpanExcise.dupSpanIncrementalOf(corpus(standing), corpus(batch))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out.keySet === Set(100L, 101L, 102L, 103L), "batch docs only")
    assert(out(100L) === ((1L, 12L, true)), "cross-corpus span, exact extent")
    assert(out(101L) === ((1L, 9L, true)), "intra-batch span")
    assert(out(102L) === ((1L, 9L, true)))
    assert(out(103L) === ((0L, 0L, false)), "clean doc untouched")
  }

  // ---- winnowing guarantee at the boundary ------------------------------

  private def winnowFlagged(rows: Seq[(Long, String)]): Map[Long, Boolean] =
    SpanExcise.dupSpanWinnowOf(corpus(rows)).collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap

  test(s"winnow completeness: every shared run of WinnowW+7 tokens is detected, any context") {
    // T = WinnowW + 7 shared tokens = exactly WinnowW consecutive
    // shared gram positions = exactly ONE window per doc lying fully
    // inside the shared run. That window's minimum is decided by
    // in-window comparison only, so BOTH docs select the same gram —
    // the guarantee cannot depend on what the context hashes to.
    // 40 randomized adversarial contexts (fresh vocab each round, so
    // context hashes resample) at varying offsets.
    val T = SpanExcise.WinnowW + 7
    val rnd = new scala.util.Random(20260816L)
    for (round <- 0 until 40) {
      val s = (0 until T).map(i => s"r${round}sh$i")
      val pre1 = 3 + rnd.nextInt(9); val pre2 = 3 + rnd.nextInt(9)
      val out = winnowFlagged(Seq(
        doc(round * 2 + 1, s, pre1, 14 - pre1),
        doc(round * 2 + 2, s, pre2, 14 - pre2)))
      assert(out.values.forall(identity),
        s"round $round: a ${T}-token shared run evaded winnowing (pre=$pre1/$pre2)")
    }
  }

  test("winnow tightness: a shared run ONE token shorter can evade (counterexample exists)") {
    // T = WinnowW + 6 → only WinnowW - 1 shared gram positions: every
    // window touching a shared gram also contains a context gram, so a
    // context whose grams hash below the shared ones steals every
    // window minimum. Such a context must EXIST (the bound is tight) —
    // found by seeded search, then pinned.
    val T = SpanExcise.WinnowW + 6
    val found = (0 until 200).exists { trial =>
      val s = (0 until T).map(i => s"t${trial}sh$i")
      val out = winnowFlagged(Seq(
        doc(trial * 2 + 1, s, 8, 8), doc(trial * 2 + 2, s, 8, 8)))
      out.values.forall(v => !v)
    }
    assert(found,
      s"no evading context found for a ${T}-token run in 200 trials — " +
        "either the detector over-delivers (update the tightness claim) " +
        "or the search is broken")
  }
}
