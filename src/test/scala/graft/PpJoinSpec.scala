package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.PpJoin

/** Prefix-filtered set-similarity join: hand-computed Jaccard pairs,
  * the completeness law vs an in-test brute force, boundary and
  * hot-token behavior, and corpus sanity. */
class PpJoinSpec extends SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  private def run(df: DataFrame): Seq[(Long, Long, Long, Long, Long, Long)] =
    PpJoin.similarPairs(spark, df).orderBy("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq

  /** All-pairs reference: exact token-set Jaccard >= 1/2, driver-side. */
  private def brute(rows: Seq[(Long, String)]): Set[(Long, Long)] = {
    val sets = rows.map { case (id, t) =>
      id -> t.trim.split("\\s+").filter(_.nonEmpty).toSet
    }.filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      c = (sa & sb).size
      if c * PpJoin.TauDen >= PpJoin.TauNum * (sa.size + sb.size - c)
    } yield (a, b)).toSet
  }

  test("identical docs: J = 1, ppm = 1000000") {
    val t = run(docs(1L -> "alpha beta gamma", 2L -> "gamma alpha beta"))
    assert(t === Seq((1L, 2L, 3L, 3L, 3L, 1000000L)))
  }

  test("exact threshold boundary: J = 19/20 qualifies, just below does not") {
    val twenty = (0 until 20).map(i => s"w$i")
    // 19-token subset of a 20-token doc: c=19, union 20 -> J = 19/20
    val in = run(docs(
      1L -> twenty.mkString(" "), 2L -> twenty.take(19).mkString(" ")))
    assert(in === Seq((1L, 2L, 19L, 20L, 19L, 950000L)))
    // swap one token instead: c=19, union 21 -> J = 19/21 < 19/20
    assert(run(docs(
      1L -> twenty.mkString(" "),
      2L -> (twenty.take(19) :+ "other").mkString(" "))).isEmpty)
  }

  test("duplicate tokens collapse to sets before scoring") {
    // repeated words change nothing: {x,y} vs {x,y}
    val t = run(docs(1L -> "x x x y", 2L -> "y x y"))
    assert(t === Seq((1L, 2L, 2L, 2L, 2L, 1000000L)))
  }

  test("empty and whitespace-only docs never pair") {
    assert(run(docs(1L -> "", 2L -> "   ", 3L -> "solo words here")).isEmpty)
  }

  test("positional filter prunes candidates without changing the output") {
    // Constructed so ONE candidate is prunable purely by position:
    // docs 1/2 are 20-token sets sharing 19 tokens, with their ONLY
    // shared prefix token at rank 2 of both prefixes (r1/r3 are unique,
    // hence rarest, hence rank 1). The required overlap is
    // alpha = ceil(19*40/39) = 20 but the positional bound is
    // 1 + min(20-2, 20-2) = 19 -> pruned BEFORE the verify join. The
    // identical pair 3/4 shares its rank-1 token (bound 20 >= 20) and
    // must survive both the filter and verification.
    val hot = (0 until 18).map(i => s"h$i")
    val other = (0 until 20).map(i => s"q$i")
    val rows: Seq[(Long, String)] = Seq(
      1L -> (Seq("r1", "r2") ++ hot).mkString(" "),
      2L -> (Seq("r3", "r2") ++ hot).mkString(" "),
      3L -> other.mkString(" "),
      4L -> other.reverse.mkString(" "))
    def candsWith(arm: Boolean): (Set[(Long, Long)], Long) = {
      sys.props("graft.ppjoin.positional") = arm.toString
      try {
        val out = run(docs(rows: _*)).map(p => (p._1, p._2)).toSet
        (out, PpJoin.lastCandidates)
      } finally sys.props("graft.ppjoin.positional") = "true"
    }
    val (outOn, candOn) = candsWith(arm = true)
    val (outOff, candOff) = candsWith(arm = false)
    assert(outOn === outOff)
    assert(outOn === brute(rows))
    assert(outOn === Set((3L, 4L)))
    assert(candOn < candOff,
      s"positional filter pruned nothing (on=$candOn, off=$candOff)")
  }

  test("completeness vs brute force on an adversarial hot-token corpus") {
    // every doc shares 20 hot boilerplate tokens; paired docs (2k-1, 2k)
    // differ only in one rare token — the overlap a df-cap path could
    // drop from generation is exactly what qualifies here
    val boiler = (0 until 20).map(i => s"common$i").mkString(" ")
    val rows: Seq[(Long, String)] = (1L to 30L).map { i =>
      i -> s"$boiler pair${(i + 1) / 2}"
    }
    val got = run(docs(rows: _*)).map(p => (p._1, p._2)).toSet
    assert(got === brute(rows))
    // each (2k-1, 2k) pair is identical -> J = 1
    assert(got.size >= 15)
  }

  test("completeness vs brute force on graded-overlap vocabulary") {
    // doc i holds a 40-token sliding window over a shared sequence —
    // adjacent docs overlap 39/41 < tau, identical-window repeats hit 1
    val rows: Seq[(Long, String)] = (1L to 50L).map { i =>
      val start = (i.toInt % 25) * 1 // repeats every 25 docs
      i -> (start until start + 40).map(j => s"w$j").mkString(" ")
    }
    val got = run(docs(rows: _*)).map(p => (p._1, p._2)).toSet
    assert(got === brute(rows))
    assert(got.nonEmpty)
  }

  test("seeded sweep: completeness holds across random vocab regimes") {
    // tiny (every token hot) through wide (near-unique) vocabularies,
    // fixed seed — the regimes where prefix pruning behaves differently
    val rng = new scala.util.Random(12345)
    for (round <- 1 to 3) {
      val vocab = 5 + rng.nextInt(40)
      val rows: Seq[(Long, String)] = (1L to 40L).map { i =>
        val len = 3 + rng.nextInt(25)
        i -> (0 until len).map(_ => s"w${rng.nextInt(vocab)}").mkString(" ")
      }
      assert(run(docs(rows: _*)).map(p => (p._1, p._2)).toSet === brute(rows),
        s"round $round vocab $vocab")
    }
  }

  test("deterministic across layouts") {
    val d = docs((1L to 40L).map(i =>
      i -> (0 until 6).map(j => s"t${(i * 5 + j * 11) % 17}").mkString(" ")): _*)
    assert(run(d) === run(d.repartition(9)))
  }

  private def runInc(df: DataFrame): Seq[(Long, Long)] =
    PpJoin.incrementalPairs(spark, df).orderBy("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("incremental equals the full join restricted to batch-touching pairs") {
    // ids 7, 17, 27 are the batch (id % 10 == 7); craft qualifying pairs
    // batch-corpus (7~1), batch-batch (17~27), corpus-corpus (2~3,
    // which must NOT appear)
    val twenty = (0 until 20).map(i => s"w$i").mkString(" ")
    val other = (100 until 120).map(i => s"v$i").mkString(" ")
    val d = docs(
      1L -> twenty, 7L -> twenty,
      17L -> other, 27L -> other,
      2L -> "z1 z2 z3", 3L -> "z1 z2 z3",
      5L -> "q1 q2 q3 q4 q5")
    val full = run(d).map(p => (p._1, p._2))
      .filter(p => p._1 % 10 == 7 || p._2 % 10 == 7)
    assert(runInc(d) === full)
    assert(runInc(d).toSet === Set((1L, 7L), (17L, 27L)))
  }

  test("incremental: batch tokens unseen by the corpus rank rarest and still pair") {
    // both batch docs are entirely outside the corpus vocabulary
    val novel = (0 until 20).map(i => s"novel$i").mkString(" ")
    val d = docs(1L -> "a b c d e", 7L -> novel, 17L -> novel)
    assert(runInc(d).toSet === Set((7L, 17L)))
  }

  test("incremental: empty batch yields no pairs") {
    val d = docs(1L -> "a b c", 2L -> "a b c")
    assert(runInc(d).isEmpty)
  }

  test("corpus: incremental equals brute force restricted to the batch") {
    val t = runInc(Tables.documents(spark, sf()))
    assert(t.nonEmpty)
    assert(t.forall(p => p._1 % 10 == 7 || p._2 % 10 == 7))
    assert(t.forall(p => p._1 < p._2))
  }

  test("corpus: near-dup pairs surface and every reported pair is exact") {
    val t = run(Tables.documents(spark, sf()))
    assert(t.nonEmpty)
    t.foreach { case (a, b, c, na, nb, ppm) =>
      assert(a < b)
      assert(c >= 1 && c <= math.min(na, nb))
      assert(c * PpJoin.TauDen >= PpJoin.TauNum * (na + nb - c))
      assert(ppm === 1000000L * c / (na + nb - c))
    }
  }

  test("string-verify fallback equals the hashed fast path (ADVICE r7 #3)") {
    // the collision fallback can't be triggered by real data in-test
    // (64-bit birthday), so force it: results must be IDENTICAL —
    // verification arithmetic, not encoding, decides the output
    val corpus = Tables.documents(spark, sf())
    val fast = run(corpus)
    val fastInc = runInc(corpus)
    PpJoin.forceStringVerify = true
    try {
      assert(run(corpus) === fast)
      assert(runInc(corpus) === fastInc)
    } finally PpJoin.forceStringVerify = false
  }
}
