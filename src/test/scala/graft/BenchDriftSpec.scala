package graft

import org.scalatest.funsuite.AnyFunSuite

/** The cross-round bench drift gate (VERDICT r11 #1): the spread-only
  * outlier check cannot flag an entry whose reps are ALL uniformly
  * inflated (r11: q1_agg 22-29 s across three reps vs 1.1-2.1 s
  * judge-measured — no spread, no flag). Bench now compares each
  * entry's min against the best min across the last three committed
  * same-sf artifacts. These tests pin the gate's selection, threshold,
  * and robustness semantics against synthetic artifacts on disk. */
class BenchDriftSpec extends AnyFunSuite {

  private def writeBench(dir: java.nio.file.Path, name: String, sf: String,
      queries: (String, Double)*): Unit = {
    val qs = queries.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    java.nio.file.Files.writeString(dir.resolve(name),
      s"""{"metric":"total","value":1.0,"unit":"sec","queries":{$qs},"sf":"$sf"}""")
  }

  test("newest three VALID same-sf rounds are selected; foreign sf frees its slot") {
    val dir = java.nio.file.Files.createTempDirectory("benchdrift")
    writeBench(dir, "BENCH_r08.json", "/sf0.1", "q" -> 1.0)
    writeBench(dir, "BENCH_r09.json", "/sf0.1", "q" -> 2.0)
    writeBench(dir, "BENCH_r10.json", "/sf0.1", "q" -> 3.0)
    writeBench(dir, "BENCH_r11.json", "/sf0.1", "q" -> 4.0)
    writeBench(dir, "BENCH_QUIET_r12.json", "/sf0.01", "q" -> 0.1) // foreign sf
    val priors = Bench.priorBenchMins(dir.toString, "/sf0.1")
    // ADVICE r12 #1: validity-filter FIRST, then take the newest three
    // DISTINCT rounds — the foreign-sf r12 no longer consumes a
    // best-of-3 slot while the valid r09 sits unread
    assert(priors.map(_.tag).toSet ===
      Set("BENCH_r11", "BENCH_r10", "BENCH_r09"))
  }

  test("same-round duplicates: the RICHER artifact wins its round's slot") {
    val dir = java.nio.file.Files.createTempDirectory("benchdrift3")
    // the driver's headline-only line and the builder's quiet full dump
    // share round 12 — the one with more query entries must be used
    writeBench(dir, "BENCH_r12.json", "/sf0.1", "q" -> 9.9)
    writeBench(dir, "BENCH_QUIET_r12.json", "/sf0.1",
      "q" -> 1.0, "r" -> 2.0)
    writeBench(dir, "BENCH_r11.json", "/sf0.1", "q" -> 3.0)
    val priors = Bench.priorBenchMins(dir.toString, "/sf0.1")
    assert(priors.map(_.tag) === Seq("BENCH_QUIET_r12", "BENCH_r11"))
    // and a foreign-FORMAT same-round file (no queries) never shadows
    // the valid artifact of its round
    java.nio.file.Files.writeString(dir.resolve("BENCH_r13.json"),
      """{"metric":"total","value":1.0,"sf":0.1}""")
    val p2 = Bench.priorBenchMins(dir.toString, "/sf0.1")
    assert(p2.map(_.tag) === Seq("BENCH_QUIET_r12", "BENCH_r11"))
  }

  test("explicitly tainted entries are excluded from the prior map") {
    val dir = java.nio.file.Files.createTempDirectory("benchdrift4")
    java.nio.file.Files.writeString(dir.resolve("BENCH_QUIET_r12.json"),
      """{"metric":"total","value":1.0,"unit":"sec",""" +
        """"queries":{"g_stress":9.34,"q1":1.0},""" +
        """"tainted":["g_stress"],"sf":"/sf0.1"}""")
    java.nio.file.Files.writeString(dir.resolve("BENCH_QUIET_r11.json"),
      """{"metric":"total","value":1.0,"unit":"sec",""" +
        """"queries":{"g_stress":4.7,"q1":1.1},"sf":"/sf0.1"}""")
    val priors = Bench.priorBenchMins(dir.toString, "/sf0.1")
    val r12 = priors.find(_.tag == "BENCH_QUIET_r12").get
    assert(!r12.queries.contains("g_stress") && r12.queries("q1") === 1.0)
    // the gate falls back to the untainted r11 value for g_stress
    val drift = Bench.driftAgainst(priors, Seq(("g_stress", 11.0, true)))
    assert(drift === Seq(("g_stress", 11.0, 4.7, "BENCH_QUIET_r11")))
  }

  test("pre-r13 artifacts: taint derived from the min rep's host row") {
    val dir = java.nio.file.Files.createTempDirectory("benchdrift5")
    // g_stress: min rep (8.9 s) carries 14.7% steal → derived-tainted;
    // q1: min rep clean (steal 0, thr 0) → kept; thr_q: min rep
    // throttled 2000 ms over a 1.0 s wall (> 10%) → derived-tainted
    java.nio.file.Files.writeString(dir.resolve("BENCH_QUIET_r12.json"),
      """{"metric":"total","value":1.0,"unit":"sec",""" +
        """"queries":{"g_stress":8.9,"q1":1.0,"thr_q":1.0},""" +
        """"host_runs":{""" +
        """"g_stress":[[0.0,9.3,1.0,50.0,10,10,0,10.35],[9.3,8.9,1.0,50.0,10,10,0,14.68]],""" +
        """"q1":[[20.0,1.0,1.0,20.0,5,5,0,0.00],[21.0,1.2,1.0,20.0,5,5,0,9.99]],""" +
        """"thr_q":[[30.0,1.0,1.0,20.0,5,5,2000,0.00]]},""" +
        """"sf":"/sf0.1"}""")
    val priors = Bench.priorBenchMins(dir.toString, "/sf0.1")
    assert(priors.size === 1)
    assert(priors.head.queries.keySet === Set("q1"))
  }

  test("drift flags >2x and >0.5s against the BEST prior min") {
    val priors = Seq(
      Bench.PriorBench("BENCH_r10", Map("a" -> 1.0, "b" -> 0.1, "c" -> 5.0)),
      Bench.PriorBench("BENCH_r11", Map("a" -> 30.0, "b" -> 0.1, "c" -> 6.0)))
    val drift = Bench.driftAgainst(priors, Seq(
      ("a", 25.0, true),  // 25x vs r10's 1.0 — the q1_agg class: flagged
      ("b", 0.3, true),   // 3x but only +0.2s absolute — noise floor
      ("c", 9.0, true),   // 1.8x — under threshold
      ("d", 50.0, true))) // no prior — new entry, nothing to compare
    assert(drift === Seq(("a", 25.0, 1.0, "BENCH_r10")))
  }

  test("a polluted IMMEDIATE prior cannot mask drift (best-of-3)") {
    // r11 polluted (22s), r10 clean (0.9s): a 20s current min must
    // still flag, attributed to the clean round
    val priors = Seq(
      Bench.PriorBench("BENCH_r11", Map("q1_agg" -> 22.0)),
      Bench.PriorBench("BENCH_r10", Map("q1_agg" -> 0.9)))
    val drift = Bench.driftAgainst(priors, Seq(("q1_agg", 20.0, true)))
    assert(drift === Seq(("q1_agg", 20.0, 0.9, "BENCH_r10")))
  }

  test("failed entries are never labeled drift; missing dir is empty") {
    assert(Bench.driftAgainst(
      Seq(Bench.PriorBench("BENCH_r11", Map("a" -> 1.0))),
      Seq(("a", 99.0, false))) === Nil)
    assert(Bench.priorBenchMins("/nonexistent-dir", "/sf0.1") === Nil)
  }

  test("unparseable artifact is skipped, not fatal") {
    val dir = java.nio.file.Files.createTempDirectory("benchdrift2")
    java.nio.file.Files.writeString(dir.resolve("BENCH_r11.json"), "{not json")
    writeBench(dir, "BENCH_r10.json", "/sf0.1", "q" -> 1.5)
    val priors = Bench.priorBenchMins(dir.toString, "/sf0.1")
    assert(priors.map(_.tag) === Seq("BENCH_r10"))
    assert(priors.head.queries === Map("q" -> 1.5))
  }
}
