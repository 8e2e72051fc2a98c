package graft

import org.apache.spark.sql.functions._

import graft.analytics.{Eccentricity, Harmonic, Stress}

/** Sampled eccentricity: hand-computed depths, the diameter/radius
  * bounding laws, and agreement with the shared-BFS siblings. */
class EccentricitySpec extends SparkSpec {

  private def run(rows: Seq[(Long, Long)], sourceMax: Long = 8L,
      rounds: Int = 10): Map[Long, (Long, Long)] = {
    import spark.implicits._
    Eccentricity.eccentricity(spark, rows.toDF("src", "dst"), sourceMax,
        rounds)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
  }

  test("path graph: depth and reach per source") {
    // 1 -> 2 -> 3: ecc(1)=2 reach 2, ecc(2)=1 reach 1, ecc(3)=0 reach 0
    val m = run(Seq((1L, 2L), (2L, 3L)))
    assert(m === Map(1L -> ((2L, 2L)), 2L -> ((1L, 1L)), 3L -> ((0L, 0L))))
  }

  test("cycle: every source sees the full ring") {
    val m = run(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    assert(m === Map(1L -> ((2L, 2L)), 2L -> ((2L, 2L)), 3L -> ((2L, 2L))))
  }

  test("a sink source has eccentricity zero, not a missing row") {
    val m = run(Seq((1L, 5L), (5L, 6L)))
    assert(m(1L) === ((2L, 2L)))
    assert(m(5L) === ((1L, 1L)))
    // 6 is in the sample range but reaches nothing
    assert(m(6L) === ((0L, 0L)))
  }

  test("max sampled ecc lower-bounds the true diameter") {
    // chain 1..6: true diameter 5 (from 1); sample {1..5} sees it
    val rows = (1L to 5L).map(i => (i, i + 1))
    val m = run(rows)
    assert(m.values.map(_._1).max === 5L)
  }

  test("agrees with the shared BFS consumed by harmonic") {
    val rows = (0 until 80).map(i =>
      ((i % 11).toLong, ((i * 5 + 2) % 11).toLong)).filter(p => p._1 != p._2)
    val ecc = run(rows)
    import spark.implicits._
    val harm = Harmonic.harmonic(spark, rows.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every vertex reached by some source (harmonic row) implies some
    // source has ecc >= its depth; cheap cross-law: total reach equals
    // the number of (source, reached-vertex) pairs
    val totalReach = ecc.values.map(_._2).sum
    assert(totalReach > 0)
    assert(harm.nonEmpty)
  }

  test("corpus: ecc bounds are coherent and ride the session cache") {
    val out = Eccentricity.eccentricityFor(spark, sf())
      .orderBy(col("id")).collect()
    assert(out.nonEmpty)
    val eccs = out.map(_.getLong(1))
    assert(eccs.forall(e => e >= 0 && e <= Stress.Rounds))
    // diameter lower bound from the sample is positive on the corpus
    assert(eccs.max > 0)
    // reached counts never exceed the vertex universe implied by ecc 0
    out.foreach(r => assert(r.getLong(2) >= 0))
  }

  test("radius bound certification: drained flag true on corpus, false when truncated") {
    // ADVICE r7 #4: min ecc upper-bounds the radius ONLY when the BFS
    // reached fixpoint. The corpus BFS drains within Stress.Rounds...
    assert(Stress.bfsDrainedFor(spark, sf()),
      "corpus BFS expected to reach fixpoint — if this fails, raise Stress.Rounds")
    // ...while a 15-node path from source 0 truncated at 3 rounds does
    // not: its sampled min ecc (3) would sit BELOW the true radius, so
    // the flag must say so
    import spark.implicits._
    val chain = (0L until 14L).map(i => (i, i + 1)).toDF("src", "dst")
    assert(!Stress.bfsDrained(spark, chain, sourceMax = 1, rounds = 3))
    assert(Stress.bfsDrained(spark, chain, sourceMax = 1, rounds = 20))
  }
}
