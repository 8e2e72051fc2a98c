package graft

import org.apache.spark.sql.functions._

import graft.analytics.RandomWalks

/** Deterministic random walks: every emitted transition is a real edge,
  * steps are gapless, sinks stop walks, and the draw is uniform-ish and
  * layout-independent. */
class RandomWalksSpec extends SparkSpec {

  private def edges(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    rows.toDF("src", "dst")
  }

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("walk on a path graph follows the only road and stops at the sink") {
    // 1 -> 2 -> 3 (3 is a sink): walk from 1 is exactly 1,2,3
    val w = collect(RandomWalks.walks(spark,
      edges(Seq((1L, 2L), (2L, 3L))), walkLen = 8, seedMax = 32L))
      .filter(_._1 == 1L).sortBy(_._2)
    assert(w.map(_._3).toSeq === Seq(1L, 2L, 3L))
    assert(w.map(_._2).toSeq === Seq(0L, 1L, 2L))
  }

  test("every emitted transition is an edge; steps gapless from 0") {
    val g = graft.graph.CitationGraph.edges(spark, sf())
    val w = RandomWalks.walks(spark, g)
    val eSet = g.filter(col("src") =!= col("dst")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val byWalk = collect(w).groupBy(_._1)
    assert(byWalk.nonEmpty)
    byWalk.foreach { case (wid, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (0L until sorted.length).toSeq,
        s"walk $wid steps not gapless")
      assert(sorted.head._3 === wid, s"walk $wid does not start at its seed")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(eSet((a._3, b._3)),
          s"walk $wid emitted non-edge ${a._3}->${b._3}")
        case _ =>
      }
    }
  }

  test("deterministic across layouts") {
    val g = graft.graph.CitationGraph.edges(spark, sf())
    val a = collect(RandomWalks.walks(spark, g)).toSet
    val b = collect(RandomWalks.walks(spark, g.repartition(17))).toSet
    assert(a === b)
  }

  test("walks from different seeds diverge even on a shared clique") {
    // complete digraph on {1,2,3,4}: if the draw ignored the walk id,
    // all walks would trace isomorphic sequences from step 1 on; the
    // wid-salted hash makes at least two walks differ somewhere
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a != b) yield (a, b)
    val w = collect(RandomWalks.walks(spark, edges(k4), walkLen = 6,
      seedMax = 32L))
    val seqs = w.groupBy(_._1).map { case (_, rows) =>
      rows.sortBy(_._2).map(_._3).mkString(",")
    }.toSet
    assert(seqs.size >= 2)
  }

  test("all walks have length walkLen+1 when no sinks exist") {
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val w = collect(RandomWalks.walks(spark, edges(cyc), walkLen = 5,
      seedMax = 32L))
    assert(w.groupBy(_._1).forall(_._2.length === 6))
  }
}
