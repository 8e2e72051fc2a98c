package graft

import org.apache.spark.sql.functions._

import graft.analytics.KCore

/** k-core peeling contracts: the fixpoint satisfies the defining
  * property (every survivor has degree >= k among survivors), survivor
  * sets shrink monotonically with rounds, and a hand-computable toy
  * graph peels exactly as the definition says. */
class KCoreSpec extends SparkSpec {

  private def toyEdges = {
    // triangle {1,2,3} + a pendant path 3-4-5: 2-core = the triangle
    val rows = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    spark.createDataFrame(rows).toDF("src", "dst")
  }

  test("toy graph: 2-core is exactly the triangle, pendants peel in cascade") {
    val out = KCore.kcore(spark, toyEdges, k = 2, rounds = Int.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("fixpoint satisfies the k-core property on the citation graph") {
    val edges = graft.graph.CitationGraph.edges(spark, sf())
    val core = KCore.kcore(spark, edges, k = KCore.K, rounds = Int.MaxValue)
    val degs = core.select(col("deg")).collect().map(_.getLong(0))
    assert(degs.forall(_ >= KCore.K),
      s"fixpoint survivor with degree < ${KCore.K}: min=${if (degs.isEmpty) -1 else degs.min}")
  }

  test("survivor sets shrink monotonically with rounds") {
    val edges = graft.graph.CitationGraph.edges(spark, sf())
    def survivors(rounds: Int): Set[Long] =
      KCore.kcore(spark, edges, k = KCore.K, rounds = rounds)
        .select(col("id")).collect().map(_.getLong(0)).toSet
    val s1 = survivors(1)
    val s3 = survivors(3)
    val s6 = survivors(KCore.Rounds)
    assert(s3.subsetOf(s1) && s6.subsetOf(s3))
    info(s"survivors: r1=${s1.size} r3=${s3.size} r6=${s6.size}")
  }
}
