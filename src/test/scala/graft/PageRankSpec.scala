package graft

import org.apache.spark.sql.functions._

import graft.analytics.PageRank
import graft.graph.CitationGraph

/** PageRank: exact equality with an in-memory reference of the same
  * integer recurrence, structural sanity, and the one-exchange-per-
  * iteration layout contract. */
class PageRankSpec extends SparkSpec {

  /** Reference implementation: same integer fixed-point recurrence over
    * Scala Maps (truncating Long division everywhere). */
  private def referencePr(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val e = edges.filter(p => p._1 != p._2).distinct
    val vs = (e.map(_._1) ++ e.map(_._2)).distinct
    val n = vs.size.toLong
    val deg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val inc = e.groupBy(_._2)
    val r0 = PageRank.Scale / n
    val base = ((100L - PageRank.DampPct) * PageRank.Scale) / (100L * n)
    var r = vs.map(_ -> r0).toMap
    for (_ <- 1 to iters) {
      r = vs.map { v =>
        val contrib = inc.getOrElse(v, Seq.empty)
          .map { case (u, _) => r(u) / deg(u) }.sum
        v -> (base + (PageRank.DampPct * contrib) / 100L)
      }.toMap
    }
    r
  }

  private def prOf(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    import spark.implicits._
    PageRank.pageRank(spark, edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("star + chain graph equals the reference recurrence exactly") {
    // 2,3,4 -> 1 (star); 1 -> 5 -> 6 (chain); 7 <-> 8 (cycle); dangling 6
    val edges = Seq[(Long, Long)](
      (2, 1), (3, 1), (4, 1), (1, 5), (5, 6), (7, 8), (8, 7), (2, 1))
    assert(prOf(edges, 10) === referencePr(edges, 10))
  }

  test("hub accumulates more rank than its spokes") {
    val edges = Seq[(Long, Long)]((2, 1), (3, 1), (4, 1), (5, 1))
    val r = prOf(edges, 10)
    assert(r(1) > r(2) && r(2) === r(3))
  }

  test("citation graph at sf0.001: mass bounded, deterministic across runs") {
    val edges = CitationGraph.edges(spark, sf())
    val a = PageRank.pageRank(spark, edges, 10)
      .agg(sum(col("r")), count(lit(1))).head
    // truncation + dangling leak only REMOVE mass: sum <= Scale
    assert(a.getLong(0) <= PageRank.Scale && a.getLong(0) > 0L)
    val r1 = PageRank.pageRank(spark, edges, 10).collect().map(_.toSeq).toSet
    val r2 = PageRank.pageRank(spark, edges.repartition(7), 10)
      .collect().map(_.toSeq).toSet
    assert(r1 === r2)
  }

  test("iteration plan has exactly one exchange: the contribution groupBy") {
    PageRank.pageRank(spark, CitationGraph.edges(spark, sf()), iters = 2)
    assert(PageRank.lastIterationExchanges === 1,
      s"expected 1 exchange per iteration, saw ${PageRank.lastIterationExchanges}")
  }

  test("personalized: unreachable vertices hold rank exactly 0") {
    import spark.implicits._
    // seed {1} feeds the chain 1→2→3; the island 10→11 never sees mass
    val e = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val r = PageRank.personalizedPageRank(spark, e, seedMax = 2L, iters = 5)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) > 0L && r(2L) > 0L && r(3L) > 0L)
    assert(r(10L) === 0L && r(11L) === 0L)
    // seed holds the teleport base; downstream holds strictly less
    assert(r(1L) > r(2L) && r(2L) > r(3L))
  }

  test("personalized with every vertex a seed equals plain PageRank") {
    val edges = CitationGraph.edges(spark, sf())
    val plain = PageRank.pageRank(spark, edges, iters = 5)
      .collect().map(_.toSeq).toSet
    val ppr = PageRank.personalizedPageRank(spark, edges,
      seedMax = Long.MaxValue, iters = 5).collect().map(_.toSeq).toSet
    assert(ppr === plain)
  }
}
