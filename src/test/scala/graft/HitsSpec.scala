package graft

import org.apache.spark.sql.functions._

import graft.analytics.Hits

/** Structural HITS properties on hand-checkable graphs; engine parity on
  * the citation graph is the g_hits DuckDB oracle's job. */
class HitsSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
    Hits.hits(spark, edges.toDF("src", "dst")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("out-star: the center is a pure hub, leaves are pure authorities") {
    val m = run(Seq((1L, 2L), (1L, 3L), (1L, 4L)))
    assert(m(1L)._1 > 0L) // hub(center)
    assert(m(1L)._2 === 0L) // auth(center): no in-edges
    for (leaf <- Seq(2L, 3L, 4L)) {
      assert(m(leaf)._1 === 0L) // no out-edges
      assert(m(leaf)._2 > 0L)
    }
    assert(Seq(2L, 3L, 4L).map(m(_)._2).distinct.size === 1)
  }

  test("directed 3-cycle: vertex-transitive, all six scores equal") {
    val m = run(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    val vals = m.values.flatMap(v => Seq(v._1, v._2)).toSeq
    assert(vals.distinct.size === 1)
    assert(vals.head > 0L)
  }

  test("bipartite: hubs only on the source side, authorities on the sink side") {
    val m = run(Seq((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L)))
    assert(m(1L)._2 === 0L && m(2L)._2 === 0L)
    assert(m(3L)._1 === 0L && m(4L)._1 === 0L)
    assert(m(1L)._1 > 0L && m(3L)._2 > 0L)
  }

  test("empty graph returns an empty typed frame") {
    val df = Hits.hits(spark, Seq.empty[(Long, Long)].toDF("src", "dst"))
    assert(df.columns.toSeq === Seq("id", "hub", "auth"))
    assert(df.count() === 0L)
  }

  test("scores are partitioning-invariant (exact integer arithmetic)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
    val base = run(edges)
    val shuffled = Hits.hits(spark,
      edges.toDF("src", "dst").repartition(7)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(base === shuffled)
  }
}
