package graft

import org.apache.spark.sql.functions._

import graft.analytics.GraphQueries
import graft.pipeline.PipelineQueries

/** Toy-graph squares (4-cycle) counts and crafted-document quality-filter
  * verdicts — hand-computable inputs for the two round-7 additions whose
  * sf-corpus behavior the DuckDB oracle already pins. */
class MotifQualitySpec extends SparkSpec {
  import spark.implicits._

  private def squares(edges: Seq[(Long, Long)]): (Long, Long) = {
    val r = GraphQueries.squaresOf(edges.toDF("src", "dst")).head()
    (r.getLong(0), r.getLong(1))
  }

  test("4-cycle graph has exactly one square over its two diagonals") {
    // 1-2-3-4-1: diagonals (1,3) and (2,4) each see 2 common neighbors
    val (nd, ns) = squares(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    assert(nd === 2L)
    assert(ns === 1L)
  }

  test("K4 has three squares; every vertex pair is a diagonal") {
    val (nd, ns) = squares(
      Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    assert(nd === 6L)
    assert(ns === 3L)
  }

  test("a path has wedges but no squares; a triangle has none either") {
    assert(squares(Seq((1L, 2L), (2L, 3L))) === ((1L, 0L)))
    assert(squares(Seq((1L, 2L), (2L, 3L), (3L, 1L))) === ((3L, 0L)))
  }

  test("empty graph reports one exact zero row, not NULLs") {
    val r = GraphQueries.squaresOf(
      Seq.empty[(Long, Long)].toDF("src", "dst")).collect()
    assert(r.length === 1)
    assert(r.head.getLong(0) === 0L)
    assert(r.head.getLong(1) === 0L)
  }

  test("squares count is salt-invariant: matches the unsalted per-pair formula") {
    // pseudo-random graph, seeded — compare against an independent
    // wedge-count aggregation with no salting
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(120)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter { case (a, b) => a != b }.distinct
    val e = edges.toDF("src", "dst")
    val bidir = graft.graph.CitationGraph.bidirectional(e)
    val plain = bidir.as("x").join(bidir.as("y"),
        col("x.src") === col("y.src") && col("x.dst") < col("y.dst"))
      .groupBy(col("x.dst").as("a"), col("y.dst").as("b"))
      .agg(count(lit(1)).as("w"))
      .agg(coalesce(sum(expr("(w * (w - 1)) DIV 2")), lit(0L)).as("p"))
      .select(expr("p DIV 2")).head().getLong(0)
    assert(squares(edges)._2 === plain)
  }

  // ---- quality filter ---------------------------------------------------

  private def verdicts(docs: Seq[(Long, String)]): Map[Long, (Long, Boolean)] =
    PipelineQueries.qualityFilterOf(docs.toDF("doc_id", "text"))
      .select(col("doc_id"), col("reasons"), col("pass"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap

  /** 60 distinct 5-char alphabetic tokens incl. two stopwords — passes
    * every rule. */
  private val cleanDoc: String =
    (Seq("the", "of") ++ (1 to 58).map(i => f"word$i%02d")).mkString(" ")

  test("a clean document passes with reasons 0") {
    val v = verdicts(Seq((1L, cleanDoc)))
    assert(v(1L) === ((0L, true)))
  }

  test("each rule trips its own bit and only that bit") {
    val shortDoc = (Seq("the", "of") ++ (1 to 8).map(i => f"word$i%02d"))
      .mkString(" ") // < 50 tokens, everything else clean -> bit 1
    val longWords = (Seq("the", "of") ++
      (1 to 58).map(i => f"verylongtoken$i%09d")).mkString(" ") // bit 4
    val noStops = (1 to 60).map(i => f"word$i%02d").mkString(" ") // bit 8
    val numeric = (Seq("the", "of") ++ (1 to 58).map(i => f"$i%05d"))
      .mkString(" ") // 58/60 non-alpha -> bit 16
    val repeated = (Seq("the", "of") ++
      Seq.fill(29)(Seq("spam1", "spam2")).flatten).mkString(" ") // bit 32
    val v = verdicts(Seq(
      (1L, shortDoc), (2L, longWords), (3L, noStops),
      (4L, numeric), (5L, repeated)))
    assert(v(1L)._1 === 1L)
    assert(v(2L)._1 === 4L)
    assert(v(3L)._1 === 8L)
    assert(v(4L)._1 === 16L)
    assert(v(5L)._1 === 32L)
    assert(v.values.forall(!_._2))
  }

  test("violations compose into a combined bitmask") {
    // 8 numeric-only tokens: too short (1) + no stopwords (8) +
    // non-alphabetic (16); mean token length 5 stays in bounds
    val v = verdicts(Seq((1L, (1 to 8).map(i => f"$i%05d").mkString(" "))))
    assert(v(1L)._1 === (1L | 8L | 16L))
  }

  test("the filter's plan is map-only: no shuffle below the output sort") {
    val plan = PipelineQueries.qualityFilterOf(
      Seq((1L, cleanDoc)).toDF("doc_id", "text"))
      .queryExecution.executedPlan
    val exchanges = plan.collect {
      case x: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => x
    }
    // the single exchange is the orderBy's range partitioning
    assert(exchanges.size <= 1)
  }
}
