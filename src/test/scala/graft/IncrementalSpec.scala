package graft

import org.apache.spark.sql.functions._

import graft.operators.Incremental

/** Incremental aggregation: fold-invariance is the property that makes
  * it a correct materialized view. */
class IncrementalSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame) =
    Incremental.readout(df, "o_orderpriority")
      .collect().map(_.toSeq).toSet

  test("any chunking folds to the single-pass aggregate") {
    val orders = Tables.orders(spark, sf())
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
    val whole = Incremental.partialState(orders, "o_orderpriority", "o_totalprice")

    // 2-way and 7-way chunkings by different predicates
    for (k <- Seq(2, 7)) {
      val states = (0 until k).map(i =>
        Incremental.partialState(orders.filter(col("o_orderkey") % k === i),
          "o_orderpriority", "o_totalprice"))
      val folded = states.reduce(Incremental.mergeStates(_, _, "o_orderpriority"))
      assert(canon(folded) === canon(whole), s"$k-way fold diverged")
    }
  }

  test("empty chunk is a fold identity") {
    val orders = Tables.orders(spark, sf())
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
    val st = Incremental.partialState(orders, "o_orderpriority", "o_totalprice")
    val empty = Incremental.partialState(orders.limit(0), "o_orderpriority", "o_totalprice")
    assert(canon(Incremental.mergeStates(st, empty, "o_orderpriority")) === canon(st))
  }

  test("incremental join: quadrant union equals the direct join, quadrants disjoint") {
    val quads = Incremental.incrJoinQ.run(spark, sf())
    val direct = Tables.orders(spark, sf())
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.customer(spark, sf())
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
    // same row multiset ignoring provenance
    val a = quads.select(col("o_orderkey"), col("c_custkey"), col("c_nationkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val b = direct
      .select(col("o_orderkey"), col("c_custkey"), col("c_nationkey").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(a === b)
    // o_orderkey unique => each row in exactly one quadrant
    assert(quads.groupBy(col("o_orderkey")).count()
      .filter(col("count") > 1).count() === 0L)
    // all four quadrants non-empty at this sf (the split exercises them)
    assert(quads.select(col("part")).distinct().count() === 4L)
  }
}
