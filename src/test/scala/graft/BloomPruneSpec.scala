package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomPrune

/** Bloom pruning: no false negatives ever, real selectivity, exactness
  * after the scrub join. */
class BloomPruneSpec extends SparkSpec {

  test("no false negatives: every true match survives the bloom") {
    val li = Tables.lineitem(spark, sf())
    val dim = Tables.orders(spark, sf())
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val bloom = BloomPrune.bloomOf(dim, "o_orderkey", dim.count())
    val pruned = BloomPrune.prune(li, "l_orderkey", bloom)
    val trueMatches = li.join(dim.select(col("o_orderkey").as("l_orderkey")),
      Seq("l_orderkey"), "left_semi")
    // true matches minus pruned must be empty
    assert(trueMatches.join(pruned.select("l_orderkey").distinct(),
      Seq("l_orderkey"), "left_anti").count() === 0L)
  }

  test("bloom actually prunes: survivors well below the full scan") {
    val li = Tables.lineitem(spark, sf())
    val dim = Tables.orders(spark, sf())
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val bloom = BloomPrune.bloomOf(dim, "o_orderkey", dim.count())
    val prunedN = BloomPrune.prune(li, "l_orderkey", bloom).count()
    val total = li.count()
    val exact = li.join(dim.select(col("o_orderkey").as("l_orderkey")),
      Seq("l_orderkey"), "left_semi").count()
    assert(prunedN >= exact)          // superset of matches
    assert(prunedN < total * 6 / 10,  // ~20% selectivity + fpp slack
      s"bloom kept $prunedN of $total")
  }

  test("semiJoinPruned equals the plain semi-join") {
    val li = Tables.lineitem(spark, sf())
    val dim = Tables.orders(spark, sf())
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val got = BloomPrune.semiJoinPruned(li, dim, "l_orderkey", "o_orderkey")
      .count()
    val want = li.join(dim.select(col("o_orderkey").as("l_orderkey")),
      Seq("l_orderkey"), "left_semi").count()
    assert(got === want && want > 0L)
  }

  test("empty dim prunes everything") {
    val li = Tables.lineitem(spark, sf())
    val dim = Tables.orders(spark, sf()).filter(lit(false))
      .select(col("o_orderkey"))
    assert(BloomPrune.semiJoinPruned(li, dim, "l_orderkey", "o_orderkey")
      .count() === 0L)
  }
}
