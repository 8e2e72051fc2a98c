package graft.operators

import org.apache.spark.sql.{DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, DecimalType}

import graft.Tables
import graft.registry.Q

/** Bloom-filter semi-join pruning — Spark's own runtime-filter primitive
  * (InjectRuntimeFilter's BloomFilterAggregate / BloomFilterMightContain,
  * both codegen'd) surfaced as an explicit operator for when the
  * optimizer can't see the opportunity (pre-filtering before a
  * non-join consumer, cross-job reuse, a dim computed in another step).
  *
  * 100-TB shape: the dim side collapses to a ~numBits/8-byte sketch on
  * the driver and ships to every task as a literal — the big side is
  * pruned AT THE SCAN, before any shuffle, to rows that might match.
  * Bloom false positives mean `prune` alone is a superset; exactness
  * comes from the semi-join that follows on the (now tiny) survivor set.
  * False negatives are impossible (BloomPruneSpec).
  */
object BloomPrune {

  /** Build the dim-side bloom over xxhash64(key) — the hash contract
    * BloomFilterAggregate/MightContain share. */
  def bloomOf(dim: DataFrame, key: String, expectedItems: Long): Array[Byte] = {
    val numBits = math.max(64L, expectedItems * 16L) // ~0.5% fpp at 16 bits/item
    val agg = new BloomFilterAggregate(
      GraftColumnBridge.expression(xxhash64(col(key))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    dim.select(GraftColumnBridge.column(agg).as("bf")).head.getAs[Array[Byte]](0)
  }

  /** Keep rows whose key might be in the bloom (superset of matches). */
  def prune(big: DataFrame, key: String, bloom: Array[Byte]): DataFrame =
    big.filter(GraftColumnBridge.column(
      BloomFilterMightContain(Literal(bloom, BinaryType),
        GraftColumnBridge.expression(xxhash64(col(key))))))

  /** Bloom-prune, then exact semi-join to scrub false positives. */
  def semiJoinPruned(big: DataFrame, dim: DataFrame, bigKey: String,
      dimKey: String): DataFrame = {
    val items = dim.count()
    val pruned =
      if (items == 0) big.limit(0)
      else prune(big, bigKey, bloomOf(dim, dimKey, items))
    pruned.join(dim.select(col(dimKey).as(bigKey)).distinct(),
      Seq(bigKey), "left_semi")
  }

  // ---- registry entry ---------------------------------------------------

  /** lineitem pruned to urgent-priority orders, then aggregated — the
    * oracle is the plain semi-join, so any bloom false negative or
    * unscrubbed false positive breaks the hash. */
  val bloomPruneQ: Q = Q(
    "x_bloom_prune",
    Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
           |FROM lineitem
           |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
           |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
    (s, d) => {
      val dim = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      semiJoinPruned(Tables.lineitem(s, d), dim, "l_orderkey", "o_orderkey")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2)))
            .cast("double").as("revenue"))
        .orderBy(col("l_returnflag"))
    })

  val all: Seq[Q] = Seq(bloomPruneQ)
}
