package graft

import org.apache.spark.sql.functions._

import graft.operators.TableStats

/** ANALYZE-style stats: exact counts on the real table and the
  * single-pass plan shape. */
class TableStatsSpec extends SparkSpec {

  test("stats agree with directly-computed per-column answers") {
    val o = Tables.orders(spark, sf())
    val m = TableStats.stats(o).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    val n = o.count()
    assert(m("o_orderkey")._1 === n)
    assert(m("o_orderkey")._2 === 0L)
    assert(m("o_orderkey")._3 ===
      o.select("o_orderkey").distinct().count())
    assert(m("o_orderstatus")._3 ===
      o.select("o_orderstatus").distinct().count())
    assert(m("o_custkey")._4 ===
      o.agg(min(col("o_custkey").cast("long"))).head.getLong(0).toString)
  }

  test("nulls are counted, excluded from ndv, and invisible to min/max") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (null, "b"),
      (3L, null), (3L, "a"))
      .toDF("o_orderkey", "o_orderstatus")
      .withColumn("o_custkey", col("o_orderkey"))
      .withColumn("o_orderpriority", col("o_orderstatus"))
      .withColumn("o_totalprice", lit(1.0))
      .withColumn("o_orderdate",
        lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00")))
    val m = TableStats.stats(df).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    assert(m("o_orderkey") === ((4L, 1L, 2L, "1", "3")))
    assert(m("o_orderstatus") === ((4L, 1L, 2L, "a", "b")))
  }

  test("plan is a single pass: Expand aggregate, no joins, no repeated scans") {
    val p = TableStats.stats(Tables.orders(spark, sf()))
      .queryExecution.executedPlan.toString
    assert(p.contains("Expand"), p)
    assert(!p.contains("Join"), p)
    // exactly one parquet scan feeds the whole profile
    assert(p.split("FileScan parquet").length - 1 === 1, p)
  }
}
