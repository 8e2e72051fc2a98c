package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Tables
import graft.Tables.{asLong, dec}
import graft.registry.Q

/** Relational operator coverage per SURVEY.md §2 (scans S*, projections P*,
  * filters F*, joins J*, aggregations A*, window W1, sorts O*, set ops U*,
  * scalar functions C*), exercised against the driver testdata.
  *
  * Determinism rules (so the DuckDB-oracle hash compare is bit-exact):
  *  - any summed double measure is cast to DECIMAL(18,2) first on BOTH
  *    engines (double sums are partition-order dependent; decimal is exact);
  *  - no final select emits DECIMAL: exact decimal aggregates are cast to
  *    DOUBLE at the very end on BOTH engines (cents numerator < 2^53 so
  *    both engines produce the identical nearest double; raw DECIMAL
  *    output hash-mismatches whenever the value has trailing zeros —
  *    Decimal('253942.00') vs float repr '253942.0');
  *  - no NULL in numeric output columns (nullable ints coerce to float on
  *    one side of the driver's hash: '7' vs '7.0', None vs nan) — use a
  *    sentinel / coalesce / grouping() flag on BOTH engines;
  *  - integer outputs are BIGINT on both engines;
  *  - every result carries a total ORDER BY with a unique tiebreaker;
  *  - averages are computed as round(decimal_sum / count, 6) cast to double.
  */
object Relational {

  // ---- shared fragments -------------------------------------------------

  /** avg(x) computed deterministically: exact decimal sum / count, 6 dp. */
  private def avg6(c: Column): Column =
    round(sum(dec(c)).cast("double") / count(lit(1)), 6)

  private val avg6Sql = (x: String) =>
    s"round(CAST(sum(CAST($x AS DECIMAL(18,2))) AS DOUBLE)/count(*), 6)"

  // ---- queries ----------------------------------------------------------

  /** A2+A3+C8 — TPC-H Q1-shaped pricing summary (flagship aggregation).
    * Reference analogue: per-year count/sum aggregations
    * (Analytics.scala:42,60,97). */
  val q1Agg: Q = Q(
    "q1_agg",
    Some("""SELECT l_returnflag, l_linestatus,
           |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/count(*), 6) AS avg_qty,
           |  count(*) AS count_order
           |FROM lineitem GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin),
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          avg6(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")))

  /** S1/P1 — pruned parquet scan: 3-column projection + pushed filter.
    * Reference analogue: citations text scan + na.drop
    * (DataFrameLoader.scala:28-38). */
  val s1ScanPrune: Q = Q(
    "s1_scan_prune",
    Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
           |WHERE l_quantity > 45.0
           |ORDER BY l_orderkey, l_linenumber""".stripMargin),
    (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .filter(col("l_quantity") > 45.0)
        .orderBy(col("l_orderkey"), col("l_linenumber")))

  /** P1-P3 — projection, drop, rename (Analytics.scala:41,44,61-62,352-361). */
  val pProjectRename: Q = Q(
    "p_project_rename",
    Some("""SELECT c_custkey AS id, c_name AS name, c_mktsegment AS segment
           |FROM customer ORDER BY id""".stripMargin),
    (s, d) =>
      Tables.customer(s, d)
        .drop("c_acctbal")
        .withColumnRenamed("c_mktsegment", "segment")
        .select(col("c_custkey").as("id"), col("c_name").as("name"), col("segment"))
        .orderBy(col("id")))

  /** F3 — temporal snapshot predicate: conjunctive <= against literals
    * (THE temporal-graph filter, Analytics.scala:360). */
  val f3Snapshot: Q = Q(
    "f3_temporal_snapshot",
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
           |WHERE o_orderdate <= TIMESTAMP '1996-12-31 23:59:59'
           |  AND o_totalprice <= 50000.0
           |ORDER BY o_orderkey""".stripMargin),
    (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderdate") <= lit("1996-12-31 23:59:59").cast("timestamp")
          && col("o_totalprice") <= 50000.0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey")))

  /** F4/A4 — exact dedup on a column subset (DataFrameLoader.scala:73 made
    * deterministic: DISTINCT instead of first-wins). */
  val f4Dedup: Q = Q(
    "f4_dedup_exact",
    Some("""SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
           |ORDER BY c_mktsegment, c_nationkey""".stripMargin),
    (s, d) =>
      Tables.customer(s, d)
        .select(col("c_mktsegment"), col("c_nationkey"))
        .distinct()
        .orderBy(col("c_mktsegment"), col("c_nationkey")))

  /** J1 — equi inner join, small side broadcast (Analytics.scala:39-41). */
  val j1Inner: Q = Q(
    "j1_join_inner",
    Some("""SELECT c_mktsegment,
           |  count(*) AS n_orders,
           |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
           |FROM orders JOIN customer ON o_custkey = c_custkey
           |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
    (s, d) =>
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), sum(dec(col("o_totalprice"))).cast("double").as("revenue"))
        .orderBy(col("c_mktsegment")))

  /** J2 — double join resolving both "endpoints" of a fact row
    * (Analytics.scala:348-359): lineitem → orders → customer. */
  val j2Double: Q = Q(
    "j2_join_double",
    Some("""SELECT c_nationkey,
           |  count(*) AS n_items,
           |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin),
    (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(
          count(lit(1)).as("n_items"),
          sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
            .cast("double").as("revenue"))
        .orderBy(col("c_nationkey")))

  /** J4/U2 — left-anti join (subtractByKey, Analytics.scala:285-288). */
  val j4Anti: Q = Q(
    "j4_join_anti",
    Some("""SELECT c_custkey, c_nationkey FROM customer c
           |WHERE NOT EXISTS (SELECT 1 FROM orders o
           |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
           |ORDER BY c_custkey""".stripMargin),
    (s, d) =>
      Tables.customer(s, d)
        .join(
          Tables.orders(s, d).filter(col("o_totalprice") > 300000.0),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_nationkey"))
        .orderBy(col("c_custkey")))

  /** left-semi join (EXISTS) — engine extension beyond the reference. */
  val jSemi: Q = Q(
    "j_join_semi",
    Some("""SELECT c_custkey FROM customer c
           |WHERE EXISTS (SELECT 1 FROM orders o
           |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
           |ORDER BY c_custkey""".stripMargin),
    (s, d) =>
      Tables.customer(s, d)
        .join(
          Tables.orders(s, d).filter(col("o_totalprice") > 300000.0),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"))
        .orderBy(col("c_custkey")))

  /** left-outer join with null-coalesced aggregate — engine extension. */
  val jOuter: Q = Q(
    "j_join_outer",
    Some("""SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
           |FROM customer c LEFT JOIN orders o
           |  ON o.o_custkey = c.c_custkey AND o.o_totalprice > 200000.0
           |GROUP BY c.c_custkey ORDER BY c.c_custkey""".stripMargin),
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, col("o_custkey") === col("c_custkey") && col("o_totalprice") > 200000.0, "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey"))
    })

  /** A1 — per-key degree then degree distribution (Analytics.scala:97). */
  val a1DegreeDist: Q = Q(
    "a1_degree_dist",
    Some("""SELECT n_orders, count(*) AS n_customers FROM (
           |  SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey
           |) GROUP BY n_orders ORDER BY n_orders""".stripMargin),
    (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
        .groupBy(col("n_orders")).agg(count(lit(1)).as("n_customers"))
        .orderBy(col("n_orders")))

  /** A5 — adjacency build / collect_list by key (Analytics.scala:323-331),
    * made deterministic by sorting and joining to one string. */
  val a5CollectSorted: Q = Q(
    "a5_collect_list_sorted",
    Some("""SELECT s_nationkey, string_agg(CAST(s_suppkey AS VARCHAR), ',' ORDER BY s_suppkey) AS supp_list
           |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin),
    (s, d) =>
      Tables.supplier(s, d)
        .groupBy(col("s_nationkey"))
        .agg(array_join(transform(sort_array(collect_list(col("s_suppkey"))),
          x => x.cast("string")), ",").as("supp_list"))
        .orderBy(col("s_nationkey")))

  /** A6 + global stats — min/max/avg/count/count-distinct in one pass. */
  val aGlobalStats: Q = Q(
    "a_global_stats",
    Some(s"""SELECT count(*) AS n_rows,
            |  count(DISTINCT l_orderkey) AS n_orders,
            |  CAST(min(l_quantity) AS DOUBLE) AS min_qty,
            |  CAST(max(l_quantity) AS DOUBLE) AS max_qty,
            |  ${avg6Sql("l_extendedprice")} AS avg_price
            |FROM lineitem""".stripMargin),
    (s, d) =>
      Tables.lineitem(s, d)
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          min(col("l_quantity")).cast("double").as("min_qty"),
          max(col("l_quantity")).cast("double").as("max_qty"),
          avg6(col("l_extendedprice")).as("avg_price")))

  /** W1 — running cumulative total ordered by time (Analytics.scala:22-25):
    * monthly order revenue → cumulative revenue. */
  val w1RunningTotal: Q = Q(
    "w1_running_total",
    Some("""SELECT month,
           |  CAST(sum(n) OVER w AS BIGINT) AS cum_orders,
           |  CAST(sum(rev) OVER w AS DOUBLE) AS cum_revenue
           |FROM (
           |  SELECT date_trunc('month', o_orderdate) AS month,
           |         count(*) AS n, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
           |  FROM orders GROUP BY 1
           |) WINDOW w AS (ORDER BY month ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |ORDER BY month""".stripMargin),
    (s, d) => {
      val w = Window.orderBy(col("month"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n"), sum(dec(col("o_totalprice"))).as("rev"))
        .select(
          col("month"),
          sum(col("n")).over(w).cast(LongType).as("cum_orders"),
          sum(col("rev")).over(w).cast("double").as("cum_revenue"))
        .orderBy(col("month"))
    })

  /** ranking window — top-3 suppliers per nation by balance (extension). */
  val wRankTopkPerGroup: Q = Q(
    "w_rank_topk_per_group",
    Some("""SELECT s_nationkey, s_suppkey, rn FROM (
           |  SELECT s_nationkey, s_suppkey,
           |    row_number() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS rn
           |  FROM supplier)
           |WHERE rn <= 3 ORDER BY s_nationkey, rn""".stripMargin),
    (s, d) => {
      val w = Window.partitionBy(col("s_nationkey"))
        .orderBy(col("s_acctbal").desc, col("s_suppkey"))
      Tables.supplier(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("s_nationkey"), col("s_suppkey"), col("rn"))
        .orderBy(col("s_nationkey"), col("rn"))
    })

  /** lag window — month-over-month revenue delta (extension). */
  val wLagDelta: Q = Q(
    "w_lag_delta",
    Some("""SELECT month, CAST(rev AS DOUBLE) AS rev,
           |  CAST(rev - lag(rev, 1, CAST(0 AS DECIMAL(18,2))) OVER (ORDER BY month) AS DOUBLE) AS delta
           |FROM (
           |  SELECT date_trunc('month', o_orderdate) AS month,
           |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
           |  FROM orders GROUP BY 1)
           |ORDER BY month""".stripMargin),
    (s, d) => {
      val w = Window.orderBy(col("month"))
      Tables.orders(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(sum(dec(col("o_totalprice"))).as("rev"))
        .select(col("month"), col("rev").cast("double").as("rev"),
          (col("rev") - lag(col("rev"), 1, lit(0).cast(DecimalType(18, 2))).over(w))
            .cast("double").as("delta"))
        .orderBy(col("month"))
    })

  /** O1-O3 — global sort + top-k with unique tiebreaker. */
  val oTopk: Q = Q(
    "o_sort_topk",
    Some("""SELECT o_orderkey, o_totalprice FROM orders
           |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin),
    (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10))

  /** U1 — UNION ALL of two projections (Analytics.scala:287). */
  val uUnionAll: Q = Q(
    "u_union_all",
    Some("""SELECT * FROM (
           |  SELECT c_custkey AS id, 'customer' AS kind FROM customer
           |  UNION ALL
           |  SELECT s_suppkey AS id, 'supplier' AS kind FROM supplier
           |) ORDER BY kind, id""".stripMargin),
    (s, d) =>
      Tables.customer(s, d).select(col("c_custkey").as("id"), lit("customer").as("kind"))
        .union(Tables.supplier(s, d).select(col("s_suppkey").as("id"), lit("supplier").as("kind")))
        .orderBy(col("kind"), col("id")))

  /** INTERSECT — nation keys having both customers and suppliers. */
  val uIntersect: Q = Q(
    "u_intersect",
    Some("""SELECT c_nationkey AS nk FROM customer
           |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin),
    (s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
        .orderBy(col("nk")))

  /** EXCEPT — nation keys with no supplier. */
  val uExcept: Q = Q(
    "u_except",
    Some("""SELECT n_nationkey AS nk FROM nation
           |EXCEPT SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin),
    (s, d) =>
      Tables.nation(s, d).select(col("n_nationkey").as("nk"))
        .except(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
        .orderBy(col("nk")))

  /** C1-C7 — string scalar functions (split/substring/trim/case/length). */
  val cStringFuncs: Q = Q(
    "c_string_funcs",
    Some("""SELECT p_partkey,
           |  upper(p_name) AS uname,
           |  substr(p_name, 1, 5) AS prefix,
           |  CAST(length(p_name) AS BIGINT) AS name_len,
           |  split_part(p_type, ' ', 1) AS type_head,
           |  replace(p_brand, '#', '-') AS brand_norm,
           |  concat(p_brand, ':', p_type) AS brand_type
           |FROM part ORDER BY p_partkey""".stripMargin),
    (s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("uname"),
          substring(col("p_name"), 1, 5).as("prefix"),
          length(col("p_name")).cast(LongType).as("name_len"),
          element_at(split(col("p_type"), " "), 1).as("type_head"),
          expr("replace(p_brand, '#', '-')").as("brand_norm"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"))
        .orderBy(col("p_partkey")))

  /** C6/C9 — conditional + least/greatest canonicalization
    * (Analytics.scala:251,269; DataFrameLoader.scala:66-68). */
  val cCondLeastGreatest: Q = Q(
    "c_cond_least_greatest",
    Some("""SELECT p_partkey,
           |  CASE WHEN p_size < 10 THEN 'small' WHEN p_size < 30 THEN 'medium' ELSE 'large' END AS size_class,
           |  CAST(least(p_size, 25) AS BIGINT) AS size_capped,
           |  CAST(greatest(p_size, 5) AS BIGINT) AS size_floored
           |FROM part ORDER BY p_partkey""".stripMargin),
    (s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          when(col("p_size") < 10, "small")
            .when(col("p_size") < 30, "medium")
            .otherwise("large").as("size_class"),
          least(col("p_size"), lit(25)).cast(LongType).as("size_capped"),
          greatest(col("p_size"), lit(5)).cast(LongType).as("size_floored"))
        .orderBy(col("p_partkey")))

  /** C3 — date/time extraction (year-from-date, DataFrameLoader.scala:62). */
  val cDateFuncs: Q = Q(
    "c_date_funcs",
    Some("""SELECT o_orderkey,
           |  CAST(extract(year FROM o_orderdate) AS BIGINT) AS yr,
           |  CAST(extract(month FROM o_orderdate) AS BIGINT) AS mth,
           |  CAST(extract(day FROM o_orderdate) AS BIGINT) AS dom,
           |  CAST(extract(quarter FROM o_orderdate) AS BIGINT) AS qtr,
           |  date_trunc('month', o_orderdate) AS month_start
           |FROM orders ORDER BY o_orderkey""".stripMargin),
    (s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          asLong(year(col("o_orderdate"))).as("yr"),
          asLong(month(col("o_orderdate"))).as("mth"),
          asLong(dayofmonth(col("o_orderdate"))).as("dom"),
          asLong(quarter(col("o_orderdate"))).as("qtr"),
          date_trunc("month", col("o_orderdate")).as("month_start"))
        .orderBy(col("o_orderkey")))

  /** C8 + math — ratios in EXACT integer/decimal arithmetic (rounding a
    * double at a digit position where the true value can be an exact tie —
    * e.g. price/qty = x.xxx75 — diverges between engines, so division is
    * done on integer cents with integer div instead). */
  val cMathFuncs: Q = Q(
    "c_math_funcs",
    Some("""SELECT l_orderkey, l_linenumber,
           |  CAST(abs(l_quantity) AS DOUBLE) AS q_abs,
           |  CAST(ceil(l_quantity) AS BIGINT) AS q_ceil,
           |  CAST(floor(l_quantity) AS BIGINT) AS q_floor,
           |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 10
           |    // greatest(CAST(l_quantity AS BIGINT), 1) AS unit_price_milli,
           |  CAST(l_linenumber % 3 AS BIGINT) AS ln_mod
           |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin),
    (s, d) =>
      Tables.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_quantity")).cast("double").as("q_abs"),
          ceil(col("l_quantity")).cast(LongType).as("q_ceil"),
          floor(col("l_quantity")).cast(LongType).as("q_floor"),
          expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 10" +
            " div greatest(CAST(l_quantity AS BIGINT), 1L)").as("unit_price_milli"),
          (col("l_linenumber") % 3).cast(LongType).as("ln_mod"))
        .orderBy(col("l_orderkey"), col("l_linenumber")))

  /** JSON extraction from the events.props column (engine extension). */
  val cJson: Q = Q(
    "c_json_extract",
    Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
           |FROM events ORDER BY event_id""".stripMargin),
    (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast(LongType).as("k"))
        .orderBy(col("event_id")))

  /** ROLLUP aggregate (engine extension; DuckDB supports ROLLUP).
    * Subtotal keys are surfaced via grouping() sentinels ('ALL') instead
    * of NULL so no output column is a NULL-bearing int. */
  val aRollup: Q = Q(
    "a_rollup",
    Some("""SELECT
           |  CASE WHEN GROUPING(c_mktsegment) = 1 THEN 'ALL' ELSE c_mktsegment END AS seg,
           |  CASE WHEN GROUPING(c_nationkey) = 1 THEN 'ALL' ELSE CAST(c_nationkey AS VARCHAR) END AS nk,
           |  count(*) AS n,
           |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
           |FROM customer GROUP BY ROLLUP (c_mktsegment, c_nationkey)
           |ORDER BY seg, nk""".stripMargin),
    (s, d) =>
      Tables.customer(s, d)
        .rollup(col("c_mktsegment"), col("c_nationkey"))
        .agg(count(lit(1)).as("n"), sum(dec(col("c_acctbal"))).cast("double").as("bal"),
          grouping(col("c_mktsegment")).as("g1"), grouping(col("c_nationkey")).as("g2"))
        .select(
          when(col("g1") === 1, lit("ALL")).otherwise(col("c_mktsegment")).as("seg"),
          when(col("g2") === 1, lit("ALL")).otherwise(col("c_nationkey").cast("string")).as("nk"),
          col("n"), col("bal"))
        .orderBy(col("seg"), col("nk")))

  /** CUBE aggregate (engine extension). */
  val aCube: Q = Q(
    "a_cube",
    Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n
           |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
           |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin),
    (s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first))

  val all: Seq[Q] = Seq(
    q1Agg, s1ScanPrune, pProjectRename, f3Snapshot, f4Dedup,
    j1Inner, j2Double, j4Anti, jSemi, jOuter,
    a1DegreeDist, a5CollectSorted, aGlobalStats, aRollup, aCube,
    w1RunningTotal, wRankTopkPerGroup, wLagDelta,
    oTopk, uUnionAll, uIntersect, uExcept,
    cStringFuncs, cCondLeastGreatest, cDateFuncs, cMathFuncs, cJson)
}
