package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.registry.Q

/** Declarative data-quality auditing — the constraint-validation pass a
  * training-data pipeline runs before trusting an ingest batch. Row
  * rules compile to ONE aggregation over a single scan (each rule a
  * conditional count — map-side combinable, no shuffle beyond the final
  * 1-row reduce); referential integrity is a left-anti count against
  * the parent's keys. Everything is an exact BIGINT count, so the audit
  * is bit-deterministic and plain-SQL oracled.
  */
object DataQuality {

  /** A named row-level constraint; `violation` evaluates true on BAD rows. */
  final case class Rule(name: String, violation: Column)

  /** One row, one violation-count column per rule, single scan. The
    * coalesce matters: sum() over an EMPTY frame is NULL, and an empty
    * ingest batch is a plausible input for a pre-trust audit (ADVICE
    * r5 #2) — every rule must report 0, not NULL. */
  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "audit needs at least one rule")
    def cnt(r: Rule): Column =
      coalesce(sum(when(r.violation, 1L).otherwise(0L)), lit(0L)).as(r.name)
    df.agg(cnt(rules.head), rules.tail.map(cnt): _*)
  }

  /** Count of child rows whose key has no match in parent (FK orphans). */
  def orphanCount(child: DataFrame, childKey: Column,
      parent: DataFrame, parentKey: Column): DataFrame =
    child.select(childKey.as("__k"))
      .join(parent.select(parentKey.as("__k")), Seq("__k"), "left_anti")
      .agg(count(lit(1)).as("n"))

  /** Count of duplicated primary-key values. */
  def duplicateKeyCount(df: DataFrame, key: Column): DataFrame =
    df.groupBy(key.as("__k")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
      .agg(coalesce(sum(col("c")), lit(0L)).as("n"))

  /** The registered audit: lineitem row rules (date ordering, value
    * ranges, nulls) in one scan, plus lineitem→orders referential
    * integrity and an orders PK uniqueness check. The testdata is clean
    * by construction, so the expected counts are zero — the point is
    * the single-pass plan shape and that any future corruption shows up
    * as a nonzero cell in a hash-checked result. */
  val dqChecks: Q = Q(
    "x_dq_checks",
    Some("""SELECT
           |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem
           |     WHERE l_shipdate < DATE '1992-01-01' OR l_shipdate > DATE '2002-12-31') AS bad_shipdate,
           |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem
           |     WHERE l_quantity <= 0 OR l_extendedprice < 0) AS bad_values,
           |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem
           |     WHERE l_returnflag IS NULL OR l_linestatus IS NULL) AS null_flags,
           |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem
           |     WHERE l_discount < 0 OR l_discount > 1) AS bad_discount,
           |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
           |     WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS orphan_lineitems,
           |  (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) FROM (
           |     SELECT count(*) AS c FROM orders GROUP BY o_orderkey HAVING count(*) > 1)) AS dup_orderkeys""".stripMargin),
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val rowAudit = audit(li, Seq(
        Rule("bad_shipdate", col("l_shipdate") < lit("1992-01-01").cast("date")
          || col("l_shipdate") > lit("2002-12-31").cast("date")),
        Rule("bad_values", col("l_quantity") <= 0 || col("l_extendedprice") < 0),
        Rule("null_flags", col("l_returnflag").isNull || col("l_linestatus").isNull),
        Rule("bad_discount", col("l_discount") < 0 || col("l_discount") > 1)))
      val orphans = orphanCount(li, col("l_orderkey"),
        Tables.orders(s, d), col("o_orderkey"))
        .select(col("n").as("orphan_lineitems"))
      val dups = duplicateKeyCount(Tables.orders(s, d), col("o_orderkey"))
        .select(col("n").as("dup_orderkeys"))
      rowAudit.crossJoin(orphans).crossJoin(dups)
    })

  /** k-anonymity / l-diversity audit — the privacy-governance check a
    * training-data release runs before shipping a table: group rows by
    * their QUASI-IDENTIFIER combination (here nation + account-balance
    * kilo-bucket — attributes an adversary can link externally) and
    * flag groups smaller than k=3 (re-identifiable) or with fewer than l
    * distinct SENSITIVE values (attribute-disclosing even at size >= k
    * — the homogeneity attack l-diversity exists for; sensitive =
    * market segment). Output is the per-group audit artifact the
    * suppression/generalization pass consumes. ONE shuffle: the QI
    * groupBy (count-distinct expands in the same aggregation); floor()
    * buckets on both engines — CAST(double AS INT) rounds in DuckDB
    * but truncates in Spark, the one cross-engine trap here. */
  val kAnonymity: Q = Q(
    "x_k_anonymity",
    Some("""SELECT CAST(c_nationkey AS BIGINT) AS nation,
           |  CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
           |  CAST(count(*) AS BIGINT) AS group_size,
           |  CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_sensitive,
           |  count(*) >= 3 AS k_anonymous,
           |  count(DISTINCT c_mktsegment) >= 2 AS l_diverse
           |FROM customer
           |GROUP BY 1, 2 ORDER BY nation, bal_bucket""".stripMargin),
    (s, d) =>
      Tables.customer(s, d)
        .groupBy(col("c_nationkey").cast("long").as("nation"),
          floor(col("c_acctbal") / 1000).cast("long").as("bal_bucket"))
        .agg(count(lit(1)).as("group_size"),
          countDistinct(col("c_mktsegment")).as("n_sensitive"))
        .select(col("nation"), col("bal_bucket"), col("group_size"),
          col("n_sensitive"),
          (col("group_size") >= 3).as("k_anonymous"),
          (col("n_sensitive") >= 2).as("l_diverse"))
        .orderBy(col("nation"), col("bal_bucket")))

  /** The APPLY step: release only rows whose QI group passes BOTH
    * gates (suppression — generalization is the other lever, out of
    * contract here). The audit side is at most |QI-combinations| rows
    * (aggregated, small), so it BROADCASTS back onto the table: the
    * corpus is scanned once and never shuffled. */
  val kSuppress: Q = Q(
    "x_k_suppress",
    Some("""WITH audit AS (
           |  SELECT c_nationkey AS nation,
           |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bb,
           |    count(*) >= 3 AND count(DISTINCT c_mktsegment) >= 2 AS ok
           |  FROM customer GROUP BY 1, 2)
           |SELECT c.c_custkey, c.c_mktsegment
           |FROM customer c JOIN audit a
           |  ON c.c_nationkey = a.nation
           |  AND CAST(floor(c.c_acctbal / 1000) AS BIGINT) = a.bb
           |WHERE a.ok ORDER BY c.c_custkey""".stripMargin),
    (s, d) => {
      val cust = Tables.customer(s, d)
        .withColumn("bb", floor(col("c_acctbal") / 1000).cast("long"))
      val audit = cust
        .groupBy(col("c_nationkey").as("nation"), col("bb").as("abb"))
        .agg(((count(lit(1)) >= 3) &&
          (countDistinct(col("c_mktsegment")) >= 2)).as("ok"))
        .filter(col("ok"))
      cust.join(broadcast(audit),
          cust("c_nationkey") === audit("nation") && col("bb") === col("abb"))
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    })

  def all: Seq[Q] = Seq(dqChecks, kAnonymity, kSuppress)
}
