package graft

import org.apache.spark.sql.functions._

import graft.operators.DataQuality
import graft.operators.DataQuality.Rule

/** DataQuality contracts: violations are actually counted (on planted
  * corruption, not just the clean testdata), the row audit is one scan
  * with no shuffle before the final reduce, and orphan/dup helpers
  * count what they claim. */
class DataQualitySpec extends SparkSpec {

  private def corrupt = {
    val rows = Seq(
      (1L, 10L, "ok"),
      (2L, -5L, "ok"),   // bad value
      (3L, 7L, null),    // null flag
      (3L, 8L, "ok"))    // dup key
    spark.createDataFrame(rows).toDF("k", "v", "flag")
  }

  test("planted corruption is counted exactly") {
    val out = DataQuality.audit(corrupt, Seq(
      Rule("neg_v", col("v") < 0),
      Rule("null_flag", col("flag").isNull))).collect().head
    assert(out.getLong(0) == 1L && out.getLong(1) == 1L)

    val dups = DataQuality.duplicateKeyCount(corrupt, col("k")).collect().head.getLong(0)
    assert(dups == 2L) // both rows of the duplicated key count

    val parent = spark.range(3).select((col("id") + 1).as("pk")) // 1,2,3
    val orphans = DataQuality.orphanCount(
      corrupt, col("k") + 10, parent, col("pk")).collect().head.getLong(0)
    assert(orphans == 4L) // all child keys shifted out of range
  }

  test("empty input reports zero violations, not NULL (empty ingest batch)") {
    val out = DataQuality.audit(corrupt.filter(lit(false)), Seq(
      Rule("neg_v", col("v") < 0),
      Rule("null_flag", col("flag").isNull))).collect().head
    assert(!out.isNullAt(0) && out.getLong(0) == 0L)
    assert(!out.isNullAt(1) && out.getLong(1) == 0L)
  }

  test("row audit is a single-scan aggregate (one partial/final pair, no join)") {
    val plan = DataQuality.audit(Tables.lineitem(spark, sf()), Seq(
      Rule("a", col("l_quantity") <= 0),
      Rule("b", col("l_discount") < 0)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"row audit must not join:\n$plan")
    assert(plan.contains("partial"), s"expected map-side partial aggregation:\n$plan")
  }

  test("registered audit is all-zeros on the clean testdata") {
    val row = DataQuality.dqChecks.run(spark, sf()).collect().head
    (0 until row.length).foreach(i => assert(row.getLong(i) == 0L,
      s"clean testdata flagged at column $i"))
  }

  test("k-anonymity audit: boundary semantics on both gates") {
    // sf0.01: sf0.001's 150 customers spread over 122 QI groups — every
    // group sub-k, both gates vacuous there
    val audit = DataQuality.kAnonymity.run(spark, sf("0.01")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5))).toMap
    assert(audit.nonEmpty)
    audit.values.foreach { case (size, nSens, kOk, lOk) =>
      assert(kOk === (size >= 3))
      assert(lOk === (nSens >= 2))
      assert(nSens <= size, "distinct sensitive values cannot exceed rows")
      assert(nSens >= 1)
    }
    // the corpus must exercise BOTH failure modes, or the gates are
    // vacuous: some group too small, and some group size>=k but l<2
    // (the homogeneity attack l-diversity exists for)
    assert(audit.values.exists(v => !v._3), "need a sub-k group")
    assert(audit.values.exists(v => v._3 && !v._4),
      "need a k-anonymous but non-diverse group")
    assert(audit.values.exists(v => v._3 && v._4), "need a passing group")
  }

  test("suppression releases exactly the rows of passing groups") {
    import org.apache.spark.sql.functions.{col, floor}
    val audit = DataQuality.kAnonymity.run(spark, sf("0.01")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getBoolean(4) && r.getBoolean(5)))
      .toMap
    val released = DataQuality.kSuppress.run(spark, sf("0.01")).collect()
      .map(_.getLong(0)).toSet
    val all = graft.Tables.customer(spark, sf("0.01"))
      .select(col("c_custkey"), col("c_nationkey").cast("long"),
        floor(col("c_acctbal") / 1000).cast("long")).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
    all.foreach { case (ck, qi) =>
      assert(released.contains(ck) === audit(qi),
        s"customer $ck release verdict must equal its group's audit")
    }
    assert(released.nonEmpty && released.size < all.length)
  }
}
