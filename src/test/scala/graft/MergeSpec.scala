package graft

import org.apache.spark.sql.functions._

import graft.operators.Merge

/** MERGE/upsert operator semantics (graft.operators.Merge). */
class MergeSpec extends SparkSpec {

  import spark.implicits._

  private def tgt = Seq(
    (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L)
  ).toDF("k", "v", "n")

  private def src = Seq(
    (2L, "B", 21L),  // update
    (3L, "C", 31L),  // matched + deleteWhen(n=31) -> delete
    (9L, "Z", 90L)   // insert
  ).toDF("k", "v", "n")

  test("update / insert / keep / delete classification") {
    val out = Merge.merge(tgt, src, Seq("k"),
        deleteWhen = Some(col("n") === 31L))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    assert(out === Seq(
      (1L, "a", 10L, "keep"),
      (2L, "B", 21L, "update"),
      (4L, "d", 40L, "keep"),
      (9L, "Z", 90L, "insert")))
  }

  test("no delete predicate: matched rows all update") {
    val out = Merge.merge(tgt, src, Seq("k")).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out === Map(1L -> "keep", 2L -> "update", 3L -> "update",
      4L -> "keep", 9L -> "insert"))
  }

  test("delete-flagged source rows never land, matched or not (CDC-apply)") {
    // a tombstone for an absent key is a no-op, never an insert — the
    // resurrect bug that breaks chained CDC merges (Cdc.applyLog)
    val out = Merge.merge(tgt, src, Seq("k"),
        deleteWhen = Some(col("n") === 90L))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(!out.contains(9L))
    assert(out.values.forall(_ != "delete"))
  }

  test("composite keys and column order independence") {
    val t = Seq((1L, 1L, "x"), (1L, 2L, "y")).toDF("k1", "k2", "v")
    val s = Seq(("y2", 2L, 1L)).toDF("v", "k2", "k1") // shuffled columns
    val out = Merge.merge(t, s, Seq("k1", "k2")).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getString(2), r.getString(3)))).toMap
    assert(out === Map((1L, 1L) -> ("x", "keep"), (1L, 2L) -> ("y2", "update")))
  }

  test("output keys stay unique when input keys are unique") {
    val out = Merge.merge(tgt, src, Seq("k"))
    assert(out.count() === out.select("k").distinct().count())
  }

  test("schema mismatch and missing key are rejected") {
    val bad = Seq((1L, "a")).toDF("k", "v")
    intercept[IllegalArgumentException] { Merge.merge(tgt, bad, Seq("k")) }
    intercept[IllegalArgumentException] { Merge.merge(tgt, src, Seq("nope")) }
  }

  test("NULL keys match null-safe: update through NULL, never duplicate") {
    val t = Seq[(Option[Long], String)](
      (None, "nullrow"), (Some(1L), "a")).toDF("k", "v")
    val s = Seq[(Option[Long], String)](
      (None, "NULLROW2"), (Some(2L), "b")).toDF("k", "v")
    val out = Merge.merge(t, s, Seq("k")).collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        r.getString(1), r.getString(2))).sortBy(_._1)
    // the NULL-key source row must UPDATE the NULL-key target row, not
    // insert a second NULL-key row (ADVICE r4 #1)
    assert(out === Seq((-1L, "NULLROW2", "update"),
      (1L, "a", "keep"), (2L, "b", "insert")))
  }

  test("NULL-key delete removes the NULL-key target row") {
    val t = Seq[(Option[Long], String)]((None, "nullrow"), (Some(1L), "a"))
      .toDF("k", "v")
    val s = Seq[(Option[Long], String)]((None, "gone")).toDF("k", "v")
    val out = Merge.merge(t, s, Seq("k"),
        deleteWhen = Some(col("v") === "gone"))
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert(out.toSeq === Seq((1L, "keep")))
  }

  test("x_merge_nullsafe registry entry matches in-memory classification") {
    val out = SparkEntry.queries("x_merge_nullsafe")(spark, sf()).cache()
    val byK = out.collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(3))).toMap
    assert(byK(-999L) === ((true, "update")))   // NULL key updated null-safe
    assert(byK(100L) === ((false, "insert")))
    assert(!byK.contains(200L))                 // tombstone never resurrects
    assert(!byK.contains(6L))                   // matched delete vanished
    assert(byK(3L) === ((false, "update")))
    assert(byK(1L) === ((false, "keep")))
    assert(out.count() === out.select("k").distinct().count())
    out.unpersist(false)
  }

  test("x_merge_upsert registry entry: actions present, keys unique") {
    val out = SparkEntry.queries("x_merge_upsert")(spark, sf()).cache()
    val acts = out.groupBy("action").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(acts.keySet === Set("keep", "update", "insert"))
    assert(out.count() === out.select("c_custkey").distinct().count())
    out.unpersist(false)
  }
}
