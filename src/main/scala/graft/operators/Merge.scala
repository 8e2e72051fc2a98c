package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lakehouse-style MERGE/upsert (VERDICT r2 #8): compute the post-merge
  * state of `target` given `source`, classified through ONE full-outer
  * equi-join on the key — no driver loop, no per-row branching outside
  * codegen. Semantics mirror SQL MERGE INTO:
  *
  *   - key in both            → UPDATE (source values win), unless the
  *     row's `deleteWhen` flag (evaluated over source columns) holds →
  *     DELETE (dropped from the output)
  *   - key only in source     → INSERT, unless delete-flagged — a delete
  *     for an absent key is a no-op (CDC-apply semantics: a tombstone
  *     must never resurrect as an insert)
  *   - key only in target     → keep
  *
  * The output carries an `action` column ('update'/'insert'/'keep') so
  * results are auditable (deleted keys simply vanish).
  *
  * NULL keys are compared null-safe (`<=>`): a NULL-key source row
  * matches a NULL-key target row, so it updates/deletes rather than
  * silently duplicating as an insert. "Output keys unique when input
  * keys are unique" therefore holds with NULL treated as a value.
  *
  * Scale shape: ONE shuffle on the merge key (full-outer is sort-merge —
  * Spark cannot broadcast a full-outer side, which is the right call
  * anyway when both sides are table-sized); AQE handles skewed keys, and
  * row count is |target ∪ source| keys, never a product. Output keys are
  * unique when input keys are (MergeSpec).
  */
object Merge {

  def merge(target: DataFrame, source: DataFrame, keys: Seq[String],
      deleteWhen: Option[Column] = None): DataFrame = {
    require(target.columns.sorted.sameElements(source.columns.sorted),
      s"merge: target/source schemas differ: " +
        s"${target.columns.mkString(",")} vs ${source.columns.mkString(",")}")
    require(keys.nonEmpty && keys.forall(target.columns.contains),
      s"merge: keys ${keys.mkString(",")} must exist in target")
    val dataCols = target.columns.filterNot(keys.contains).toSeq

    val t = target.select(
      keys.map(col) ++ dataCols.map(c => col(c).as(s"__t_$c"))
        :+ lit(true).as("__t_present"): _*)
    // evaluate the delete predicate BEFORE renaming, so callers write it
    // against the source's natural column names
    val s = source
      .withColumn("__s_delete", deleteWhen.getOrElse(lit(false)))
      .select(
        keys.map(c => col(c).as(s"__sk_$c")) ++ dataCols.map(c => col(c).as(s"__s_$c"))
          ++ Seq(col("__s_delete"), lit(true).as("__s_present")): _*)

    // null-safe equi-join (<=> is a supported SMJ/hash join key), then
    // coalesce the key columns manually — USING-column joins would treat
    // NULL keys as never-matching
    val cond = keys.map(k => col(k) <=> col(s"__sk_$k")).reduce(_ && _)
    val j = t.join(s, cond, "full_outer")
    val matched = col("__t_present").isNotNull && col("__s_present").isNotNull
    val action = when(col("__s_present").isNotNull && col("__s_delete"), lit("delete"))
      .when(matched, lit("update"))
      .when(col("__s_present").isNotNull, lit("insert"))
      .otherwise(lit("keep"))

    j.withColumn("__action", action)
      .filter(col("__action") =!= "delete")
      .select(
        keys.map(k =>
          when(col("__t_present").isNotNull, col(k))
            .otherwise(col(s"__sk_$k")).as(k))
        ++ dataCols.map(c =>
          when(col("__s_present").isNotNull, col(s"__s_$c"))
            .otherwise(col(s"__t_$c")).as(c))
          :+ col("__action").as("action"): _*)
  }
}
