package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each probe row, the most recent build row of the same
  * key with build.ts <= probe.ts (inner semantics).
  *
  * Implementation is the compose-first option (engine policy SURVEY.md
  * §2.10 / guide preference (a)): tag-union both sides, one window pass
  * per key ordered by (ts, side) carrying the last build payload forward.
  * This compiles to exactly the physical shape a custom SortMergeAsOfExec
  * would produce — ONE hash-partition shuffle on the key and ONE sort per
  * partition — so the custom-operator route (LogicalPlan + Strategy) is
  * unnecessary until profiling says otherwise. Ties: build rows sort
  * before probe rows at equal ts (<= semantics); the build side must be
  * unique per (key, ts) for determinism — pre-aggregate it.
  */
object AsOfJoin {

  /** @param probe   rows to enrich
    * @param build   lookup rows, unique per (key, ts)
    * @param key     equi-join key column name (same name both sides)
    * @param ts      event-time column name (same name both sides)
    * @param payload build columns to carry onto each probe row
    */
  def asof(probe: DataFrame, build: DataFrame, key: String, ts: String,
      payload: Seq[String]): DataFrame = {
    val probeCols = probe.columns.toSeq
    val tagged =
      probe
        .withColumn("__side", lit(1))
        .select(
          (probeCols.map(col) :+ col("__side")) ++
            payload.map(p => lit(null).cast(build.schema(p).dataType).as(p)): _*)
        .unionByName(
          build
            .withColumn("__side", lit(0))
            .select(
              (probeCols.map(c =>
                if (c == key || c == ts) col(c)
                else lit(null).cast(probe.schema(c).dataType).as(c)) :+ col("__side")) ++
                payload.map(col): _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(tagged) { (df, p) =>
      df.withColumn(s"__asof_$p", last(col(p), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("__side") === 1 && payload.map(p => col(s"__asof_$p").isNotNull)
        .reduce(_ && _))
      .select(probeCols.map(col) ++
        payload.map(p => col(s"__asof_$p").as(p)): _*)
  }

  /** LEFT as-of join with a lookback tolerance — the attribution shape:
    * every probe row survives; the carried payload is kept only when the
    * matched build row lies within `tolerance` BEFORE the probe's ts
    * (build.ts in [probe.ts - tolerance, probe.ts]), else nulled. The
    * carried build row is the LATEST one <= probe.ts, so "latest is too
    * old" proves no build row exists in the window at all — the
    * tolerance check needs no second pass.
    *
    * Same single-shuffle single-sort shape as [[asof]]: one key
    * partition, one (ts, side) sort, one window. */
  def asofLeftTol(probe: DataFrame, build: DataFrame, key: String,
      ts: String, payload: Seq[String], tolerance: Column): DataFrame = {
    val probeCols = probe.columns.toSeq
    val tagged =
      probe
        .withColumn("__side", lit(1))
        .withColumn("__bts", lit(null).cast(probe.schema(ts).dataType))
        .select(
          (probeCols.map(col) :+ col("__side") :+ col("__bts")) ++
            payload.map(p => lit(null).cast(build.schema(p).dataType).as(p)): _*)
        .unionByName(
          build
            .withColumn("__side", lit(0))
            .withColumn("__bts", col(ts))
            .select(
              (probeCols.map(c =>
                if (c == key || c == ts) col(c)
                else lit(null).cast(probe.schema(c).dataType).as(c))
                :+ col("__side") :+ col("__bts")) ++
                payload.map(col): _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = (payload :+ "__bts").foldLeft(tagged) { (df, p) =>
      df.withColumn(s"__asof_$p", last(col(p), ignoreNulls = true).over(w))
    }
    // tolerance is an interval column (e.g. expr("INTERVAL 7 DAYS")):
    // the compare stays in the timestamp domain, micros-exact
    val fresh = col("__asof___bts").isNotNull &&
      col("__asof___bts") >= col(ts) - tolerance
    carried
      .filter(col("__side") === 1)
      .select(probeCols.map(col) ++
        payload.map(p =>
          when(fresh, col(s"__asof_$p")).as(p)): _*)
  }
}
