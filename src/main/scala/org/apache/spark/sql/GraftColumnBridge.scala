package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the private[sql] Column<->Expression and plan<->DataFrame
  * converters, so custom Catalyst expressions and logical plans
  * (graft.functions / graft.plans) can be exposed through the public
  * API. Placed in the Spark SQL package — the standard extension-point
  * pattern for libraries shipping native operators.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzed(df: DataFrame): LogicalPlan = {
    val qe = df.asInstanceOf[classic.Dataset[_]].queryExecution
    qe.analyzed
  }

  /** private[sql] sessionUUID — unique per session for the JVM lifetime,
    * the safe cache-identity key (a recycled identityHashCode is not). */
  def sessionUUID(spark: SparkSession): String =
    spark.asInstanceOf[classic.SparkSession].sessionUUID

  /** The materialized RDD behind a localCheckpoint'ed Dataset (its plan
    * is a LogicalRDD), so iterative algorithms can explicitly unpersist
    * superseded iteration frames instead of leaking them until the
    * ContextCleaner catches up (ADVICE r2, HyperANF superstep frames). */
  def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    analyzed(df) match {
      case lr: execution.LogicalRDD => Some(lr.rdd)
      case _ => None
    }

  /** Re-wrap a (typically localCheckpoint'ed) frame as a LogicalRDD
    * WITHOUT origin statistics. localCheckpoint propagates the
    * truncated plan's estimated stats into the LogicalRDD it returns;
    * in an iterative loop whose round plan INNER-joins the state frame
    * k times, sizeInBytes therefore compounds ~(digits x k) per round —
    * by round ~12 the estimate is a BigInteger with millions of digits
    * and the driver livelocks inside stats multiplication (semi-join
    * loops like k-core never multiply sizes, which is why only the
    * truss peel hit this). The re-wrapped frame computes from the same
    * materialized checkpoint blocks but reports the session-default
    * size, keeping every round's estimate constant. */
  def statsClean(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[_]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema)
  }

  /** Row count of a localCheckpoint-backed frame via its MATERIALIZED
    * RDD: one cached-scan job — no re-analysis, no partial/final
    * aggregate pair, no exchange. The superstep loops call a
    * convergence count every round; `Dataset.count()` plans a fresh
    * aggregate each time (measured ~100-140 ms per call on the bench
    * host vs ~30 ms for the raw RDD count — graft.SchedProbe,
    * OPTIMIZATION_r13.md §Scheduler). Falls back to `Dataset.count()`
    * when the frame is not checkpoint-backed, so callers can use it
    * unconditionally on loop state. */
  def fastCount(df: DataFrame): Long =
    analyzed(df) match {
      case lr: execution.LogicalRDD => lr.rdd.count()
      case _ => df.count()
    }

  /** Exact row count, memoized per (session, canonical plan) — for the
    * superstep loops' partition-sizing count (LoopConf.pinned): every
    * loop query counted its raw edge frame on entry, a full scan +
    * aggregate whose value is identical across the ~25 loop queries
    * reading the same frame in one session. Checkpoint-backed frames
    * short-circuit to the materialized RDD (no memo needed); everything
    * else keys on the canonicalized plan STRING (exact equality — a
    * hash collision cannot return a wrong count). Bounded: a handful of
    * distinct scan plans per session. */
  private val countMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, String), java.lang.Long]()

  def memoCount(df: DataFrame): Long =
    analyzed(df) match {
      case lr: execution.LogicalRDD => lr.rdd.count()
      case plan =>
        countMemo.computeIfAbsent(
          (sessionUUID(df.sparkSession), plan.canonicalized.toString),
          _ => df.count()).longValue()
    }

  /** Count rows of a checkpoint-backed frame whose BOOLEAN column
    * `name` is true, in one cached-scan job (the loop-body
    * `filter(col).count()` convergence idiom re-plans a filter +
    * aggregate every round; this reads the materialized rows
    * directly). NULL counts as false, matching `filter(col)`. */
  def countTrue(df: DataFrame, name: String): Long = {
    val idx = df.schema.fieldIndex(name)
    analyzed(df) match {
      case lr: execution.LogicalRDD =>
        lr.rdd.asInstanceOf[org.apache.spark.rdd.RDD[
          org.apache.spark.sql.catalyst.InternalRow]]
          .mapPartitions(
            it => Iterator.single(
              it.count(r => !r.isNullAt(idx) && r.getBoolean(idx)).toLong),
            preservesPartitioning = true)
          .fold(0L)(_ + _)
      case _ => df.filter(df.col(name)).count()
    }
  }
}
