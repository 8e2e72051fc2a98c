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
}
