package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeSet, BindReferences, JoinedRow, SortOrder,
  UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** As-of join as a WHOLE-OPERATOR Catalyst extension (engine policy
  * SURVEY.md §2.10 preference (c): custom LogicalPlan + Strategy +
  * SparkPlan when an operator's semantics deserve their own physical
  * plan). Semantically identical to operators/AsOfJoin.asof (the
  * compose-first union+window form, which remains the conservative
  * default); this operator executes the textbook merge instead:
  *
  *   - each side is hash-clustered on its key and sorted by (key, ts) —
  *     EnsureRequirements co-partitions the two shuffles exactly as it
  *     does for SortMergeJoin;
  *   - one streaming two-pointer pass per partition emits, for every
  *     probe row, the latest build row of the same key with
  *     build.ts <= probe.ts (inner semantics; probes without a match are
  *     dropped). O(|probe| + |build|) per partition, zero buffered state
  *     beyond one build row — unlike the window form, which carries the
  *     union of both sides through one window sort.
  *
  * Key/ts/payload columns are referenced BY NAME and re-resolved against
  * the children's current outputs on every access: the analyzer's
  * DeduplicateRelations freely rewrites child exprIds when both sides
  * derive from one source (the classic self-join problem), so captured
  * Attribute fields would go stale (found the hard way: the optimizer
  * then pruned the right side down to the payload column).
  *
  * v1 contract: key and ts columns must evaluate to Long (BIGINT or
  * TIMESTAMP — Spark timestamps are Long micros internally); rows with
  * NULL key/ts are skipped; the build side should be unique per
  * (key, ts) — among equal (key, ts) build rows the last in sort order
  * wins, which is nondeterministic unless deduplicated upstream.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    keyName: String,
    tsName: String,
    payloadNames: Seq[String]) extends BinaryNode {

  /** Resolution honors the session's case-sensitivity setting (ADVICE
    * r2: a bare `==` silently diverged from Spark's default
    * case-insensitive resolution) and rejects ambiguity instead of
    * silently taking the first match. */
  private def byName(plan: LogicalPlan, n: String): Attribute =
    plan.output.filter(a => conf.resolver(a.name, n)) match {
      case Seq(one) => one
      case Seq() => throw new IllegalArgumentException(
        s"column $n not found in ${plan.output.map(_.name)}")
      case many => throw new IllegalArgumentException(
        s"column $n is ambiguous in ${many.map(_.name)}")
    }

  def leftKey: Attribute = byName(left, keyName)
  def leftTs: Attribute = byName(left, tsName)
  def rightKey: Attribute = byName(right, keyName)
  def rightTs: Attribute = byName(right, tsName)
  def payload: Seq[Attribute] = payloadNames.map(byName(right, _))

  override def output: Seq[Attribute] = left.output ++ payload

  /** Explicit: keeps ColumnPruning from stripping the join columns off
    * the children (they appear in no expression field of this node). */
  override def references: AttributeSet =
    AttributeSet(Seq(leftKey, leftTs, rightKey, rightTs) ++ payload)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    leftTs: Attribute,
    rightKey: Attribute,
    rightTs: Attribute,
    payload: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payload

  /** Standard custom-exec observability: row counts surface in the SQL
    * UI / metrics listeners like any built-in join. */
  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numDroppedProbeRows" -> SQLMetrics.createMetric(sparkContext,
      "probe rows without an as-of match"))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val lKeyB = BindReferences.bindReference(leftKey: org.apache.spark.sql.catalyst.expressions.Expression, lOut)
    val lTsB = BindReferences.bindReference(leftTs: org.apache.spark.sql.catalyst.expressions.Expression, lOut)
    val rKeyB = BindReferences.bindReference(rightKey: org.apache.spark.sql.catalyst.expressions.Expression, rOut)
    val rTsB = BindReferences.bindReference(rightTs: org.apache.spark.sql.catalyst.expressions.Expression, rOut)
    val numOutputRows = longMetric("numOutputRows")
    val numDropped = longMetric("numDroppedProbeRows")

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outAttrs, lOut ++ rOut)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // latest build row whose (key, ts) precedes the current probe
        private var curBuild: InternalRow = _
        private var curBuildKey = 0L
        // first build row PAST the probe frontier (copied: row buffers
        // are reused by the upstream sorter)
        private var pending: InternalRow = _
        private var result: InternalRow = _
        private var computed = false

        /** Consume build rows up to the probe frontier (k, t). */
        private def advanceBuild(k: Long, t: Long): Unit = {
          var cont = true
          while (cont) {
            val row = if (pending != null) pending else if (rIter.hasNext) rIter.next() else null
            if (row == null) cont = false
            else {
              val bkAny = rKeyB.eval(row)
              val btAny = rTsB.eval(row)
              if (bkAny == null || btAny == null) pending = null // skip null keys
              else {
                val bk = bkAny.asInstanceOf[Long]
                val bt = btAny.asInstanceOf[Long]
                if (bk < k || (bk == k && bt <= t)) {
                  if (bk == k) { curBuild = row.copy(); curBuildKey = bk }
                  pending = null
                } else {
                  if (pending == null) pending = row.copy()
                  cont = false
                }
              }
            }
          }
        }

        private def findNext(): InternalRow = {
          while (lIter.hasNext) {
            val p = lIter.next()
            val kAny = lKeyB.eval(p)
            val tAny = lTsB.eval(p)
            if (kAny != null && tAny != null) {
              val k = kAny.asInstanceOf[Long]
              val t = tAny.asInstanceOf[Long]
              advanceBuild(k, t)
              if (curBuild != null && curBuildKey == k) {
                numOutputRows += 1
                return proj(joined(p, curBuild))
              } else numDropped += 1
            } else numDropped += 1
          }
          null
        }

        override def hasNext: Boolean = {
          if (!computed) { result = findNext(); computed = true }
          result != null
        }

        override def next(): InternalRow = {
          if (!computed) hasNext
          computed = false
          result
        }
      }
    }
  }
}

/** Planner strategy mapping the logical node to its exec. Injected via
  * GraftExtensions (deployment path) or self-registered through
  * spark.experimental.extraStrategies by AsOfJoinPlan.asofNative. */
object GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(planLater(p.left), planLater(p.right),
        p.leftKey, p.leftTs, p.rightKey, p.rightTs, p.payload) :: Nil
    case _ => Nil
  }
}

/** Optimizer rule: push probe-side filter conjuncts through AsOfJoinPlan.
  * Catalyst's PushPredicateThroughJoin only understands built-in nodes,
  * so without this a `asofNative(...).filter(probe_col ...)` evaluates
  * the predicate AFTER the merge — shuffling and merging rows the scan
  * could have dropped. Sound because every output row derives from
  * exactly one probe row and a probe-only predicate cannot observe the
  * payload; build-side conjuncts are NOT pushed (dropping a build row
  * can change which row is "latest" for later probes — as-of joins are
  * order-sensitive on the build side). */
object PushProbeFilterThroughAsOf
  extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{And, PredicateHelper}
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  private object Split extends PredicateHelper {
    def conjuncts(e: org.apache.spark.sql.catalyst.expressions.Expression) =
      splitConjunctivePredicates(e)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, asof: AsOfJoinPlan) =>
      val (push, keep) = Split.conjuncts(cond)
        .partition(c => c.deterministic && c.references.subsetOf(asof.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = asof.copy(left = Filter(push.reduce(And), asof.left))
        if (keep.isEmpty) pushed else Filter(keep.reduce(And), pushed)
      }
  }
}

object AsOfJoinPlan {

  /** DataFrame-level entry: enrich `probe` with the latest `payload`
    * columns from `build` per key at or before each probe timestamp. */
  def asofNative(probe: DataFrame, build: DataFrame, key: String, ts: String,
      payload: Seq[String]): DataFrame = {
    val spark: SparkSession = probe.sparkSession
    // v1 contract enforced at ANALYSIS time, not as an executor
    // ClassCastException (ADVICE r2): the merge evals key/ts as Long, so
    // only BIGINT and TIMESTAMP (Long micros internally) are accepted.
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    for ((df, side) <- Seq((probe, "probe"), (build, "build"));
         (n, what) <- Seq((key, "key"), (ts, "ts"))) {
      val dt = df.select(n).schema.head.dataType // session-resolver lookup
      // TIMESTAMP_NTZ is Long micros internally too (parquet written
      // without tz annotation — e.g. most non-Spark writers — reads as
      // NTZ, and the merge's ordering semantics are identical)
      if (dt != LongType && dt != TimestampType && dt != TimestampNTZType)
        throw new IllegalArgumentException(
          s"asofNative $side $what column $n must be BIGINT or TIMESTAMP, got $dt")
    }
    if (!spark.experimental.extraStrategies.contains(GraftStrategies))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GraftStrategies
    if (!spark.experimental.extraOptimizations.contains(PushProbeFilterThroughAsOf))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushProbeFilterThroughAsOf
    GraftColumnBridge.ofRows(spark,
      AsOfJoinPlan(GraftColumnBridge.analyzed(probe),
        GraftColumnBridge.analyzed(build), key, ts, payload))
  }
}
