package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: makes the native graft expressions
  * available in any session via
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) — the deployment-grade
  * registration path; `GraftFunctions.register` is the programmatic
  * equivalent for an already-built session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => graft.plans.GraftStrategies)
    e.injectOptimizerRule(_ => graft.plans.PushProbeFilterThroughAsOf)
    e.injectFunction((
      FunctionIdentifier("pack_pair"),
      info("pack_pair", "pack_pair(a, b) - canonical (min<<32)|max pair key"),
      (es: Seq[Expression]) => PackPair(es(0), es(1))))
    e.injectFunction((
      FunctionIdentifier("byte_histogram"),
      info("byte_histogram", "byte_histogram(bin) - 16-bin high-nibble histogram"),
      (es: Seq[Expression]) => ByteHistogram(es.head)))
    e.injectFunction((
      FunctionIdentifier("sample_bytes"),
      info("sample_bytes", "sample_bytes(bin, k) - every k-th byte"),
      (es: Seq[Expression]) => SampleBytes(es(0), es(1))))
    e.injectFunction((
      FunctionIdentifier("array_dot"),
      info("array_dot", "array_dot(a, b) - strict left-fold dot product"),
      (es: Seq[Expression]) => ArrayDot(es(0), es(1))))
    e.injectFunction((
      FunctionIdentifier("minhash_agg"),
      info("minhash_agg", "minhash_agg(h) - 32-slot MinHash signature over long hashes"),
      (es: Seq[Expression]) => MinHashAgg(es.head).toAggregateExpression()))
  }
}
