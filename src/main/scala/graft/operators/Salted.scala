package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant two-phase aggregation (SURVEY.md "salting for skew"):
  * rows of a hot key are spread over `salts` sub-keys, partially
  * aggregated per (key, salt) — bounding any single reducer's input to
  * 1/salts of the hot key — then finalized per key. Results are exactly
  * the direct groupBy for decomposable aggregates (sum/count/min/max with
  * exact types), which is what the oracle checks. AQE's skew handling
  * covers joins; this is the aggregation-side counterpart for when a
  * single key's partial state itself is too hot.
  */
object Salted {

  def saltedAgg(df: DataFrame, key: String, salts: Int,
      aggs: (String, Column)*): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val partial = salted.groupBy(col(key), col("__salt"))
      .agg(aggs.head._2.as(s"__p_${aggs.head._1}"),
        aggs.tail.map { case (n, c) => c.as(s"__p_$n") }: _*)
    partial.groupBy(col(key))
      .agg(sum(col(s"__p_${aggs.head._1}")).as(aggs.head._1),
        aggs.tail.map { case (n, _) => sum(col(s"__p_$n")).as(n) }: _*)
  }

  /** Skew-resistant equi-join: `big`'s rows of a hot key are spread over
    * `salts` sub-keys by row position (same scheme as saltedAgg — a
    * content hash would pile exact-duplicate rows of a hot key into one
    * salt bucket, exactly the mass-duplicate case salting exists for,
    * and errors on unhashable types like MapType; ADVICE r2), and the
    * dimension side is replicated once per salt — the join shuffles on
    * (key, salt), bounding any single reducer's share of a hot key to
    * 1/salts. The salt never reaches the output, so the result is the
    * plain equi-join's rows (which is what the oracle checks) regardless
    * of how rows were spread; the manual counterpart to AQE's runtime
    * skew-join splitting, for when skew is known ahead of time or AQE is
    * unavailable (e.g. inside a cached subplan). */
  def saltedJoin(big: DataFrame, dim: DataFrame, key: String,
      salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val expandedDim = dim.withColumn("__salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    saltedBig.join(expandedDim, Seq(key, "__salt")).drop("__salt")
  }
}
