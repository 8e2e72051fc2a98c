package graft

import org.apache.spark.sql.functions._

import graft.operators.Rendezvous

/** HRW sharding: minimal movement on shard-set growth, balance, and
  * layout-independence. */
class RendezvousSpec extends SparkSpec {

  private lazy val out =
    Rendezvous.assign(Tables.documents(spark, sf())).cache()

  test("every moved doc lands on the NEW shard — the minimal-movement law") {
    val bad = out.filter(col("moved") === 1L &&
      col("shard9") =!= lit(Rendezvous.NGrown - 1))
    assert(bad.count() === 0)
    val alsoBad = out.filter(col("moved") === 0L &&
      col("shard8") =!= col("shard9"))
    assert(alsoBad.count() === 0)
  }

  test("moved fraction is near 1/9") {
    val n = out.count().toDouble
    val moved = out.filter(col("moved") === 1L).count().toDouble
    assert(math.abs(moved / n - 1.0 / 9.0) < 0.05, s"moved ${moved / n}")
  }

  test("shards are balanced within 2x of uniform") {
    val n = out.count().toDouble
    val counts = out.groupBy("shard8").count()
      .collect().map(_.getLong(1).toDouble)
    assert(counts.length === Rendezvous.NBase)
    assert(counts.forall(c => c > n / 16 && c < n / 4), counts.mkString(","))
  }

  test("assignment is a pure function of the key: layout-independent") {
    val a = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Rendezvous.assign(
      Tables.documents(spark, sf()).repartition(11))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("plan is a narrow map: no joins, no aggregation exchanges") {
    val p = Rendezvous.assign(Tables.documents(spark, sf()))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p)
    assert(!sansFanout(p).contains("Exchange"), p)
  }
}
