package graft.queries

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables
import graft.registry.Q

/** Typed Dataset API coverage (SURVEY.md §1.4: Dataset[T] with case-class
  * Encoders where type safety helps): a custom typed Aggregator over a
  * case-class Dataset. Money flows as integer cents through the buffer so
  * the merge order cannot perturb the result — the determinism rule
  * applied at the typed layer.
  */
object Typed {

  final case class Line(l_returnflag: String, l_extendedprice: Double,
      l_quantity: Double)
  final case class Stats(cents: Long, qty10: Long, n: Long)

  /** sum(price), sum(quantity), count — exact integer arithmetic. */
  object LineStatsAgg extends Aggregator[Line, Stats, Stats] {
    override def zero: Stats = Stats(0L, 0L, 0L)
    override def reduce(b: Stats, a: Line): Stats = Stats(
      b.cents + math.round(a.l_extendedprice * 100),
      b.qty10 + math.round(a.l_quantity * 10),
      b.n + 1)
    override def merge(x: Stats, y: Stats): Stats =
      Stats(x.cents + y.cents, x.qty10 + y.qty10, x.n + y.n)
    override def finish(r: Stats): Stats = r
    override def bufferEncoder: Encoder[Stats] = Encoders.product[Stats]
    override def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
  }

  val typedAgg: Q = Q(
    "t_typed_aggregator",
    Some("""SELECT l_returnflag,
           |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents,
           |  CAST(sum(CAST(round(l_quantity * 10) AS BIGINT)) AS BIGINT) AS qty10,
           |  count(*) AS n
           |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin),
    (s: SparkSession, d: String) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
        .as[Line]
        .groupByKey(_.l_returnflag)
        .agg(LineStatsAgg.toColumn.name("stats"))
        .select(col("key").as("l_returnflag"),
          col("stats.cents").as("cents"),
          col("stats.qty10").as("qty10"),
          col("stats.n").as("n"))
        .orderBy(col("l_returnflag"))
    })

  val all: Seq[Q] = Seq(typedAgg)
}
