package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Changepoint

/** Integer CUSUM changepoint: exact argmax on hand-built series, the
  * no-change flat series, tie-to-earliest, and corpus invariants. */
class ChangepointSpec extends SparkSpec {

  private def ev(rows: Seq[(String, String)]) = {
    import spark.implicits._
    rows.map { case (t, d) => (t, Timestamp.valueOf(d + " 12:00:00")) }
      .toDF("event_type", "ts")
  }

  private def run(rows: Seq[(String, String)]): Map[String, (Long, Long)] =
    Changepoint.cusum(ev(rows)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("a clean level shift is found at the last day of the old level") {
    // days 0-2 one event/day, days 3-5 three/day: N=6 total=12
    // N*prefix - k*total: k=1: 6-12=-6; k=2: 12-24=-12; k=3: 18-36=-18;
    // k=4: 36-48=-12; k=5: 54-60=-6; k=6: 72-72=0 -> max |.| at day 2
    val rows =
      Seq("2024-01-01", "2024-01-02", "2024-01-03").map(("a", _)) ++
        Seq("2024-01-04", "2024-01-05", "2024-01-06")
          .flatMap(d => Seq(("a", d), ("a", d), ("a", d)))
    val m = run(rows)
    assert(m("a") === ((2L, 18L)))
  }

  test("a flat series scores 0 with the earliest day as tiebreak") {
    val rows = Seq("2024-01-01", "2024-01-02", "2024-01-03").map(("b", _))
    assert(run(rows)("b") === ((0L, 0L)))
  }

  test("types are independent") {
    val rows = Seq(("a", "2024-01-01"), ("a", "2024-01-02"),
      ("b", "2024-01-01"), ("b", "2024-01-02"), ("b", "2024-01-02"),
      ("b", "2024-01-02"))
    val m = run(rows)
    assert(m("a")._2 === 0L)
    // b: N=2 total=4; k=1: |2*1-1*4|=2 -> day 0
    assert(m("b") === ((0L, 2L)))
  }

  test("DOW profile: exact deviation arithmetic and epoch anchoring") {
    import spark.implicits._
    // 2024-01-01 is day 0 (dow 0); 2024-01-02 dow 1; 2024-01-08 dow 0
    val rows = Seq(("a", "2024-01-01"), ("a", "2024-01-08"),
      ("a", "2024-01-02"))
      .map { case (t, d) => (t, java.sql.Timestamp.valueOf(d + " 09:00:00")) }
      .toDF("event_type", "ts")
    val m = Changepoint.dowProfile(rows).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    // dow0: cnt 2, dev |14-3|=11; dow1: cnt 1, dev |7-3|=4
    assert(m === Map(0L -> ((2L, 11L)), 1L -> ((1L, 4L))))
  }

  test("DOW profile: corpus has <= 7 rows per type, counts sum to type totals") {
    val e = Tables.events(spark, sf())
    val out = Changepoint.dowProfile(e.select(col("event_type"), col("ts")))
    val perType = out.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("cnt").as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val totals = e.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perType.foreach { case (t, (n, s)) =>
      assert(n <= 7L)
      assert(s === totals(t))
    }
  }

  test("corpus: one row per event type, day within the observed range") {
    val e = Tables.events(spark, sf())
    val out = Changepoint.cusum(e.select(col("event_type"), col("ts")))
    val types = e.select("event_type").distinct().count()
    assert(out.count() === types)
    val range = e.select(
      min(datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))).as("lo"),
      max(datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))).as("hi")).head
    val bad = out.filter(col("cp_day") < range.getInt(0).toLong ||
      col("cp_day") > range.getInt(1).toLong)
    assert(bad.count() === 0)
  }
}
