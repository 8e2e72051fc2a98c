package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.queries.EventsAnalytics

/** Funnel / cohort-retention / gini contracts on hand-built inputs plus
  * real-corpus invariants. */
class EventsAnalyticsSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("funnel: strictly-after ordering; out-of-order clicks don't count") {
    import spark.implicits._
    val e = Seq(
      // user 1: full ordered funnel -> stage 3
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 11:00:00")),
      (1L, "purchase", ts("2024-01-01 12:00:00")),
      // user 2: click BEFORE first view -> stage 1 only
      (2L, "click", ts("2024-01-01 09:00:00")),
      (2L, "view", ts("2024-01-01 10:00:00")),
      // user 3: purchase before click -> stage 2 (click after view, but
      // no purchase after the click)
      (3L, "view", ts("2024-01-01 08:00:00")),
      (3L, "purchase", ts("2024-01-01 08:30:00")),
      (3L, "click", ts("2024-01-01 09:00:00")),
      // user 4: never viewed -> stage 0
      (4L, "purchase", ts("2024-01-01 13:00:00")),
      // user 5: same-timestamp click (NOT strictly after) -> stage 1
      (5L, "view", ts("2024-01-01 10:00:00")),
      (5L, "click", ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val stages = EventsAnalytics.funnelOf(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stages === Map(1L -> 3L, 2L -> 1L, 3L -> 2L, 4L -> 0L, 5L -> 1L))
  }

  test("funnel: real corpus — stages monotone, every user present") {
    val f = EventsAnalytics.funnelQ.run(spark, sf())
    val n = Tables.events(spark, sf()).select("user_id").distinct().count()
    assert(f.count() === n)
    val byStage = f.groupBy(col("stage")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // funnel counts can only shrink at deeper stages
    val reached = (0L to 3L).map(k =>
      byStage.filter(_._1 >= k).values.sum)
    assert(reached.sliding(2).forall { case Seq(a, b) => a >= b })
  }

  test("cohort: every user's k=0 cell exists and rows cover all users once at k=0") {
    import spark.implicits._
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00")), // cohort day 0
      (1L, ts("2024-01-02 10:00:00")), // day 1 -> k=1
      (1L, ts("2024-01-02 12:00:00")), // same day, dedupes
      (2L, ts("2024-01-02 10:00:00")), // cohort day 1
      (2L, ts("2024-01-20 10:00:00"))  // k=18 -> beyond horizon, dropped
    ).toDF("user_id", "ts").withColumn("event_type", lit("view"))
    val r = EventsAnalytics.cohortOf(e).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(r === Map((0L, 0L) -> 1L, (0L, 1L) -> 1L, (1L, 0L) -> 1L))
    // real corpus: sum of k=0 cells = number of users; no negative k
    val real = EventsAnalytics.cohortQ.run(spark, sf())
    val users = Tables.events(spark, sf()).select("user_id").distinct().count()
    val k0 = real.filter(col("k") === 0L).agg(sum(col("users"))).head.getLong(0)
    assert(k0 === users)
    assert(real.filter(col("k") < 0L).count() === 0L)
  }

  test("gini: exact values on hand-built docs; bounds on the corpus") {
    import spark.implicits._
    // doc 0: one token repeated 4x -> ss=16, n=4 -> gini = 1e6 - 1e6 = 0
    // doc 1: 4 distinct -> ss=4, n=4 -> 1e6 - (4e6 div 16) = 750000
    // doc 2: "x x y" -> ss=5, n=9... n=3 -> 1e6 - (5e6 div 9) = 444445
    val docs = Seq(
      (0L, "a a a a"), (1L, "a b c d"), (2L, "x x y")).toDF("doc_id", "text")
    val g = graft.pipeline.PipelineQueries.giniOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(g(0L) === ((4L, 1L, 0L)))
    assert(g(1L) === ((4L, 4L, 750000L)))
    assert(g(2L) === ((3L, 2L, 444445L)))
    val real = graft.pipeline.PipelineQueries.gini.run(spark, sf())
    assert(real.count() === Tables.documents(spark, sf()).count())
    assert(real.filter(col("gini_ppm") < 0 || col("gini_ppm") >= 1000000).count() === 0L)
  }

  test("attribution: last touch wins, stale touches age out, unmatched is -1") {
    import spark.implicits._
    val e = Seq(
      // user 1: two clicks before the purchase -> the later one (id 12)
      (11L, 1L, "click", ts("2024-01-01 10:00:00")),
      (12L, 1L, "click", ts("2024-01-02 10:00:00")),
      (13L, 1L, "purchase", ts("2024-01-03 10:00:00")),
      // user 2: click 8 days before purchase -> outside lookback, -1
      (21L, 2L, "click", ts("2024-01-01 10:00:00")),
      (22L, 2L, "purchase", ts("2024-01-09 10:00:01")),
      // user 3: click AFTER the purchase -> -1
      (31L, 3L, "purchase", ts("2024-01-01 10:00:00")),
      (32L, 3L, "click", ts("2024-01-01 11:00:00")),
      // user 4: no clicks at all -> -1
      (41L, 4L, "purchase", ts("2024-01-05 10:00:00")),
      // user 5: click exactly at the 7-day boundary -> still credited
      (51L, 5L, "click", ts("2024-01-01 10:00:00")),
      (52L, 5L, "purchase", ts("2024-01-08 10:00:00")),
      // user 6: same-ts click and purchase -> credited (<= semantics)
      (61L, 6L, "click", ts("2024-01-01 10:00:00")),
      (62L, 6L, "purchase", ts("2024-01-01 10:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val m = EventsAnalytics.attributionOf(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m === Map(13L -> 12L, 22L -> -1L, 31L -> -1L, 41L -> -1L,
      52L -> 51L, 62L -> 61L))
  }

  test("attribution: real corpus — one row per purchase, every touch a real click id") {
    val ev = Tables.events(spark, sf())
    val out = EventsAnalytics.attributionQ.run(spark, sf())
    assert(out.count() ===
      ev.filter(col("event_type") === "purchase").count())
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("touch_id"))
    val badTouch = out.filter(col("touch_id") =!= -1L)
      .join(clicks, Seq("touch_id"), "left_anti")
    assert(badTouch.count() === 0)
  }
}
