package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.registry.Q

/** Event-sequence analytics over the events table: ordered-stage funnel
  * and first-seen cohort retention — the two classic product-analytics
  * operators (ClickHouse windowFunnel / retention shape), expressed as
  * keyed aggregations and co-partitioned joins so every shuffle is on
  * user_id and no per-user event window is ever sorted globally.
  *
  * Both outputs are BIGINT-only (stage numbers, day numbers, counts) —
  * no timestamp or DATE column leaves the query, per the established
  * engine-parity discipline (timestamps only feed internal MIN/compare
  * steps, where micros agree bit-for-bit).
  */
object EventsAnalytics {

  private def ev(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts"))

  /** Ordered funnel view -> click -> purchase with STRICTLY-AFTER
    * semantics: stage n+1 counts only if its earliest qualifying event
    * is strictly after the user's stage-n completion time (a click
    * logged before the first view is not a funnel click). stage =
    * furthest reached, 0 for users with no view at all.
    *
    * Scale shape: three filtered min-aggregations chained by inner
    * joins plus three left joins — every one keyed on user_id, so the
    * whole funnel is one co-partitioned lineage with map-side-combined
    * mins and no window/sort. */
  val funnelQ: Q = Q(
    "x_funnel",
    Some("""WITH u AS (SELECT DISTINCT user_id FROM events),
           |s1 AS (SELECT user_id, min(ts) AS t1 FROM events
           |  WHERE event_type = 'view' GROUP BY user_id),
           |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
           |  JOIN s1 ON e.user_id = s1.user_id
           |  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
           |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
           |  JOIN s2 ON e.user_id = s2.user_id
           |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
           |SELECT u.user_id,
           |  CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
           |            WHEN s2.user_id IS NOT NULL THEN 2
           |            WHEN s1.user_id IS NOT NULL THEN 1
           |            ELSE 0 END AS BIGINT) AS stage
           |FROM u LEFT JOIN s1 ON u.user_id = s1.user_id
           |  LEFT JOIN s2 ON u.user_id = s2.user_id
           |  LEFT JOIN s3 ON u.user_id = s3.user_id
           |ORDER BY u.user_id""".stripMargin),
    (s, d) => funnelOf(ev(s, d)))

  /** x_funnel over any (user_id, event_type, ts) frame. */
  def funnelOf(e: DataFrame): DataFrame = {
    val users = e.select(col("user_id")).distinct()
    val s1 = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = e.filter(col("event_type") === "click")
      .join(s1, "user_id").filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = e.filter(col("event_type") === "purchase")
      .join(s2, "user_id").filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    users
      .join(s1.select(col("user_id"), col("t1")), Seq("user_id"), "left")
      .join(s2.select(col("user_id"), col("t2")), Seq("user_id"), "left")
      .join(s3.select(col("user_id"), col("t3")), Seq("user_id"), "left")
      .select(col("user_id"),
        when(col("t3").isNotNull, 3L)
          .when(col("t2").isNotNull, 2L)
          .when(col("t1").isNotNull, 1L)
          .otherwise(0L).as("stage"))
      .orderBy(col("user_id"))
  }

  /** First-seen cohort retention: cohort = a user's first active day
    * (day number from the corpus epoch 2024-01-01 — BIGINT, never a
    * DATE output), k = days since cohort, users = how many of that
    * cohort were active on day cohort+k, horizon k <= 13. The
    * (user, day) activity set is deduped FIRST, so the final count is
    * a plain count, not a countDistinct.
    *
    * Scale shape: one distinct on (user, day), a per-user min, a
    * co-partitioned join back, one small aggregation — cohort output
    * is days x horizon, tiny at any corpus size. */
  val cohortQ: Q = Q(
    "x_cohort_retention",
    Some("""WITH act AS (
           |  SELECT DISTINCT user_id,
           |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day
           |  FROM events),
           |coh AS (SELECT user_id, min(day) AS cohort FROM act GROUP BY user_id)
           |SELECT coh.cohort, act.day - coh.cohort AS k,
           |  CAST(count(*) AS BIGINT) AS users
           |FROM act JOIN coh ON act.user_id = coh.user_id
           |WHERE act.day - coh.cohort <= 13
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    (s, d) => cohortOf(ev(s, d)))

  /** x_cohort_retention over any (user_id, ts) frame. */
  def cohortOf(e: DataFrame): DataFrame = {
    val act = e.select(col("user_id"),
      datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
        .cast(LongType).as("day")).distinct()
    val coh = act.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
    act.join(coh, "user_id")
      .withColumn("k", col("day") - col("cohort"))
      .filter(col("k") <= 13)
      .groupBy(col("cohort"), col("k"))
      .agg(count(lit(1)).as("users"))
      .orderBy(col("cohort"), col("k"))
  }

  /** Last-touch attribution: each purchase is credited to the MOST
    * RECENT click by the same user within a 7-day lookback; purchases
    * with no qualifying click report touch_id = -1 (never NULL). The
    * marketing-analytics staple, and the second production use of the
    * as-of machinery: AsOfJoin.asofLeftTol — left semantics + lookback
    * tolerance — in the same one-shuffle one-sort plan as x_asof_join.
    *
    * Click ids are pre-deduped to max(event_id) per (user, ts) so the
    * build side is unique per key+time (the as-of determinism
    * contract). The oracle takes the classic correlated form: latest
    * qualifying click ts per purchase, joined back for its id — equal
    * by definition to the window-carried latest. */
  val attributionQ: Q = Q(
    "x_attribution",
    Some("""WITH clicks AS (
           |  SELECT user_id, ts, max(event_id) AS cid FROM events
           |  WHERE event_type = 'click' GROUP BY 1, 2),
           |pur AS (SELECT event_id, user_id, ts FROM events
           |  WHERE event_type = 'purchase'),
           |lastc AS (SELECT p.event_id, max(c.ts) AS cts
           |  FROM pur p JOIN clicks c ON c.user_id = p.user_id
           |    AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 7 DAY
           |  GROUP BY p.event_id)
           |SELECT p.event_id, CAST(coalesce(c.cid, -1) AS BIGINT) AS touch_id
           |FROM pur p
           |  LEFT JOIN lastc l ON p.event_id = l.event_id
           |  LEFT JOIN clicks c ON c.user_id = p.user_id AND c.ts = l.cts
           |ORDER BY p.event_id""".stripMargin),
    (s, d) => attributionOf(
      Tables.events(s, d).select(col("event_id"), col("user_id"),
        col("event_type"), col("ts"))))

  /** x_attribution over any (event_id, user_id, event_type, ts) frame. */
  def attributionOf(e: DataFrame): DataFrame = {
    val probe = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val build = e.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("cid"))
    graft.operators.AsOfJoin.asofLeftTol(probe, build, "user_id", "ts",
      Seq("cid"), expr("INTERVAL 7 DAYS"))
      .select(col("event_id"),
        coalesce(col("cid"), lit(-1L)).as("touch_id"))
      .orderBy(col("event_id"))
  }

  /** Batch sessionization — the clickstream primitive (the streaming
    * twin is st_sessionize/st_session_window): a user's events split
    * into sessions at inactivity gaps > 2 h, via the classic
    * lag-flag-cumsum: break = (gap > threshold), session = running sum
    * of breaks. Output one row per session (seq, size, exact integer
    * duration in seconds).
    *
    * Scale shape: every window is PARTITIONED BY user_id ordered by
    * (ts, event_id) — one user-key shuffle feeds both windows AND the
    * final session aggregation (same partitioning, no re-exchange); no
    * global sort anywhere. The (ts, event_id) tie-break makes the lag
    * deterministic under equal timestamps on both engines. */
  val sessionizeQ: Q = Q(
    "x_sessionize_batch",
    Some("""WITH l AS (
           |  SELECT user_id, event_id, ts,
           |    CASE WHEN lag(ts) OVER w IS NULL
           |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > CAST(7200 AS BIGINT) * 1000000
           |      THEN 1 ELSE 0 END AS brk
           |  FROM events
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
           |s AS (
           |  SELECT user_id, ts,
           |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |      ROWS UNBOUNDED PRECEDING) AS sess
           |  FROM l)
           |SELECT user_id, CAST(sess AS BIGINT) AS session_seq,
           |  CAST(count(*) AS BIGINT) AS n_events,
           |  CAST((epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS BIGINT) AS duration_sec
           |FROM s GROUP BY user_id, sess
           |ORDER BY user_id, session_seq""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val lagTs = lag(col("ts"), 1).over(w)
      val brk = when(lagTs.isNull ||
        unix_micros(col("ts")) - unix_micros(lagTs) > 7200L * 1000000L,
        1L).otherwise(0L)
      Tables.events(s, d).select(col("user_id"), col("event_id"), col("ts"))
        .withColumn("brk", brk)
        .withColumn("sess", sum(col("brk")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sess").as("session_seq"))
        .agg(count(lit(1)).as("n_events"),
          ((unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
            / 1000000L).cast(LongType).as("duration_sec"))
        .select(col("user_id"), col("session_seq"), col("n_events"),
          col("duration_sec"))
        .orderBy(col("user_id"), col("session_seq"))
    })

  val all: Seq[Q] = Seq(funnelQ, cohortQ, attributionQ, sessionizeQ)
}
