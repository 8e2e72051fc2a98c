package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{Streams, StreamingQueries}

/** Streaming == batch equivalence: the same event-time operators must
  * produce identical results run incrementally (Structured Streaming)
  * and as batch SQL (the DuckDB-verified registry entries). */
class StreamingSpec extends SparkSpec {

  test("tumbling window: streaming (complete mode) == batch") {
    val stream = Streams.tumblingCounts(Streams.readEventsStream(spark, sf()))
    val q = stream.writeStream
      .format("memory").queryName("tumbling_out")
      .outputMode("complete")
      .start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("tumbling_out")
      .select("hstart", "event_type", "n", "v")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val want = StreamingQueries.tumbling.run(spark, sf())
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("sliding window: streaming (complete mode) == batch") {
    val stream = Streams.slidingCounts(Streams.readEventsStream(spark, sf()))
    val q = stream.writeStream
      .format("memory").queryName("sliding_out")
      .outputMode("complete")
      .start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("sliding_out").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val want = StreamingQueries.sliding.run(spark, sf()).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("session_window: streaming (complete mode) == batch") {
    val stream = Streams.sessionWindowAgg(Streams.readEventsStream(spark, sf()))
    val q = stream.writeStream
      .format("memory").queryName("sesswin_out")
      .outputMode("complete")
      .start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("sesswin_out").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    val want = StreamingQueries.sessionWindow.run(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("custom TopKByAgg under the streaming runtime == batch") {
    val stream = Streams.topEventsPerHour(Streams.readEventsStream(spark, sf()))
    val q = stream.writeStream
      .format("memory").queryName("topk_out")
      .outputMode("complete")
      .start()
    try q.processAllAvailable() finally q.stop()

    def rows(df: org.apache.spark.sql.DataFrame): Set[(java.sql.Timestamp, Long, Long, Long)] =
      df.select("hstart", "event_id", "cents", "rnk")
        .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
    val got = rows(spark.table("topk_out"))
    val want = rows(Streams.topEventsPerHour(Tables.events(spark, sf())))
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("foreachBatch upsert sink: folded stream state == direct CDC state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, Long, String, Double)]
    val sink = new Streams.UpsertSink(Seq("user_id"), "event_id",
      col("event_type") === "error")
    val q = input.toDS().toDF("user_id", "event_id", "event_type", "value")
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) => sink(b, id))
      .start()
    try {
      input.addData((1L, 1L, "view", 1.0), (2L, 2L, "click", 2.0),
        (3L, 3L, "view", 3.0))
      q.processAllAvailable()
      // update key 1, tombstone key 2
      input.addData((1L, 4L, "purchase", 4.0), (2L, 5L, "error", 0.0))
      q.processAllAvailable()
      // resurrect key 2, tombstone absent key 4 (no-op), tombstone key 3,
      // and key 5 inserted+tombstoned WITHIN one batch (latest wins)
      input.addData((2L, 6L, "signup", 6.0), (4L, 7L, "error", 0.0),
        (3L, 8L, "error", 0.0), (5L, 9L, "view", 9.0), (5L, 10L, "error", 0.0))
      q.processAllAvailable()
    } finally q.stop()

    val got = sink.current.get.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .toSet
    assert(got === Set((1L, 4L, "purchase", 4.0), (2L, 6L, "signup", 6.0)))
  }

  test("watermark drops late data in append-mode window aggregation") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def ts(s: String) = Timestamp.valueOf(s)
    val input = MemoryStream[(Timestamp, String)]
    val agg = input.toDF().toDF("ts", "event_type")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .count()
      .select(col("w.start").as("h"), col("event_type"), col("count"))
    val q = agg.writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()
    try {
      // two on-time events in hour 10
      input.addData(Seq((ts("2024-01-01 10:05:00"), "a"), (ts("2024-01-01 10:50:00"), "a")))
      q.processAllAvailable()
      // advance watermark far past hour 10 (event at 13:00 → wm 12:50)
      input.addData(Seq((ts("2024-01-01 13:00:00"), "a")))
      q.processAllAvailable()
      // LATE arrival for hour 10 — behind the watermark, must be dropped
      input.addData(Seq((ts("2024-01-01 10:30:00"), "a")))
      q.processAllAvailable()
      // close the 13:00 window too
      input.addData(Seq((ts("2024-01-01 16:00:00"), "a")))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("late_out").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(2))).toMap
    // hour-10 window emitted with 2 events — the late third never counted
    assert(rows("2024-01-01 10:00:00.0") === 2L)
    assert(rows("2024-01-01 13:00:00.0") === 1L)
  }

  test("stream-static enrichment join == registered st_enrich twin, row for row") {
    val joined = Streams.enrichEvents(
      Streams.readEventsStream(spark, sf()), Tables.customer(spark, sf()))
    val q = joined.writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("enrich_out").collect().map(_.toSeq).toSet
    val want = graft.registry.Registry.byName("st_enrich")
      .run(spark, sf()).collect().map(_.toSeq).toSet
    assert(got.nonEmpty)
    assert(got === want)
  }

  test("stream-static join == batch join") {
    val static = Tables.events(spark, sf())
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
    val joined = Streams.readEventsStream(spark, sf())
      .select(col("event_id"), col("user_id"))
      .join(static, "user_id")
    val q = joined.writeStream.format("memory").queryName("ssx_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("ssx_out").count()
    val want = Tables.events(spark, sf()).count() // every event's user exists
    assert(got === want)
  }

  test("checkpointed file sink: restart reprocesses nothing (exactly-once)") {
    val ckpt = java.nio.file.Files.createTempDirectory("ss_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("ss_out").toString

    def run(): Unit = {
      val q = Streams.readEventsStream(spark, sf())
        .select(col("event_id"), col("user_id"), col("ts"))
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    run()
    val n1 = spark.read.parquet(out).count()
    assert(n1 === Tables.events(spark, sf()).count())
    // second run from the SAME checkpoint: offsets committed, no new rows
    run()
    assert(spark.read.parquet(out).count() === n1)
  }

  test("stream-stream interval join == registered batch twin, pair for pair") {
    val joined = Streams.intervalJoinPairs(Streams.readEventsStream(spark, sf()))
    val q = joined.writeStream.format("memory").queryName("ssjoin_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("sid", "bid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = pairs(spark.table("ssjoin_out"))
    val want = pairs(
      graft.registry.Registry.byName("st_stream_stream_join").run(spark, sf()))
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("left-outer interval join: unmatched signup emits -1 only at watermark expiry") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)

    val input = MemoryStream[(Long, Long, String, Timestamp)]
    val joined = Streams.intervalJoinLeftPairs(
      input.toDF().toDF("event_id", "user_id", "event_type", "ts"))
    val q = joined.writeStream.format("memory").queryName("ssjoin_outer_out")
      .outputMode("append").start()
    def emitted: Set[(Long, Long)] =
      spark.table("ssjoin_outer_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    try {
      // signup 1 (user 1) matched at 10:30; signup 3 (user 2) never matched
      input.addData(Seq(
        (1L, 1L, "signup", ts("2024-01-01 10:00:00")),
        (2L, 1L, "view", ts("2024-01-01 10:30:00")),
        (3L, 2L, "signup", ts("2024-01-01 10:00:00"))))
      q.processAllAvailable()
      // watermark has NOT passed 11:00 yet: no (3, -1) emitted
      assert(!emitted.contains((3L, -1L)))
      // advance BOTH sides' watermarks to 14:00 (the join watermark is
      // their min, so the a-side needs a late signup too) — signup 3's
      // [10:00, 11:00] window is then provably unmatched
      input.addData(Seq(
        (9L, 99L, "view", ts("2024-01-01 16:00:00")),
        (10L, 98L, "signup", ts("2024-01-01 16:00:00"))))
      q.processAllAvailable()
    } finally q.stop()
    val got = emitted
    assert(got.contains((1L, 2L)), s"matched pair missing: $got")
    assert(got.contains((3L, -1L)), s"expiry null-row missing: $got")
    // the late signup's own window is still open — its outer row is held
    assert(!got.contains((10L, -1L)), s"premature outer row: $got")
  }

  test("streaming dedup: dropDuplicatesWithinWatermark expires state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)

    val input = MemoryStream[(Long, Timestamp)]
    val q = input.toDF().toDF("id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
      .writeStream.format("memory").queryName("dedup_stream_out")
      .outputMode("append").start()
    try {
      // duplicate id 1 within the watermark window → emitted once
      input.addData(Seq((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:01:00")),
        (2L, ts("2024-01-01 10:00:30"))))
      q.processAllAvailable()
      // advance the watermark far past 10:0x → id 1's dedup state expires
      input.addData(Seq((9L, ts("2024-01-01 13:00:00"))))
      q.processAllAvailable()
      // same id, new epoch → emitted AGAIN (within-watermark, not global, dedup)
      input.addData(Seq((1L, ts("2024-01-01 13:01:00"))))
      q.processAllAvailable()
      input.addData(Seq((8L, ts("2024-01-01 16:00:00"))))
      q.processAllAvailable()
    } finally q.stop()

    val byId = spark.table("dedup_stream_out").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(byId(1L) === 2) // once per watermark epoch
    assert(byId(2L) === 1)
  }

  test("dedupEvents: streaming dedup key set == registered st_dedup twin") {
    val q = Streams.dedupEvents(Streams.readEventsStream(spark, sf()))
      .select(col("user_id"), col("event_type"), col("m"))
      .writeStream.format("memory").queryName("dedup_twin_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    def keys(df: org.apache.spark.sql.DataFrame): Set[(Long, String, java.sql.Timestamp)] =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2))).toSet
    val got = keys(spark.table("dedup_twin_out"))
    val want = keys(graft.registry.Registry.byName("st_dedup").run(spark, sf())
      .select(col("user_id"), col("event_type"), col("m")))
    assert(got === want)
    // exactly one survivor per key — the whole point of the operator
    assert(spark.table("dedup_twin_out").count() === want.size)
    assert(got.nonEmpty)
  }

  test("dedupEvents: duplicates suppressed across micro-batches within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)

    val input = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val events = input.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = Streams.dedupEvents(events)
      .writeStream.format("memory").queryName("dedup_xbatch_out")
      .outputMode("append").start()
    try {
      input.addData((1L, ts("2024-01-01 10:00:05"), 7L, "view", 1.0, ""))
      q.processAllAvailable()
      // same key re-delivered in a LATER micro-batch, inside the horizon
      input.addData((2L, ts("2024-01-01 10:00:40"), 7L, "view", 1.0, ""),
        (3L, ts("2024-01-01 10:02:00"), 7L, "view", 3.0, ""))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("dedup_xbatch_out").collect()
      .map(r => r.getAs[Long]("event_id")).toSet
    // id 2 is a cross-batch duplicate of id 1's (user, type, minute) key;
    // id 3 is the same user+type in a different minute → distinct key
    assert(got === Set(1L, 3L))
  }

  test("sessionize: flatMapGroupsWithState == batch window sessionization") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val events = Tables.events(spark, sf())
      .select(col("user_id"), col("ts")).as[Streams.Ev].collect().toSeq
    val maxUs = events.map(e => Streams.tsToUs(e.ts)).max

    val input = MemoryStream[Streams.Ev]
    val q = Streams.sessionize(input.toDS()).writeStream
      .format("memory").queryName("sessions_out")
      .outputMode("append")
      .start()
    try {
      input.addData(events)
      q.processAllAvailable()
      // advance the watermark far past every open session's timeout so
      // flush happens (sentinel user filtered out below)
      input.addData(Seq(Streams.Ev(-1L,
        new Timestamp((maxUs / 1000L) + 48L * 3600 * 1000))))
      q.processAllAvailable()
      input.addData(Seq(Streams.Ev(-1L,
        new Timestamp((maxUs / 1000L) + 96L * 3600 * 1000))))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sessions_out")
      .filter(col("user_id") >= 0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val want = StreamingQueries.sessionize.run(spark, sf())
      .collect()
      .map(r => (r.getLong(0),
        Streams.tsToUs(r.getTimestamp(2)),
        Streams.tsToUs(r.getTimestamp(3)),
        r.getLong(4))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("transformWithState sessionization == batch oracle (RocksDB provider)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val events = Tables.events(spark, sf())
        .select(col("user_id"), col("ts")).as[Streams.Ev].collect().toSeq
      val maxUs = events.map(e => Streams.tsToUs(e.ts)).max

      val input = MemoryStream[Streams.Ev]
      val q = Streams.sessionizeTws(input.toDS()).writeStream
        .format("memory").queryName("sessions_tws_out")
        .outputMode("append")
        .start()
      try {
        input.addData(events)
        q.processAllAvailable()
        // push the watermark past every open session's timer (sentinel
        // user filtered out below), twice so the flush batch commits
        input.addData(Seq(Streams.Ev(-1L,
          new Timestamp((maxUs / 1000L) + 48L * 3600 * 1000))))
        q.processAllAvailable()
        input.addData(Seq(Streams.Ev(-1L,
          new Timestamp((maxUs / 1000L) + 96L * 3600 * 1000))))
        q.processAllAvailable()
      } finally q.stop()

      val got = spark.table("sessions_tws_out")
        .filter(col("user_id") >= 0)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val want = StreamingQueries.sessionize.run(spark, sf())
        .collect()
        .map(r => (r.getLong(0),
          Streams.tsToUs(r.getTimestamp(2)),
          Streams.tsToUs(r.getTimestamp(3)),
          r.getLong(4))).toSet
      assert(got === want)
      assert(got.nonEmpty)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("crawl ingest: streaming seen-set dedup + extract == registered batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.GraftFunctions.gzip_text

    val docs = Tables.documents(spark, sf())
    val pages = graft.pipeline.CrawlE2e.withCrawlUrls(docs)
      .join(graft.pipeline.Html.withHtml(docs), "doc_id")
      .select(col("doc_id"), col("url"), gzip_text(col("html")).as("payload"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2)))
      .sortBy(_._1)
    // arrival in doc_id order, split so every pair's min lands in micro-
    // batch 1 and its twin in micro-batch 2: batch 2 must be suppressed
    // ENTIRELY by state carried across micro-batches (the seen set)
    val pairMin = pages.groupBy(_._1 / 2).map(_._2.map(_._1).min).toSet
    val (first, second) = pages.partition(p => pairMin(p._1))

    val input = MemoryStream[(Long, String, Array[Byte])]
    val q = Streams.crawlIngest(input.toDF().toDF("doc_id", "url", "payload"))
      .writeStream.format("memory").queryName("crawl_ingest_out")
      .outputMode("append").start()
    try {
      input.addData(first.toSeq)
      q.processAllAvailable()
      input.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()

    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long)] =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val got = rows(spark.table("crawl_ingest_out"))
    val want = rows(StreamingQueries.crawlIngest.run(spark, sf()))
    assert(got === want)
    assert(got.nonEmpty)
    // nothing from micro-batch 2 leaked through the seen set
    assert(got.map(_._1) === pairMin)
  }

  test("warc ingest: streaming shard demux + uri seen-set == registered batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = Tables.documents(spark, sf())
    val shards = graft.pipeline.Warc.withWarcGzPaired(docs)
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
      .sortBy(_._1)
    // every pair's min arrives in micro-batch 1; its re-fetch twin in
    // micro-batch 2 must be suppressed ENTIRELY by state
    val pairMin = shards.groupBy(_._1 / 2).map(_._2.map(_._1).min).toSet
    val (first, second) = shards.partition(s => pairMin(s._1))

    val input = MemoryStream[(Long, Array[Byte])]
    val q = Streams.warcIngest(input.toDF().toDF("doc_id", "warcgz"))
      .writeStream.format("memory").queryName("warc_ingest_out")
      .outputMode("append").start()
    try {
      input.addData(first.toSeq)
      q.processAllAvailable()
      input.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()

    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long)] =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val got = rows(spark.table("warc_ingest_out"))
    val want = rows(StreamingQueries.warcIngest.run(spark, sf()))
    assert(got === want)
    assert(got.nonEmpty)
    assert(got.map(_._1) === pairMin,
      "micro-batch 2's re-fetches must all drop at the seen set")
  }

  test("warc.zst ingest: streaming zstd demux + uri seen-set == registered batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = Tables.documents(spark, sf())
    val shards = graft.pipeline.Warc.withWarcZstPaired(docs)
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
      .sortBy(_._1)
    val pairMin = shards.groupBy(_._1 / 2).map(_._2.map(_._1).min).toSet
    val (first, second) = shards.partition(s => pairMin(s._1))

    val input = MemoryStream[(Long, Array[Byte])]
    val q = Streams.warcZstIngest(input.toDF().toDF("doc_id", "warczst"))
      .writeStream.format("memory").queryName("warc_zst_ingest_out")
      .outputMode("append").start()
    try {
      input.addData(first.toSeq)
      q.processAllAvailable()
      input.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()

    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long)] =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val got = rows(spark.table("warc_zst_ingest_out"))
    val want = rows(StreamingQueries.warcZstIngest.run(spark, sf()))
    assert(got === want)
    assert(got.nonEmpty)
    assert(got.map(_._1) === pairMin,
      "micro-batch 2's re-fetches must all drop at the seen set")
  }

  test("quality gate: stateless model scoring over micro-batches == batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.QualityModel

    val docs = Tables.documents(spark, sf())
    // train OFFLINE on the standing corpus, ship the artifact
    val (weights, prior, unseen) =
      QualityModel.trainArtifact(docs.filter(col("doc_id") % 10 =!= 7))
    val batch = docs.filter(col("doc_id") % 10 === 7)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val (m1, m2) = batch.splitAt(batch.length / 2)

    val input = MemoryStream[(Long, String)]
    val q = Streams.qualityGate(
        input.toDF().toDF("doc_id", "text"), weights, prior, unseen)
      .writeStream.format("memory").queryName("quality_gate_out")
      .outputMode("append").start()
    try {
      input.addData(m1.toSeq)
      q.processAllAvailable()
      input.addData(m2.toSeq)
      q.processAllAvailable()
    } finally q.stop()

    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Boolean)] =
      df.select("doc_id", "n_tokens", "score", "predicted").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    val got = rows(spark.table("quality_gate_out"))
    val want = rows(graft.registry.Registry.byName("st_quality_model_gate")
      .run(spark, sf()))
    assert(got === want)
    assert(got.nonEmpty)
    // the stateless literal-map fold and the distributed broadcast-join
    // scorer are the SAME arithmetic: scores agree value for value
    assert(got.exists(_._4) || got.exists(!_._4))
  }

  test("lang-id gate: stateless multiclass scoring over micro-batches == batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.LangIdModel

    val docs = Tables.documents(spark, sf())
    // train OFFLINE on the standing corpus, ship the artifact
    val (wm, priors, norms) =
      LangIdModel.trainArtifact(docs.filter(col("doc_id") % 10 =!= 7))
    val batch = docs.filter(col("doc_id") % 10 === 7)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
    val (m1, m2) = batch.splitAt(batch.length / 2)

    val input = MemoryStream[(Long, String, String)]
    val q = Streams.langIdGate(
        input.toDF().toDF("doc_id", "lang", "text"), wm, priors, norms)
      .writeStream.format("memory").queryName("lang_id_gate_out")
      .outputMode("append").start()
    try {
      input.addData(m1.toSeq)
      q.processAllAvailable()
      input.addData(m2.toSeq)
      q.processAllAvailable()
    } finally q.stop()

    def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.select("doc_id", "n_grams", "s_en", "s_de", "s_es", "s_fr",
        "s_zh", "lang_pred", "correct").collect().map(_.toSeq).toSet
    val got = rows(spark.table("lang_id_gate_out"))
    val want = rows(graft.registry.Registry.byName("st_lang_id_gate")
      .run(spark, sf()))
    assert(got === want)
    assert(got.nonEmpty)
  }
}
