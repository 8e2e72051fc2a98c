package graft

import org.apache.spark.sql.DataFrame

import graft.registry.Registry

/** Physical-plan regression guards: the properties that make these
  * queries scale (pushdown, pruning, broadcast, map-side combine) are
  * asserted, not assumed — a refactor that silently de-optimizes a plan
  * fails here even though results stay correct.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    sansFanout(Registry.byName(name).run(spark, sf("0.01"))
      .queryExecution.executedPlan.toString)

  test("s1_scan_prune: filter pushed to parquet, schema pruned") {
    val p = plan("s1_scan_prune")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"))
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>"))
  }

  test("j1_join_inner: dimension side broadcast, aggregation partial") {
    val p = plan("j1_join_inner")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("partial_sum"))
  }

  test("q1_agg: map-side combine + column-pruned scan") {
    val p = plan("q1_agg")
    assert(p.contains("partial_sum"))
    assert(p.contains("partial_count"))
    // only the 5 referenced columns are read
    assert(p.contains("struct<l_quantity:double,l_extendedprice:double,l_discount:double"))
  }

  test("j2_join_double: both joins resolved, customer broadcast") {
    val p = plan("j2_join_double")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("f3_temporal_snapshot: both conjuncts pushed to the scan") {
    val p = plan("f3_temporal_snapshot")
    assert(p.contains("PushedFilters") && p.contains("LessThanOrEqual(o_orderdate"))
    assert(p.contains("o_totalprice#") && p.contains("<= 50000.0"))
  }

  test("m_decode_features: narrow per-row pipeline, zero exchanges before sort") {
    val p = sansFanout(Registry.byName("m_decode_features").run(spark, sf("0.01"))
      .queryExecution.executedPlan.toString)
    // one exchange allowed: the final presentation sort
    assert(p.split("Exchange").length - 1 <= 1, p)
  }

  test("d_dedup_ngram_jaccard: equi-join inverted index, no cartesian") {
    val p = plan("d_dedup_ngram_jaccard")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("whole-stage codegen wraps the aggregation pipelines") {
    val p = plan("q1_agg")
    assert(p.contains("HashAggregate"))
  }

  test("rank<=k filter triggers WindowGroupLimit pushdown (map-side top-k)") {
    val p = plan("w_rank_topk_per_group")
    // Partial before the shuffle + Final after: per-partition state is
    // bounded to k rows — the built-in that makes a custom TopKPerKey
    // operator unnecessary (see README design positions)
    assert(p.contains("WindowGroupLimit"))
    assert(p.contains("Partial") && p.contains("Final"))
  }

  test("tfidf top-terms: per-doc rank bounded by WindowGroupLimit") {
    val p = plan("t_tfidf_top_terms")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("t_cooccurrence: map-only pair generation, top-k as TakeOrdered") {
    val p = plan("t_cooccurrence")
    // pairs are built per-row (nested transforms + one explode), never
    // by a token self-join; the global top-50 is a TakeOrdered, not a
    // full sort
    assert(!p.contains("Join"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("sim_ann_multiprobe: bucket equi-join, never a nested loop") {
    val p = plan("sim_ann_multiprobe")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("g_triangles: degree-oriented wedge join, no nested loop") {
    val p = plan("g_triangles")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the orientation requires joining per-node degrees onto both endpoints
    assert(p.split("Join").length - 1 >= 4, p)
  }

  test("x_interval_join: equi component keeps the range join off nested loops") {
    val p = plan("x_interval_join")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("d_dedup_simhash: banding carries only id pairs through distinct") {
    val p = plan("d_dedup_simhash")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the distinct aggregate's grouping keys are the two ids, no sketches
    assert(p.contains("HashAggregate(keys=[a_id"), p)
  }

  test("x_lateral decorrelates to an aggregate + join (no per-row subquery)") {
    val p = plan("x_lateral")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("keyed running windows: the row-grain window is partitioned") {
    for (name <- Seq("w_running_total_keyed", "w_ignore_nulls_keyed")) {
      val p = plan(name)
      // the window over raw rows runs partitioned by the stitch key; the
      // only unpartitioned window sorts the tiny per-partition aggregate
      assert(p.contains("windowspecdefinition(__part"), s"$name:\n$p")
      // offsets rejoin via broadcast, not another row-grain shuffle
      assert(p.contains("BroadcastHashJoin"), s"$name:\n$p")
    }
  }

  test("st_enrich: customer dimension is the broadcast build side") {
    val p = plan("st_enrich")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("g_squares: salted wedge join shuffles by (middle, salt), no nested loop") {
    val p = plan("g_squares")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    // the salt column joins alongside the middle vertex
    assert(p.contains("salt_a"), p)
  }

  test("x_hash_split: split assignment is a narrow map (one sort exchange only)") {
    val p = plan("x_hash_split")
    // the md5-bucket assignment itself must add no shuffle; the single
    // allowed exchange is the final presentation sort
    assert(p.split("Exchange").length - 1 <= 1, p)
    assert(!p.contains("Join"), p)
  }

  test("x_bloom_prune: bloom filter evaluates at the scan side, before the join") {
    val p = plan("x_bloom_prune")
    assert(p.contains("might_contain"), p)
    // the bloom predicate must sit below the semi-join: in the tree
    // string the Filter(might_contain) line appears after the join line
    val joinAt = p.indexOf("Join")
    val bloomAt = p.indexOf("might_contain")
    assert(joinAt >= 0 && bloomAt > joinAt,
      s"bloom filter not under the join (join@$joinAt bloom@$bloomAt)")
  }

  test("x_incr_agg: chunk states partially aggregate before their exchanges") {
    val p = plan("x_incr_agg")
    assert(p.contains("partial_sum"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("x_resample_locf: all windows are partitioned (no single-partition sort)") {
    val p = plan("x_resample_locf")
    // every Window/Sort in this plan must carry a partition spec — a
    // global window would show 'Window [...]' with an empty partitionBy
    // and a SinglePartition exchange
    assert(!p.contains("SinglePartition"), p)
  }

  test("AQE coalesces post-shuffle partitions at runtime") {
    import org.apache.spark.sql.functions.count
    val df = Tables.orders(spark, sf("0.01"))
      .groupBy("o_orderstatus").agg(count(org.apache.spark.sql.functions.lit(1)))
    df.collect() // run so AQE replaces the plan with the final one
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AQEShuffleRead"), p)
    assert(p.contains("coalesced"), p)
  }

  test("join strategy hints are honored in the initial plan") {
    import org.apache.spark.sql.functions.col
    val o = Tables.orders(spark, sf("0.01"))
    val c = Tables.customer(spark, sf("0.01"))
    val sh = o.join(c.hint("shuffle_hash"), col("o_custkey") === col("c_custkey"))
      .queryExecution.executedPlan.toString
    assert(sh.contains("ShuffledHashJoin"), sh)
    val sm = o.join(c.hint("merge"), col("o_custkey") === col("c_custkey"))
      .queryExecution.executedPlan.toString
    assert(sm.contains("SortMergeJoin"), sm)
  }

  test("x_mad_outliers: per-group stats join back is a broadcast, no nested loop") {
    val p = plan("x_mad_outliers")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("t_cdc_chunk: boundary gate stays in-array (no token self-join), dup join is equi") {
    val p = plan("t_cdc_chunk")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the only joins are hash-keyed (chunk hash / doc)
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"), p)
  }

  test("x_attribution: as-of compose shape — windowed, no nested loop, no extra key shuffle") {
    val p = plan("x_attribution")
    assert(p.contains("Window"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the build side's (user, ts) dedup aggregation + the window's key
    // partition; anything more means the compose shape regressed
    assert(p.split("Exchange hashpartitioning").length - 1 <= 2, p)
  }

  test("m_sniff_dispatch: sniff + route + decode is a pure narrow map") {
    val p = plan("m_sniff_dispatch")
    // per-row kind detection and per-kind decode must add NO shuffle;
    // the single allowed exchange is the final presentation sort
    assert(p.split("Exchange").length - 1 <= 1, p)
    assert(!p.contains("Join"), p)
  }

  test("d_corpus_shuffle: shard-keyed window, never a global single-partition sort") {
    val p = plan("d_corpus_shuffle")
    // the rank window partitions by shard (hashpartitioning), so no
    // stage serializes the corpus through one task: every Exchange in
    // the plan below the final presentation sort is a hash exchange
    assert(p.contains("hashpartitioning"), p)
    assert(!p.contains("Join"), p)
  }

  test("d_budget_select: one domain-keyed exchange feeds rank and running sum") {
    val p = plan("d_budget_select")
    // score/tokens are narrow maps; both window functions share the
    // source-keyed partitioning, so the query is one hash exchange
    // plus the presentation sort
    assert(p.contains("hashpartitioning(source"), p)
    assert(p.split("Exchange").length - 1 <= 2, p)
  }

  test("t_html_extract: codegen'd narrow map — pruned scan, one exchange (output sort)") {
    val p = plan("t_html_extract")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
    // htmlextract stays inside the projection; the ONLY exchange is the
    // presentation sort's range partitioning
    assert(p.split("Exchange").length - 1 <= 1, p)
    assert(p.contains("rangepartitioning(doc_id"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("d_crawl_e2e: no cartesian wider than 1-row aggregates; guarded decode") {
    val p = plan("d_crawl_e2e")
    // the waterfall assembly cross-joins two single-row aggregates —
    // a broadcast nested loop over 1 row is the allowed pattern, a
    // CartesianProduct never is
    assert(!p.contains("CartesianProduct"), p)
    // both survivor elections hash on their keys
    assert(p.contains("hashpartitioning(canonical"), p)
    assert(p.contains("partial_count"), p)
  }

  test("d_crawl_frontier: link-key aggregation is partial; anti-join, no nested loop") {
    val p = plan("d_crawl_frontier")
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count"), p)
  }

  test("d_dup_span_excise: gram-key exchanges only, rewrite stays in the row") {
    val p = plan("d_dup_span_excise")
    assert(p.contains("hashpartitioning(gram"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("m_image_resize: full decode + grid sample is a pure narrow map") {
    val p = plan("m_image_resize")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
    assert(p.split("Exchange").length - 1 <= 1, p) // output sort only
    assert(!p.contains("CartesianProduct"), p)
  }

  test("d_crawl_incremental: anti-joins on the canonical/content keys, no nested loop beyond 1-row aggs") {
    val p = plan("d_crawl_incremental")
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("hashpartitioning(canonical"), p)
  }

  test("st_crawl_ingest: one canonical-key shuffle; decode after the election") {
    val p = plan("st_crawl_ingest")
    assert(p.contains("hashpartitioning(canonical"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("m_jpeg_pixels: full entropy decode is a pure narrow map") {
    val p = plan("m_jpeg_pixels")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
    assert(p.split("Exchange").length - 1 <= 1, p) // output sort only
    assert(!p.contains("CartesianProduct"), p)
  }

  test("d_crawl_frontier_polite: rules broadcast, link-keyed verdict agg, no nested loop") {
    val p = plan("d_crawl_frontier_polite")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("LeftAnti"), p) // the frontier's seen-set drop survives
  }

  test("t_quality_model_score: model broadcast to the scoring join, aggs partial, no cartesian") {
    val p = plan("t_quality_model_score")
    // the vocab-sized weight table must reach the corpus-sized token
    // stream as a broadcast-hash build, never a shuffle of the corpus
    // onto the vocab key twice
    assert(p.contains("BroadcastHashJoin"), p)
    // train + score aggregations both map-side combine
    assert(p.contains("partial_sum"), p)
    // the only nested-loop shapes are the 1-row totals broadcasts
    assert(!p.contains("CartesianProduct"), p)
  }

  test("m_video_frames: demux + per-frame entropy decode is a pure narrow map over doc_id alone") {
    val p = plan("m_video_frames")
    // the video corpus derives entirely from doc_id — the scan must
    // prune text/lang/source away
    assert(p.contains("ReadSchema: struct<doc_id:bigint>"), p)
    assert(p.split("Exchange").length - 1 <= 1, p) // output sort only
    assert(!p.contains("CartesianProduct"), p)
  }

  test("m_dedup_video: decoded-content key is ONE shuffle, aggs partial") {
    val p = plan("m_dedup_video")
    assert(p.contains("ReadSchema: struct<doc_id:bigint>"), p)
    // key exchange + final sort — nothing else moves data
    assert(p.split("Exchange").length - 1 <= 2, p)
    assert(p.contains("partial_min") || p.contains("partial_count"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("m_video_clip_pairs: inverted-index frame-key join, never all-pairs") {
    val p = plan("m_video_clip_pairs")
    assert(p.contains("ReadSchema: struct<doc_id:bigint>"), p)
    // the only join is the fkey equi-join (postings self-join)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_count"), p) // pair counts map-side combine
  }

  test("m_webdataset_route: shard walk + extension dispatch is one narrow pass + a doc-keyed fold") {
    val p = plan("m_webdataset_route")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string,lang:string>"), p)
    // doc-keyed re-group + output sort only
    assert(p.split("Exchange").length - 1 <= 2, p)
    assert(p.contains("partial_max") || p.contains("partial"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("st_warc_ingest twin: uri-keyed election, demux narrow, no cartesian") {
    val p = plan("st_warc_ingest")
    assert(p.contains("hashpartitioning(uri"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("t_chat_validate: construct + from_json + verdicts is one narrow pass") {
    val p = plan("t_chat_validate")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
    assert(p.split("Exchange").length - 1 <= 1, p) // output sort only
    assert(!p.contains("CartesianProduct"), p)
  }

  test("m_gif_pixels: hand-rolled LZW decode is a pure narrow map") {
    val p = plan("m_gif_pixels")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
    assert(p.split("Exchange").length - 1 <= 1, p) // output sort only
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x_sessionize_batch: ONE user-key exchange feeds both windows AND the session agg") {
    val p = plan("x_sessionize_batch")
    // hashpartitioning(user_id) satisfies the (user_id, sess) clustered
    // distribution (subset rule), so the aggregation rides the window's
    // exchange — only the user shuffle + the output sort move data
    assert(p.contains("hashpartitioning(user_id"), p)
    assert(p.split("Exchange").length - 1 <= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("t_warc_extract: WARC walk + HTTP parse + HTML extract is one narrow pass") {
    val p = plan("t_warc_extract")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
    assert(p.split("Exchange").length - 1 <= 1, p) // output sort only
    assert(!p.contains("CartesianProduct"), p)
  }

  test("d_decontaminate_embedding: eval side broadcasts (bounded-eval class), corpus scanned once") {
    val p = plan("d_decontaminate_embedding")
    // the nested loop is the DESIGNED shape here: corpus x BROADCAST
    // eval (<25 rows) — the coreset/k-means bounded-broadcast class,
    // never corpus x corpus
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("PushedFilters: [IsNotNull(vec_id)"), p) // both range filters reach the scan
    assert(p.contains("partial_max") || p.contains("partial"), p)
  }

  test("g_walks superstep: walk state broadcasts against edges (checkpointed result hides it)") {
    // the registered query's final plan is checkpoint-truncated frames,
    // so assert the per-step shape directly: seed-sized state joined to
    // the edge table must build a broadcast on the state side
    import org.apache.spark.sql.functions.{broadcast, col}
    val e = graft.graph.CitationGraph.edges(spark, sf("0.01"))
      .filter(col("src") =!= col("dst")).distinct()
    val st = e.select(col("src").as("wid"), col("src").as("cur"))
      .filter(col("wid") < 32).distinct()
    val p = broadcast(st).join(e, col("cur") === col("src"))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("d_dup_span_exact: gram-key exchanges map-side combine, island window partitioned by doc") {
    val p = plan("d_dup_span_exact")
    // duplicate-set aggregation combines before the gram-key shuffle
    assert(p.contains("partial_count"), p)
    // the gaps-and-islands row_number must be a doc_id-PARTITIONED
    // window, never a global single-partition sort
    assert(p.contains("row_number"), p)
    assert(p.contains("hashpartitioning(doc_id"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("t_lang_id_model: trigram model broadcast to the scoring join, aggs partial, no cartesian") {
    val p = plan("t_lang_id_model")
    // the vocab-bounded weight table reaches the corpus-sized gram
    // stream as a broadcast-hash build (the QualityModel shape)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_sum"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("t_warc_zst_dict_parse: the decode side stays a pure narrow map (dict ships as a literal)") {
    val p = plan("t_warc_zst_dict_parse")
    // the trained dict is a driver-side literal by the time this plan
    // exists — the stream build + self-contained decode + record walk
    // pay only the output sort's exchange; training's own gram-count
    // shuffle ran in its separate job
    assert(p.split("Exchange").length - 1 <= 1, p)
    assert(p.contains("rangepartitioning(doc_id"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("t_warc_zst_dict_artifact: shipped dict is a literal; ONE scan, no training subtree") {
    val p = plan("t_warc_zst_dict_artifact")
    // the train-once/ship twin (VERDICT r12 #7): the ≤4 KiB dict is an
    // out-of-band artifact, so the query plan is a single narrow map
    // over ONE documents scan — no gram-explode/groupBy training
    // subtree, no second scan, no join; only the output sort exchanges
    assert(p.split("Scan parquet").length - 1 === 1, p)
    assert(p.split("Exchange").length - 1 <= 1, p)
    assert(p.contains("rangepartitioning(doc_id"), p)
    assert(!p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("t_warc_zst_parse: zstd encode + strict decode + record walk is a pure narrow map") {
    val p = plan("t_warc_zst_parse")
    // the whole compression layer (FSE/Huffman frames, XXH64 checks)
    // lives inside the projection — the ONLY exchange is the output
    // sort's range partitioning, exactly like the .warc.gz twin
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
    assert(p.split("Exchange").length - 1 <= 1, p)
    assert(p.contains("rangepartitioning(doc_id"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
