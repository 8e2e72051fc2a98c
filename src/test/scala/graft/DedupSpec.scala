package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{PipelineQueries, Sketches}

/** Sketch/dedup operator properties at sf0.001 (same 500-doc corpus). */
class DedupSpec extends SparkSpec {

  private lazy val sketches =
    Sketches.sketchTable(Tables.documents(spark, sf())).cache()

  test("minhash signature: 32 values, stable across evaluations") {
    val sigs1 = sketches.select("doc_id", "sig").collect()
    val sigs2 = Sketches.sketchTable(Tables.documents(spark, sf()))
      .select("doc_id", "sig").collect()
    assert(sigs1.map(_.getSeq[Long](1).size).forall(_ == 32))
    assert(sigs1.map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      === sigs2.map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap)
  }

  test("identical texts get identical sketches; sketch of self has hamming 0") {
    import spark.implicits._
    val two = Seq((1L, "a b c a"), (2L, "a b c a"), (3L, "x y z w"))
      .toDF("doc_id", "text")
    val sk = Sketches.sketchTable(two).collect()
      .map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getLong(2))).toMap
    assert(sk(1L) === sk(2L))
    assert(sk(1L) !== sk(3L))
  }

  test("minhash similarity estimates Jaccard for near-identical docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w11"), // J = 9/11 ≈ 0.82
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10")) // J = 0
      .toDF("doc_id", "text")
    val sk = Sketches.sketchTable(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def est(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.size
    assert(est(sk(1L), sk(2L)) > 0.5)
    assert(est(sk(1L), sk(3L)) === 0.0)
  }

  test("LSH candidates cover every true near-dup pair (recall check)") {
    val exact = PipelineQueries.dedupNgram.run(spark, sf())
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = PipelineQueries.dedupMinhashLsh.run(spark, sf())
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact === lsh) // verified-candidate output == exact output
    assert(exact.nonEmpty)  // the corpus has planted near-dups
  }

  test("LSH recall holds at bench scale too (sf0.1, 5000 docs)") {
    val exact = PipelineQueries.dedupNgram.run(spark, sf("0.1"))
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = PipelineQueries.dedupMinhashLsh.run(spark, sf("0.1"))
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact === lsh)
    assert(exact.nonEmpty)
  }

  test("simhash hamming pairs: threshold respected and canonical order") {
    val rows = PipelineQueries.dedupSimhash.run(spark, sf()).collect()
    assert(rows.forall(r => r.getLong(2) <= 3))
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("df cap: jaccard values stay exact (full-posting verification)") {
    import spark.implicits._
    // docs 1,2 share a HOT shingle (df=72 via filler docs) and rare r1:
    // J = 2/(3+3-2) = 0.5. With the hot shingle capped out of candidate
    // generation, the pair must still surface via r1 AND with the hot
    // shingle counted in the jaccard (capped verification would say 1/3).
    val posts = (Seq(
      (1L, "hot"), (1L, "r1"), (1L, "r2"),
      (2L, "hot"), (2L, "r1"), (2L, "r3")) ++
      (100L until 170L).map(i => (i, "hot"))).toDF("doc_id", "g")
    val got = PipelineQueries.ngramJaccardPairs(posts, 0.5, dfCap = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got.get((1L, 2L)) === Some(0.5))
    // the documented tradeoff: filler pairs share ONLY the hot shingle
    // (true J = 1.0) and are missed under the cap...
    assert(!got.contains((100L, 101L)))
    // ...but found when the cap is above the corpus max df
    val uncapped = PipelineQueries.ngramJaccardPairs(posts, 0.5, dfCap = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((100L, 101L)) && uncapped.contains((1L, 2L)))
  }

  test("df cap is a no-op on the testdata corpus (max df << cap)") {
    val posts = Sketches.shinglePosts(Tables.documents(spark, sf()))
    val capped = PipelineQueries.ngramJaccardPairs(posts, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val uncapped = PipelineQueries.ngramJaccardPairs(posts, 0.5, dfCap = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(capped === uncapped)
    assert(capped.nonEmpty)
  }

  test("native MinHashAgg == 32-column min() formulation, value for value") {
    val classic = Sketches.minhashTable(Tables.documents(spark, sf()))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val native = Sketches.minhashTableNative(Tables.documents(spark, sf()))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native === classic)
    assert(native.nonEmpty)
  }

  test("per-row sketch kernels == aggregate builds, value for value") {
    val docs = Tables.documents(spark, sf())
    val aggSig = Sketches.minhashTable(docs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val rowSig = Sketches.minhashTableRow(docs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(rowSig === aggSig)
    val aggSim = Sketches.simhashTable(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rowSim = Sketches.simhashTableRow(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rowSim === aggSim)
    val aggPosts = Sketches.shinglePosts(docs)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val rowPosts = Sketches.shinglePostsRow(docs)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rowPosts === aggPosts)
    assert(aggSig.nonEmpty && aggSim.nonEmpty && aggPosts.nonEmpty)
  }

  test("per-row kernels handle whitespace/empty edge cases like Spark split") {
    import spark.implicits._
    // leading/trailing spaces, interior runs, tabs/newlines (NOT trimmed
    // by space-only trim but consumed by \s+), exactly-3 tokens, 2 tokens,
    // empty and all-space text
    val docs = Seq(
      (1L, "  a b c  "), (2L, "a\tb\nc"), (3L, "a  b   c"),
      (4L, "a b"), (5L, ""), (6L, "   "), (7L, "x y z w"),
      (8L, "a b c\t") // trailing tab survives space-only trim => "" token
    ).toDF("doc_id", "text")
    val agg = Sketches.minhashTable(docs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val row = Sketches.minhashTableRow(docs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(row === agg)
    assert(row.keySet === Set(1L, 2L, 3L, 7L, 8L)) // <3-token docs dropped
    val aggSim = Sketches.simhashTable(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rowSim = Sketches.simhashTableRow(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rowSim === aggSim)
    assert(rowSim.keySet === (1L to 8L).toSet)
  }

  test("incremental dedup equals the full run restricted to batch-touching pairs") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = pairs(PipelineQueries.dedupMinhashLsh.run(spark, sf()))
    val incr = pairs(PipelineQueries.dedupIncremental.run(spark, sf()))
    val expected = full.filter { case (a, b) => a % 10 == 7 || b % 10 == 7 }
    assert(incr == expected)
  }

  test("curation writer round trip: re-read rows aggregate to d_curate_e2e's bins") {
    import org.apache.spark.sql.functions._
    // the written store's per-chunk rows, re-aggregated per (shard, bin),
    // must reproduce the stats query exactly — writer and stats are two
    // views of one corpus
    val written = PipelineQueries.curateWrite.run(spark, sf())
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_chunks"), sum(col("n_tokens")).as("total_tokens"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val stats = PipelineQueries.curateE2e.run(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(written == stats)
    // and the store really is shard-partitioned on disk
    val dirs = new java.io.File("target/curate_write").listFiles()
      .flatMap(_.listFiles()).map(_.getName).filter(_.startsWith("shard="))
    assert(dirs.nonEmpty)
  }

  test("incremental curation: batch bins continue after each shard's base bins") {
    val rows = PipelineQueries.curateIncremental.run(spark, sf()).collect()
    val (batch, base) = rows.partition(_.getLong(2) % 10 == 7)
    assert(base.nonEmpty && batch.nonEmpty)
    val baseMax = base.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).max).toMap
    batch.foreach { r =>
      val m = baseMax.get(r.getLong(0))
      assert(m.forall(r.getLong(1) > _),
        s"shard ${r.getLong(0)}: batch bin ${r.getLong(1)} does not continue past base max $m")
    }
    // re-running must not double-append (overwrite-then-append idempotency)
    assert(PipelineQueries.curateIncremental.run(spark, sf()).count() === rows.length.toLong)
  }

  test("exact all-pairs baselines fail fast above the input cap") {
    import spark.implicits._
    val big = spark.range(201).toDF("vec_id")
    val e = intercept[IllegalArgumentException] {
      PipelineQueries.requireBounded(big, "test op", cap = 200L)
    }
    assert(e.getMessage.contains("LSH-bucketed"))
    // at or under the cap it passes through unchanged
    assert(PipelineQueries.requireBounded(big, "test op", cap = 201L).count() === 201L)
  }
}
