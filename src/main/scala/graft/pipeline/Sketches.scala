package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** MinHash and SimHash sketches over a tokenized text column.
  *
  * Portability contract: every hash is derived from md5(token) — the only
  * cross-engine-stable hash — reduced to integer arithmetic that DuckDB
  * reproduces exactly (`CAST('0x'||substr(md5(t),1,15) AS BIGINT)`), so
  * sketch values themselves are oracle-checkable, not just downstream
  * results. Permutations are (a_i*h + b_i) mod P with Knuth-multiplier
  * constants (see `a`/`b` below): h, a_i < P = 1e9+7 < 2^30 keeps
  * products < 2^60 — no int64 overflow on either engine.
  *
  * Scale: signatures are embarrassingly parallel (per-row); the LSH
  * band-bucket join replaces the O(n²) all-pairs comparison with an
  * equi-join shuffle on band keys — the 100-TB dedup path.
  */
object Sketches {

  val P: Long = graft.functions.SketchUtil.P
  val NumHashes: Int = graft.functions.SketchUtil.NumHashes
  /** 8 bands x 4 rows. r=2 floods band buckets on this high-overlap
    * corpus (every doc shares tokens -> 2-minhash collisions -> O(k²)
    * candidate blowup per bucket, measured 205s at sf0.1); r=4 keeps
    * buckets tight while catching every planted near-dup (all have
    * J >= 0.9, where P(catch) = 1-(1-s⁴)⁸ ≈ 0.9998 — recall asserted
    * against the exact query in DedupSpec). */
  val BandRows = 4
  val NumBands: Int = NumHashes / BandRows
  val SimHashBits = 60

  /** Permutation constants MUST wrap the modulus: tiny multipliers make
    * (a*h + b) mod P order-preserving for small h, so every slot picks
    * the same minimum element and the signature collapses (found as a
    * J=0.98 pair with zero matching bands). Large odd multipliers from
    * Knuth's multiplicative hashing scramble the order; products stay
    * < 2^60 (a,h < P < 2^30) — no int64 overflow on either engine. */
  val permA: Array[Long] = graft.functions.SketchUtil.permA
  val permB: Array[Long] = graft.functions.SketchUtil.permB
  private def a(i: Int): Long = permA(i)
  private def b(i: Int): Long = permB(i)

  /** Token hashes WITH multiplicity, as DuckDB SQL (bag semantics — the
    * frequency weighting of Charikar SimHash); feeds the d_simhash
    * oracles. RAW 60-bit md5 prefix, deliberately NOT reduced mod P:
    * P < 2^30, so a mod-P hash has zero entropy in bits 30..59 — half the
    * simhash is constant and the 15-bit pigeonhole chunks 2/3 degenerate
    * to the full cross product (measured: two 5000-doc buckets = 25M
    * candidate pairs at sf0.1). Only the MinHash permutation arithmetic
    * needs the mod (to bound products below 2^63). */
  val tokenHashesAllSql: String =
    "list_transform(toks, t -> CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT))"

  def minhashSigSql(hsExpr: String): String =
    (0 until NumHashes).map { i =>
      s"list_min(list_transform($hsExpr, h -> (h * ${a(i)} + ${b(i)}) % 1000000007))"
    }.mkString("[", ", ", "]")

  /** LSH band keys: one 64-bit hash per band over (band index, its
    * BandRows signature slots) — a LONG key instead of the former
    * "j:v1,v2,.." string narrows the band-explode shuffle ~6x. An
    * xxhash64 collision across different band contents merely adds a
    * candidate pair, and every candidate is exactly verified downstream
    * (jaccardVerify), so correctness is unaffected. */
  def bandKeys(sig: Column): Column =
    array((0 until NumBands).map { j =>
      xxhash64((lit(j) +: (0 until BandRows).map(r =>
        element_at(sig, j * BandRows + r + 1))): _*)
    }: _*)

  def simhashSql(hsExpr: String): String =
    (0 until SimHashBits).map { bb =>
      s"(CASE WHEN len(list_filter($hsExpr, h -> ((h >> $bb) & 1) = 1)) * 2 > len($hsExpr) THEN ${1L << bb} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Single-string base hash (scalar form, codegen'd). */
  def tokenHash(t: Column): Column =
    conv(md5(t).substr(1, 15), 16, 10).cast(LongType) % P

  /** Raw 60-bit base hash (no mod — full entropy for SimHash bits). */
  def tokenHash60(t: Column): Column =
    conv(md5(t).substr(1, 15), 16, 10).cast(LongType)

  /** Distinct word-3-gram postings (doc_id, g) via posexplode + window
    * lead — codegen'd, one doc_id shuffle, no array lambdas. */
  def shinglePosts(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    docs
      .select(col("doc_id"),
        posexplode(split(trim(col(textCol)), "\\s+")).as(Seq("pos", "tok")))
      .select(col("doc_id"),
        concat_ws(" ", col("tok"),
          lead(col("tok"), 1).over(w), lead(col("tok"), 2).over(w)).as("g"),
        lead(col("tok"), 2).over(w).isNotNull.as("complete"))
      .filter(col("complete"))
      .select(col("doc_id"), col("g"))
      .distinct()
  }

  /** MinHash signatures over the SHINGLE sets: (doc_id, sig ARRAY[32]).
    *
    * Shingles, not tokens: MinHash estimates the Jaccard of whatever set
    * it sketches, and the downstream verification is 3-gram Jaccard. On a
    * small-vocabulary corpus token sets are near-identical across all
    * docs (token-minhash banding measured a 2318-doc bucket = 22M
    * candidate pairs at sf0.1); shingle sets are near-unique, so buckets
    * stay tight. Built on explode + 32 codegen'd min() aggregates — array
    * higher-order functions run interpreted and dominated this path.
    */
  def minhashTable(docs: DataFrame, textCol: String = "text"): DataFrame =
    shinglePosts(docs, textCol)
      .withColumn("h", tokenHash(col("g")))
      .groupBy(col("doc_id"))
      .agg(min((col("h") * a(0) + b(0)) % P).as("m0"),
        (1 until NumHashes).map(i =>
          min((col("h") * a(i) + b(i)) % P).as(s"m$i")): _*)
      .select(col("doc_id"),
        array((0 until NumHashes).map(i => col(s"m$i")): _*).as("sig"))

  /** Frequency-weighted 60-bit SimHash over token occurrences:
    * (doc_id, simhash) via 60 codegen'd sum() aggregates. */
  def simhashTable(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(col("doc_id"), explode(split(trim(col(textCol)), "\\s+")).as("tok"))
      .withColumn("h", tokenHash60(col("tok")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("ntok"),
        (0 until SimHashBits).map(bb =>
          sum(shiftright(col("h"), bb).bitwiseAND(1)).as(s"c$bb")): _*)
      .select(col("doc_id"),
        (0 until SimHashBits).map { bb =>
          when(col(s"c$bb") * 2 > col("ntok"), lit(1L << bb)).otherwise(0L)
        }.reduce(_ + _).as("simhash"))

  /** MinHash signatures via the native MinHashAgg TypedImperativeAggregate
    * (one long[32] buffer update per row through ObjectHashAggregate)
    * instead of 32 independent min() columns. Value-for-value identical
    * to minhashTable — DedupSpec cross-checks. */
  def minhashTableNative(docs: DataFrame, textCol: String = "text"): DataFrame =
    shinglePosts(docs, textCol)
      .withColumn("h", tokenHash(col("g")))
      .groupBy(col("doc_id"))
      .agg(graft.functions.MinHashAgg.minhash_agg(col("h")).as("sig"))

  /** Combined sketch table (docs with >= 3 tokens): (doc_id, sig, simhash). */
  def sketchTable(docs: DataFrame, textCol: String = "text"): DataFrame =
    minhashTable(docs, textCol).join(simhashTable(docs, textCol), "doc_id")

  // ---- per-row (map-only) builds ----------------------------------------
  // A sketch is a function of ONE document, so the aggregate formulations
  // above (explode + window + groupBy — three shuffles over the exploded
  // postings) are pure overhead: at 100 TB the sketch build should be a
  // narrow scan. These compute identical values in a single codegen'd
  // per-row pass (DedupSpec cross-checks value-for-value) and are the
  // main-path builds; the aggregate forms remain as reference oracles.

  import graft.functions.SketchFunctions

  /** shinglePosts, map-only: explode of the per-row distinct-shingle
    * array (explode skips the NULL array of <3-token docs — same row set
    * as the window+distinct build, zero shuffles). */
  def shinglePostsRow(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
      explode(SketchFunctions.word_shingles(col(textCol))).as("g"))

  /** minhashTable, map-only: one per-row kernel call instead of
    * explode + shuffle + 32 min() aggregates. */
  def minhashTableRow(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
        SketchFunctions.minhash_sig(col(textCol)).as("sig"))
      .filter(col("sig").isNotNull)

  /** simhashTable, map-only. The null filter matches the aggregate
    * build, which dropped NULL-text docs at the explode — without it a
    * null text would surface as a (doc_id, NULL) row the oracle never
    * produces. */
  def simhashTableRow(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
        SketchFunctions.simhash60(col(textCol)).as("simhash"))
      .filter(col("simhash").isNotNull)
}
