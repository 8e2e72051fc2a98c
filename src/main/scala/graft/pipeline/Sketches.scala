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
  * results. Permutations are (a_i*h + b_i) mod P with small constants:
  * h < P = 1e9+7 < 2^30 and a_i < 2^7 keep products < 2^37 — no int64
  * overflow on either engine.
  *
  * Scale: signatures are embarrassingly parallel (per-row); the LSH
  * band-bucket join replaces the O(n²) all-pairs comparison with an
  * equi-join shuffle on band keys — the 100-TB dedup path.
  */
object Sketches {

  val P = 1000000007L
  val NumHashes = 32
  val BandRows = 2 // 16 bands x 2 rows: recall 1-(1-s²)¹⁶ (≈0.99 at s=0.5)
  val NumBands: Int = NumHashes / BandRows
  val SimHashBits = 60

  private def a(i: Int): Long = 2L * i + 3
  private def b(i: Int): Long = 5L * i + 7

  /** Distinct-token base hashes (set semantics — MinHash/Jaccard). */
  def tokenHashes(toks: Column): Column =
    transform(array_distinct(toks),
      t => (conv(md5(t).substr(1, 15), 16, 10).cast(LongType) % P))

  val tokenHashesSql: String =
    "list_transform(list_distinct(toks), t -> CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) % 1000000007)"

  /** Token hashes WITH multiplicity (bag semantics — the frequency
    * weighting of Charikar SimHash). */
  def tokenHashesAll(toks: Column): Column =
    transform(toks, t => (conv(md5(t).substr(1, 15), 16, 10).cast(LongType) % P))

  val tokenHashesAllSql: String =
    "list_transform(toks, t -> CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) % 1000000007)"

  /** 32 minhash values (array column) from a token-hash array column. */
  def minhashSig(hs: Column): Column =
    array((0 until NumHashes).map { i =>
      array_min(transform(hs, h => (h * a(i) + b(i)) % P))
    }: _*)

  def minhashSigSql(hsExpr: String): String =
    (0 until NumHashes).map { i =>
      s"list_min(list_transform($hsExpr, h -> (h * ${a(i)} + ${b(i)}) % 1000000007))"
    }.mkString("[", ", ", "]")

  /** LSH band keys: NumBands strings "band:v1,v2". */
  def bandKeys(sig: Column): Column =
    array((0 until NumBands).map { j =>
      concat_ws(",",
        (lit(s"$j:") +: (0 until BandRows).map(r =>
          element_at(sig, j * BandRows + r + 1).cast("string"))): _*)
    }: _*)

  /** 60-bit SimHash from a token-hash array column (pass the
    * with-multiplicity hashes for standard frequency weighting): bit b is
    * set when more than half the token occurrences have bit b set. */
  def simhash(hs: Column): Column =
    (0 until SimHashBits).map { bb =>
      when(size(filter(hs, h => (shiftright(h, bb).bitwiseAND(1)) === 1)) * 2
        > size(hs), lit(1L << bb)).otherwise(0L)
    }.reduce(_ + _)

  def simhashSql(hsExpr: String): String =
    (0 until SimHashBits).map { bb =>
      s"(CASE WHEN len(list_filter($hsExpr, h -> ((h >> $bb) & 1) = 1)) * 2 > len($hsExpr) THEN ${1L << bb} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** doc-level sketch table: (doc_id, hs, sig, simhash). */
  def sketchTable(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(col("doc_id"), split(trim(col(textCol)), "\\s+").as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"),
        tokenHashes(col("toks")).as("hs"),
        tokenHashesAll(col("toks")).as("hsAll"))
      .select(col("doc_id"), col("hs"),
        minhashSig(col("hs")).as("sig"),
        simhash(col("hsAll")).as("simhash"))
}
