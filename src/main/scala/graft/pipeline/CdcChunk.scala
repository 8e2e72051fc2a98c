package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.registry.Q

/** Content-defined chunking (CDC) + chunk-level dedup — the dedup
  * granularity between d_dup_span's 8-gram spans and whole-doc hashing.
  * Fixed-size chunking breaks on a one-token insertion (every later
  * chunk shifts); CDC (Muthitacharoen et al. SOSP'01 LBFS; FastCDC,
  * USENIX ATC'16) draws a boundary wherever a hash of the LOCAL content
  * window hits a gate value, so chunk boundaries re-synchronize right
  * after an edit and shared regions between near-identical docs hash to
  * identical chunks again.
  *
  * Deterministic, engine-portable rule: a boundary falls AFTER token i
  * iff the first hex digit of md5(last-3-token window ending at i) is in
  * {'0','1'} (gate probability 2/16 → mean chunk ≈ 8 tokens); the final
  * token never ends a chunk early. A chunk's identity is md5 of its
  * space-joined tokens; a chunk is DUPLICATED iff the same hash occurs
  * in ≥ 2 distinct docs (d_dup_span's convention — within-doc repeats
  * are repetition, not duplication).
  *
  * Scale shape: the boundary gate is computed inside the token array
  * (one map-only transform, no token self-join); the only window is the
  * per-doc running boundary count (partition = doc, bounded by doc
  * length — never a corpus-wide sort); chunk identity is a map-side
  * md5; the dup test is one hash-keyed aggregation + equi-join. All
  * corpus-sized exchanges are keyed by doc_id or chunk hash.
  */
object CdcChunk {

  private def toks(c: Column): Column = split(trim(c), "\\s+")
  private val toksSql = "string_split_regex(trim(text), '\\s+')"

  /** (doc_id, n_tokens, n_chunks, dup_chunks, dup_ppm) per doc. */
  def chunkStats(docs: DataFrame): DataFrame =
    perDocStats(chunks(docs))

  /** (doc_id, cid, h, n_toks): the chunk table — the seam specs use to
    * check reassembly and boundary re-synchronization. */
  def chunks(docs: DataFrame): DataFrame = {
    val t = docs.select(col("doc_id"), toks(col("text")).as("tk"))
    // boundary flag per position, computed inside the array (map-only):
    // window = tokens max(1, i-2)..i, gate = first md5 hex digit < '2'
    val withB = t.withColumn("b", expr(
      """transform(sequence(1, size(tk)), i ->
        |  CASE WHEN i < size(tk) AND substring(md5(concat_ws(' ',
        |      slice(tk, greatest(1, i - 2), i - greatest(1, i - 2) + 1))),
        |      1, 1) IN ('0', '1')
        |  THEN 1L ELSE 0L END)""".stripMargin))
    val rows = withB.select(col("doc_id"),
      posexplode(arrays_zip(col("tk"), col("b"))).as(Seq("p0", "z")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"),
        col("z.tk").as("tok"), col("z.b").as("b"))
    // chunk id of token i = boundaries strictly before i
    val cum = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCid = rows.withColumn("cid", sum(col("b")).over(cum) - col("b"))
    withCid.groupBy(col("doc_id"), col("cid"))
      .agg(
        md5(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            z => z.getField("tok")), " ")).as("h"),
        count(lit(1)).as("n_toks"))
  }

  private def perDocStats(ch: DataFrame): DataFrame = {
    val dup = ch.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("h"), lit(1L).as("isdup"))
    ch.join(dup, Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("n_toks")).as("n_tokens"),
        count(lit(1)).as("n_chunks"),
        sum(coalesce(col("isdup"), lit(0L))).as("dup_chunks"))
      .select(col("doc_id"), col("n_tokens"), col("n_chunks"),
        col("dup_chunks"),
        expr("(1000000L * dup_chunks) div n_chunks").as("dup_ppm"))
  }

  // DuckDB replays the identical gate: parallel unnest zips the token,
  // position, and boundary lists; slicing tk[a:i] is 1-based inclusive
  // like Spark's slice(tk, a, i-a+1).
  private val oracleSql: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents),
       |p AS (SELECT doc_id,
       |    unnest(generate_series(1, len(tk))) AS pos,
       |    unnest(tk) AS tok,
       |    unnest(list_transform(generate_series(1, len(tk)), i ->
       |      CASE WHEN i < len(tk) AND substr(md5(array_to_string(
       |          tk[greatest(1, i - 2):i], ' ')), 1, 1) IN ('0', '1')
       |      THEN 1 ELSE 0 END)) AS b
       |  FROM t),
       |c AS (SELECT doc_id, pos, tok, b,
       |    sum(b) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS UNBOUNDED PRECEDING) - b AS cid
       |  FROM p),
       |ch AS (SELECT doc_id, cid,
       |    md5(string_agg(tok, ' ' ORDER BY pos)) AS h,
       |    CAST(count(*) AS BIGINT) AS n_toks
       |  FROM c GROUP BY doc_id, cid),
       |dup AS (SELECT h FROM ch GROUP BY h
       |  HAVING count(DISTINCT doc_id) >= 2)
       |SELECT ch.doc_id,
       |  CAST(sum(ch.n_toks) AS BIGINT) AS n_tokens,
       |  CAST(count(*) AS BIGINT) AS n_chunks,
       |  CAST(sum(CASE WHEN dup.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS dup_chunks,
       |  (1000000 * CAST(sum(CASE WHEN dup.h IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT)) // CAST(count(*) AS BIGINT) AS dup_ppm
       |FROM ch LEFT JOIN dup ON ch.h = dup.h
       |GROUP BY ch.doc_id
       |ORDER BY ch.doc_id""".stripMargin

  val cdcQ: Q = Q(
    "t_cdc_chunk",
    Some(oracleSql),
    (s, d) => chunkStats(Tables.fanout(Tables.documents(s, d))).orderBy(col("doc_id")))

  def all: Seq[Q] = Seq(cdcQ)
}
