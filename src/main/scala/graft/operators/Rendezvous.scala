package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.registry.Q

/** Rendezvous (highest-random-weight) sharding — Thaler & Ravishankar
  * 1996, the consistent placement rule behind cache rings and shard
  * maps: doc d lands on the shard s maximizing hash(d, s). Its defining
  * property is MINIMAL MOVEMENT: growing N → N+1 shards relocates only
  * the docs the NEW shard wins (expected 1/(N+1) of the corpus);
  * mod-N hashing would relocate almost everything.
  *
  * The output carries the assignment under 8 shards, under 9, and the
  * moved flag, so the driver-checked result PINS the property: every
  * moved doc must land on the new shard (asserted in the spec; visible
  * in the oracle-checked rows).
  *
  * Exact engine parity: weight = md5(doc_id|s) hex string, argmax by
  * lexicographic max with the '|'-suffix idiom (single-digit shard ids,
  * so the suffix never distorts the order and split_part recovers the
  * winner). Scale shape: pure map — the whole operator is one narrow
  * projection over the corpus, zero joins, zero shuffles before the
  * presentation sort; at 100 TB it is a pass-through scan.
  */
object Rendezvous {

  val NBase = 8
  val NGrown = 9

  private def shardExpr(n: Int): String =
    s"""CAST(split_part(array_max(transform(sequence(0, ${n - 1}),
       |  s -> concat(md5(concat_ws('|', CAST(doc_id AS STRING),
       |    CAST(s AS STRING))), '|', CAST(s AS STRING)))), '|', 2)
       |  AS BIGINT)""".stripMargin

  def assign(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      expr(shardExpr(NBase)).as("shard8"),
      expr(shardExpr(NGrown)).as("shard9"))
      .withColumn("moved", (col("shard8") =!= col("shard9")).cast("long"))

  // single-line on purpose: this fragment is interpolated into a
  // stripMargin'd query, where a continuation line starting with `||`
  // would lose its first pipe to the margin strip
  private def shardSql(n: Int): String =
    s"CAST(split_part(list_max(list_transform(generate_series(0, ${n - 1}), " +
      "s -> md5(CAST(doc_id AS VARCHAR) || '|' || CAST(s AS VARCHAR)) " +
      "|| '|' || CAST(s AS VARCHAR))), '|', 2) AS BIGINT)"

  private val oracleSql: String =
    s"""SELECT doc_id,
       |  ${shardSql(NBase)} AS shard8,
       |  ${shardSql(NGrown)} AS shard9,
       |  CAST(${shardSql(NBase)} <> ${shardSql(NGrown)} AS BIGINT) AS moved
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  val hrwQ: Q = Q(
    "x_hrw_shard",
    Some(oracleSql),
    (s, d) => assign(Tables.documents(s, d)).orderBy(col("doc_id")))

  def all: Seq[Q] = Seq(hrwQ)
}
