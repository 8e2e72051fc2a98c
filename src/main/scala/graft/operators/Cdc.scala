package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.registry.Q

/** CDC log application: fold an ordered change log into table state by
  * chaining MERGEs — the batch core of the lakehouse `foreachBatch`
  * upsert sink (streaming/Streams.UpsertSink drives exactly this per
  * micro-batch; StreamingSpec proves stream-of-merges == one batch
  * latest-per-key pass).
  *
  * Scale shape: each chunk reduction is one keyed window (partitioned,
  * no global sort) and each merge is one key-shuffle full-outer join —
  * state size stays |live keys|, never |log|; a 100-TB log folds in
  * seq-ordered chunks with bounded state.
  */
object Cdc {

  /** Latest row per key by `seq` — the within-chunk CDC reduction (two
    * changes to one key in a chunk: last wins, including tombstone-ness). */
  def latestPerKey(log: DataFrame, keys: Seq[String], seq: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(seq).desc)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Apply one log chunk to `target`: reduce to latest-per-key, then
    * MERGE (tombstones delete; deletes of absent keys are no-ops). */
  def applyLog(target: DataFrame, log: DataFrame, keys: Seq[String],
      seq: String, deleteWhen: Column): DataFrame =
    Merge.merge(target, latestPerKey(log, keys, seq), keys, Some(deleteWhen))
      .drop("action")

  // ---- registry entry ---------------------------------------------------

  /** events as a CDC log (key = user_id, seq = event_id, tombstone =
    * 'error'): folding four seq-ordered chunks through applyLog must
    * equal the direct latest-per-key state the oracle computes in one
    * window pass. */
  val cdcApplyQ: Q = Q(
    "x_cdc_apply",
    Some("""WITH ranked AS (
           |  SELECT user_id, event_id, event_type, value,
           |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
           |  FROM events)
           |SELECT user_id, event_id AS last_seq, event_type AS last_type,
           |  CAST(value AS DOUBLE) AS last_value
           |FROM ranked WHERE rn = 1 AND event_type <> 'error'
           |ORDER BY user_id""".stripMargin),
    (s, d) => {
      val log = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      val empty = log.limit(0)
      val maxRow = log.agg(max(col("event_id"))).head
      def shape(df: DataFrame) =
        df.select(col("user_id"), col("event_id").as("last_seq"),
          col("event_type").as("last_type"), col("value").as("last_value"))
          .orderBy(col("user_id"))
      if (maxRow.isNullAt(0)) shape(empty) // empty log → empty state
      else {
        val maxSeq = maxRow.getLong(0)
        val state = (1 to 4).foldLeft(empty) { (tgt, i) =>
          val lo = (i - 1).toLong * maxSeq / 4
          val hi = i.toLong * maxSeq / 4
          // first chunk unbounded below (seqs can start at 0), last
          // unbounded above — the chunks must cover the whole log
          val chunk = log.filter(
            (if (i == 1) lit(true) else col("event_id") > lo) &&
              (if (i == 4) lit(true) else col("event_id") <= hi))
          applyLog(tgt, chunk, Seq("user_id"), "event_id",
            col("event_type") === "error")
        }
        shape(state)
      }
    })

  val all: Seq[Q] = Seq(cdcApplyQ)
}
