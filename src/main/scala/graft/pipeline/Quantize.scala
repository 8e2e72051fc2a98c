package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.functions.GraftFunctions.array_dot_long
import graft.pipeline.PipelineQueries.requireBounded
import graft.registry.Q

/** Int8 embedding quantization — the memory-bandwidth lever of a
  * 100-TB similarity stack: a float32 embedding column is 4 bytes/dim,
  * its symmetric int8 quantization is 1 — so the candidate-verify scan
  * that dominates ANN cost reads 4x fewer bytes and runs on exact
  * integer arithmetic (codegen'd [[graft.functions.ArrayDotLong]], no
  * float summation order to pin).
  *
  * Scheme: per-vector symmetric max-abs — scale m = max|v_i|,
  * q_i = round(v_i * 127 / m) in [-127, 127] (0 when m = 0). The
  * round is floor(x + 0.5): identical IEEE double ops in Spark and
  * DuckDB, so the ORACLE replays quantization bit-exactly and every
  * quantized value is hash-gated — no tolerance entry needed even
  * though the input is float.
  *
  * Scale shape: quantization is a per-row narrow projection (quantize
  * once, cheap); the top-k scan shuffles only the bounded query side
  * and runs integer dots inside whole-stage codegen (scan fast,
  * repeatedly). The exact path stays requireBounded-gated like every
  * all-pairs baseline here.
  */
object Quantize {

  /** Adds (m = max|vd_i|, q = int8-in-long quantization of vd) to any
    * frame carrying a double-array `vd` column — shared with the IVF
    * int8-verify path in [[VectorIndex]] so the scheme cannot drift
    * between the audit queries and the scale path. */
  def withQuantized(df: DataFrame): DataFrame =
    df.withColumn("m", array_max(transform(col("vd"), x => abs(x))))
      .withColumn("q", transform(col("vd"), x =>
        when(col("m") === 0.0, lit(0L))
          .otherwise(floor(x * lit(127.0) / col("m") + lit(0.5)))))

  /** The same two columns in DuckDB SQL, appended to a CTE exposing
    * `vd`: `m` first (own CTE level), then `q` from (vd, m). */
  def quantSqlM(vd: String): String =
    s"list_max(list_transform($vd, x -> abs(x)))"

  def quantSqlQ(vd: String, m: String): String =
    s"""list_transform($vd, x -> CASE WHEN $m = 0 THEN 0
       |      ELSE CAST(floor(x * 127.0 / $m + 0.5) AS BIGINT) END)""".stripMargin

  /** embeddings -> (vec_id, vd double[], m, q long[] in [-127,127]). */
  def quantized(emb: DataFrame): DataFrame =
    withQuantized(emb.select(
      col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("vd")))

  private def l1(q: Column): Column =
    aggregate(q, lit(0L), (acc, x) => acc + abs(x))

  /** Per-vector quantization audit: md5 over every quantized value plus
    * exact integer summaries — a flipped sign, an off-by-one round, or
    * a clamp bug anywhere hash-fails. */
  val quantizeQ: Q = Q(
    "sim_quantize_int8",
    Some("""WITH n AS (
           |  SELECT vec_id,
           |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
           |  FROM embeddings),
           |mm AS (
           |  SELECT vec_id, vd,
           |    list_max(list_transform(vd, x -> abs(x))) AS m FROM n),
           |qq AS (
           |  SELECT vec_id,
           |    list_transform(vd, x -> CASE WHEN m = 0 THEN 0
           |      ELSE CAST(floor(x * 127.0 / m + 0.5) AS BIGINT) END) AS q
           |  FROM mm)
           |SELECT vec_id,
           |  md5(array_to_string(q, ',')) AS q_fp,
           |  CAST(list_min(q) AS BIGINT) AS q_min,
           |  CAST(list_max(q) AS BIGINT) AS q_max,
           |  CAST(list_sum(list_transform(q, x -> abs(x))) AS BIGINT) AS q_l1,
           |  CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS q_l2sq
           |FROM qq ORDER BY vec_id""".stripMargin),
    (s, d) =>
      quantized(Tables.embeddings(s, d))
        .select(
          col("vec_id"),
          md5(array_join(transform(col("q"), x => x.cast("string")), ","))
            .as("q_fp"),
          array_min(col("q")).as("q_min"),
          array_max(col("q")).as("q_max"),
          l1(col("q")).as("q_l1"),
          array_dot_long(col("q"), col("q")).as("q_l2sq"))
        .orderBy(col("vec_id")))

  /** Top-5 neighbors by exact INTEGER dot product over the quantized
    * vectors — the int8 twin of sim_ann_topk: same query set, same
    * tie-break, but the similarity is BIGINT (no round() hazard) and
    * the inner loop is the codegen'd integer dot. */
  val topkInt8Q: Q = Q(
    "sim_ann_topk_int8",
    Some("""WITH n AS (
           |  SELECT vec_id,
           |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
           |  FROM embeddings),
           |mm AS (
           |  SELECT vec_id, vd,
           |    list_max(list_transform(vd, x -> abs(x))) AS m FROM n),
           |qq AS (
           |  SELECT vec_id,
           |    list_transform(vd, x -> CASE WHEN m = 0 THEN 0
           |      ELSE CAST(floor(x * 127.0 / m + 0.5) AS BIGINT) END) AS q
           |  FROM mm),
           |p AS (
           |  SELECT a.vec_id AS qid, c.vec_id AS nid,
           |    CAST(list_sum(list_transform(generate_series(1, len(a.q)),
           |      i -> a.q[i] * c.q[i])) AS BIGINT) AS sim
           |  FROM qq a JOIN qq c ON a.vec_id <> c.vec_id
           |  WHERE a.vec_id < 10)
           |SELECT qid, nid, sim, rnk FROM (
           |  SELECT *, row_number() OVER (PARTITION BY qid
           |    ORDER BY sim DESC, nid) AS rnk FROM p)
           |WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin),
    (s, d) => {
      val n = quantized(Tables.embeddings(s, d))
      val q = requireBounded(n.filter(col("vec_id") < 10),
        "sim_ann_topk_int8 query side", 1024L)
        .select(col("vec_id").as("qid"), col("q").as("qv"))
      val c = n.select(col("vec_id").as("nid"), col("q").as("cv"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("sim").desc, col("nid"))
      q.join(c, col("qid") =!= col("nid"))
        .withColumn("sim", array_dot_long(col("qv"), col("cv")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("qid"), col("nid"), col("sim"),
          col("rnk").cast(LongType).as("rnk"))
        .orderBy(col("qid"), col("rnk"))
    })

  val all: Seq[Q] = Seq(quantizeQ, topkInt8Q)
}
