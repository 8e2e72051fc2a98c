package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.registry.Q

/** Z-order (Morton) clustering — the write-time layout for
  * MULTI-dimensional data skipping: a linear sort makes file-level
  * min/max stats tight in one column and useless in every other, while
  * interleaving the key bits keeps every file's bounding box small in
  * BOTH dimensions, so a predicate on either column (or both) skips
  * most files at 100 TB (ZOrderSpec measures the bounding boxes).
  *
  * The z-value is plain bit arithmetic over builtin (codegen'd)
  * shift/and functions — engine-portable exactly, so x_zorder is
  * strict-hash oracle-checked against the same formula in DuckDB.
  */
object ZOrderStore {

  /** Interleave the low `bits` bits of x (even positions) and y (odd):
    * z = Σ_i ((x>>i)&1)<<2i | ((y>>i)&1)<<(2i+1). Inputs must already
    * be non-negative and < 2^bits (callers range-normalize first). */
  def zValue(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftrightunsigned(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** The identical formula as DuckDB SQL over column expressions. */
  def zValueSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"(((($x) >> $i) & 1) << ${2 * i}) + (((($y) >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  /** Write df clustered by z(x, y): range-partition on the z-value, sort
    * within partitions, one file per range — every file covers a compact
    * square-ish region of (x, y) space. */
  def writeZOrdered(df: DataFrame, path: String, x: String, y: String,
      files: Int, bits: Int = 16): Unit =
    df.withColumn("__z", zValue(col(x), col(y), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  // ---- registry entry ---------------------------------------------------

  val zorderQ: Q = Q(
    "x_zorder",
    Some(s"""SELECT c_custkey,
            |  ${zValueSql("c_custkey % 65536", "c_nationkey % 65536")} AS z
            |FROM customer ORDER BY c_custkey""".stripMargin),
    (s, d) =>
      Tables.customer(s, d).select(
        col("c_custkey"),
        zValue(col("c_custkey") % 65536, col("c_nationkey") % 65536).as("z"))
        .orderBy(col("c_custkey")))

  val all: Seq[Q] = Seq(zorderQ)
}
