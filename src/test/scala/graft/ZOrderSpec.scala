package graft

import org.apache.spark.sql.functions._

import graft.sources.ZOrderStore

/** Z-order layout: the measurable claim is per-file bounding boxes that
  * are small in BOTH dimensions, where a linear sort is tight in one and
  * full-width in the other. */
class ZOrderSpec extends SparkSpec {

  test("zValue interleaves bits (known values)") {
    import spark.implicits._
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("x", "y")
      .select(ZOrderStore.zValue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    // interleave(3=0b011, 5=0b101) = y2 x2 y1 x1 y0 x0 = 1 0 0 1 1 1 = 0b100111
    assert(got === Array(0L, 1L, 2L, 0x27L, (1L << 32) - 1))
  }

  /** Mean fraction of each column's domain covered per file. */
  private def meanCoverage(path: String, cols: Seq[String]): Map[String, Double] = {
    val df = spark.read.parquet(path)
      .withColumn("__f", input_file_name())
    val domain = cols.map { c =>
      val r = df.agg(min(col(c)), max(col(c))).head
      c -> math.max(1L, r.getLong(1) - r.getLong(0))
    }.toMap
    cols.map { c =>
      val spans = df.groupBy(col("__f"))
        .agg((max(col(c)) - min(col(c))).as("span"))
        .agg(avg(col("span"))).head.getDouble(0)
      c -> spans / domain(c)
    }.toMap
  }

  test("z-ordered files are compact in both dims; linear sort is not") {
    // synthetic uniform grid so the geometry is unambiguous
    import spark.implicits._
    val grid = (0 until 256).flatMap(x => (0 until 256).map(y =>
      (x.toLong, y.toLong))).toDF("x", "y")

    val zPath = java.nio.file.Files.createTempDirectory("zorder").toString
    ZOrderStore.writeZOrdered(grid, zPath, "x", "y", files = 16, bits = 8)
    val zCov = meanCoverage(zPath, Seq("x", "y"))

    val linPath = java.nio.file.Files.createTempDirectory("linear").toString
    grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(linPath)
    val linCov = meanCoverage(linPath, Seq("x", "y"))

    // 16 z-range files over a 256x256 grid ≈ 64x64 quadrants: ~25% of
    // each domain per file; linear sort: ~6% in x but ~100% in y
    assert(zCov("x") < 0.5 && zCov("y") < 0.5,
      s"z-order not compact: $zCov")
    assert(linCov("y") > 0.9, s"expected full-width y under linear sort: $linCov")
    assert(zCov("y") < linCov("y") / 2)
  }
}
