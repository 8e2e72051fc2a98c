package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.analytics.HopPlot
import graft.functions.GraftFunctions
import graft.operators.Salted

/** ScalaCheck-generated cases over the engine's algebraic invariants
  * (generators driven directly with fixed seeds — deterministic runs,
  * no scalatestplus bridge needed). */
class PropertySpec extends SparkSpec {

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val smallId = Gen.chooseNum(0L, (1L << 31) - 1)

  test("pack_pair: symmetric, order-canonical, invertible (20 seeded cases)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    (1L to 20L).foreach { seed =>
      val pairs = sample(Gen.listOfN(30, Gen.zip(smallId, smallId)), seed)
      val packed = pairs.toDF("a", "b")
        .select(GraftFunctions.pack_pair(col("a"), col("b")).as("k"))
        .collect().map(_.getLong(0))
      packed.zip(pairs).foreach { case (k, (a, b)) =>
        val (lo, hi) = (math.min(a, b), math.max(a, b))
        assert(k === ((lo << 32) | hi))
        assert((k >>> 32) === lo && (k & 0xFFFFFFFFL) === hi)
      }
    }
  }

  test("salted aggregation equals direct aggregation for random data/salts") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    (1L to 5L).foreach { seed =>
      val rows = sample(Gen.listOfN(60,
        Gen.zip(Gen.oneOf("a", "b", "c"), Gen.chooseNum(0, 10000))), seed)
      val salts = sample(Gen.chooseNum(1, 32), seed + 100)
      val df = rows.toDF("k", "v")
      val direct = df.groupBy(col("k")).agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val salted = Salted.saltedAgg(df, "k", salts,
        "s" -> sum(col("v")), "n" -> count(lit(1)))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(salted === direct, s"seed=$seed salts=$salts")
    }
  }

  test("hop-plot: g(d) monotone, final pct 1.0, pairs bounded by C(n,2)") {
    import spark.implicits._
    (1L to 5L).foreach { seed =>
      val n = sample(Gen.chooseNum(2, 12), seed)
      val stride = sample(Gen.chooseNum(3, 17), seed + 50)
      val es = (0 until 2 * n)
        .map(i => ((i % n).toLong, ((i * stride + 1) % n).toLong))
        .filter { case (a, b) => a != b }
      if (es.nonEmpty) {
        val rows = HopPlot.hopPlotRows(spark, es.toDF("src", "dst"))
        assert(rows.map(_.g_d) === rows.map(_.g_d).sorted, s"seed=$seed")
        if (rows.nonEmpty) {
          assert(rows.last.pct === 1.0)
          assert(rows.last.g_d <= n.toLong * (n - 1) / 2)
        }
      }
    }
  }

  test("effective diameter lies within the hop-plot's distance range") {
    import spark.implicits._
    Seq(3, 5, 8, 10).foreach { n =>
      val chain = (1L to n.toLong).sliding(2).map(s => (s(0), s(1))).toSeq
      val ed = HopPlot.effectiveDiameter(spark, chain.toDF("src", "dst"))
        .head.getDouble(0)
      assert(ed >= 1.0 && ed <= (n - 1).toDouble, s"n=$n ed=$ed")
    }
  }
}
