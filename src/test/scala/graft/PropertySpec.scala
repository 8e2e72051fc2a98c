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

  test("histogram median/MAD equals the sort-based reference on random groups") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    (1L to 8L).foreach { seed =>
      val rows = sample(Gen.listOfN(80, Gen.zip(
        Gen.oneOf("g1", "g2", "g3"), Gen.chooseNum(0L, 30L))), seed)
        .zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      val out = graft.operators.RobustStats
        .madOutliers(rows.toDF("id", "g", "v"), "id", "g", "v")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      // reference: lower median by explicit sort
      def lowerMedian(xs: Seq[Long]): Long =
        xs.sorted.apply(((xs.size + 1) / 2) - 1)
      rows.groupBy(_._2).foreach { case (g, grp) =>
        val vs = grp.map(_._3)
        val med = lowerMedian(vs)
        val mad = lowerMedian(vs.map(v => math.abs(v - med)))
        grp.foreach { case (id, _, v) =>
          val (m, d, o) = out(id)
          assert(m === med && d === mad, s"seed=$seed g=$g")
          assert(o === (if (math.abs(v - med) > 3 * mad) 1L else 0L))
        }
      }
    }
  }

  test("percentile ranks are monotone in the value and bounded (random groups)") {
    import spark.implicits._
    (1L to 8L).foreach { seed =>
      val rows = sample(Gen.listOfN(60, Gen.zip(
        Gen.oneOf("a", "b"), Gen.chooseNum(0L, 20L))), seed)
        .zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      val out = graft.operators.RobustStats
        .percentileRank(rows.toDF("id", "g", "v"), "id", "g", "v")
        .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
      out.groupBy(_._1).foreach { case (_, grp) =>
        val byV = grp.distinct.sortBy(_._2).toSeq
        byV.sliding(2).foreach {
          case Seq(x, y) => assert(x._3 < y._3, s"seed=$seed: $x !< $y")
          case _ =>
        }
        assert(byV.forall(p => p._3 > 0 && p._3 <= 1000000L))
      }
    }
  }

  test("CDC chunks reassemble losslessly for random token lists") {
    import spark.implicits._
    (1L to 6L).foreach { seed =>
      val texts = sample(Gen.listOfN(5, Gen.listOfN(40,
        Gen.oneOf((1 to 30).map(i => s"w$i")))), seed)
        .zipWithIndex.map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
      val stats = graft.pipeline.CdcChunk
        .chunkStats(texts.toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      texts.foreach { case (id, t) =>
        assert(stats(id) === t.split("\\s+").length.toLong, s"seed=$seed doc=$id")
      }
    }
  }

  test("HRW sharding: the movement law holds for random key sets") {
    import spark.implicits._
    (1L to 6L).foreach { seed =>
      val ids = sample(Gen.listOfN(80, Gen.chooseNum(0L, 1L << 40)), seed)
        .distinct
      val out = graft.operators.Rendezvous.assign(ids.toDF("doc_id"))
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      out.foreach { case (s8, s9, moved) =>
        assert(s8 >= 0 && s8 < 8 && s9 >= 0 && s9 < 9)
        if (moved == 1L) assert(s9 === 8L, s"seed=$seed moved to $s9")
        else assert(s8 === s9)
      }
    }
  }

  test("PNG encode/parse round-trips for random geometry") {
    // dims bounded so w*h*channels stays under the encoder's documented
    // MaxEncodeSamples cap (the real-IDAT encoder buffers the raw
    // scanlines; geometry past the cap is refused below)
    (1L to 30L).foreach { seed =>
      val w = sample(Gen.chooseNum(1, 1 << 12), seed)
      val h = sample(Gen.chooseNum(1, 1 << 10), seed + 50)
      val ct = sample(Gen.oneOf(0, 2, 3, 4, 6), seed + 100)
      val hd = graft.functions.PngCodec.parseHeaderRaw(
        graft.functions.PngCodec.encode(w, h, ct, seed))
      assert(hd != null && hd.toSeq === Seq(w.toLong, h.toLong, 8L, ct.toLong))
    }
    // past the cap: refuse with null, never OOM
    assert(graft.functions.PngCodec.encode(1 << 24, 1 << 20, 6, 1L) == null)
  }

  test("PNG pixel stats round-trip the formula for random geometry") {
    (1L to 12L).foreach { seed =>
      val w = sample(Gen.chooseNum(1, 96), seed)
      val h = sample(Gen.chooseNum(1, 64), seed + 50)
      val ct = sample(Gen.oneOf(0, 2, 4, 6), seed + 100)
      val ch = graft.functions.PngCodec.channelsOf(ct)
      val s = graft.functions.PngCodec.pixelStatsRaw(
        graft.functions.PngCodec.encode(w, h, ct, seed))
      assert(s != null)
      assert(s.take(4).toSeq === Seq(w.toLong, h.toLong, ch.toLong, w.toLong * h))
      (0 until 4).foreach { c =>
        val vs = for (y <- 0 until h; x <- 0 until w)
          yield graft.functions.PngCodec.pixelByte(seed, x, y, c).toLong
        assert(s(4 + c) === (if (c < ch) vs.sum else 0L), s"sum c$c")
        assert(s(8 + c) === (if (c < ch) vs.max else 0L), s"peak c$c")
      }
    }
  }
}
