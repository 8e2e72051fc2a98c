package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{PqIndex, Quantize}

/** Product-quantization contracts: the grouped Lloyd trains a real
  * codebook (inertia descends), the code table is a true per-subspace
  * argmin, ADC decomposes into the partial-distance table, and the
  * shortlist-plus-refine path recovers the exact int8 L2 neighbors. */
class PqIndexSpec extends SparkSpec {

  private def qdf() =
    Quantize.quantized(Tables.embeddings(spark, sf()))
      .select(col("vec_id"), col("q"))

  test("code table: M codes per vector, codes in range, dists non-negative") {
    val codes = PqIndex.codes(spark, sf()).collect()
    val n = qdf().count()
    assert(codes.length.toLong === n * PqIndex.M)
    codes.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) < PqIndex.K, "code out of range")
      assert(r.getLong(3) >= 0, "squared distance cannot be negative")
    }
    // every vector covers subs 0..M-1 exactly once
    val bySub = codes.groupBy(r => r.getLong(0)).values
    bySub.foreach { rows =>
      assert(rows.map(_.getLong(1)).sorted.toSeq === (0L until PqIndex.M).toSeq)
    }
  }

  test("encoding is the exact argmin against the final codebooks") {
    val (cents, codes) = PqIndex.trainEncode(qdf())
    val cm = cents.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getSeq[Long](2)).toMap
    val qs = qdf().collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // sample: re-verify the argmin (dist, code) for every row of 10 vectors
    val sample = codes.filter(col("vec_id") < 10).collect()
    assert(sample.nonEmpty)
    sample.foreach { r =>
      val (vid, sub, c, dist) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val sq = qs(vid).slice(sub.toInt * PqIndex.SubDims, (sub.toInt + 1) * PqIndex.SubDims)
      val best = cm.collect { case ((s, code), v) if s == sub =>
        (v.zip(sq).map { case (a, b) => (a - b) * (a - b) }.sum, code)
      }.min
      assert((dist, c) === best, s"vec $vid sub $sub")
    }
  }

  test("Lloyd inertia descends across iterations") {
    val q = qdf()
    val inertia = (1 to PqIndex.Iters).map { it =>
      PqIndex.trainEncode(q, iters = it)._2
        .agg(sum(col("dist"))).collect()(0).getLong(0)
    }
    inertia.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a, s"inertia must not increase: $inertia")
    }
  }

  test("rerank recovers the exact int8 L2 neighbors (recall floor)") {
    val q = qdf().collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val exact = q.keys.filter(_ < 10).map { qid =>
      qid -> q.keys.filter(_ != qid)
        .map(n => (d2(q(qid), q(n)), n)).toSeq.sorted.take(5).map(_._2).toSet
    }.toMap
    val got = PqIndex.annPqRerank(spark, sf()).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exact.map { case (qid, e) =>
      e.intersect(got.getOrElse(qid, Set.empty)).size.toDouble / e.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean rerank recall@5 too low: $mean")
  }

  test("ADC scores decompose into the partial-distance table") {
    val (cents, codes) = PqIndex.trainEncode(qdf())
    val cm = cents.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getSeq[Long](2)).toMap
    val cds = codes.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val qs = qdf().collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val adc = PqIndex.annPq(spark, sf()).collect()
    assert(adc.nonEmpty)
    adc.take(20).foreach { r =>
      val (qid, nid, score) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val expect = (0 until PqIndex.M).map { sub =>
        val sq = qs(qid).slice(sub * PqIndex.SubDims, (sub + 1) * PqIndex.SubDims)
        val code = cds((nid, sub.toLong))
        cm((sub.toLong, code)).zip(sq).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sum
      assert(score === expect, s"q $qid n $nid")
    }
  }

  test("codes are a pure function of the corpus, not layout") {
    val a = PqIndex.trainEncode(qdf())._2.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = PqIndex.trainEncode(qdf().repartition(13))._2.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
  }
}
