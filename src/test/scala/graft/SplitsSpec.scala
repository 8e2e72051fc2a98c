package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Splits

/** Deterministic split/sampling properties: stability under layout
  * changes (the property Spark's randomSplit lacks), expected
  * proportions, per-stratum rates. */
class SplitsSpec extends SparkSpec {

  test("assignment is a pure function of the key: repartitioning changes nothing") {
    val docs = Tables.documents(spark, sf()).select(col("doc_id"))
    val a = Splits.assignSplit(docs, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = Splits.assignSplit(docs.repartition(13), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a === b)
  }

  test("80/10/10 split lands near its proportions") {
    val docs = Tables.documents(spark, sf()).select(col("doc_id"))
    val n = docs.count().toDouble
    val counts = Splits.assignSplit(docs, "doc_id")
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") / n - 0.8) < 0.06)
    assert(math.abs(counts("val") / n - 0.1) < 0.05)
    assert(math.abs(counts("test") / n - 0.1) < 0.05)
  }

  test("stratified sampling applies per-stratum rates") {
    val docs = Tables.documents(spark, sf()).select(col("doc_id"), col("lang"))
    val base = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Splits.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 10), defaultRate = 50)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // en downsampled to ~10%, everything else ~50%
    assert(math.abs(kept("en").toDouble / base("en") - 0.10) < 0.06)
    for ((l, c) <- base if l != "en" && c >= 20)
      assert(math.abs(kept.getOrElse(l, 0L).toDouble / c - 0.50) < 0.15,
        s"lang $l: kept ${kept.getOrElse(l, 0L)} of $c")
  }

  test("domain mix hits each domain's quota exactly and is layout-stable") {
    val docs = Tables.documents(spark, sf()).select(col("doc_id"), col("source"))
    val minCount = docs.groupBy("source").count()
      .agg(min(col("count"))).collect()(0).getLong(0)
    val quota = minCount * 80 / 100

    val mixed = Splits.domainMix(docs, "doc_id", "source")
    val perDomain = mixed.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // exact equal mixture: every domain lands on the SAME quota
    assert(perDomain.values.toSet === Set(quota))

    // and the selected SET is a pure function of keys, not layout
    val a = mixed.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Splits.domainMix(docs.repartition(17), "doc_id", "source")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
  }

  test("domain mix budget floors (never rounds up past the scarcest domain)") {
    import spark.implicits._
    // 3 domains with 7/9/30 rows: quota = floor(7*80/100) = 5, and the
    // rounding direction matters (7*80/100 = 5.6 would round to 6)
    val df = ((1 to 7).map(i => (i.toLong, "a")) ++
      (101 to 109).map(i => (i.toLong, "b")) ++
      (201 to 230).map(i => (i.toLong, "c"))).toDF("doc_id", "source")
    val got = Splits.domainMix(df, "doc_id", "source")
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 5L, "b" -> 5L, "c" -> 5L))
  }

  test("split assignment is key-stable: a subset sees identical buckets") {
    val docs = Tables.documents(spark, sf()).select(col("doc_id"))
    val full = Splits.assignSplit(docs, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sub = Splits.assignSplit(docs.filter(col("doc_id") % 3 === 0), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, b) <- sub) assert(full(id) === b)
  }

  test("domain upsampling: integer epochs hit min(cap, T div n) exactly") {
    import spark.implicits._
    // domains: a=8 (largest, 1 epoch), b=4 (8//4=2), c=2 (8//2=4),
    // d=1 (8//1=8 -> capped at 4)
    val df = ((1 to 8).map(i => (i.toLong, "a")) ++
      (101 to 104).map(i => (i.toLong, "b")) ++
      (201 to 202).map(i => (i.toLong, "c")) ++
      Seq((301L, "d"))).toDF("doc_id", "source")
    val up = Splits.domainUpsample(df, "doc_id", "source")
    val per = up.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(per === Map("a" -> 8L, "b" -> 8L, "c" -> 8L, "d" -> 4L))
    // copy indices are exactly 0..n_epochs-1, no gaps, no dups
    val copies = up.filter(col("doc_id") === 201L)
      .select("copy").collect().map(_.getLong(0)).toSet
    assert(copies === Set(0L, 1L, 2L, 3L))
    // deterministic under layout changes
    val a = up.select("doc_id", "copy")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Splits.domainUpsample(df.repartition(7), "doc_id", "source")
      .select("doc_id", "copy")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }

  test("corpus shuffle: complete deterministic permutation, layout- and salt-contracts") {
    val docs = Tables.documents(spark, sf()).select(col("doc_id"))
    val n = docs.count()
    val out = Splits.corpusShuffle(docs, "doc_id", shards = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length.toLong === n, "every row keeps exactly one slot")
    assert(out.forall(r => r._2 >= 0 && r._2 < 16))
    // per-shard positions are 1..count with no gaps — (shard, pos) is a
    // total order over the corpus
    out.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq,
        s"shard $shard positions must be contiguous from 1")
    }
    // pure function of the key: layout changes nothing
    val b = Splits.corpusShuffle(docs.repartition(13), "doc_id", shards = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out.toSet === b)
    // a new salt re-randomizes the epoch order
    val c = Splits.corpusShuffle(docs, "doc_id", shards = 16, salt = "epoch2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out.toSet !== c, "changing the salt must produce a different order")
  }

  test("budget select: per-domain budget respected by a maximal quality prefix") {
    val docs = Tables.documents(spark, sf())
      .select(col("doc_id"), col("source"), col("text"))
    val budget = 600L
    val kept = Splits.budgetSelect(docs, "doc_id", "source", "text", budget)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(kept.nonEmpty)
    assert(kept.forall(_._5 <= budget), "running token count must fit the budget")
    kept.groupBy(_._2).foreach { case (src, rows) =>
      // the prefix is maximal: the next doc in quality order would
      // overflow — equivalently the fill is within one doc of the budget
      val fill = rows.map(_._3).sum
      assert(fill === rows.map(_._5).max, s"$src: cum must equal the prefix sum")
    }
    // proper selection (the corpus has more tokens than the budget allows)
    assert(kept.length < docs.count())
    // layout-stable
    val b = Splits.budgetSelect(docs.repartition(11), "doc_id", "source", "text", budget)
      .collect().map(_.getLong(0)).toSet
    assert(kept.map(_._1).toSet === b)
  }

  test("temperature sampling flattens the mixture with exact integer quotas") {
    val docs = Tables.documents(spark, sf()).select(col("doc_id"), col("lang"))
    val counts = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val budget = counts.values.sum * 60 / 100
    val sumW = counts.values.map(n => math.sqrt(n.toDouble).toLong).sum
    val out = Splits.domainTemperature(docs, "doc_id", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val kept = out.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    // quotas match the integer formula exactly
    for ((lang, n) <- counts) {
      val expect = math.min(n, budget * math.sqrt(n.toDouble).toLong / sumW)
      assert(kept.getOrElse(lang, 0L) === expect, s"lang $lang")
      assert(out.filter(_._2 == lang).forall(_._4 == expect))
    }
    // flattening: the dominant domain keeps a SMALLER fraction than any
    // scarce domain (τ=0.5 upweights the tail)
    val fracs = counts.map { case (l, n) => l -> kept.getOrElse(l, 0L).toDouble / n }
    val (domLang, _) = counts.maxBy(_._2)
    for ((l, f) <- fracs if l != domLang)
      assert(fracs(domLang) < f, s"dominant $domLang must be flattened below $l")
  }

  test("negative sampling: k ring partners per doc, never self, layout-stable") {
    val docs = Tables.documents(spark, sf()).select(col("doc_id"))
    val out = Splits.negativeSamples(docs, "doc_id", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    assert(out.forall(r => r._1 != r._3), "a doc is never its own negative")
    // reconstruct shard sizes to check the per-doc contract exactly:
    // a doc on a shard with n > k gets exactly k DISTINCT partners
    val shardOf = Splits.corpusShuffle(docs, "doc_id", shards = 64, salt = "neg")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sizes = shardOf.values.groupBy(identity).view.mapValues(_.size).toMap
    val byDoc = out.groupBy(_._1)
    byDoc.foreach { case (id, rows) =>
      if (sizes(shardOf(id)) > 5) {
        assert(rows.length === 4, s"doc $id")
        assert(rows.map(_._3).distinct.length === 4, s"doc $id partners distinct")
      }
      // partners always come from the doc's own shard
      rows.foreach(r => assert(shardOf(r._3) === shardOf(id)))
    }
    val b = Splits.negativeSamples(docs.repartition(9), "doc_id", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out.toSet === b)
  }

  test("rarity: mean inverse unigram frequency, exact integer") {
    import spark.implicits._
    // corpus: C(x)=6, C(y)=1, M=7; doc0 = avg of five (7 div 6)=1 -> 1;
    // doc1 = (7 div 6 + 7 div 1) div 2 = (1+7) div 2 = 4
    val docs = Seq((0L, "x x x x x"), (1L, "x y")).toDF("doc_id", "text")
    val rows = graft.pipeline.PipelineQueries.rarityOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows(0L) === ((5L, 1L)))
    assert(rows(1L) === ((2L, 4L)))
    // real corpus: one row per doc, rarity >= 1 (M div C >= 1 always)
    val real = graft.pipeline.PipelineQueries.rarity.run(spark, sf())
    assert(real.count() === Tables.documents(spark, sf()).count())
    assert(real.filter(col("rarity") < 1).count() === 0L)
  }

  test("dsir: exact hand-computed weights on a disjoint-vocab toy") {
    import spark.implicits._
    // cr(aa)=2 ct(aa)=2; cr(bb)=2 ct(bb)=0; Traw=4 Ttgt=2 -> rho=2e6
    // w(aa) = ((2*1e6 div 2) * 2e6) div 1e6 = 2e6; w(bb)=0
    val docs = Seq(
      (0L, "aa aa", "en"), (1L, "bb bb", "zh")).toDF("doc_id", "text", "lang")
    val rows = graft.pipeline.PipelineQueries.dsirOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows(0L) === ((2L, 2000000L)))
    assert(rows(1L) === ((2L, 0L)))
  }

  test("bigram LM: hand-computed conditional ppm; shuffled text scores lower") {
    import spark.implicits._
    // corpus pairs: doc0 = (a b)(b a)(a b), doc1 = (a c)
    // c2: (a,b)=2 (b,a)=1 (a,c)=1; c1: a=3, b=1
    // w(a,b) = 2e6 div 3 = 666666; w(b,a) = 1e6; w(a,c) = 1e6 div 3 = 333333
    // doc0 = (666666 + 1000000 + 666666) div 3 = 777777; doc1 = 333333
    val docs = Seq((0L, "a b a b"), (1L, "a c")).toDF("doc_id", "text")
    val r = graft.pipeline.PipelineQueries.bigramLmOf(docs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r(0L) === ((3L, 777777L)))
    assert(r(1L) === ((1L, 333333L)))
    // single-token / empty docs: zero pairs, score 0, still reported
    val deg = Seq((7L, "solo"), (8L, "")).toDF("doc_id", "text")
    val dr = graft.pipeline.PipelineQueries.bigramLmOf(deg).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(dr === Map(7L -> ((0L, 0L)), 8L -> ((0L, 0L))))
    // real corpus: every doc reported, fluency within (0, 1e6]
    val real = graft.pipeline.PipelineQueries.bigramLm.run(spark, sf())
    assert(real.count() === Tables.documents(spark, sf()).count())
    assert(real.filter(col("fluency") < 0 || col("fluency") > 1000000).count() === 0L)
  }

  test("dsir: target-language docs outrank every other language's mean") {
    val d = graft.pipeline.PipelineQueries.dsirScore.run(spark, sf())
      .join(Tables.documents(spark, sf()).select("doc_id", "lang"), "doc_id")
    val means = d.groupBy(col("lang")).agg(avg(col("dsir")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    means.filter(_._1 != "en").foreach { case (l, m) =>
      assert(means("en") > m, s"en ${means("en")} !> $l $m")
    }
    // every doc scored, none negative
    assert(d.count() === Tables.documents(spark, sf()).count())
    assert(d.filter(col("dsir") < 0).count() === 0L)
  }
}
