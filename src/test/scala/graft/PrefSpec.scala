package graft

import org.apache.spark.sql.functions.col

import graft.pipeline.Pref

/** Preference-pair validation contracts: every planted defect class is
  * live and recovered from the PARSED JSON; verdicts are DERIVED from
  * the record (not attributed to the plants), so composite plants and
  * chance-degenerate pairs need no special casing. */
class PrefSpec extends SparkSpec {

  test("every planted defect class is live and recovered from the parse") {
    val out = Pref.validate(Pref.withPrefPairs(Tables.documents(spark, sf())))
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(4), r.getBoolean(5),
        r.getBoolean(6), r.getBoolean(7)))
    assert(out.nonEmpty)
    out.foreach { case (id, degen, empty, extend, valid) =>
      // plants IMPLY their flag (derivation may flag more, never less)
      if (id % 11 == 3) assert(degen, s"doc $id: %11 plant must be degenerate")
      if (id % 13 == 5) assert(empty, s"doc $id: %13 plant must have empty chosen")
      if (id % 17 == 7 && id % 13 != 5 && id % 11 != 3)
        assert(extend, s"doc $id: %17 plant must extend chosen")
      assert(valid === (!degen && !empty && !extend), s"doc $id composite")
    }
    assert(out.exists(_._2) && out.exists(_._3) && out.exists(_._4))
    assert(out.exists(_._5), "clean pairs must exist")
  }

  test("composite plants flag compositely (empty AND degenerate)") {
    import spark.implicits._
    // doc_id 135 ≡ 3 (mod 11) ∧ ≡ 5 (mod 13): chosen empties, rejected
    // copies the empty chosen → degenerate AND empty, both derived
    val docs = Seq((135L, "one two three four five six seven eight nine"))
      .toDF("doc_id", "text")
    val r = Pref.validate(Pref.withPrefPairs(docs)).collect().head
    assert(r.getBoolean(4) && r.getBoolean(5), r.toString)
    assert(!r.getBoolean(7))
  }

  test("the pref column is real JSON with the three fields") {
    val one = Pref.withPrefPairs(Tables.documents(spark, sf()))
      .filter(col("doc_id") === 0L).collect().head.getString(1)
    assert(one.contains("\"prompt\":\"") && one.contains("\"chosen\":\"") &&
      one.contains("\"rejected\":\""))
  }

  test("a chance-degenerate pair (no plant) is still flagged — derivation, not attribution") {
    import spark.implicits._
    // doc_id 1 carries no plant; slices crafted equal: L=9, p=3, c=3 →
    // chosen = toks[4..6], rejected = toks[7..9], made identical
    val docs = Seq((1L, "p1 p2 p3 same same same same same same"))
      .toDF("doc_id", "text")
    val r = Pref.validate(Pref.withPrefPairs(docs)).collect().head
    assert(r.getBoolean(4), "chance-equal slices must flag degenerate")
    assert(!r.getBoolean(7))
  }
}
