package graft

import org.apache.spark.sql.functions._

import graft.operators.FuzzyMatch

/** Blocked ER contracts: pairs share the block key, are canonical
  * (a < b, no mirror duplicates), within threshold, and the kernel runs
  * on distinct names — candidate volume is vocabulary-, not row-sized. */
class FuzzyMatchSpec extends SparkSpec {

  test("every match shares the head noun, is canonical, and dist <= 3") {
    val m = FuzzyMatch.fuzzyQ.run(spark, sf()).collect()
    assert(m.nonEmpty)
    m.foreach { r =>
      val (a, b, d) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(a < b, s"non-canonical pair $a / $b")
      assert(a.split(" ")(1) === b.split(" ")(1), s"cross-block pair $a / $b")
      assert(d >= 1 && d <= 3, s"distance $d out of range for $a / $b")
    }
    // no mirror duplicates
    val keys = m.map(r => (r.getString(0), r.getString(1)))
    assert(keys.distinct.length === keys.length)
  }

  test("carrier counts sum back to the part table per matched name") {
    val parts = Tables.part(spark, sf())
    val byName = parts.groupBy(col("p_name")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    FuzzyMatch.fuzzyQ.run(spark, sf()).collect().foreach { r =>
      assert(r.getLong(3) === byName(r.getString(0)))
      assert(r.getLong(4) === byName(r.getString(1)))
    }
  }
}
