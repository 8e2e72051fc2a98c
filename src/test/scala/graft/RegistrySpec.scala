package graft

import graft.registry.Registry

/** Registry contract checks at sf0.001: every query runs, names are
  * unique, oracle SQL exists for the SQL-expressible set. The value-level
  * correctness gate is the DuckDB compare (tools/check.py / driver t2);
  * this spec guards the Scala side cheaply.
  */
class RegistrySpec extends SparkSpec {

  test("query names are unique and non-empty") {
    val names = Registry.all.map(_.name)
    assert(names.nonEmpty)
    assert(names.distinct.size === names.size)
  }

  test("every query runs at sf0.001 with stable schema") {
    Registry.all.foreach { q =>
      val df = q.run(spark, sf())
      val n = df.count()
      withClue(s"${q.name}: ") {
        assert(df.columns.nonEmpty)
        assert(n >= 0)
      }
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }
}
