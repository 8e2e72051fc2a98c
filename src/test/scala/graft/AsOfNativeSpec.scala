package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin
import graft.plans.AsOfJoinPlan
import graft.registry.Registry

/** The custom-operator as-of join (LogicalPlan + Strategy + streaming
  * merge exec) must agree exactly with the compose-first union+window
  * form on real data and on randomized inputs, and must plan as its own
  * exec node fed by co-partitioned sorted children. */
class AsOfNativeSpec extends SparkSpec {

  test("native == union+window on the events table") {
    val ev = Tables.events(spark, sf())
    val probe = ev.select(col("event_id"), col("user_id"), col("ts"))
    val build = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"), col("ts")).agg(max(col("event_id")).as("sid"))
    val nat = AsOfJoinPlan.asofNative(probe, build, "user_id", "ts", Seq("sid"))
      .select(col("event_id"), col("sid")).collect()
      .map(r => (r.getLong(0), r.getLong(2 - 1))).toSet
    val win = AsOfJoin.asof(probe, build, "user_id", "ts", Seq("sid"))
      .select(col("event_id"), col("sid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nat === win)
    assert(nat.nonEmpty)
  }

  test("TIMESTAMP_NTZ ts accepted (non-Spark parquet writers read as NTZ)") {
    val ev = Tables.events(spark, sf())
    val probe = ev.select(col("event_id"), col("user_id"),
      to_timestamp_ntz(col("ts")).as("ts"))
    val build = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"), to_timestamp_ntz(col("ts")).as("ts"))
      .agg(max(col("event_id")).as("sid"))
    val nat = AsOfJoinPlan.asofNative(probe, build, "user_id", "ts", Seq("sid"))
      .select(col("event_id"), col("sid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val win = AsOfJoin.asof(probe, build, "user_id", "ts", Seq("sid"))
      .select(col("event_id"), col("sid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nat === win)
    assert(nat.nonEmpty)
  }

  test("plans as AsOfJoinExec with sorted, hash-clustered children") {
    val p = Registry.byName("x_asof_join_native").run(spark, sf("0.01"))
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p) // AsOfJoinExec renders sans Exec suffix
    assert(p.contains("Sort ["), p)
    assert(p.contains("hashpartitioning(user_id"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Window"), p) // the merge replaces the window pass
  }

  test("randomized inputs: native == union+window across seeds") {
    import spark.implicits._
    for (seed <- Seq(1L, 7L, 42L)) {
      val rnd = new scala.util.Random(seed)
      val probe = (1 to 400).map { i =>
        (i.toLong, rnd.nextInt(12).toLong, rnd.nextInt(1000).toLong)
      }.toDF("pid", "k", "t")
      // build unique per (k, t)
      val build = rnd.shuffle((0 until 12).flatMap { k =>
        (1 to 30).map(j => (k.toLong, rnd.nextInt(1000).toLong, k * 1000L + j))
      }).toDF("k", "t", "v")
        .groupBy("k", "t").agg(max(col("v")).as("v"))
      val nat = AsOfJoinPlan.asofNative(probe, build, "k", "t", Seq("v"))
        .select("pid", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val win = AsOfJoin.asof(probe, build, "k", "t", Seq("v"))
        .select("pid", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(nat === win, s"seed=$seed")
    }
  }

  test("probe-side filter pushes through the custom node to the scan") {
    val ev = Tables.events(spark, sf("0.01"))
    val probe = ev.select(col("event_id"), col("user_id"), col("ts"))
    val build = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"), col("ts")).agg(max(col("event_id")).as("sid"))
    val df = AsOfJoinPlan.asofNative(probe, build, "user_id", "ts", Seq("sid"))
      .filter(col("event_id") < 1000L)
    val opt = df.queryExecution.optimizedPlan.toString
    // the Filter sits BELOW AsOfJoinPlan after the custom rule runs
    assert(opt.indexOf("AsOfJoinPlan") < opt.indexOf("event_id"), opt)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("PushedFilters: [IsNotNull(event_id), LessThan(event_id,1000)]"), phys)
    // and results are identical to filtering after the join
    val after = AsOfJoinPlan.asofNative(probe, build, "user_id", "ts", Seq("sid"))
      .collect().filter(_.getLong(0) < 1000L).map(_.getLong(0)).toSet
    assert(df.collect().map(_.getLong(0)).toSet === after)
  }

  test("exec reports SQL metrics (output + dropped probe rows)") {
    import spark.implicits._
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val probe = Seq((1L, 1L, 10L), (2L, 1L, 3L), (3L, 2L, 10L))
        .toDF("pid", "k", "t") // pid 2 is before any build row; pid 3 has no key match
      val build = Seq((1L, 5L, 99L)).toDF("k", "t", "v")
      val df = AsOfJoinPlan.asofNative(probe, build, "k", "t", Seq("v"))
      // collect() executes THIS queryExecution (count() would replan)
      assert(df.collect().length === 1)
      val exec = df.queryExecution.executedPlan
        .collectFirst { case e: graft.plans.AsOfJoinExec => e }
      assert(exec.isDefined, df.queryExecution.executedPlan.toString)
      assert(exec.get.metrics("numOutputRows").value === 1L)
      assert(exec.get.metrics("numDroppedProbeRows").value === 2L)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("null keys and empty build side handled") {
    import spark.implicits._
    val probe = Seq((1L, Option(1L), 10L), (2L, None, 20L))
      .toDF("pid", "k", "t")
    val build = Seq.empty[(Long, Long, Long)].toDF("k", "t", "v")
    assert(AsOfJoinPlan.asofNative(probe, build, "k", "t", Seq("v")).count() === 0L)
    val build2 = Seq((1L, 5L, 99L)).toDF("k", "t", "v")
    val got = AsOfJoinPlan.asofNative(probe, build2, "k", "t", Seq("v"))
      .select("pid", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 99L))) // null-keyed probe dropped
  }
}
