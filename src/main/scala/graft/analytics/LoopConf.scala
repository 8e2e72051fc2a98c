package graft.analytics

import org.apache.spark.sql.SparkSession

/** Session-conf pinning for iterative superstep loops.
  *
  * Two things AQE normally does have to be decided ONCE at loop entry
  * instead of per stage, because a superstep loop reuses one physical
  * layout across rounds:
  *
  *   - adaptive re-planning is disabled (a plan whose partitioning is
  *     only known at runtime makes localCheckpoint capture
  *     UnknownPartitioning, forcing a state re-shuffle every round, and
  *     per-stage coalescing could give two rounds incompatible counts);
  *   - the shuffle partition count is right-sized from the loop's own
  *     data volume — clamp(rows / rowsPerPartition, 4, session setting)
  *     — so a small graph doesn't pay hundreds of near-empty tasks per
  *     round and a 100-TB graph keeps the session's full parallelism.
  *
  * Both settings are restored when the body returns.
  */
private[analytics] object LoopConf {

  /** Sessions currently inside a pinned block. Conf changes are
    * session-global, so two overlapping pinned loops on one session
    * would restore each other's values (and anything else planned on
    * the session meanwhile silently compiles with the loop's conf —
    * callers run loops serially, which this makes a checked contract
    * instead of an assumption). */
  private val active = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def pinned[T](spark: SparkSession, approxRows: => Long,
      rowsPerPartition: Long = 100000L)(body: => T): T = {
    val sid = graft.SessionKey(spark)
    require(active.add(sid),
      "LoopConf.pinned is not reentrant: another superstep loop is " +
        "already pinning this session's conf (run loops serially)")
    val aqeKey = "spark.sql.adaptive.enabled"
    val spKey = "spark.sql.shuffle.partitions"
    val aqePrev = spark.conf.getOption(aqeKey)
    val spPrev = spark.conf.getOption(spKey)
    val sessionP = spark.conf.get(spKey, "200").toInt
    val p = math.max(4L, math.min(sessionP.toLong,
      approxRows / rowsPerPartition)).toInt
    spark.conf.set(aqeKey, "false")
    spark.conf.set(spKey, p.toString)
    try body
    finally {
      def restore(key: String, prev: Option[String]): Unit = prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      restore(aqeKey, aqePrev)
      restore(spKey, spPrev)
      active.remove(sid)
    }
  }
}
