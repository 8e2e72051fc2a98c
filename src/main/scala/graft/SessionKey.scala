package graft

import org.apache.spark.sql.{GraftColumnBridge, SparkSession}

/** Stable cache identity for a SparkSession. `sessionUUID` is unique for
  * the JVM's lifetime, so a cache keyed on it can never alias two
  * sessions the way a recycled `System.identityHashCode` could after the
  * original session is GC'd (ADVICE r2).
  */
object SessionKey {
  def apply(s: SparkSession): String =
    try GraftColumnBridge.sessionUUID(s)
    catch { case _: Throwable => "idhash-" + System.identityHashCode(s) }
}
