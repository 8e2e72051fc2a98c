package graft

import org.apache.spark.sql.SparkSession

/** Central eviction registry for every SESSION-SCOPED cache in the
  * engine (ADVICE r7 #2: session caches with no release path pin
  * checkpoint blocks for the session lifetime and make repeated-run
  * bench statistics pure cache hits).
  *
  * These caches are deliberately NOT in
  * [[analytics.CheckpointRegistry]] — that ledger is released after
  * EVERY query, while these frames are meant to be shared across a
  * family of queries (one sampled BFS for three centralities, one SCC
  * assignment for g_scc + g_condensation, one exact-similarity baseline
  * for the ANN recall gate). What was missing was the OTHER end of the
  * lifecycle: a named way to drop each cache once its family is done.
  * Bench uses these hooks two ways —
  *  - between reps of a `_setup_*` entry, so every rep times a real
  *    build (min-of-N keeps meaning "a build", never "a no-op");
  *  - after the last consumer of each cache, so blocks don't pin for
  *    the rest of the run.
  * Long-lived cluster sessions should call [[clearAll]] at family
  * boundaries for the same reason.
  */
object SessionCaches {

  /** name -> clear hook. Names are the `_setup_<name>` bench entries. */
  val hooks: Seq[(String, SparkSession => Unit)] = Seq(
    "dedup_family" -> (s => pipeline.PipelineQueries.releaseShared(s)),
    "bfs_levels" -> (s => analytics.Stress.clearLevels(s)),
    "scc" -> (s => analytics.Scc.clearAssignments(s)),
    "labelprop" -> (s => analytics.LabelPropagation.clearAssignments(s)),
    "hopplot" -> (s => analytics.HopPlot.clearRows(s)),
    "hyperanf" -> (s => analytics.HyperANF.clearRows(s)),
    "embed_exact" -> (s => pipeline.ExactBaselines.clear(s)),
    "pq" -> (s => pipeline.PqIndex.clear(s)),
    "kmeans" -> (s => pipeline.SemanticCluster.clear(s)),
    "warc_zst" -> (s => pipeline.Warc.clearShards(s)),
    "zst_dict" -> (s => pipeline.ZstdDict.clearDict(s)))

  private lazy val byName = hooks.toMap

  def clear(spark: SparkSession, name: String): Unit =
    byName(name)(spark)

  def clearAll(spark: SparkSession): Unit = {
    hooks.foreach { case (_, f) =>
      try f(spark) catch { case _: Throwable => () }
    }
    // the partition-sizing count memo (GraftColumnBridge.memoCount) is
    // session-scoped with no per-family hook; a full clear is the
    // invalidation point for long-lived sessions whose inputs changed
    // (VERDICT r13 what's-wrong #3)
    org.apache.spark.sql.GraftColumnBridge.clearCountMemo(spark)
  }
}
