package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability exposed through the driver contract.
  *
  * @param name   stable query id (key in SparkEntry.queries)
  * @param oracle equivalent ANSI SQL runnable by DuckDB against the same
  *               parquet tables; None for ops DuckDB can't express → the
  *               driver records a weaker rows-only check.
  * @param run    builds the result DataFrame for a given sf directory
  */
final case class Q(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

object Registry {
  /** Every registered capability, in rough SURVEY.md §2 order. */
  def all: Seq[Q] =
    graft.queries.Relational.all ++
      graft.queries.Extended.all ++
      graft.queries.Extended2.all ++
      graft.queries.Typed.all ++
      graft.queries.EventsAnalytics.all ++
      graft.analytics.GraphQueries.all ++
      graft.analytics.IncrementalComponents.all ++
      graft.analytics.PageRank.all ++
      graft.analytics.Hits.all ++
      graft.analytics.ShortestPaths.all ++
      graft.analytics.TemporalReach.all ++
      graft.analytics.RandomWalks.all ++
      graft.analytics.Scc.all ++
      graft.analytics.Condensation.all ++
      graft.analytics.Stress.all ++
      graft.analytics.Harmonic.all ++
      graft.analytics.Eccentricity.all ++
      graft.analytics.Mst.all ++
      graft.analytics.KCore.all ++
      graft.analytics.Mis.all ++
      graft.analytics.Truss.all ++
      graft.analytics.LabelPropagation.all ++
      graft.analytics.Modularity.all ++
      graft.operators.Cdc.all ++
      graft.operators.BloomPrune.all ++
      graft.sources.ZOrderStore.all ++
      graft.operators.Incremental.all ++
      graft.operators.FuzzyMatch.all ++
      graft.operators.Resample.all ++
      graft.operators.RangeJoin.all ++
      graft.operators.DataQuality.all ++
      graft.operators.RobustStats.all ++
      graft.operators.Rendezvous.all ++
      graft.operators.Changepoint.all ++
      graft.operators.TableStats.all ++
      graft.pipeline.PipelineQueries.all ++
      graft.pipeline.CdcChunk.all ++
      graft.pipeline.BpeTrain.all ++
      graft.pipeline.Novelty.all ++
      graft.pipeline.CorpusReport.all ++
      graft.pipeline.Coreset.all ++
      graft.pipeline.PpJoin.all ++
      graft.pipeline.VectorIndex.all ++
      graft.pipeline.Multimodal.all ++
      graft.pipeline.Pii.all ++
      graft.pipeline.Quantize.all ++
      graft.pipeline.SemanticCluster.all ++
      graft.pipeline.PqIndex.all ++
      graft.pipeline.IvfPq.all ++
      graft.pipeline.Urls.all ++
      graft.pipeline.Html.all ++
      graft.pipeline.SpanExcise.all ++
      graft.pipeline.QualityModel.all ++
      graft.pipeline.LangIdModel.all ++
      graft.pipeline.Flac.all ++
      graft.pipeline.CrawlE2e.all ++
      graft.pipeline.Robots.all ++
      graft.pipeline.Video.all ++
      graft.pipeline.Warc.all ++
      graft.pipeline.ZstdDict.all ++
      graft.pipeline.WebDataset.all ++
      graft.pipeline.Chat.all ++
      graft.pipeline.Pref.all ++
      graft.pipeline.Encoding.all ++
      graft.pipeline.Splits.all ++
      graft.streaming.StreamingQueries.all

  lazy val byName: Map[String, Q] = {
    val qs = all
    require(qs.map(_.name).distinct.size == qs.size, "duplicate query name")
    qs.map(q => q.name -> q).toMap
  }
}
