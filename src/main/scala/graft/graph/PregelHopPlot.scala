package graft.graph

import org.apache.spark.graphx.{EdgeDirection, EdgeTriplet, Graph, Pregel, VertexId}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.analytics.HopPlot.HopRow

/** GraphX/Pregel alternate of the hop-plot computation (SURVEY.md §7.3.2):
  * multi-source BFS where each vertex accumulates a map
  * {source -> shortest distance}, messages merge by min, supersteps bound
  * the distance. Cross-validated against the Dataset BFS
  * (analytics.HopPlot) in PregelHopPlotSpec.
  *
  * State is O(pairs) spread across vertices — same asymptotics as the
  * Dataset BFS; use for the bounded analytics graph. The Pregel loop is
  * the formalization of the reference's driver-side superstep pattern
  * (SURVEY.md §3.2: "driver↔cluster every iteration").
  */
object PregelHopPlot {

  def hopPlotRows(spark: SparkSession, edges: DataFrame, maxD: Int = 20): Seq[HopRow] = {
    val edgeTuples = edges
      .select("src", "dst").na.drop()
      .rdd.map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => a != b }
      .distinct()

    val graph: Graph[Map[VertexId, Int], Int] =
      Graph.fromEdgeTuples(edgeTuples, defaultValue = 1)
        .mapVertices((id, _) => Map(id -> 0))

    def mergeMin(a: Map[VertexId, Int], b: Map[VertexId, Int]): Map[VertexId, Int] =
      (a.keySet ++ b.keySet).iterator.map { k =>
        k -> math.min(a.getOrElse(k, Int.MaxValue), b.getOrElse(k, Int.MaxValue))
      }.toMap

    def sendMsg(t: EdgeTriplet[Map[VertexId, Int], Int])
        : Iterator[(VertexId, Map[VertexId, Int])] = {
      def improves(from: Map[VertexId, Int], to: Map[VertexId, Int]) =
        from.iterator
          .map { case (k, v) => k -> (v + 1) }
          .filter { case (k, v) => v <= maxD && to.getOrElse(k, Int.MaxValue) > v }
          .toMap
      val toDst = improves(t.srcAttr, t.dstAttr)
      val toSrc = improves(t.dstAttr, t.srcAttr)
      Iterator((t.dstId, toDst), (t.srcId, toSrc)).filter(_._2.nonEmpty)
    }

    val result = Pregel(graph,
      initialMsg = Map.empty[VertexId, Int],
      maxIterations = maxD,
      activeDirection = EdgeDirection.Either)(
      vprog = (_, attr, msg) => mergeMin(attr, msg),
      sendMsg = sendMsg,
      mergeMsg = mergeMin)

    val hist = result.vertices
      .flatMap { case (id, m) =>
        m.iterator.collect { case (src, d) if src < id && d > 0 => (d, 1L) }
      }
      .reduceByKey(_ + _)
      .collect().sortBy(_._1)

    val total = hist.map(_._2).sum
    var cum = 0L
    hist.toSeq.map { case (d, n) =>
      cum += n
      HopRow(d, cum,
        BigDecimal(cum.toDouble / total.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }
}
