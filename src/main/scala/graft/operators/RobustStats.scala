package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.registry.Q

/** Robust per-group outlier detection by median / MAD (median absolute
  * deviation) — the classic heavy-tail-safe alternative to mean/stddev
  * z-scores (Hampel 1974; mean and stddev are themselves dragged by the
  * outliers they are meant to find, the median and MAD are not). A doc
  * is flagged when |x − med| > k·MAD with the conventional k = 3.
  *
  * Exact integer end to end: x = n_chars (BIGINT), the LOWER median
  * (element at 1-indexed position (n+1) div 2 of the sorted multiset) so
  * both medians are corpus values — no float interpolation, bit-equal in
  * DuckDB by the identical cumulative-histogram construction.
  *
  * Scale shape — the reason this is an operator and not a one-liner:
  * exact per-group medians are usually written as a per-group SORT
  * (row_number over every row), a full shuffle + sort of the corpus per
  * statistic. Here the corpus collapses FIRST to a (group, value) →
  * count histogram (map-side combinable agg; n_chars has bounded
  * distinct values), medians come from a running sum over the TINY
  * histogram (window over ~distinct-values rows per group, never corpus
  * rows), the MAD repeats the trick on the derived |x − med| histogram,
  * and the flag join back to the corpus is a broadcast of one 3-column
  * row per group. Corpus passes: exactly two narrow scans + one
  * broadcast join — no corpus-sized sort or window anywhere.
  */
object RobustStats {

  /** Flag multiplier: |x - med| > MadK * mad. */
  val MadK = 3L

  /** Lower median of the (g, v, c) histogram `h`: per group, the
    * smallest v whose running count reaches position (total+1) div 2. */
  private def histMedian(h: DataFrame, out: String): DataFrame = {
    val byG = Window.partitionBy(col("g"))
    val cum = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    h.withColumn("cumc", sum(col("c")).over(cum))
      .withColumn("tot", sum(col("c")).over(byG))
      .filter(col("cumc") >= expr("(tot + 1L) div 2L"))
      .groupBy(col("g")).agg(min(col("v")).as(out))
  }

  /** (doc_id, g, v, med, mad, outlier) for any (id, group, BIGINT value)
    * frame — the toy-corpus seam. */
  def madOutliers(rows: DataFrame, id: String, group: String,
      value: String, k: Long = MadK): DataFrame = {
    val base = rows.select(col(id).as("doc_id"), col(group).as("g"),
      col(value).cast("long").as("v"))
    val hist = base.groupBy(col("g"), col("v"))
      .agg(count(lit(1)).as("c"))
    val med = histMedian(hist, "med")
    // |v - med| histogram, derived from the VALUE histogram (counts
    // carry over) — never a second corpus aggregation
    val adHist = hist.join(med, "g")
      .select(col("g"), abs(col("v") - col("med")).as("v"), col("c"))
      .groupBy(col("g"), col("v")).agg(sum(col("c")).as("c"))
    val mad = histMedian(adHist, "mad")
    val stats = med.join(mad, "g")
    base.join(broadcast(stats), "g")
      .select(col("doc_id"), col("g"), col("v"), col("med"), col("mad"),
        (abs(col("v") - col("med")) > lit(k) * col("mad"))
          .cast("long").as("outlier"))
  }

  private val oracleSql: String =
    s"""WITH base AS (SELECT doc_id, lang AS g, CAST(n_chars AS BIGINT) AS v
       |  FROM documents),
       |hist AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
       |  FROM base GROUP BY g, v),
       |medh AS (SELECT g, v, c,
       |    sum(c) OVER (PARTITION BY g ORDER BY v
       |      ROWS UNBOUNDED PRECEDING) AS cumc,
       |    sum(c) OVER (PARTITION BY g) AS tot
       |  FROM hist),
       |med AS (SELECT g, CAST(min(v) AS BIGINT) AS med FROM medh
       |  WHERE cumc >= (tot + 1) // 2 GROUP BY g),
       |adh AS (SELECT h.g, abs(h.v - m.med) AS v, CAST(sum(h.c) AS BIGINT) AS c
       |  FROM hist h JOIN med m ON h.g = m.g GROUP BY h.g, abs(h.v - m.med)),
       |madh AS (SELECT g, v, c,
       |    sum(c) OVER (PARTITION BY g ORDER BY v
       |      ROWS UNBOUNDED PRECEDING) AS cumc,
       |    sum(c) OVER (PARTITION BY g) AS tot
       |  FROM adh),
       |mad AS (SELECT g, CAST(min(v) AS BIGINT) AS mad FROM madh
       |  WHERE cumc >= (tot + 1) // 2 GROUP BY g)
       |SELECT b.doc_id, b.g, b.v, m.med, d.mad,
       |  CAST(abs(b.v - m.med) > $MadK * d.mad AS BIGINT) AS outlier
       |FROM base b JOIN med m ON b.g = m.g JOIN mad d ON b.g = d.g
       |ORDER BY b.doc_id""".stripMargin

  val madQ: Q = Q(
    "x_mad_outliers",
    Some(oracleSql),
    (s, d) => madOutliers(Tables.documents(s, d), "doc_id", "lang", "n_chars")
      .orderBy(col("doc_id")))

  /** Per-group percentile-rank normalization — the calibration step
    * that makes a quality score comparable ACROSS groups (a "good"
    * length for German is not a "good" length for English): each row's
    * value is replaced by its within-group mid-rank percentile in exact
    * ppm, pct = (1e6·(below + (ties+1) div 2)) div n, where below
    * counts strictly-smaller rows and ties the rows sharing the value
    * (the mid-rank convention keeps a constant column at ~500000, not
    * 0 or 1e6). Same histogram discipline as the MAD operator: the
    * corpus collapses to (group, value) counts, the rank accumulates
    * over the TINY histogram, and rows join their value's percentile
    * back by (group, value) — no corpus-wide sort at any point. */
  def percentileRank(rows: DataFrame, id: String, group: String,
      value: String): DataFrame = {
    val base = rows.select(col(id).as("doc_id"), col(group).as("g"),
      col(value).cast("long").as("v"))
    val hist = base.groupBy(col("g"), col("v"))
      .agg(count(lit(1)).as("c"))
    val cum = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val byG = Window.partitionBy(col("g"))
    val ranked = hist
      .withColumn("below", sum(col("c")).over(cum) - col("c"))
      .withColumn("n", sum(col("c")).over(byG))
      .select(col("g"), col("v"),
        expr("(1000000L * (below + (c + 1L) div 2L)) div n").as("pct_ppm"))
    base.join(ranked, Seq("g", "v"))
      .select(col("doc_id"), col("g"), col("v"), col("pct_ppm"))
  }

  private val pctOracleSql: String =
    """WITH base AS (SELECT doc_id, lang AS g, CAST(n_chars AS BIGINT) AS v
      |  FROM documents),
      |hist AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
      |  FROM base GROUP BY g, v),
      |ranked AS (SELECT g, v,
      |    (1000000 * ((sum(c) OVER (PARTITION BY g ORDER BY v
      |        ROWS UNBOUNDED PRECEDING) - c) + (c + 1) // 2))
      |      // (sum(c) OVER (PARTITION BY g)) AS pct_ppm
      |  FROM hist)
      |SELECT b.doc_id, b.g, b.v, CAST(r.pct_ppm AS BIGINT) AS pct_ppm
      |FROM base b JOIN ranked r ON b.g = r.g AND b.v = r.v
      |ORDER BY b.doc_id""".stripMargin

  val pctQ: Q = Q(
    "x_percentile_rank",
    Some(pctOracleSql),
    (s, d) => percentileRank(Tables.documents(s, d), "doc_id", "lang", "n_chars")
      .orderBy(col("doc_id")))

  /** Equi-depth (decile) histogram boundaries per group — the
    * ANALYZE-style twin of x_width_bucket_hist's equal-WIDTH buckets,
    * and what a cost model or skew-aware partitioner actually wants:
    * boundary_i = the smallest value whose cumulative count reaches
    * ⌈i·n/B⌉ (lower-value convention, exact integer ceil via div), so
    * decile 10 is the group max and ties collapse boundaries onto the
    * repeated value instead of splitting it. Same histogram discipline
    * as the MAD/percentile operators: the corpus collapses map-side to
    * (group, value) counts, targets explode to B rows per group, and
    * the boundary argmin runs over the group-keyed histogram — no
    * corpus-wide sort. */
  def equiDepth(rows: DataFrame, group: String, cents: Column,
      buckets: Int = 10): DataFrame = {
    val base = rows.select(col(group).as("g"), cents.as("v"))
    val hist = base.groupBy(col("g"), col("v"))
      .agg(count(lit(1)).as("c"))
    val cum = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val byG = Window.partitionBy(col("g"))
    val ranked = hist
      .withColumn("cumc", sum(col("c")).over(cum))
      .withColumn("n", sum(col("c")).over(byG))
    val targets = ranked.select(col("g"), col("n")).distinct()
      .withColumn("decile", explode(sequence(lit(1L), lit(buckets.toLong))))
      .select(col("g"), col("decile"),
        expr(s"(decile * n + ${buckets - 1}) div $buckets").as("target"),
        col("n"))
    targets.join(
        ranked.select(col("g"), col("v"), col("cumc")), Seq("g"))
      .filter(col("cumc") >= col("target"))
      .groupBy(col("g"), col("decile"), col("n"))
      .agg(min(col("v")).as("boundary"))
      .select(col("g"), col("decile"), col("boundary"), col("n"))
  }

  private def equiDepthOracleSql(buckets: Int): String =
    s"""WITH base AS (SELECT event_type AS g,
       |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
       |  FROM events),
       |hist AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
       |  FROM base GROUP BY g, v),
       |ranked AS (SELECT g, v,
       |    sum(c) OVER (PARTITION BY g ORDER BY v
       |      ROWS UNBOUNDED PRECEDING) AS cumc,
       |    sum(c) OVER (PARTITION BY g) AS n
       |  FROM hist),
       |targets AS (SELECT g, n, CAST(decile AS BIGINT) AS decile,
       |    (decile * n + ${buckets - 1}) // $buckets AS target
       |  FROM (SELECT DISTINCT g, n FROM ranked),
       |    generate_series(1, $buckets) AS t(decile))
       |SELECT t.g, t.decile, CAST(min(r.v) AS BIGINT) AS boundary,
       |  CAST(t.n AS BIGINT) AS n
       |FROM targets t JOIN ranked r ON r.g = t.g AND r.cumc >= t.target
       |GROUP BY t.g, t.decile, t.n
       |ORDER BY t.g, t.decile""".stripMargin

  val equiDepthQ: Q = Q(
    "x_equidepth_hist",
    Some(equiDepthOracleSql(10)),
    (s, d) => equiDepth(Tables.events(s, d), "event_type",
        (col("value").cast("decimal(18,2)") * 100).cast(LongType))
      .orderBy(col("g"), col("decile")))

  def all: Seq[Q] = Seq(madQ, pctQ, equiDepthQ)
}
