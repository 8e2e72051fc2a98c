package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Tables
import graft.registry.Q

/** Incremental aggregate maintenance — the materialized-view pattern: a
  * 100-TB aggregate is never recomputed from scratch; each arriving
  * chunk is reduced to per-group PARTIAL state (count/sum/min/max — the
  * decomposable aggregates), and states fold associatively:
  *
  *   state ⊕ chunk_state = agg(state ∪ chunk_state)
  *
  * so the standing cost per refresh is O(|chunk| + |groups|), not
  * O(|history|). Exactness needs exact types: sums are held as DECIMAL
  * in state (order-independent) and only cast to DOUBLE on read-out.
  * x_incr_agg folds four chunk states and must hash-equal DuckDB's
  * single-pass aggregate over everything.
  */
object Incremental {

  /** State sum type: maximally wide so folding can NEVER overflow-null
    * the running sum (a cast back to (18,2) would silently yield NULL
    * once a group's cumulative sum passed 10^16 — state must stay exact
    * at any history length; presentation narrowing happens in readout). */
  private val StateDec = DecimalType(38, 2)

  /** Per-group partial state of a chunk (or of a fold of chunks). */
  def partialState(chunk: DataFrame, key: String, value: String): DataFrame =
    chunk.groupBy(col(key))
      .agg(count(lit(1)).as("n"),
        sum(col(value).cast(DecimalType(18, 2))).cast(StateDec).as("s"),
        min(col(value)).as("mn"),
        max(col(value)).as("mx"))

  /** Fold two states: re-aggregate the union with the merge functions
    * (sum of counts/sums, min of mins, max of maxes). */
  def mergeStates(a: DataFrame, b: DataFrame, key: String): DataFrame =
    a.unionByName(b).groupBy(col(key))
      .agg(sum(col("n")).cast(LongType).as("n"),
        sum(col("s")).cast(StateDec).as("s"),
        min(col("mn")).as("mn"),
        max(col("mx")).as("mx"))

  /** Read-out: exact state → presentation types. */
  def readout(state: DataFrame, key: String): DataFrame =
    state.select(col(key), col("n"),
      col("s").cast("double").as("s"), col("mn"), col("mx"))

  // ---- registry entry ---------------------------------------------------

  /** orders revenue by priority, maintained over four o_orderkey-range
    * chunks, vs DuckDB's one-pass aggregate over the whole table. */
  val incrAggQ: Q = Q(
    "x_incr_agg",
    Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s,
           |  min(o_totalprice) AS mn, max(o_totalprice) AS mx
           |FROM orders GROUP BY o_orderpriority
           |ORDER BY o_orderpriority""".stripMargin),
    (s, d) => {
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      val maxRow = orders.agg(max(col("o_orderkey"))).head
      // empty table → empty state, not an NPE on the null max
      val maxKey = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
      val states = (1 to 4).map { i =>
        val lo = (i - 1).toLong * maxKey / 4
        val hi = i.toLong * maxKey / 4
        // first chunk has NO lower bound (keys can start at 0), last has
        // no upper bound — the four ranges must cover the whole domain
        partialState(
          orders.filter(
            (if (i == 1) lit(true) else col("o_orderkey") > lo) &&
              (if (i == 4) lit(true) else col("o_orderkey") <= hi)),
          "o_orderpriority", "o_totalprice")
      }
      val folded = states.reduce(mergeStates(_, _, "o_orderpriority"))
      readout(folded, "o_orderpriority").orderBy(col("o_orderpriority"))
    })

  /** Incremental JOIN-view maintenance — the delta algebra of a
    * materialized join: with base snapshots (Ab, Bb) and arriving
    * deltas (Ad, Bd),
    *
    *   (Ab ∪ Ad) ⋈ (Bb ∪ Bd)
    *     = (Ab ⋈ Bb) ∪ (Ad ⋈ Bb) ∪ (Ab ⋈ Bd) ∪ (Ad ⋈ Bd)
    *
    * so a refresh touches only the three delta quadrants — O(|delta| +
    * |delta ⋈ view|), never a rejoin of history (the join twin of
    * x_incr_agg's partial-state fold). The registered query
    * materializes all four quadrants WITH their provenance tag, and the
    * oracle recomputes the single full join deriving each row's
    * quadrant from the split predicates — any row lost, duplicated, or
    * misrouted by the delta algebra hash-fails.
    *
    * Splits: orders by order date (< 1997 = base), customer by
    * c_custkey % 10 (nonzero = base) — both sides have base AND delta,
    * exercising all four quadrants. Each quadrant join is keyed on
    * custkey; o_orderkey is unique and each order matches exactly one
    * customer, so ORDER BY o_orderkey is a total order. */
  val incrJoinQ: Q = Q(
    "x_incr_join",
    Some("""SELECT o.o_orderkey, c.c_custkey,
           |  CAST(c.c_nationkey AS BIGINT) AS c_nationkey,
           |  CASE WHEN CAST(o.o_orderdate AS DATE) < DATE '1997-01-01'
           |    THEN (CASE WHEN c.c_custkey % 10 <> 0 THEN 'base-base' ELSE 'base-delta' END)
           |    ELSE (CASE WHEN c.c_custkey % 10 <> 0 THEN 'delta-base' ELSE 'delta-delta' END)
           |  END AS part
           |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
           |ORDER BY o.o_orderkey""".stripMargin),
    (s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate").cast("date").as("odate"))
      val c = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
      val cut = lit("1997-01-01").cast("date")
      val ab = o.filter(col("odate") < cut)
      val ad = o.filter(col("odate") >= cut)
      val bb = c.filter(col("c_custkey") % 10 =!= 0)
      val bd = c.filter(col("c_custkey") % 10 === 0)
      def quad(a: DataFrame, b: DataFrame, tag: String): DataFrame =
        a.join(b, col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("c_custkey"),
            col("c_nationkey").cast(LongType).as("c_nationkey"),
            lit(tag).as("part"))
      quad(ab, bb, "base-base")
        .unionByName(quad(ad, bb, "delta-base"))
        .unionByName(quad(ab, bd, "base-delta"))
        .unionByName(quad(ad, bd, "delta-delta"))
        .orderBy(col("o_orderkey"))
    })

  val all: Seq[Q] = Seq(incrAggQ, incrJoinQ)
}
