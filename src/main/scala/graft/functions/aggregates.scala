package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import graft.pipeline.Sketches

/** Native MinHash signature aggregate (SURVEY §2.10 path (b): a custom
  * Catalyst aggregation function where composition runs out): one pass
  * over per-row hashes maintains all NumHashes slot minima in a
  * primitive long[] buffer, merged associatively across partitions —
  * planned through ObjectHashAggregateExec. Same permutation family as
  * Sketches.minhashTable ((a_i*h + b_i) mod P, Knuth multipliers), so
  * the two implementations are value-for-value interchangeable
  * (cross-checked in DedupSpec).
  *
  * vs the 32-column `min()` formulation: identical arithmetic per row,
  * but ONE buffer update instead of 32 independent aggregate columns —
  * narrower aggregation state and one output column end to end.
  */
case class MinHashAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val n = Sketches.NumHashes

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(n)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val hAny = child.eval(input)
    if (hAny != null) {
      val h = hAny.asInstanceOf[Long]
      var i = 0
      while (i < n) {
        val v = (h * Sketches.permA(i) + Sketches.permB(i)) % Sketches.P
        if (v < buf(i)) buf(i) = v
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < n) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(n * 8)
    var i = 0
    while (i < n) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "minhash_agg"
}

object MinHashAgg {
  /** Column-level entry: aggregate per-row long hashes into the
    * NumHashes-slot MinHash signature. */
  def minhash_agg(h: Column): Column =
    GraftColumnBridge.column(
      MinHashAgg(GraftColumnBridge.expression(h)).toAggregateExpression())
}

/** Bounded top-k-per-group as a real AGGREGATE — the scale rewrite of
  * `row_number() OVER (PARTITION BY g ORDER BY ord DESC, v ASC) <= k`:
  * the window form shuffles EVERY row of the group and sorts it; this
  * TypedImperativeAggregate keeps a k-bounded sorted buffer per group,
  * so partial aggregation prunes to k rows per group map-side BEFORE the
  * exchange and the shuffle carries O(groups*k), not O(rows). Planned
  * through ObjectHashAggregateExec like [[MinHashAgg]] (PlanSpec asserts
  * no Window/global sort in the x_topk_agg plan).
  *
  * Ordering is the total order (ord DESC, value ASC) — the same
  * deterministic tie-break `w_rank_topk_per_group` uses, so the two
  * formulations are value-for-value interchangeable and share one
  * oracle. Both ord and value are BIGINT (exact); rows with a NULL in
  * either are ignored, matching row_number over NULLS-filtered input.
  * Buffer layout: flat Array[Long] [ord0,val0,ord1,val1,...], kept
  * sorted best-first, at most k pairs — merge is a k-bounded sorted
  * merge, associative and commutative.
  */
case class TopKByAgg(
    ord: Expression,
    value: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.ArrayList[Long]] {

  require(k > 0, s"top_k_by: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(ord, value)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ord", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("value", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): java.util.ArrayList[Long] =
    new java.util.ArrayList[Long](2 * k)

  /** true iff (o1,v1) ranks strictly better than (o2,v2). */
  @inline private def better(o1: Long, v1: Long, o2: Long, v2: Long): Boolean =
    o1 > o2 || (o1 == o2 && v1 < v2)

  private def insert(buf: java.util.ArrayList[Long], o: Long, v: Long): Unit = {
    val n = buf.size() / 2
    if (n == k && !better(o, v, buf.get(2 * (k - 1)), buf.get(2 * (k - 1) + 1)))
      return
    var i = 0
    while (i < n && !better(o, v, buf.get(2 * i), buf.get(2 * i + 1))) i += 1
    buf.add(2 * i, o)
    buf.add(2 * i + 1, v)
    if (buf.size() / 2 > k) {
      buf.remove(buf.size() - 1)
      buf.remove(buf.size() - 1)
    }
  }

  override def update(buf: java.util.ArrayList[Long], input: InternalRow): java.util.ArrayList[Long] = {
    val oAny = ord.eval(input)
    val vAny = value.eval(input)
    if (oAny != null && vAny != null)
      insert(buf, oAny.asInstanceOf[Long], vAny.asInstanceOf[Long])
    buf
  }

  override def merge(b1: java.util.ArrayList[Long], b2: java.util.ArrayList[Long]): java.util.ArrayList[Long] = {
    var i = 0
    val n2 = b2.size() / 2
    while (i < n2) {
      insert(b1, b2.get(2 * i), b2.get(2 * i + 1))
      i += 1
    }
    b1
  }

  override def eval(buf: java.util.ArrayList[Long]): Any = {
    val n = buf.size() / 2
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](buf.get(2 * i), buf.get(2 * i + 1)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.ArrayList[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size() * 8)
    bb.putInt(buf.size())
    var i = 0
    while (i < buf.size()) { bb.putLong(buf.get(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.ArrayList[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new java.util.ArrayList[Long](math.max(n, 2 * k))
    var i = 0
    while (i < n) { buf.add(bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByAgg =
    copy(ord = newChildren(0), value = newChildren(1))

  override def prettyName: String = "top_k_by"
}

object TopKByAgg {
  /** Column-level entry: k best (ord DESC, value ASC) pairs per group as
    * ARRAY<STRUCT<ord, value>>, best first. */
  def top_k_by(ord: Column, value: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKByAgg(GraftColumnBridge.expression(ord),
        GraftColumnBridge.expression(value), k).toAggregateExpression())
}
