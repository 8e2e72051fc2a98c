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
