package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-Min sketch over pre-hashed (xxhash64) keys: DEPTH x WIDTH
  * counters, each row incrementing one counter per depth row; point
  * estimates take the min over depth rows, which NEVER under-counts
  * (every true occurrence incremented every probed counter) and
  * over-counts only by collision mass (expected <= N*e/WIDTH per row,
  * min over DEPTH rows). The sketch rows hash with the same Knuth-style
  * LCG family as the MinHash permutations; [[CmsSketchAgg]] (build) and
  * [[CmsEstimate]] (probe) share [[CmsParams.slot]] so the pair is
  * self-consistent by construction.
  *
  * Scale shape: the aggregation buffer is a fixed 4x2048 long array
  * (64 KiB) merged associatively across partitions — a global heavy-
  * hitter pass is ONE partial-aggregated reduce with constant shuffle
  * bytes, vs the exact groupBy whose shuffle is O(distinct keys). The
  * x_cms_heavy_hitters query uses the standard sketch discipline: CMS
  * screens candidates, an exact count verifies the survivors, so the
  * emitted values are exact and the oracle is plain SQL.
  */
object CmsParams {
  val Depth = 4
  val Width = 2048
  val P = 2305843009213693951L // 2^61 - 1, same prime family as Sketches

  // Knuth MMIX multipliers/offsets, distinct per depth row
  private val A = Array(6364136223846793005L, 3935559000370003845L,
    3202034522624059733L, 2862933555777941757L)
  private val B = Array(1442695040888963407L, 2691343689449507681L,
    4354685564936845319L, 7046029254386353087L)

  /** Counter index for depth row i and pre-hashed key h — one shared
    * definition so build and probe cannot drift. */
  @inline def slot(i: Int, h: Long): Int =
    (java.lang.Math.floorMod(A(i) * h + B(i), P) % Width).toInt
}

/** Aggregate: Count-Min sketch of a LONG (xxhash64) key column, emitted
  * as a flat ARRAY<BIGINT> of Depth*Width counters, row-major. */
case class CmsSketchAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  import CmsParams._

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](Depth * Width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val hAny = child.eval(input)
    if (hAny != null) {
      val h = hAny.asInstanceOf[Long]
      var i = 0
      while (i < Depth) {
        buf(i * Width + slot(i, h)) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](Depth * Width)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsSketchAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "cms_sketch"
}

/** Scalar probe: min-over-depth point estimate for a pre-hashed key
  * against a [[CmsSketchAgg]] array. Codegen'd (the probe side may be
  * wide — one estimate per candidate row); the generated loop calls the
  * shared [[CmsParams.slot]] so build and probe cannot drift. */
case class CmsEstimate(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  import CmsParams._

  override def dataType: DataType = LongType

  override def nullSafeEval(skAny: Any, kAny: Any): Any = {
    val sk = skAny.asInstanceOf[ArrayData]
    val h = kAny.asInstanceOf[Long]
    var est = Long.MaxValue
    var i = 0
    while (i < Depth) {
      val v = sk.getLong(i * Width + slot(i, h))
      if (v < est) est = v
      i += 1
    }
    est
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cms = "graft.functions.CmsParams$.MODULE$"
    nullSafeCodeGen(ctx, ev, (sk, k) => {
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
         |${ev.value} = Long.MAX_VALUE;
         |for (int $i = 0; $i < ${Depth}; $i++) {
         |  long $v = $sk.getLong($i * ${Width} + $cms.slot($i, $k));
         |  if ($v < ${ev.value}) ${ev.value} = $v;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cms_estimate"
}

object CmsSketch {
  def cms_sketch(hashedKey: Column): Column =
    GraftColumnBridge.column(
      CmsSketchAgg(GraftColumnBridge.expression(hashedKey)).toAggregateExpression())

  def cms_estimate(sketch: Column, hashedKey: Column): Column =
    GraftColumnBridge.column(CmsEstimate(
      GraftColumnBridge.expression(sketch), GraftColumnBridge.expression(hashedKey)))
}
