package graft.plans

import java.nio.ByteBuffer

import org.roaringbitmap.longlong.Roaring64Bitmap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Roaring-bitmap distinct-set aggregation — the Doris BITMAP_UNION
  * table-model capability (the reference platform's OLAP engine keeps
  * BITMAP columns in aggregate-model tables so count(DISTINCT) rollups
  * are EXACT and mergeable, where HLL rollups are approximate;
  * reference: internal/controller/doris.go — the deployed engine's
  * signature exact-distinct serving path). Spark bundles RoaringBitmap
  * for shuffle MapStatus tracking, so the 64-bit bitmap rides the
  * distribution's own jars.
  *
  * At 100 TB: a bitmap partial is bounded by the distinct-key set per
  * group, compresses runs, and merges by OR — the MV stores one binary
  * blob per (group) and ANY coarser rollup re-aggregates by union
  * without rescanning the fact. Exact where HLL (B23) is ±1%.
  */
object BitmapCodec {
  def ser(b: Roaring64Bitmap): Array[Byte] = {
    b.runOptimize()
    val n = b.serializedSizeInBytes()
    require(n <= Int.MaxValue - 8, s"bitmap too large to serialize: $n bytes")
    val buf = ByteBuffer.allocate(n.toInt)
    b.serialize(buf)
    buf.array()
  }

  def deser(bytes: Array[Byte]): Roaring64Bitmap = {
    val b = new Roaring64Bitmap
    b.deserialize(ByteBuffer.wrap(bytes))
    b
  }

  /** Static-forwarder entry point for codegen call sites. */
  def cardinality(bytes: Array[Byte]): Long = deser(bytes).getLongCardinality

  def andCardinality(a: Array[Byte], b: Array[Byte]): Long =
    Roaring64Bitmap.andCardinality(deser(a), deser(b))
}

private[plans] trait BitmapAggBase extends TypedImperativeAggregate[Roaring64Bitmap]
    with UnaryLike[Expression] {
  override def createAggregationBuffer(): Roaring64Bitmap = new Roaring64Bitmap
  override def merge(buffer: Roaring64Bitmap, input: Roaring64Bitmap): Roaring64Bitmap = {
    buffer.or(input); buffer
  }
  override def eval(buffer: Roaring64Bitmap): Any = BitmapCodec.ser(buffer)
  override def serialize(buffer: Roaring64Bitmap): Array[Byte] = BitmapCodec.ser(buffer)
  override def deserialize(storageFormat: Array[Byte]): Roaring64Bitmap =
    BitmapCodec.deser(storageFormat)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
}

/** bitmap_build(key bigint) → binary: the distinct-key bitmap of a
  * group. NULL keys are skipped (count(DISTINCT) semantics).
  */
case class BitmapBuildAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends BitmapAggBase {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bitmap_build expects an integral key, got $t")
  }

  private lazy val toLong: Any => Long = child.dataType match {
    case LongType => v => v.asInstanceOf[Long]
    case _ => v => v.asInstanceOf[Int].toLong
  }

  override def update(buffer: Roaring64Bitmap, input: InternalRow): Roaring64Bitmap = {
    val v = child.eval(input)
    if (v != null) buffer.addLong(toLong(v))
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): BitmapBuildAgg = copy(child = c)
}

/** bitmap_union(bm binary) → binary: OR-merge of stored bitmap
  * partials — the rollup re-aggregation verb. A coarser grouping over
  * an MV of bitmap partials unions blobs, never touching the fact.
  */
case class BitmapUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends BitmapAggBase {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bitmap_union expects binary, got $t")
  }

  override def update(buffer: Roaring64Bitmap, input: InternalRow): Roaring64Bitmap = {
    val v = child.eval(input)
    if (v != null) buffer.or(BitmapCodec.deser(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): BitmapUnionAgg = copy(child = c)
}

/** Intersection buffer: bm == null is the AND-identity (no input
  * yet), distinct from an empty bitmap (a genuinely empty
  * intersection, which stays empty under further ANDs).
  */
final class AndBuf(var bm: Roaring64Bitmap)

/** bitmap_intersect(bm binary) → binary: AND-merge of stored bitmaps
  * across rows — the MATCH_ALL verb of inverted-index search (docs
  * present in EVERY query term's posting bitmap). Zero input rows
  * yield an empty bitmap.
  */
case class BitmapIntersectAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends TypedImperativeAggregate[AndBuf]
    with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bitmap_intersect expects binary, got $t")
  }

  override def createAggregationBuffer(): AndBuf = new AndBuf(null)

  override def update(buffer: AndBuf, input: InternalRow): AndBuf = {
    val v = child.eval(input)
    if (v != null) {
      val in = BitmapCodec.deser(v.asInstanceOf[Array[Byte]])
      if (buffer.bm == null) buffer.bm = in else buffer.bm.and(in)
    }
    buffer
  }

  override def merge(buffer: AndBuf, input: AndBuf): AndBuf = {
    if (input.bm != null) {
      if (buffer.bm == null) buffer.bm = input.bm else buffer.bm.and(input.bm)
    }
    buffer
  }

  override def eval(buffer: AndBuf): Any =
    BitmapCodec.ser(if (buffer.bm == null) new Roaring64Bitmap else buffer.bm)

  /** Zero-length payload encodes the identity buffer. */
  override def serialize(buffer: AndBuf): Array[Byte] =
    if (buffer.bm == null) Array.emptyByteArray else BitmapCodec.ser(buffer.bm)
  override def deserialize(storageFormat: Array[Byte]): AndBuf =
    if (storageFormat.isEmpty) new AndBuf(null)
    else new AndBuf(BitmapCodec.deser(storageFormat))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapIntersectAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapIntersectAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): BitmapIntersectAgg = copy(child = c)
}

/** bitmap_to_array(bm binary) → array<bigint>: materialize the stored
  * id set (ascending). Use only where the result set is known-bounded
  * (a search-match list), never on a whole-corpus bitmap.
  */
case class BitmapToArray(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bitmap_to_array expects binary, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      BitmapCodec.deser(input.asInstanceOf[Array[Byte]]).toArray)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.plans.BitmapCodec.deser($b).toArray())")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** bitmap_count(bm binary) → bigint: exact cardinality of a stored
  * bitmap. Codegen'd via the BitmapCodec static forwarder.
  */
case class BitmapCardinality(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bitmap_count expects binary, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    BitmapCodec.cardinality(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.plans.BitmapCodec.cardinality($b)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** bitmap_and_count(a binary, b binary) → bigint: exact intersection
  * cardinality — the MATCH_ALL verb of the inverted-index search path.
  */
case class BitmapAndCardinality(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bitmap_and_count expects (binary, binary), got $t")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    BitmapCodec.andCardinality(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.BitmapCodec.andCardinality($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** dv_deleted(file_path string, row_index bigint) → boolean: is this
  * row marked deleted by the snapshot's deletion vectors (B46
  * merge-on-read DELETE)? The per-file bitmap blobs travel as a
  * BROADCAST (fetched once per executor) — embedding them in the
  * expression would re-serialize the whole vector set with the plan
  * for every task, the difference between KBs and GBs of task bytes
  * on a heavily-deleted 100 TB table.
  */
case class DvDeleted(left: Expression, right: Expression,
    blobs: org.apache.spark.broadcast.Broadcast[Map[String, Array[Byte]]])
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"dv_deleted expects (string, bigint), got $t")
  }

  // UTF8String-keyed so the per-row probe allocates nothing; the map
  // is read-only after lazy init, so concurrent task threads sharing
  // this plan reference are safe.
  @transient private lazy val map
      : java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Roaring64Bitmap] = {
    val m = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Roaring64Bitmap]()
    blobs.value.foreach { case (f, b) =>
      m.put(org.apache.spark.unsafe.types.UTF8String.fromString(f), BitmapCodec.deser(b))
    }
    m
  }

  def isDeleted(file: org.apache.spark.unsafe.types.UTF8String, pos: Long): Boolean = {
    val bm = map.get(file)
    bm != null && bm.contains(pos)
  }

  override def nullSafeEval(f: Any, p: Any): Any =
    isDeleted(f.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      p.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dv", this, classOf[DvDeleted].getName)
    defineCodeGen(ctx, ev, (f, p) => s"$ref.isDeleted($f, $p)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
