package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.roaringbitmap.RoaringBitmap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Exact distinct count over a RoaringBitmap buffer — the
  * `TypedImperativeAggregate` pattern for sketch-style aggregation state
  * (mutable buffer, custom serialization at shuffle boundaries).
  *
  * Where `count(DISTINCT x)` plans an Expand + extra shuffle of every
  * distinct value, this aggregates a compressed bitmap partially on the map
  * side and merges bitmaps on the reduce side: one shuffle, payload
  * proportional to the compressed bitmap, not the value stream — the
  * at-scale shape for exact distinct over bounded integer domains
  * (cf. Spark's own bitmap-based functions). Exact, so the DuckDB oracle is
  * plain `count(DISTINCT x)`.
  */
case class BitmapDistinctCount(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[RoaringBitmap] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitmap distinct needs an int column, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): RoaringBitmap = new RoaringBitmap()

  override def update(buffer: RoaringBitmap, input: InternalRow): RoaringBitmap = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Int])
    buffer
  }

  override def merge(buffer: RoaringBitmap, other: RoaringBitmap): RoaringBitmap = {
    buffer.or(other)
    buffer
  }

  override def eval(buffer: RoaringBitmap): Any = buffer.getLongCardinality

  override def serialize(buffer: RoaringBitmap): Array[Byte] = {
    buffer.runOptimize()
    val bos = new ByteArrayOutputStream()
    buffer.serialize(new DataOutputStream(bos))
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): RoaringBitmap = {
    val bitmap = new RoaringBitmap()
    bitmap.deserialize(ByteBuffer.wrap(bytes))
    bitmap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinctCount =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinctCount =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapDistinctCount =
    copy(child = newChildren.head)
}

object BitmapDistinct {
  import org.apache.spark.sql.graftshim.ColumnBridge.{column, expression}

  /** Column form: exact distinct count of an integer-domain column. */
  def bitmapDistinct(c: Column): Column =
    column(BitmapDistinctCount(expression(c)).toAggregateExpression())
}
