package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.roaringbitmap.longlong.Roaring64NavigableMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/** Exact distinct count over a 64-bit Roaring bitmap buffer — the
  * `TypedImperativeAggregate` pattern for sketch-style aggregation state
  * (mutable buffer, custom serialization at shuffle boundaries).
  *
  * Where `count(DISTINCT x)` plans an Expand + extra shuffle of every
  * distinct value, this aggregates a compressed bitmap partially on the map
  * side and merges bitmaps on the reduce side: one shuffle, payload
  * proportional to the compressed bitmap, not the value stream — the
  * at-scale shape for exact distinct over integer domains (cf. Spark's own
  * bitmap-based functions). Exact, so the DuckDB oracle is plain
  * `count(DISTINCT x)`.
  *
  * Backed by `Roaring64NavigableMap`, so the full LongType key domain is
  * exact — no narrowing cast, no silent collision past 2^31 (TPC-H partkey
  * crosses that around sf2000). IntegerType input is widened losslessly.
  */
case class BitmapDistinctCount(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Roaring64NavigableMap] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType | LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bitmap distinct needs an int or long column, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): Roaring64NavigableMap =
    new Roaring64NavigableMap()

  override def update(buffer: Roaring64NavigableMap, input: InternalRow): Roaring64NavigableMap = {
    val v = child.eval(input)
    v match {
      case null       => ()
      case i: Integer => buffer.addLong(i.longValue())
      case l: java.lang.Long => buffer.addLong(l.longValue())
    }
    buffer
  }

  override def merge(buffer: Roaring64NavigableMap, other: Roaring64NavigableMap): Roaring64NavigableMap = {
    buffer.or(other)
    buffer
  }

  override def eval(buffer: Roaring64NavigableMap): Any = buffer.getLongCardinality

  override def serialize(buffer: Roaring64NavigableMap): Array[Byte] = {
    buffer.runOptimize()
    val bos = new ByteArrayOutputStream()
    buffer.serialize(new DataOutputStream(bos))
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Roaring64NavigableMap = {
    val bitmap = new Roaring64NavigableMap()
    bitmap.deserialize(new DataInputStream(new ByteArrayInputStream(bytes)))
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

/** [[BitmapDistinctCount]]'s build half split out: emits the SERIALIZED
  * bitmap instead of its cardinality, so partial distinct state can be
  * persisted (per day / per partition) and re-merged later — exact
  * re-aggregatable distinct, the precise counterpart of the approximate
  * DataSketches HLL union (X53). */
case class BitmapBuild(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Roaring64NavigableMap] with BitmapCodec {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType | LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bitmap build needs an int or long column, got ${other.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def createAggregationBuffer(): Roaring64NavigableMap = new Roaring64NavigableMap()

  override def update(buffer: Roaring64NavigableMap, input: InternalRow): Roaring64NavigableMap = {
    child.eval(input) match {
      case null => ()
      case i: Integer => buffer.addLong(i.longValue())
      case l: java.lang.Long => buffer.addLong(l.longValue())
    }
    buffer
  }
  override def merge(buffer: Roaring64NavigableMap, other: Roaring64NavigableMap): Roaring64NavigableMap = {
    buffer.or(other); buffer
  }
  override def eval(buffer: Roaring64NavigableMap): Any = serialize(buffer)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapBuild =
    copy(child = newChildren.head)
}

/** Merge half: unions serialized bitmaps (from [[BitmapBuild]], possibly
  * read back from storage) and returns the exact union cardinality. */
case class BitmapUnionCount(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Roaring64NavigableMap] with BitmapCodec {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bitmap union needs a binary (serialized bitmap) column, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def createAggregationBuffer(): Roaring64NavigableMap = new Roaring64NavigableMap()

  override def update(buffer: Roaring64NavigableMap, input: InternalRow): Roaring64NavigableMap = {
    child.eval(input) match {
      case null => ()
      case bytes: Array[Byte] => buffer.or(deserialize(bytes))
    }
    buffer
  }
  override def merge(buffer: Roaring64NavigableMap, other: Roaring64NavigableMap): Roaring64NavigableMap = {
    buffer.or(other); buffer
  }
  override def eval(buffer: Roaring64NavigableMap): Any = buffer.getLongCardinality

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapUnionCount =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapUnionCount =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapUnionCount =
    copy(child = newChildren.head)
}

/** Shared Roaring64 wire format (shuffle buffers AND the persisted-state
  * column use the same bytes). */
trait BitmapCodec {
  def serialize(buffer: Roaring64NavigableMap): Array[Byte] = {
    buffer.runOptimize()
    val bos = new ByteArrayOutputStream()
    buffer.serialize(new DataOutputStream(bos))
    bos.toByteArray
  }
  def deserialize(bytes: Array[Byte]): Roaring64NavigableMap = {
    val bitmap = new Roaring64NavigableMap()
    bitmap.deserialize(new DataInputStream(new ByteArrayInputStream(bytes)))
    bitmap
  }
}

object BitmapDistinct {
  import org.apache.spark.sql.graftshim.ColumnBridge.{column, expression}

  /** Column form: exact distinct count of an int/long-domain column. */
  def bitmapDistinct(c: Column): Column =
    column(BitmapDistinctCount(expression(c)).toAggregateExpression())

  /** Column form: serialized partial-distinct bitmap (persistable state). */
  def bitmapAgg(c: Column): Column =
    column(BitmapBuild(expression(c)).toAggregateExpression())

  /** Column form: exact cardinality of the union of serialized bitmaps. */
  def bitmapUnionCount(c: Column): Column =
    column(BitmapUnionCount(expression(c)).toAggregateExpression())
}
