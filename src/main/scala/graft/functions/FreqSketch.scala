package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable heavy-hitters (Misra–Gries / DataSketches frequent-items):
  * the scale path for "top tokens" when the exact token-count groupBy —
  * a full shuffle of every distinct token — is not worth it. Per-group
  * sketch state is O(maxMapSize) regardless of vocabulary, serializes to
  * the DataSketches wire format (persistable parquet binary, same
  * incremental-stats pattern as the KLL/Theta layer), and merges
  * associatively with the guarantee: every item with true count >
  * maxError survives (NO_FALSE_NEGATIVES), and every estimate brackets
  * the true count within [lb, ub].
  *
  * Merge ORDER can change which sub-threshold items are retained (purges
  * are order-sensitive), so exact sketch contents must never be
  * hash-compared — queries over this aggregate assert the CONTRACT
  * (membership + bracketing) against exact counts, as with KLL rank
  * error. */
case class FreqItemsBuild(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"frequent-items build needs a string column, got ${other.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buffer: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    child.eval(input) match {
      case null => ()
      case s: UTF8String => buffer.update(s.toString)
    }
    buffer
  }
  override def merge(buffer: ItemsSketch[String], other: ItemsSketch[String]): ItemsSketch[String] = {
    buffer.merge(other); buffer
  }
  override def eval(buffer: ItemsSketch[String]): Any =
    buffer.toByteArray(new ArrayOfStringsSerDe())

  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(new ArrayOfStringsSerDe())
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe())

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqItemsBuild =
    copy(child = newChildren.head)
}

/** Merges serialized frequent-items sketches and emits the union's
  * NO_FALSE_NEGATIVES frequent rows as array<struct<token, est, lb, ub>>
  * (explode downstream). maxMapSize must match the build aggregate's. */
case class FreqItemsUnionRows(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"frequent-items union needs a binary (serialized sketch) column, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("lb", LongType, nullable = false),
    StructField("ub", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buffer: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    child.eval(input) match {
      case null => ()
      case bytes: Array[Byte] =>
        buffer.merge(ItemsSketch.getInstance(Memory.wrap(bytes),
          new ArrayOfStringsSerDe()))
    }
    buffer
  }
  override def merge(buffer: ItemsSketch[String], other: ItemsSketch[String]): ItemsSketch[String] = {
    buffer.merge(other); buffer
  }
  override def eval(buffer: ItemsSketch[String]): Any = {
    val rows = buffer.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
    new GenericArrayData(rows.map { r =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(r.getItem),
        r.getEstimate, r.getLowerBound, r.getUpperBound))
    }.toArray[Any])
  }

  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(new ArrayOfStringsSerDe())
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe())

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsUnionRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsUnionRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqItemsUnionRows =
    copy(child = newChildren.head)
}

object FreqSketch {
  import org.apache.spark.sql.graftshim.ColumnBridge.{column, expression}

  /** Per-group frequent-items sketch (serialized, persistable, mergeable). */
  def freqBuild(c: Column, maxMapSize: Int = 256): Column =
    column(FreqItemsBuild(expression(c), maxMapSize).toAggregateExpression())

  /** Frequent rows of the union of serialized sketches. */
  def freqUnionRows(c: Column, maxMapSize: Int = 256): Column =
    column(FreqItemsUnionRows(expression(c), maxMapSize).toAggregateExpression())
}
