package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, Union}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, IntegerType, LongType}

/** Mergeable DataSketches aggregates beyond the built-in HLL family (X53):
  *
  *   - [[KllDoublesBuild]] / [[KllUnionQuantile]] — KLL quantile sketches:
  *     per-group/per-partition rank state that merges associatively, the
  *     scale path for percentiles over groups too large to window-sort
  *     (a per-group `percentile` sorts each group on ONE reducer; KLL state
  *     is O(k·log n) and shuffles bytes, not rows).
  *   - [[ThetaBuild]] / [[ThetaIntersectEstimate]] — Theta sketches close
  *     the set-algebra gap HLL cannot: HLL unions only, Theta supports
  *     INTERSECTION with bounded error, so "distinct keys present in EVERY
  *     group" is answerable from per-group state without rescanning facts.
  *
  * Buffers serialize through the DataSketches wire formats, so persisted
  * sketch columns (parquet binary) and shuffle-boundary partials are the
  * same bytes — the lakehouse incremental-stats pattern (cf. X53/X53b).
  *
  * Determinism: Theta hashing uses the library's fixed default seed, so
  * results are reproducible run-to-run. KLL compaction draws random bits,
  * so KLL keys must assert an ERROR CONTRACT (rank distance within the
  * sketch's guarantee), never an exact hash — at k=200 the normalized rank
  * error is ≈1.65% at 99% confidence.
  */
case class KllDoublesBuild(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll build needs a double column, got ${other.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    child.eval(input) match {
      case null => ()
      case d: java.lang.Double => buffer.update(d.doubleValue())
    }
    buffer
  }
  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other); buffer
  }
  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllDoublesBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllDoublesBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllDoublesBuild =
    copy(child = newChildren.head)
}

/** Merges serialized KLL sketches and evaluates the q-quantile of the
  * union. Null on an empty union (no input sketches). */
case class KllUnionQuantile(
    child: Expression,
    q: Double,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll union needs a binary (serialized sketch) column, got ${other.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    child.eval(input) match {
      case null => ()
      case bytes: Array[Byte] =>
        buffer.merge(KllDoublesSketch.heapify(Memory.wrap(bytes)))
    }
    buffer
  }
  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other); buffer
  }
  override def eval(buffer: KllDoublesSketch): Any =
    if (buffer.isEmpty) null else buffer.getQuantile(q)

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllUnionQuantile =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllUnionQuantile =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllUnionQuantile =
    copy(child = newChildren.head)
}

/** Per-group Theta sketch over an integral key, emitted as compact bytes.
  * The buffer is a theta `Union` — it accepts raw updates AND sketch
  * merges, and its state round-trips through the union wire format, so
  * shuffle-boundary partials merge losslessly. */
case class ThetaBuild(
    child: Expression,
    nominalEntries: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType | LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta build needs an int or long column, got ${other.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def createAggregationBuffer(): Union =
    SetOperation.builder().setNominalEntries(nominalEntries).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    child.eval(input) match {
      case null => ()
      case i: Integer => buffer.update(i.longValue())
      case l: java.lang.Long => buffer.update(l.longValue())
    }
    buffer
  }
  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult); buffer
  }
  override def eval(buffer: Union): Any = buffer.getResult.toByteArray
  override def serialize(buffer: Union): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): Union =
    SetOperation.heapify(Memory.wrap(bytes)).asInstanceOf[Union]

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaBuild =
    copy(child = newChildren.head)
}

/** Intersects serialized Theta sketches (one per input row — typically
  * per-group states) and evaluates the intersection's distinct estimate.
  * The empty buffer is the intersection IDENTITY (the universal set), so
  * partial merges in any grouping are sound. */
case class ThetaIntersectEstimate(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[CompactSketch]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta intersect needs a binary (serialized sketch) column, got ${other.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def createAggregationBuffer(): Option[CompactSketch] = None

  private def intersect(a: CompactSketch, b: CompactSketch): CompactSketch = {
    val ix = SetOperation.builder().buildIntersection()
    ix.intersect(a); ix.intersect(b)
    ix.getResult
  }

  override def update(buffer: Option[CompactSketch], input: InternalRow): Option[CompactSketch] =
    child.eval(input) match {
      case null => buffer
      case bytes: Array[Byte] =>
        val in = Sketches.heapifySketch(Memory.wrap(bytes)).compact()
        Some(buffer.fold(in)(intersect(_, in)))
    }

  override def merge(buffer: Option[CompactSketch], other: Option[CompactSketch]): Option[CompactSketch] =
    (buffer, other) match {
      case (None, x) => x
      case (x, None) => x
      case (Some(a), Some(b)) => Some(intersect(a, b))
    }

  override def eval(buffer: Option[CompactSketch]): Any =
    buffer.fold(0.0)(_.getEstimate)

  override def serialize(buffer: Option[CompactSketch]): Array[Byte] =
    buffer.fold(Array.empty[Byte])(_.toByteArray)
  override def deserialize(bytes: Array[Byte]): Option[CompactSketch] =
    if (bytes.isEmpty) None
    else Some(Sketches.heapifySketch(Memory.wrap(bytes)).compact())

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaIntersectEstimate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaIntersectEstimate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaIntersectEstimate =
    copy(child = newChildren.head)
}

/** Scalar expression over a SERIALIZED KLL sketch column: extract several
  * quantiles at once. This is the read half of sketch-column algebra —
  * persisted per-group/per-partition sketch state queried without touching
  * the facts. Evaluates post-aggregation on one row per group, so
  * `CodegenFallback` costs nothing in the hot path. */
case class KllQuantilesExpr(child: Expression, qs: Seq[Double])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll quantiles needs a binary (serialized sketch) column, got ${other.simpleString}")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(input.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      qs.map(q => sk.getQuantile(q)).toArray)
  }
  override protected def withNewChildInternal(newChild: Expression): KllQuantilesExpr =
    copy(child = newChild)
}

object SketchAggregates {
  import org.apache.spark.sql.graftshim.ColumnBridge.{column, expression}

  /** Quantiles read from a serialized KLL sketch column (scalar). */
  def kllQuantiles(c: Column, qs: Seq[Double]): Column =
    column(KllQuantilesExpr(expression(c), qs))

  /** Per-group KLL quantile sketch (serialized, persistable, mergeable). */
  def kllBuild(c: Column, k: Int = 200): Column =
    column(KllDoublesBuild(expression(c), k).toAggregateExpression())

  /** q-quantile of the union of serialized KLL sketches. */
  def kllUnionQuantile(c: Column, q: Double, k: Int = 200): Column =
    column(KllUnionQuantile(expression(c), q, k).toAggregateExpression())

  /** Per-group Theta sketch (serialized, persistable, mergeable). */
  def thetaBuild(c: Column, nominalEntries: Int = 4096): Column =
    column(ThetaBuild(expression(c), nominalEntries).toAggregateExpression())

  /** Distinct-count estimate of the INTERSECTION of serialized sketches. */
  def thetaIntersect(c: Column): Column =
    column(ThetaIntersectEstimate(expression(c)).toAggregateExpression())
}
