package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded per-group top-k as a `TypedImperativeAggregate` — the scale
  * replacement for the window `row_number() <= k` pattern.
  *
  * The window formulation sorts EVERY group's full row set (a per-partition
  * sort of the whole fact table under the window exchange) and discards all
  * but k rows afterward. This aggregate keeps a bounded k-element heap per
  * group, combines partially on the map side, and merges heaps at the
  * shuffle — so at most k·(partitions) rows per group ever move, and
  * nothing is globally sorted. Same exact result (deterministic tie-break:
  * higher score wins, then LOWER id — so the output is unique for any
  * input permutation).
  *
  * State is (score: double, id: long) pairs; `eval` returns the k winners
  * as an array of structs sorted (score desc, id asc), ready to
  * `posexplode` back into ranked rows.
  */
case class TopKPairs(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, s"topK needs k > 0, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    (scoreExpr.dataType, idExpr.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"topK needs (double score, long id), got (${s.simpleString}, ${i.simpleString})")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)

  /** Min-heap by keep-priority: head is the WEAKEST element (lowest score;
    * among equal scores the HIGHEST id), so a better candidate replaces the
    * head in O(log k). */
  private val weakestFirst: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(weakestFirst)

  private def offer(buf: mutable.PriorityQueue[(Double, Long)], s: Double, id: Long): Unit =
    if (buf.size < k) buf.enqueue((s, id))
    else {
      val (ws, wid) = buf.head
      if (s > ws || (s == ws && id < wid)) { buf.dequeue(); buf.enqueue((s, id)) }
    }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    if (s != null && id != null)
      offer(buf, s.asInstanceOf[Double], id.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { case (s, id) => offer(buf, s, id) }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val winners = buf.toArray.sortBy { case (s, id) => (-s, id) }
    new GenericArrayData(winners.map { case (s, id) => InternalRow(s, id) })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, id) => out.writeDouble(s); out.writeLong(id) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKAggregate {
  import org.apache.spark.sql.graftshim.ColumnBridge.{column, expression}

  /** Column form: array<struct<score,id>> of the group's top k, sorted
    * (score desc, id asc). */
  def topK(score: Column, id: Column, k: Int): Column =
    column(TopKPairs(expression(score), expression(id), k).toAggregateExpression())
}
