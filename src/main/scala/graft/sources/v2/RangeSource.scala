package graft.sources.v2

import java.util

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expression, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** X223: a full DataSourceV2 batch source — the "move work INTO the scan"
  * architecture the reference's JDBC reads rely on
  * (`Sites/DataProc_Script/spark_ingest_slmandicprd.py:56-63` pushes a
  * dbtable subquery to MySQL), expressed through Spark's connector API so
  * Catalyst does the pushing:
  *
  *   - '''filter pushdown''' (`SupportsPushDownFilters`): range predicates
  *     on `id` NARROW the served interval (the scan never materializes
  *     pruned rows — the DSv2 analogue of partition pruning), and
  *     `bucket = k` equality is applied inside the partition reader;
  *     anything else is reported back as residual for Spark to evaluate.
  *   - '''column pruning''' (`SupportsPushDownRequiredColumns`): readers
  *     build rows of exactly the pruned schema — a projection never pays
  *     for unread columns (the `ReadSchema` contract parquet gives for free,
  *     implemented by hand here).
  *   - '''limit pushdown''' (`SupportsPushDownLimit`): each partition stops
  *     emitting after `limit` rows; Spark still applies the global limit.
  *   - '''partition planning''': the (narrowed) interval splits into
  *     `slices` contiguous `InputPartition`s — the executor-parallelism
  *     contract a 1000-executor cluster scan depends on.
  *
  * The table itself is deterministic ("a numbers table with derived
  * columns"), so the DuckDB oracle reproduces it from `range()` and the
  * differential gate proves the pushdown machinery does not change answers.
  * Registered as `graft-range` via `DataSourceRegister` (META-INF services).
  */
object RangeSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", LongType, nullable = false),
    StructField("val", LongType, nullable = false),
    StructField("tag", StringType, nullable = false)))

  private[v2] def bucketOf(id: Long): Long = id % 16L
  private[v2] def valOf(id: Long): Long = (id * 2654435761L) % 1000003L
}

class RangeTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-range"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = RangeSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    def opt(key: String, dflt: Long): Long =
      Option(properties.get(key)).map(_.toLong).getOrElse(dflt)
    new RangeTable(opt("start", 0L), opt("end", 1000L), opt("slices", 4L).toInt)
  }
}

class RangeTable(start: Long, end: Long, slices: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_range($start, $end)"
  override def schema(): StructType = RangeSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RangeScanBuilder(start, end, slices)
}

class RangeScanBuilder(start: Long, end: Long, slices: Int)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit
    with SupportsPushDownAggregates {

  private var lo = start
  private var hi = end
  private var bucketEq: Option[Long] = None
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = RangeSource.schema
  private var limit: Int = -1
  // (groupCols, aggSpecs) once an aggregate is pushed; specs are
  // "count" | "sum:col" | "min:col" | "max:col" over the derived columns
  private var pushedAgg: Option[(Seq[String], Seq[String])] = None

  private def fieldName(e: Expression): Option[String] = e match {
    case f: NamedReference if f.fieldNames().length == 1 => Some(f.fieldNames()(0))
    case _ => None
  }

  /** Partial aggregate pushdown: each slice pre-aggregates its interval and
    * emits one row per group — the map-side-combine contract, done at the
    * source. Spark plans the final merge (sum of counts/sums, min of mins,
    * max of maxes), so a 1000-slice scan ships `slices × |groups|` rows
    * instead of the raw interval. Supported shape: GROUP BY bucket (or
    * global), COUNT(*) / SUM / MIN / MAX over source columns. */
  override def supportCompletePushDown(aggregation: Aggregation): Boolean = false

  override def pushAggregation(aggregation: Aggregation): Boolean = {
    if (limit >= 0) return false
    val groups = aggregation.groupByExpressions().toSeq.map { e =>
      fieldName(e) match {
        case Some("bucket") => "bucket"
        case _ => return false
      }
    }
    val specs = aggregation.aggregateExpressions().toSeq.map { f: AggregateFunc =>
      f match {
        case _: CountStar => "count"
        case s: Sum if !s.isDistinct && fieldName(s.column).isDefined =>
          "sum:" + fieldName(s.column).get
        case m: Min if fieldName(m.column).isDefined =>
          "min:" + fieldName(m.column).get
        case m: Max if fieldName(m.column).isDefined =>
          "max:" + fieldName(m.column).get
        case _ => return false
      }
    }
    pushedAgg = Some((groups, specs))
    required = StructType(
      groups.map(g => StructField(g, LongType, nullable = false)) ++
        specs.zipWithIndex.map { case (sp, i) =>
          StructField(s"agg_$i" + "_" + sp.replace(':', '_'), LongType, nullable = false)
        })
    true
  }

  private def num(v: Any): Option[Long] = v match {
    case n: Number => Some(n.longValue())
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val residual = ArrayBuffer.empty[Filter]
    val ok = ArrayBuffer.empty[Filter]
    filters.foreach {
      case f @ GreaterThanOrEqual("id", v) if num(v).isDefined =>
        lo = math.max(lo, num(v).get); ok += f
      case f @ GreaterThan("id", v) if num(v).isDefined =>
        lo = math.max(lo, num(v).get + 1); ok += f
      case f @ LessThan("id", v) if num(v).isDefined =>
        hi = math.min(hi, num(v).get); ok += f
      case f @ LessThanOrEqual("id", v) if num(v).isDefined =>
        hi = math.min(hi, num(v).get + 1); ok += f
      case f @ EqualTo("id", v) if num(v).isDefined =>
        lo = math.max(lo, num(v).get); hi = math.min(hi, num(v).get + 1); ok += f
      case f @ EqualTo("bucket", v) if num(v).isDefined =>
        bucketEq = Some(num(v).get); ok += f
      case other =>
        residual += other
    }
    accepted = ok.toArray
    residual.toArray
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushLimit(l: Int): Boolean =
    if (pushedAgg.isDefined) false else { limit = l; true }

  override def build(): Scan =
    new RangeScan(lo, hi, slices, bucketEq, required, limit, pushedAgg)
}

case class RangePartition(lo: Long, hi: Long) extends InputPartition

class RangeScan(
    lo: Long,
    hi: Long,
    slices: Int,
    bucketEq: Option[Long],
    required: StructType,
    limit: Int,
    pushedAgg: Option[(Seq[String], Seq[String])] = None)
    extends Scan
    with Batch {

  override def readSchema(): StructType = required

  override def description(): String =
    s"GraftRange[start=$lo, end=$hi, slices=$slices, " +
      s"bucket=${bucketEq.getOrElse("*")}, limit=$limit, " +
      pushedAgg.map { case (g, a) =>
        s"agg=[${a.mkString(",")}] groupBy=[${g.mkString(",")}], "
      }.getOrElse("") +
      s"cols=${required.fieldNames.mkString(",")}]"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(0L, hi - lo)
    if (n == 0L) return Array(RangePartition(lo, lo)) // empty interval: one empty slice
    val k = math.max(1, math.min(slices.toLong, n).toInt)
    Array.tabulate(k) { i =>
      RangePartition(lo + i * n / k, lo + (i + 1) * n / k)
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = pushedAgg match {
    case Some((groups, specs)) =>
      new RangeAggReaderFactory(groups.nonEmpty, specs, bucketEq)
    case None =>
      new RangeReaderFactory(required.fieldNames, bucketEq, limit)
  }
}

class RangeReaderFactory(cols: Array[String], bucketEq: Option[Long], limit: Int)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RangePartition]
    new PartitionReader[InternalRow] {
      private var id = p.lo - 1
      private var emitted = 0

      override def next(): Boolean = {
        if (limit >= 0 && emitted >= limit) return false
        id += 1
        while (id < p.hi && !bucketEq.forall(_ == RangeSource.bucketOf(id))) id += 1
        if (id < p.hi) { emitted += 1; true } else false
      }

      override def get(): InternalRow = {
        val values: Array[Any] = cols.map {
          case "id" => id
          case "bucket" => RangeSource.bucketOf(id)
          case "val" => RangeSource.valOf(id)
          case "tag" => UTF8String.fromString("b" + RangeSource.bucketOf(id))
        }
        new GenericInternalRow(values)
      }

      override def close(): Unit = ()
    }
  }
}

/** Aggregated-mode reader: one pass over the slice, a per-group accumulator
  * array, then `|groups|` output rows — the slice's raw interval never
  * leaves the reader. */
class RangeAggReaderFactory(byBucket: Boolean, specs: Seq[String], bucketEq: Option[Long])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RangePartition]
    new PartitionReader[InternalRow] {
      private var rows: Iterator[InternalRow] = _
      private var current: InternalRow = _

      private def compute(): Iterator[InternalRow] = {
        // accumulators: group key -> per-spec (count / sum / min / max)
        val acc = scala.collection.mutable.LinkedHashMap.empty[Long, Array[Long]]
        var id = p.lo
        while (id < p.hi) {
          val b = RangeSource.bucketOf(id)
          if (bucketEq.forall(_ == b)) {
            val key = if (byBucket) b else 0L
            val a = acc.getOrElseUpdate(key, specs.map {
              case "count" => 0L
              case s if s.startsWith("sum:") => 0L
              case s if s.startsWith("min:") => Long.MaxValue
              case _ => Long.MinValue
            }.toArray)
            var i = 0
            while (i < specs.length) {
              val sp = specs(i)
              val col = if (sp == "count") "" else sp.substring(4)
              val v = col match {
                case "id" => id
                case "bucket" => b
                case "val" => RangeSource.valOf(id)
                case _ => 0L
              }
              if (sp == "count") a(i) += 1L
              else if (sp.startsWith("sum:")) a(i) += v
              else if (sp.startsWith("min:")) a(i) = math.min(a(i), v)
              else a(i) = math.max(a(i), v)
              i += 1
            }
          }
          id += 1
        }
        acc.iterator.map { case (k, a) =>
          val out: Array[Any] =
            (if (byBucket) Array[Any](k) else Array.empty[Any]) ++ a.map(x => x: Any)
          new GenericInternalRow(out)
        }
      }

      override def next(): Boolean = {
        if (rows == null) rows = compute()
        if (rows.hasNext) { current = rows.next(); true } else false
      }

      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
