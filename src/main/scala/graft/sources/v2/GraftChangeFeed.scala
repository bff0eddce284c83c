package graft.sources.v2

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, V1Scan}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.sources.{BaseRelation, TableScan}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{DeltaLite, IcebergLite}

/** X297: the CHANGE FEED as a catalog relation — `cat.db.t.changes`
  * (the metadata-table idiom the catalog already speaks, but DATA-sized):
  *
  *   - BATCH: `SELECT * FROM cat.db.t.changes` serves the full row-level
  *     change history — [[DeltaLite.readCdf]] (schema + `_change_type` +
  *     `_commit_version`) or [[IcebergLite.readChangelog]] (schema +
  *     `_change_type` + `_snapshot_id`) — through the V1 bridge, exactly
  *     the batch readers' answers.
  *   - STREAMING (Delta): `spark.readStream.table("cat.db.t.changes")`
  *     drains each commit's change set as a micro-batch — so tables that
  *     take row-level DML stream too, where the append-only
  *     `readStream.table(t)` (X291) rightly refuses rewrites. Offsets
  *     are commit versions (a version's change set commits atomically);
  *     `option("startingVersion", v)` replays history from `v`, default
  *     = changes after stream start. Micro-batch N is byte-equal to
  *     `readCdf(N-1, N)`: cdc files serve their own `_change_type`
  *     column, dataChange adds serve as `insert`, dataChange removes
  *     serve their PRIOR live rows (deletion-vector masked) as `delete`.
  *
  * Scale notes: planning touches only the versions in (start, end] —
  * O(changed commits), never O(table); the data plane is one parquet
  * read per change file with the DV mask applied reader-side; the batch
  * face is the same log-driven plan [[DeltaLite.readCdf]] builds. */
private[v2] final class GraftChangesTable(
    tableName: String,
    parent: String,
    format: String,
    baseSchema: StructType)
  extends Table with SupportsRead {

  private def spark = SparkSession.active

  private val axis =
    if (format == "delta") "_commit_version" else "_snapshot_id"
  private val feedSchema = baseSchema
    .add("_change_type", StringType).add(axis, LongType)

  override def name(): String = tableName

  override def schema(): StructType = feedSchema

  override def capabilities(): util.Set[TableCapability] = {
    val caps = util.EnumSet.of(TableCapability.BATCH_READ)
    if (format == "delta") caps.add(TableCapability.MICRO_BATCH_READ)
    caps
  }

  private def batchFeed(): DataFrame = format match {
    case "delta" =>
      val from = DeltaLite.firstCdfVersion(spark, parent).getOrElse(
        throw new UnsupportedOperationException(
          s"$tableName: change data feed is not enabled — " +
            "DeltaLite.enableCdf first"))
      DeltaLite.readCdf(spark, parent, from,
        DeltaLite.latestVersion(spark, parent))
    case _ =>
      IcebergLite.readChangelog(spark, parent, 0L,
        IcebergLite.currentSnapshotId(spark, parent))
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new ScanBuilder {
    override def build(): Scan = {
      val v1 = new DataFrameScanBuilder(tableName, () => batchFeed(),
        feedSchema).build().asInstanceOf[V1Scan]
      new V1Scan {
        override def readSchema(): StructType = feedSchema
        override def toV1TableScan[T <: BaseRelation with TableScan](
            context: org.apache.spark.sql.SQLContext): T =
          v1.toV1TableScan(context)
        override def toMicroBatchStream(checkpointLocation: String)
            : MicroBatchStream = {
          require(format == "delta",
            s"$tableName: the Iceberg changelog is batch-only in this " +
              "subset — read ranges via IcebergLite.readChangelog or the " +
              "batch t.changes relation")
          new GraftChangeFeedStream(parent, baseSchema,
            Option(options.get("startingVersion")).map(_.toLong))
        }
        override def description(): String =
          s"graft change feed of $tableName"
      }
    }
  }
}

/** Offset = the last commit version whose change set is consumed. */
private[v2] final case class GraftCdfOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

private[v2] final class GraftChangeFeedStream(
    path: String,
    baseSchema: StructType,
    startingVersion: Option[Long])
  extends MicroBatchStream {

  private def spark = SparkSession.active

  override def initialOffset(): Offset = GraftCdfOffset(
    startingVersion.map(_ - 1)
      .getOrElse(DeltaLite.latestVersion(spark, path)))

  override def latestOffset(): Offset =
    GraftCdfOffset(DeltaLite.latestVersion(spark, path))

  override def deserializeOffset(json: String): Offset =
    GraftCdfOffset(json.toLong)

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftCdfOffset].v
    val e = end.asInstanceOf[GraftCdfOffset].v
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    var idx = -1
    ((s + 1) to e).flatMap { v =>
      DeltaLite.changeUnits(spark, path, v).map { u =>
        idx += 1
        val abs = new Path(DeltaLite.dataPath(path, u.relPath))
        ChangeFilePartition(
          FilePartition(idx, Array(PartitionedFile(InternalRow.empty,
            SparkPath.fromPath(abs), 0L, fs.getFileStatus(abs).getLen,
            Array.empty[String]))),
          u.kind, v, u.dvPositions): InputPartition
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val cdcSchema = baseSchema.add("_change_type", StringType)
    new ChangeFeedReaderFactory(
      GraftParquetReaders.factory(spark, cdcSchema, cdcSchema, Array.empty),
      GraftParquetReaders.factory(spark, baseSchema, baseSchema,
        Array.empty),
      baseSchema)
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

/** One change file: the parquet partition plus HOW its rows announce —
  * `cdc` (in-file `_change_type`), `insert`, or `delete` (the latter
  * DV-masked: `dvPositions` are prior-version row indexes that must not
  * re-announce their deletion). */
private[v2] final case class ChangeFilePartition(
    fp: FilePartition,
    kind: String,
    version: Long,
    dvPositions: Array[Long]) extends InputPartition

private[v2] final class ChangeFeedReaderFactory(
    cdcFactory: PartitionReaderFactory,
    dataFactory: PartitionReaderFactory,
    baseSchema: StructType)
  extends PartitionReaderFactory {

  private val baseWidth = baseSchema.fields.length
  private val types = baseSchema.fields.map(_.dataType)

  override def supportColumnarReads(partition: InputPartition): Boolean =
    false

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val cp = partition.asInstanceOf[ChangeFilePartition]
    val isCdc = cp.kind == "cdc"
    val inner = (if (isCdc) cdcFactory else dataFactory).createReader(cp.fp)
    val tag = if (isCdc) null else UTF8String.fromString(cp.kind)
    val masked = cp.dvPositions // sorted row indexes to skip
    new PartitionReader[InternalRow] {
      private var rowIdx = -1L
      private var mi = 0
      override def next(): Boolean = {
        while (inner.next()) {
          rowIdx += 1
          while (mi < masked.length && masked(mi) < rowIdx) mi += 1
          if (mi >= masked.length || masked(mi) != rowIdx) return true
        }
        false
      }
      override def get(): InternalRow = {
        val r = inner.get()
        val out = new GenericInternalRow(baseWidth + 2)
        var i = 0
        while (i < baseWidth) {
          out(i) = if (r.isNullAt(i)) null else r.get(i, types(i))
          i += 1
        }
        out(baseWidth) =
          if (isCdc) {
            if (r.isNullAt(baseWidth)) null
            else r.get(baseWidth, StringType)
          } else tag
        out(baseWidth + 1) = cp.version
        out
      }
      override def close(): Unit = inner.close()
    }
  }
}
