package graft.sources.v2

import java.util.OptionalLong

import org.apache.hadoop.fs.Path
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan, Statistics, SupportsReportPartitioning, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.partitioning.{Partitioning, UnknownPartitioning}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.types.StructType

import graft.sources.{DeltaLite, IcebergLite}

/** X291: streaming READ from a catalog table —
  * `spark.readStream.table("cat.db.t")` — with the table's OWN commit
  * log as the offset axis: Delta versions / Iceberg snapshot ids. The
  * first micro-batch is the table's current snapshot; every subsequent
  * batch is exactly the files the versions in (start, end] ADDED
  * (control-plane log diff, no data file opened to plan). Offsets are
  * checkpointed by Structured Streaming, so a restarted query resumes
  * from its last committed version — the read face of the exactly-once
  * contract whose write face is [[GraftStreamingWrite]]. Rewrites
  * (removes, merge-on-read delete state) REFUSE loudly: an append-only
  * stream cannot represent them — the change-feed readers (readCdf /
  * readChangelog) can.
  *
  * Scale notes: planning reads only the log/manifests of the new
  * versions (O(delta), never O(table)); the data plane is the stock
  * vectorized parquet reader over exactly the new files. */
private[v2] final case class GraftVersionOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

private[v2] final class GraftTableStream(
    path: String,
    format: String,
    tableSchema: StructType,
    readSchema: StructType)
  extends MicroBatchStream {

  private def spark = SparkSession.active

  override def initialOffset(): Offset = GraftVersionOffset(-1L)

  override def latestOffset(): Offset = GraftVersionOffset(format match {
    case "delta" => DeltaLite.latestVersion(spark, path)
    case _ => IcebergLite.currentSnapshotId(spark, path)
  })

  override def deserializeOffset(json: String): Offset =
    GraftVersionOffset(json.toLong)

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftVersionOffset].v
    val e = end.asInstanceOf[GraftVersionOffset].v
    if (s >= e) return Array.empty
    val files: Seq[String] = format match {
      case "delta" =>
        if (s < 0) {
          // the initial batch IS the snapshot at `e`
          val snap = DeltaLite.snapshotAt(spark, path, e)
          require(snap.dvs.isEmpty,
            s"$path carries deletion vectors — the table stream serves " +
              "appends only; consume row-level changes via readCdf")
          snap.files
        } else DeltaLite.addedFilesBetween(spark, path, s, e)
      case _ =>
        IcebergLite.addedFilesBetween(spark, path, s, e)
    }
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    files.zipWithIndex.map { case (f, idx) =>
      val abs = new Path(path, f)
      FilePartition(idx, Array(PartitionedFile(InternalRow.empty,
        SparkPath.fromPath(abs), 0L, fs.getFileStatus(abs).getLen,
        Array.empty[String]))): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftParquetReaders.factory(spark, tableSchema,
      StructType(readSchema.fields.filterNot(_.name == "_file")),
      Array.empty)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

/** Wraps a batch scan so the SAME pruned scan also answers
  * `toMicroBatchStream` — batch behavior (statistics, partitioning
  * report, columnar mode) delegates untouched. */
private[v2] final class StreamCapableScan(
    inner: Scan,
    mkStream: StructType => MicroBatchStream)
  extends Scan with SupportsReportStatistics with SupportsReportPartitioning {

  override def readSchema(): StructType = inner.readSchema()

  override def toBatch: org.apache.spark.sql.connector.read.Batch =
    inner.toBatch

  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream = mkStream(inner.readSchema())

  override def description(): String = inner.description()

  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    inner.columnarSupportMode()

  override def estimateStatistics(): Statistics = inner match {
    case s: SupportsReportStatistics => s.estimateStatistics()
    case _ => new Statistics {
      override def sizeInBytes(): OptionalLong = OptionalLong.empty()
      override def numRows(): OptionalLong = OptionalLong.empty()
    }
  }

  override def outputPartitioning(): Partitioning = inner match {
    case p: SupportsReportPartitioning => p.outputPartitioning()
    case _ => new UnknownPartitioning(0)
  }
}
