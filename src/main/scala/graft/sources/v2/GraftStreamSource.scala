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
private[v2] final case class GraftStreamOffset(snapV: Long, v: Long,
    k: Long) extends Offset {
  override def json(): String = s"$snapV/$v/$k"
}

private[v2] object GraftStreamOffset {
  def parse(s: String): GraftStreamOffset = {
    val Array(a, b, c) = s.split('/')
    GraftStreamOffset(a.toLong, b.toLong, c.toLong)
  }
}

private[v2] final class GraftTableStream(
    path: String,
    format: String,
    tableSchema: StructType,
    readSchema: StructType,
    maxFilesPerTrigger: Option[Int] = None)
  extends MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private def spark = SparkSession.active

  private def latestVersion: Long = format match {
    case "delta" => DeltaLite.latestVersion(spark, path)
    case _ => IcebergLite.currentSnapshotId(spark, path)
  }

  // a committed version's added-file list is immutable, but admission
  // control walks unit(v) once per candidate version per micro-batch and
  // planInputPartitions re-reads it — memoize per stream instance so each
  // version's log/manifest diff is computed once per query run
  private val unitCache =
    scala.collection.mutable.Map.empty[(Long, Long), Seq[String]]

  /** The offset axis is a concatenation of UNITS: unit(snapV) is the
    * pinned INITIAL SNAPSHOT's file list, unit(v > snapV) is exactly
    * the files version v added. File-granular offsets (v, k) = k files
    * of unit(v) consumed — so admission control can split a 100 TB
    * initial snapshot into bounded micro-batches instead of one. */
  private def unit(snapV: Long, v: Long): Seq[String] =
    unitCache.getOrElseUpdate((snapV, v), unitUncached(snapV, v))

  private def unitUncached(snapV: Long, v: Long): Seq[String] =
    if (v == snapV) format match {
      case "delta" =>
        val snap = DeltaLite.snapshotAt(spark, path, v)
        require(snap.dvs.isEmpty,
          s"$path carries deletion vectors — the table stream serves " +
            "appends only; consume row-level changes via readCdf")
        snap.files
      case _ =>
        // the table stream scans files BY NAME under the stream schema —
        // an initial snapshot holding pre-rename files would misread
        require(!IcebergLite.nameDrift(spark, path),
          s"$path has live files written under since-renamed column " +
            "names — IcebergLite.rewriteDataFiles first, then stream")
        IcebergLite.addedFilesBetween(spark, path, -1L, v)
    }
    else format match {
      case "delta" => DeltaLite.addedFilesBetween(spark, path, v - 1, v)
      // Iceberg snapshot ids are monotone but NOT dense — a metadata-only
      // commit (ALTER, spec evolution) bumps the version without a
      // snapshot. addedFilesAt treats a gap id as an empty unit and diffs
      // a present id against its actual predecessor snapshot, so a
      // checkpointed stream survives ALTER + append.
      case _ =>
        require(!IcebergLite.addedNamesDrift(spark, path, v),
          s"snapshot $v of $path added files under since-renamed column " +
            "names — IcebergLite.rewriteDataFiles first, then stream")
        IcebergLite.addedFilesAt(spark, path, v)
    }

  override def initialOffset(): Offset = {
    val snapV = latestVersion
    GraftStreamOffset(snapV, snapV, 0L)
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) drives this admission-controlled " +
        "source")

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    maxFilesPerTrigger
      .map(n => org.apache.spark.sql.connector.read.streaming.ReadLimit
        .maxFiles(n))
      .getOrElse(org.apache.spark.sql.connector.read.streaming.ReadLimit
        .allAvailable())

  // Trigger.AvailableNow pins its end HERE, so a concurrent writer
  // cannot keep the drain alive forever
  @volatile private var availableNowBound: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowBound = Some(latestVersion)
  }

  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : Offset = {
    val s = start.asInstanceOf[GraftStreamOffset]
    val cap = limit match {
      case m: org.apache.spark.sql.connector.read.streaming.ReadMaxFiles =>
        m.maxFiles()
      case _ => Int.MaxValue
    }
    val bound = availableNowBound.fold(latestVersion)(
      b => math.min(b, latestVersion))
    var v = s.v
    var k = s.k
    var budget = cap.toLong
    var done = false
    while (!done && budget > 0) {
      val size = unit(s.snapV, v).size.toLong
      if (k < size) {
        val take = math.min(budget, size - k)
        k += take
        budget -= take
      } else if (v < bound) { v += 1; k = 0 }
      else done = true
    }
    GraftStreamOffset(s.snapV, v, k)
  }

  override def reportLatestOffset(): Offset = null // AvailableNow pins
  // through prepareForTriggerAvailableNow, never this

  override def deserializeOffset(json: String): Offset =
    GraftStreamOffset.parse(json)

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftStreamOffset]
    val e = end.asInstanceOf[GraftStreamOffset]
    val files: Seq[String] = (s.v to e.v).flatMap { v =>
      val u = unit(s.snapV, v)
      val from = if (v == s.v) s.k.toInt else 0
      val until = if (v == e.v) e.k.toInt else u.size
      u.slice(from, until)
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
