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
  *   - STREAMING: `spark.readStream.table("cat.db.t.changes")` drains
  *     each commit's change set as a micro-batch — so tables that take
  *     row-level DML stream too, where the append-only
  *     `readStream.table(t)` (X291) rightly refuses rewrites. Offsets
  *     are commit versions / snapshot ids (a commit's change set lands
  *     atomically); `option("startingVersion", v)` replays history from
  *     `v`, default = changes after stream start. Delta micro-batch N is
  *     byte-equal to `readCdf(N-1, N)`: cdc files serve their own
  *     `_change_type` column, dataChange adds serve as `insert`,
  *     dataChange removes serve their PRIOR live rows (deletion-vector
  *     masked) as `delete`. Iceberg micro-batches follow
  *     `readChangelog`'s state-diff rules file-granularly: added files
  *     as `insert`, removed files' parent-live rows as `delete`
  *     (parent pos-deletes masked), a MOR position-delete commit's
  *     masked rows as `delete` (the reader EMITS exactly those
  *     positions), an EQUALITY-delete commit's masked rows as
  *     value-filtered `delete` units over the parent-live files (X301 —
  *     streaming-upsert tables, equality deletes' whole reason to
  *     exist, stream their feed); `replace` snapshots are row-silent.
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

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

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
            : MicroBatchStream =
          new GraftChangeFeedStream(parent, baseSchema,
            Option(options.get("startingVersion")).map(_.toLong), format,
            Option(options.get("maxFilesPerTrigger")).map(_.toInt))
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
    startingVersion: Option[Long],
    format: String = "delta",
    maxFilesPerTrigger: Option[Int] = None)
  extends MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
  with org.apache.spark.sql.connector.read.streaming
    .SupportsTriggerAvailableNow {

  private def spark = SparkSession.active

  private def head: Long =
    if (format == "delta") DeltaLite.latestVersion(spark, path)
    else IcebergLite.currentSnapshotId(spark, path)

  /** The commit ids in (s, e] that can hold change units — all versions
    * for Delta (dense), the snapshots list for Iceberg (gap-tolerant). */
  private def idsIn(s: Long, e: Long): Seq[Long] =
    if (format == "delta") (s + 1) to e
    else IcebergLite.snapshotIdList(spark, path).filter(id =>
      id > s && id <= e)

  // A committed version's change set is IMMUTABLE (it derives from that
  // commit's and its parent's manifests alone), but the planner asks for
  // it repeatedly — once per micro-batch in admission control
  // (unitCount), again in planInputPartitions — and computing Iceberg
  // units opens position-delete files (Spark jobs). Memoize per stream
  // instance: one computation per version per query run.
  private val deltaUnitCache =
    scala.collection.mutable.Map.empty[Long, Seq[DeltaLite.ChangeUnit]]
  private val iceUnitCache =
    scala.collection.mutable.Map.empty[Long, Seq[IcebergLite.IceChangeUnit]]

  private def deltaUnits(id: Long): Seq[DeltaLite.ChangeUnit] =
    deltaUnitCache.getOrElseUpdate(id,
      DeltaLite.changeUnits(spark, path, id))

  private def iceUnits(id: Long): Seq[IcebergLite.IceChangeUnit] =
    iceUnitCache.getOrElseUpdate(id,
      IcebergLite.changeUnits(spark, path, id))

  private def unitCount(id: Long): Int =
    if (format == "delta") deltaUnits(id).size
    else iceUnits(id).size

  override def initialOffset(): Offset = GraftCdfOffset(
    startingVersion.map(_ - 1).getOrElse(head))

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
    availableNowBound = Some(head)
  }

  /** ADMISSION CONTROL: a commit's change set lands atomically (offsets
    * are whole versions), but `maxFilesPerTrigger` bounds how many
    * COMMITS a micro-batch spans by their change-file count — replaying
    * a long DML history drains as bounded batches, never one. At least
    * one commit per batch, so progress is guaranteed. */
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : Offset = {
    val s = start.asInstanceOf[GraftCdfOffset].v
    val cap = limit match {
      case m: org.apache.spark.sql.connector.read.streaming.ReadMaxFiles =>
        m.maxFiles()
      case _ => Int.MaxValue
    }
    val bound = availableNowBound.fold(head)(b => math.min(b, head))
    var last = s
    var budget = cap.toLong
    var first = true
    idsIn(s, bound).foreach { id =>
      if (budget > 0 || first) {
        val n = unitCount(id)
        if (first || n <= budget) {
          last = id
          budget -= n
          first = false
        } else budget = 0
      }
    }
    GraftCdfOffset(last)
  }

  override def reportLatestOffset(): Offset = null // AvailableNow pins
  // through prepareForTriggerAvailableNow, never this

  override def deserializeOffset(json: String): Offset =
    GraftCdfOffset(json.toLong)

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftCdfOffset].v
    val e = end.asInstanceOf[GraftCdfOffset].v
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    var idx = -1
    // equality tuple relations travel with their columns resolved to
    // baseSchema ordinals — the executor-side reader compares canonical
    // raw values per tuple (N-column composite keys included, X305)
    def eqIdx(eq: Seq[graft.sources.EqVals])
        : Seq[(Array[Int], Array[Seq[Any]])] =
      eq.map(ev =>
        (ev.cols.map(baseSchema.fieldIndex).toArray, ev.tuples))
    def part(abs: Path, kind: String, v: Long, emit: Array[Long],
        skip: Array[Long],
        emitEq: Seq[(Array[Int], Array[Seq[Any]])] = Nil,
        skipEq: Seq[(Array[Int], Array[Seq[Any]])] = Nil): InputPartition = {
      idx += 1
      ChangeFilePartition(
        FilePartition(idx, Array(PartitionedFile(InternalRow.empty,
          SparkPath.fromPath(abs), 0L, fs.getFileStatus(abs).getLen,
          Array.empty[String]))),
        kind, v, skip, emit, emitEq, skipEq)
    }
    if (format == "delta")
      ((s + 1) to e).flatMap { v =>
        deltaUnits(v).map(u =>
          part(new Path(DeltaLite.dataPath(path, u.relPath)), u.kind, v,
            emit = null, skip = u.dvPositions))
      }.toArray
    else
      // iceberg snapshot ids are monotone but not dense: plan only the
      // ids actually in the snapshots list
      IcebergLite.snapshotIdList(spark, path)
        .filter(id => id > s && id <= e).flatMap { id =>
          iceUnits(id).map(u =>
            part(new Path(u.absPath), u.kind, id,
              emit = u.emit, skip = u.skip,
              emitEq = eqIdx(u.emitEq), skipEq = eqIdx(u.skipEq)))
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
  * `cdc` (in-file `_change_type`), `insert`, or `delete`. `skip` holds
  * prior-version row indexes that must NOT re-announce (Delta deletion
  * vectors / Iceberg parent position-deletes); `emit`, when non-null,
  * INVERTS the mask — serve ONLY those positions (an Iceberg MOR
  * position-delete commit announces exactly the rows it masked).
  * `emitEq` is the VALUE spelling of `emit` (X301 — an EQUALITY-delete
  * commit announces rows whose column value matches), and `skipEq` the
  * value spelling of `skip` (rows the parent's equality deletes already
  * masked); each entry is one delete file's N-column TUPLE relation,
  * columns as baseSchema ordinals. A row is served iff it passes the
  * emit selection (positions ∪ values; everything when neither is set)
  * and neither skip mask. */
private[v2] final case class ChangeFilePartition(
    fp: FilePartition,
    kind: String,
    version: Long,
    skip: Array[Long],
    emit: Array[Long] = null,
    emitEq: Seq[(Array[Int], Array[Seq[Any]])] = Nil,
    skipEq: Seq[(Array[Int], Array[Seq[Any]])] = Nil) extends InputPartition

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
    val masked = cp.skip // sorted row indexes to skip
    val emit = cp.emit // non-null: sorted row indexes to serve EXCLUSIVELY
    val emitEq = graft.sources.EqVals.checks(cp.emitEq, types)
    val skipEq = graft.sources.EqVals.checks(cp.skipEq, types)
    def eqHit(r: InternalRow,
        checks: Array[graft.sources.EqVals.Check]): Boolean =
      graft.sources.EqVals.hit(r, checks)
    new PartitionReader[InternalRow] {
      private var rowIdx = -1L
      private var mi = 0
      private var si = 0
      override def next(): Boolean = {
        while (inner.next()) {
          rowIdx += 1
          // emit selection: positions ∪ value match; all rows when
          // neither mask is set
          val selected =
            if (emit == null && emitEq.isEmpty) true
            else {
              var hit = false
              if (emit != null) {
                while (mi < emit.length && emit(mi) < rowIdx) mi += 1
                hit = mi < emit.length && emit(mi) == rowIdx
              }
              hit || (emitEq.nonEmpty && eqHit(inner.get(), emitEq))
            }
          if (selected) {
            while (si < masked.length && masked(si) < rowIdx) si += 1
            val posDead = si < masked.length && masked(si) == rowIdx
            if (!posDead &&
                (skipEq.isEmpty || !eqHit(inner.get(), skipEq)))
              return true
          }
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
