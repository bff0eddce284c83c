package graft.sources.v2

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.TaskAttemptID
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.execution.datasources.{FilePartition, OutputWriterFactory, PartitionedFile}
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import graft.sources.{DeltaLite, IcebergLite}

/** X284: SQL `UPDATE` and `MERGE INTO` through the catalog — Spark's
  * GROUP-BASED row-level-operation contract (`SupportsRowLevelOperations`,
  * the machinery Iceberg's Spark integration uses) implemented as a
  * Delta copy-on-write rewrite:
  *
  *   1. Spark's rewrite rules turn `UPDATE`/`MERGE`/fallback-`DELETE`
  *      into a ReplaceData plan: read the AFFECTED GROUPS (files), apply
  *      the modifications, write the replacement rows back.
  *   2. The operation's SCAN is a real parquet batch scan over the
  *      pinned snapshot — ONE input partition per file, each row tagged
  *      with its `_file` coordinate by a thin reader wrapper — and it
  *      implements RUNTIME GROUP FILTERING (`SupportsRuntimeV2Filtering`
  *      on `_file`): Spark runs the group-filter subquery first, hands
  *      the affected file set to the scan, and only those files are
  *      read and rewritten — O(touched), never O(table).
  *   3. The operation's WRITE is a real DSv2 BatchWrite: executors
  *      stream replacement rows into commit-private staged parquet
  *      (Spark's own `ParquetUtils.prepareWrite` writer factory), and
  *      the driver commit swaps removes(affected) + adds(staged) as ONE
  *      log version through [[DeltaLite]]'s arbiter, with fresh
  *      long-column stats so skipping keeps working on SQL-updated
  *      files. Failed/speculative attempts abort their own file; the
  *      commit lists only files the SUCCEEDED writers reported.
  *
  * Stated subset (`format = "delta"`): unpartitioned,
  * non-column-mapped, no live deletion vectors (optimize first) — the
  * mergeInto envelope; the snapshot is pinned LAZILY at first
  * execution, so claimable DELETEs still take the metadata fast path
  * without touching it. With `format = "iceberg"` (X285) the SAME
  * machinery commits through [[IcebergLite.commitReplaceFiles]]'s
  * manifest arbiter instead — untouched manifests carried by
  * reference, one `overwrite` snapshot. */
private[v2] final class GraftRowLevelBuilder(
    tableName: String,
    path: String,
    tableSchema: StructType,
    info: RowLevelOperationInfo,
    format: String = "delta",
    partCol: Option[String] = None)
  extends RowLevelOperationBuilder {
  override def build(): RowLevelOperation =
    new GraftRowLevelOp(tableName, path, tableSchema, info, format, partCol)
}

private[v2] final class GraftRowLevelOp(
    tableName: String,
    path: String,
    tableSchema: StructType,
    info: RowLevelOperationInfo,
    format: String,
    partCol: Option[String])
  extends RowLevelOperation {

  private def spark = SparkSession.active

  // ONE snapshot pins both the scan and the commit — resolved lazily so
  // plans that end up metadata-only never pay (or refuse) it. Delta
  // files are log-relative; Iceberg files are the manifests' absolute
  // paths (FileTaggedScan resolves both, the dataPath rule).
  private lazy val snapFiles: Seq[String] = format match {
    case "delta" =>
      val (files, dvs, _, _) = DeltaLite.rowLevelSnapshot(spark, path)
      require(dvs.isEmpty,
        s"$tableName: SQL ${info.command()} on a deletion-vector-carrying " +
          "snapshot is outside this subset — DeltaLite.optimize first")
      files
    case _ => IcebergLite.rowLevelSnapshot(spark, path)._1
  }

  // the affected file set (basenames) the runtime group filter found;
  // None = filtering never ran → every live file is affected
  @volatile private var affected: Option[Set[String]] = None

  private def affectedFiles: Seq[String] = affected match {
    case Some(names) =>
      snapFiles.filter(f => names.contains(GraftRowLevel.fileTag(f)))
    case None => snapFiles
  }

  override def command(): RowLevelOperation.Command = info.command()

  override def description(): String =
    s"graft copy-on-write ${info.command()} on $tableName"

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column("_file"))

  override def newScanBuilder(options: org.apache.spark.sql.util
      .CaseInsensitiveStringMap): ScanBuilder = new ScanBuilder
      with SupportsPushDownRequiredColumns {
    private val fullSchema = tableSchema.add("_file", StringType)
    private var required: StructType = fullSchema

    override def pruneColumns(requiredSchema: StructType): Unit = {
      required = requiredSchema
    }

    override def build(): Scan = new RowLevelScan(required)
  }

  /** The operation's scan: [[FileTaggedScan]] over the pinned
    * snapshot, plus RUNTIME GROUP FILTERING — the group-filter
    * subquery's `_file IN (…)` verdict narrows the scan AND the
    * commit's remove set. An unintelligible filter keeps every group
    * (conservative, never wrong). */
  private final class RowLevelScan(readSchema0: StructType)
    extends FileTaggedScan(spark, path, tableSchema, readSchema0,
      () => affectedFiles, Array.empty)
    with SupportsRuntimeV2Filtering {

    override def description(): String =
      s"graft row-level scan of $tableName " +
        s"(${affected.map(_.size.toString).getOrElse("all")} groups)"

    override def filterAttributes(): Array[NamedReference] =
      Array(Expressions.column("_file"))

    override def filter(predicates: Array[Predicate]): Unit = {
      import org.apache.spark.sql.connector.{expressions => vexpr}
      val names = scala.collection.mutable.Set.empty[String]
      var understood = false
      predicates.foreach { p =>
        if (p.name() == "IN" || p.name() == "=") {
          val isFile = p.children().exists {
            case r: vexpr.NamedReference =>
              r.fieldNames.mkString(".") == "_file"
            case _ => false
          }
          if (isFile) {
            understood = true
            p.children().foreach {
              case l: vexpr.Literal[_] if l.value != null =>
                names += String.valueOf(l.value)
              case _ =>
            }
          }
        }
      }
      if (understood) affected = Some(names.toSet)
    }
  }

  override def newWriteBuilder(writeInfo: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = partCol match {
        case Some(pc) =>
          // partitioned replacement (X288): demand the engine CLUSTER
          // and SORT the replacement rows by the partition column, so
          // the rolling writers below emit one staged file per
          // (task, partition value) and every add action can carry its
          // partitionValues — log-only pruning keeps working on
          // SQL-rewritten partitions
          new Write with org.apache.spark.sql.connector.write
              .RequiresDistributionAndOrdering {
            override def requiredDistribution()
                : org.apache.spark.sql.connector.distributions.Distribution =
              org.apache.spark.sql.connector.distributions.Distributions
                .clustered(Array(Expressions.identity(pc)))
            override def requiredOrdering(): Array[
                org.apache.spark.sql.connector.expressions.SortOrder] =
              Array(Expressions.sort(Expressions.column(pc),
                org.apache.spark.sql.connector.expressions.SortDirection
                  .ASCENDING))
            override def toBatch: BatchWrite = new GraftReplaceBatchWrite(
              spark, path, tableSchema, () => affectedFiles,
              info.command().toString, format, partCol)
          }
        case None => new Write {
          override def toBatch: BatchWrite = new GraftReplaceBatchWrite(
            spark, path, tableSchema, () => affectedFiles,
            info.command().toString, format)
        }
      }
    }
}

/** A parquet batch scan over explicit files where each row is tagged
  * with its `_file` basename — the coordinate the row-level rewrite
  * plans group on. Used by the operation's own scan AND by the regular
  * read path when a plan (the runtime group-filter subquery) asks for
  * `_file`. */
private[v2] class FileTaggedScan(
    spark: SparkSession,
    path: String,
    tableSchema: StructType,
    readSchema0: StructType,
    filesProvider: () => Seq[String],
    pushed: Array[org.apache.spark.sql.sources.Filter])
  extends Scan with Batch {

  override def readSchema(): StructType = readSchema0

  override def toBatch: Batch = this

  override def description(): String =
    s"graft file-tagged parquet scan of $path"

  override def planInputPartitions(): Array[InputPartition] = {
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    filesProvider().zipWithIndex.map { case (f, idx) =>
      val abs = new Path(path, f)
      val len = fs.getFileStatus(abs).getLen
      FilePartition(idx, Array(PartitionedFile(InternalRow.empty,
        SparkPath.fromPath(abs), 0L, len,
        Array.empty[String]))): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val dataCols =
      StructType(readSchema0.fields.filterNot(_.name == "_file"))
    new FileTaggingReaderFactory(
      GraftParquetReaders.factory(spark, tableSchema, dataCols, pushed),
      readSchema0, dataCols)
  }
}

/** The regular-read ScanBuilder of a row-level-capable table: delegates
  * everything to the stock builder, EXCEPT when the pruned schema asks
  * for `_file` (the runtime group-filter subquery does) — then it
  * serves the [[FileTaggedScan]]. Filter pushdown is forwarded to the
  * delegate (file sources always re-evaluate data filters above the
  * scan, so whichever scan wins stays exact); the tagged scan receives
  * the V1-translatable subset for row-group skipping. */
private[v2] final class FileAwareScanBuilder(
    spark: SparkSession,
    path: String,
    tableSchema: StructType,
    files: Seq[String],
    inner: ScanBuilder,
    mkStream: Option[StructType =>
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream] = None)
  extends ScanBuilder
  with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
  with SupportsPushDownRequiredColumns {

  private var exprFilters: Seq[org.apache.spark.sql.catalyst.expressions
    .Expression] = Nil
  private var required: StructType = tableSchema
  private var wantsFile = false

  override def pushFilters(filters: Seq[org.apache.spark.sql.catalyst
      .expressions.Expression]): Seq[org.apache.spark.sql.catalyst
      .expressions.Expression] = {
    exprFilters = filters
    inner match {
      case s: org.apache.spark.sql.internal.connector
          .SupportsPushDownCatalystFilters => s.pushFilters(filters)
      case _ => filters
    }
  }

  override def pushedFilters(): Array[Predicate] = inner match {
    case s: org.apache.spark.sql.internal.connector
        .SupportsPushDownCatalystFilters => s.pushedFilters
    case _ => Array.empty[Predicate]
  }

  override def pruneColumns(requiredSchema: StructType): Unit = {
    wantsFile = requiredSchema.fieldNames.contains("_file")
    required = requiredSchema
    inner match {
      case s: SupportsPushDownRequiredColumns => s.pruneColumns(
        StructType(requiredSchema.fields.filterNot(_.name == "_file")))
      case _ =>
    }
  }

  override def build(): Scan =
    if (!wantsFile) inner.build() match {
      // the merge-on-read V1 bridge resolves through the V1Scan
      // interface — wrapping would hide it (and MOR snapshots refuse
      // to stream anyway)
      case v1: org.apache.spark.sql.connector.read.V1Scan => v1
      case b => mkStream.fold(b)(mk => new StreamCapableScan(b, mk))
    }
    else
      // no row-group pushdown on the tagged path: Spark re-evaluates
      // every data filter above the scan (file-source contract), and
      // this path serves only the control-plane-sized group-filter
      // subquery — correctness first, the stock path keeps its pushdown
      new FileTaggedScan(spark, path, tableSchema, required, () => files,
        Array.empty)
}

/** Wraps the stock parquet reader: each partition holds ONE file, and
  * every row gains that file's basename at the `_file` position of the
  * requested schema. Row-based (the wrapper disables columnar). */
private[v2] final class FileTaggingReaderFactory(
    inner: PartitionReaderFactory,
    outSchema: StructType,
    dataCols: StructType)
  extends PartitionReaderFactory {

  override def supportColumnarReads(partition: InputPartition): Boolean =
    false

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val fp = partition.asInstanceOf[FilePartition]
    val tag = UTF8String.fromString(
      GraftRowLevel.fileTag(fp.files.head.toPath.toString))
    val dataIdx = dataCols.fieldNames.zipWithIndex.toMap
    // output position → source data position (-1 = the _file tag)
    val perm = outSchema.fields.map(f => dataIdx.getOrElse(f.name, -1))
    val types = dataCols.fields.map(_.dataType)
    val ir = inner.createReader(partition)
    new PartitionReader[InternalRow] {
      override def next(): Boolean = ir.next()
      override def get(): InternalRow = {
        val r = ir.get()
        val out = new GenericInternalRow(perm.length)
        var i = 0
        while (i < perm.length) {
          val j = perm(i)
          out(i) = if (j < 0) tag
            else if (r.isNullAt(j)) null
            else r.get(j, types(j))
          i += 1
        }
        out
      }
      override def close(): Unit = ir.close()
    }
  }
}

/** The replacement write: executors stream rows into commit-private
  * staged parquet via Spark's own parquet writer factory; the driver
  * commit removes the affected files and adds exactly the files the
  * succeeded writers reported — through the Delta log arbiter or the
  * Iceberg manifest arbiter, per `format`. */
private[v2] final class GraftReplaceBatchWrite(
    spark: SparkSession,
    path: String,
    schema: StructType,
    removeFiles: () => Seq[String],
    operation: String,
    format: String = "delta",
    partCol: Option[String] = None)
  extends BatchWrite {

  private val token = java.util.UUID.randomUUID().toString.take(8)
  private val stagedRel = s"data/rlo-$token"

  override def createBatchWriterFactory(
      physInfo: PhysicalWriteInfo): DataWriterFactory = {
    val conf = spark.sessionState.newHadoopConf()
    val job = org.apache.hadoop.mapreduce.Job.getInstance(conf)
    val factory = org.apache.spark.sql.execution.datasources.parquet
      .ParquetUtils.prepareWrite(spark.sessionState.conf, job, schema,
        new org.apache.spark.sql.execution.datasources.parquet
          .ParquetOptions(
          org.apache.spark.sql.catalyst.util.CaseInsensitiveMap(
            Map.empty[String, String]), spark.sessionState.conf))
    val serConf = new SerializableConfiguration(job.getConfiguration)
    partCol match {
      case Some(pc) => new GraftRollingParquetWriterFactory(
        s"$path/$stagedRel", schema, pc, factory, serConf)
      case None => new GraftParquetWriterFactory(s"$path/$stagedRel",
        schema, factory, serConf)
    }
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val added = messages.collect {
      case GraftWrittenFile(name) if name != null => s"$stagedRel/$name"
    }.toSeq.sorted
    val partFiles = messages.collect {
      case GraftWrittenPartFiles(files) => files
    }.flatten.toSeq.sortBy(_._1)
    val addedAll = added ++ partFiles.map(f => s"$stagedRel/${f._1}")
    val pvals: Map[String, Map[String, String]] = partCol match {
      case Some(pc) =>
        partFiles.map(f => s"$stagedRel/${f._1}" -> Map(pc -> f._2)).toMap
      case None => Map.empty
    }
    format match {
      case "delta" =>
        DeltaLite.commitReplaceFiles(spark, path, removeFiles(), addedAll,
          operation, pvals)
      case _ =>
        // the spec's operation for replacing rows is `overwrite`,
        // whatever SQL verb drove it; identity-partitioned tables carry
        // each rolling file's raw value as its manifest p0
        IcebergLite.commitReplaceFiles(spark, path, removeFiles(), addedAll,
          "overwrite",
          partitionValues = partFiles
            .map(f => s"$stagedRel/${f._1}" -> f._2).toMap)
    }
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(path, stagedRel), true)
    ()
  }
}

private[v2] object GraftRowLevel {
  /** The `_file` group coordinate: the LAST TWO path components, never
    * the basename alone — one partitioned write job stages the SAME
    * `part-<n>-<jobUuid>` basename into every `_p=<value>` directory it
    * touches (the writePartitioned stats-key hazard), so a basename tag
    * would glue sibling partitions into one group and rewrite files the
    * predicate never touched. The penultimate component (staging-dir
    * token or partition-value dir under a tokened stage) disambiguates. */
  def fileTag(path: String): String =
    path.split('/').takeRight(2).mkString("/")
}

private[v2] final case class GraftWrittenFile(name: String)
  extends WriterCommitMessage

/** (file name, partition value) pairs a ROLLING writer reported — the
  * value rides with the file so the commit can declare partitionValues
  * on every add action (null value = null partition). */
private[v2] final case class GraftWrittenPartFiles(
    files: Seq[(String, String)])
  extends WriterCommitMessage

/** Partition-ROLLING parquet writers (X288): the write plan's required
  * clustering + ordering delivers each task's rows grouped by the
  * partition column, so the writer closes its current file and opens a
  * fresh one whenever the value changes — one staged file per
  * (task, partition value), each reported WITH its value. Rolling stays
  * CORRECT without the sort (just more files), so a plan that somehow
  * drops the ordering degrades in file count, never in rows. */
private[v2] final class GraftRollingParquetWriterFactory(
    stagedDir: String,
    schema: StructType,
    partCol: String,
    factory: OutputWriterFactory,
    conf: SerializableConfiguration)
  extends DataWriterFactory {

  private val partIdx = schema.fieldIndex(partCol)
  private val partDt = schema(partCol).dataType

  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] = new DataWriter[InternalRow] {
    private var cur: org.apache.spark.sql.execution.datasources
      .OutputWriter = null
    private var curValue: String = null
    private var curOpen = false
    private var written = List.empty[(String, String)]

    private def valueOf(r: InternalRow): String =
      if (r.isNullAt(partIdx)) null
      else partDt match {
        case StringType => r.getUTF8String(partIdx).toString
        case org.apache.spark.sql.types.LongType =>
          r.getLong(partIdx).toString
        case org.apache.spark.sql.types.IntegerType =>
          r.getInt(partIdx).toString
        case other => throw new UnsupportedOperationException(
          s"partition column $partCol: ${other.simpleString} is outside " +
            "the rolling-writer subset (string/long/int)")
      }

    private def attempt(n: Int) = new TaskAttemptContextImpl(conf.value,
      new TaskAttemptID("graft", 0,
        org.apache.hadoop.mapreduce.TaskType.MAP, partitionId,
        ((taskId * 131 + n) % Int.MaxValue).toInt))

    private def roll(v: String): Unit = {
      if (curOpen) cur.close()
      val name =
        f"part-$partitionId%05d-$taskId-${java.util.UUID.randomUUID()}.parquet"
      cur = factory.newInstance(s"$stagedDir/$name", schema,
        attempt(written.size))
      curOpen = true
      curValue = v
      written = (name, v) :: written
    }

    override def write(record: InternalRow): Unit = {
      val v = valueOf(record)
      if (!curOpen || curValue != v) roll(v)
      cur.write(record)
    }

    override def commit(): WriterCommitMessage = {
      if (curOpen) { cur.close(); curOpen = false }
      GraftWrittenPartFiles(written.reverse)
    }

    override def abort(): Unit = {
      if (curOpen) { cur.close(); curOpen = false }
      val fs = new Path(stagedDir).getFileSystem(conf.value)
      written.foreach { case (name, _) =>
        fs.delete(new Path(s"$stagedDir/$name"), false)
      }
    }

    override def close(): Unit = ()
  }
}

private[v2] final class GraftParquetWriterFactory(
    stagedDir: String,
    schema: StructType,
    factory: OutputWriterFactory,
    conf: SerializableConfiguration)
  extends DataWriterFactory {

  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] = new DataWriter[InternalRow] {
    private val name =
      f"part-$partitionId%05d-$taskId-${java.util.UUID.randomUUID()}.parquet"
    private val filePath = s"$stagedDir/$name"
    private lazy val writer = {
      val attempt = new TaskAttemptContextImpl(conf.value,
        new TaskAttemptID("graft", 0,
          org.apache.hadoop.mapreduce.TaskType.MAP, partitionId,
          (taskId % Int.MaxValue).toInt))
      factory.newInstance(filePath, schema, attempt)
    }
    private var wrote = false

    override def write(record: InternalRow): Unit = {
      wrote = true
      writer.write(record)
    }

    override def commit(): WriterCommitMessage = {
      if (wrote) { writer.close(); GraftWrittenFile(name) }
      else GraftWrittenFile(null) // empty task: nothing staged
    }

    override def abort(): Unit = {
      if (wrote) {
        writer.close()
        val p = new Path(filePath)
        p.getFileSystem(conf.value).delete(p, false)
        ()
      }
    }

    override def close(): Unit = ()
  }
}
