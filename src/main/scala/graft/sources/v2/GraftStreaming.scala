package graft.sources.v2

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

import graft.sources.{DeltaLite, IcebergLite}

/** X286: REAL `writeStream.toTable` through the catalog — the r13 notes'
  * stated next step past foreachBatch. The table's write builder hands
  * Spark's micro-batch engine this `StreamingWrite`: EXECUTORS stream
  * each epoch's rows into commit-private staged parquet (the same
  * [[GraftParquetWriterFactory]] writers the row-level path uses, staged
  * under an epoch-scoped directory), and the driver's per-epoch commit
  * lands the reported files as ONE versioned commit through the format's
  * idempotent arbiter — [[DeltaLite.commitStreamFiles]] (SetTransaction
  * ledger) or [[IcebergLite.commitStreamFiles]] (snapshot-summary
  * ledger). Exactly-once: Structured Streaming redelivers epochs
  * at-least-once; the ledger makes the redelivery a no-op, the same
  * txnAppId/txnVersion contract Delta's own streaming writer implements.
  * The ledger is keyed by `queryId` (LogicalWriteInfo.queryId — stable
  * across restarts of the same checkpointed query): two streaming
  * queries writing one table, or a query plus a foreachBatch
  * commitIdempotent sink, each advance their OWN ledger instead of
  * sharing a global high-water mark that would silently drop the
  * lower-epoch query's commits.
  *
  * Scale notes: the data plane is per-executor parquet writing (no
  * driver rows, no shuffle added); the commit is one control-plane
  * metadata operation per epoch. Failed/speculative attempts abort
  * their own file and the commit lists only the SUCCEEDED writers'
  * reports — stray files are never referenced, and [[abort]] removes
  * the epoch's staging directory outright. */
private[v2] final class GraftStreamingWrite(
    path: String,
    writeSchema: StructType,
    format: String,
    queryId: String,
    part: Option[graft.sources.IcebergLite.PartField] = None)
  extends StreamingWrite {

  private def spark = SparkSession.active

  // query-instance token: a restarted query gets a fresh token, so a
  // replayed epoch stages into a new directory and the ledger (not the
  // filesystem) decides whether it commits
  private val token = java.util.UUID.randomUUID().toString.take(8)

  private def stagedRel(epochId: Long) = s"data/se$epochId-$token"

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val conf = spark.sessionState.newHadoopConf()
    val job = org.apache.hadoop.mapreduce.Job.getInstance(conf)
    val factory = org.apache.spark.sql.execution.datasources.parquet
      .ParquetUtils.prepareWrite(spark.sessionState.conf, job, writeSchema,
        new org.apache.spark.sql.execution.datasources.parquet
          .ParquetOptions(
          org.apache.spark.sql.catalyst.util.CaseInsensitiveMap(
            Map.empty[String, String]), spark.sessionState.conf))
    new GraftStreamingWriterFactory(path, token, writeSchema, factory,
      new SerializableConfiguration(job.getConfiguration), part)
  }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val added = messages.collect {
      case GraftWrittenFile(name) if name != null =>
        s"${stagedRel(epochId)}/$name"
    }.toSeq.sorted
    // PARTITIONED epochs (X295): rolling writers report each staged
    // file WITH its partition/transform value, recorded in the commit so
    // log-only pruning keeps working on streamed epochs
    val partFiles = messages.collect {
      case GraftWrittenPartFiles(files) => files
    }.flatten.toSeq.sortBy(_._1)
    val addedAll = added ++ partFiles.map(f => s"${stagedRel(epochId)}/${f._1}")
    format match {
      case "delta" =>
        DeltaLite.commitStreamFiles(spark, path, addedAll, epochId,
          appId = s"${DeltaLite.TxnAppId}-$queryId",
          partitionValues = part.fold(
            Map.empty[String, Map[String, String]])(pf =>
            partFiles.map(f => s"${stagedRel(epochId)}/${f._1}" ->
              Map(pf.source -> f._2)).toMap))
      case _ =>
        IcebergLite.commitStreamFiles(spark, path, addedAll, epochId,
          appId = s"${IcebergLite.DefaultLedger}-$queryId",
          partitionValues = partFiles
            .map(f => s"${stagedRel(epochId)}/${f._1}" -> f._2).toMap)
    }
    ()
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(path, stagedRel(epochId)), true)
    ()
  }
}

/** Epoch-aware writer factory: each epoch's rows stage under that
  * epoch's own directory, so [[GraftStreamingWrite.abort]] can remove a
  * failed epoch without touching committed data. */
private[v2] final class GraftStreamingWriterFactory(
    path: String,
    token: String,
    schema: StructType,
    factory: OutputWriterFactory,
    conf: SerializableConfiguration,
    part: Option[graft.sources.IcebergLite.PartField] = None)
  extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] = part match {
    case Some(pf) =>
      // partitioned epoch: ROLLING writers — one staged file per
      // (task, partition value), reported with the value (X288's
      // machinery in the streaming slot)
      new GraftRollingParquetWriterFactory(s"$path/data/se$epochId-$token",
        schema, pf, factory, conf).createWriter(partitionId, taskId)
    case None =>
      new GraftParquetWriterFactory(s"$path/data/se$epochId-$token", schema,
        factory, conf).createWriter(partitionId, taskId)
  }
}
