package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.sources.CommitLog

/** X36d streaming face: an exactly-once `foreachBatch` sink over the
  * [[CommitLog]] optimistic-commit table. Structured Streaming's
  * `foreachBatch` guarantees at-least-once delivery with a monotonic
  * `batchId`; pairing it with [[CommitLog.commitIdempotent]] upgrades the
  * sink to exactly-once — a redelivered micro-batch finds its id among the
  * committed manifests and becomes a no-op, the same txnAppId/txnVersion
  * contract Delta's streaming writer implements. Readers get snapshot
  * isolation and as-of reads over micro-batch history for free (each
  * micro-batch is one committed version).
  *
  * Usage: `stream.writeStream.foreachBatch(TransactionalSink.into(table))`.
  */
object TransactionalSink {

  /** foreachBatch body: commit each micro-batch as one log version,
    * idempotent on `batchId` across failure/replay. */
  def into(table: String): (DataFrame, Long) => Unit =
    (df, batchId) => {
      CommitLog.commitIdempotent(df.sparkSession, table, df, batchId)
      ()
    }
}
