package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.llm.Dedup

/** X197 (spec-only; streaming twin of X191 `x_dedup_incremental`): ONLINE
  * ingest dedup — a stream of new documents is probed per micro-batch
  * against the static base corpus, and each batch's flagged documents
  * (best base match per doc) are handed to the sink as they arrive.
  *
  * Contract (the same one the batch operator makes): every delta document
  * is paired against BASE ONLY — the base never re-self-joins, and
  * delta×delta dedup is deferred until the batch joins the base on the
  * next full pass. Because each document's base matches depend only on
  * (document, base), the flagged set is invariant to how the stream is
  * micro-batched, except through the df cutoff, which production systems
  * freeze with the persisted base index (here it is recomputed per batch
  * over base ∪ batch — identical to the batch key when the delta arrives
  * in one batch, the case the spec pins exactly).
  *
  * At scale the base side is the persisted shingle-id index (partitioned
  * by sid on disk, loaded once per executor), so a micro-batch pays
  * |batch|·df candidate work — the online complement of the batch
  * operator's |delta|·df.
  */
object IngestDedup {

  /** Start the stream: `deltaStream` must carry (doc_id, text) with every
    * doc_id ≥ `deltaFrom`; `baseDocs` is the static base (< `deltaFrom`).
    * Each micro-batch's flagged relation is passed to `sink`. */
  def dedupStream(baseDocs: DataFrame, deltaStream: DataFrame,
      deltaFrom: Long, threshold: Double)(
      sink: DataFrame => Unit): StreamingQuery =
    deltaStream.writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty) {
          // loan variant: the internal caches unpersist after the sink
          // materializes — a per-batch plain call would accumulate cached
          // plans without bound on a long-running stream
          Dedup.withIncrementalNearDuplicates(
            baseDocs.unionByName(batch.toDF()), deltaFrom, threshold)(sink)
        }
        ()
      }
      .start()
}
