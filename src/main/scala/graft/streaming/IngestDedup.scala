package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.llm.Dedup

/** X197 (spec-only; streaming twin of X191 `x_dedup_incremental`): ONLINE
  * ingest dedup — a stream of new documents is probed per micro-batch
  * against the static base corpus, and each batch's flagged documents
  * (best base match per doc) are handed to the sink as they arrive.
  *
  * Two entry points with different cost/semantics contracts:
  *
  *   - [[dedupStream]] — BATCH-PARITY semantics: every micro-batch
  *     recomputes the df cutoff over base ∪ batch, which (a) re-shingles
  *     and rescans the whole base every micro-batch — O(|base|) per batch
  *     on a long-running stream — and (b) lets the flagged set vary with
  *     micro-batch composition (a hot shingle can cross `MaxShingleDf`
  *     only in a larger batch). Identical to the batch key when the delta
  *     arrives in one batch — the case the spec pins exactly. Use for
  *     small bases or one-shot replays; NOT the long-running-stream shape.
  *   - [[dedupStreamIndexed]] — FROZEN-INDEX semantics, the production
  *     shape: [[buildBaseIndex]] shingles the base ONCE, freezes the df
  *     cutoff over the base alone, and materializes the df-filtered
  *     (doc_id, sid, n) index + hot-shingle list (localCheckpoint blocks —
  *     survive `clearCache`, reclaimed when the index is dropped). Each
  *     micro-batch then pays only its own shingling + the probe join —
  *     O(|batch|·df) — and the flagged set is exactly invariant to how
  *     the stream is micro-batched (each document's matches depend only
  *     on (document, frozen index)). The contract difference: a shingle
  *     rare in the base but ubiquitous within the delta stream keeps
  *     counting toward similarity until the next index rebuild — the
  *     standard freshness trade of any frozen index.
  *
  * At scale the frozen index is the persisted shingle-id relation a real
  * pipeline keeps partitioned by sid on disk; `buildBaseIndex` is its
  * in-session equivalent.
  */
object IngestDedup {

  /** Frozen base-corpus index for [[dedupStreamIndexed]]: `index` holds the
    * df-filtered (doc_id, sid, n) rows, `hotSids` the base-hot shingle ids
    * dropped by the cutoff. Both are materialized and self-contained. */
  final case class BaseIndex(index: DataFrame, hotSids: DataFrame)

  /** Shingle the base once, freeze the df cutoff over the base alone, and
    * materialize the probe-side index. One base scan, ever. */
  def buildBaseIndex(baseDocs: DataFrame,
      maxDf: Int = Dedup.MaxShingleDf): BaseIndex = {
    val ids = Dedup.shingleSets(baseDocs)
      .select(col("doc_id"), Dedup.hashId(col("s")).as("sid"))
    val hot = ids.groupBy("sid").agg(count(lit(1)).as("df"))
      .where(col("df") > maxDf).select("sid")
      .localCheckpoint(true) // tiny: boilerplate shingles only
    val shF = ids.join(broadcast(hot), Seq("sid"), "left_anti")
    // per-doc size over the surviving sids; shingleSets already partitions
    // by doc_id, so the window adds no exchange
    val index = shF.withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      .localCheckpoint(true)
    BaseIndex(index, hot)
  }

  /** Probe one delta relation against the frozen index: same candidate
    * bound (base-frozen df cutoff + size-ratio prune) and same best-match
    * selection as the batch operator — (doc_id, base_id, inter, jaccard,
    * n_base_matches), best = max jaccard then min base_id. */
  def probeBatch(idx: BaseIndex, batch: DataFrame,
      threshold: Double): DataFrame = {
    val bids = Dedup.shingleSets(batch)
      .select(col("doc_id"), Dedup.hashId(col("s")).as("sid"))
    val bF = bids.join(broadcast(idx.hotSids), Seq("sid"), "left_anti")
    val bWithN = bF.withColumn("n", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    idx.index.as("a").hint("SHUFFLE_HASH")
      .join(bWithN.as("b").hint("SHUFFLE_HASH"),
        col("a.sid") === col("b.sid") &&
          least(col("a.n"), col("b.n")).cast("double") >=
            greatest(col("a.n"), col("b.n")) * threshold)
      .groupBy(col("b.doc_id").as("doc_id"), col("a.doc_id").as("base_id"))
      .agg(count(lit(1)).as("inter"),
        min(col("a.n")).as("na"), min(col("b.n")).as("nb"))
      .select(col("doc_id"), col("base_id"), col("inter"),
        round(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")), 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .withColumn("n_base_matches", count(lit(1)).over(w))
      .withColumn("rk", row_number().over(
        w.orderBy(col("jaccard").desc, col("base_id"))))
      .where(col("rk") === 1)
      .select("doc_id", "base_id", "inter", "jaccard", "n_base_matches")
      .orderBy("doc_id")
  }

  /** Start the batch-parity stream: `deltaStream` must carry (doc_id, text)
    * with every doc_id ≥ `deltaFrom`; `baseDocs` is the static base
    * (< `deltaFrom`). Each micro-batch's flagged relation is passed to
    * `sink`. See the header for the per-batch base-rescan cost. */
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

  /** Start the frozen-index stream: builds the index once up front, then
    * probes each micro-batch against it — no per-batch base rescan, no
    * per-batch cache churn, flagged set invariant to micro-batching. */
  def dedupStreamIndexed(baseDocs: DataFrame, deltaStream: DataFrame,
      threshold: Double, maxDf: Int = Dedup.MaxShingleDf)(
      sink: DataFrame => Unit): StreamingQuery = {
    val idx = buildBaseIndex(baseDocs, maxDf)
    deltaStream.writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty) sink(probeBatch(idx, batch.toDF(), threshold))
        ()
      }
      .start()
  }
}
