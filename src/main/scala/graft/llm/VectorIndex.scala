package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.relational.SessionIndex

/** Session-persisted vector-index artifacts over the `embeddings` table —
  * the index-once/query-many discipline ([[graft.relational.SessionIndex]],
  * same pattern as the r08 postings indexes) applied to the ANN serving
  * stack: IVF centroids, cell assignments, PQ codebooks, PQ codes, and the
  * composed (cell, vec_id, s, code) IVF-PQ index.
  *
  * At 100 TB every one of these is a persisted table a pipeline maintains
  * next to the corpus (rebuilt on ingest or drift, partitioned by cell) —
  * a query NEVER recomputes the quantizers; it probes them. Inside one
  * SparkSession this registry is the in-process equivalent: the first ANN
  * key builds + localCheckpoints each artifact, every later key (and every
  * later invocation of the same key) probes the materialized relation.
  *
  * Dependencies between artifacts (assignment needs centroids, codes need
  * codebooks, the composed index needs both) are resolved BEFORE entering
  * the registry — the getOrBuild re-entrancy discipline. */
object VectorIndex {

  /** IVF coarse quantizer: (cell, cvec) — see
    * [[Similarity.centroidVectors]]. */
  def centroids(spark: SparkSession, dir: String): DataFrame =
    SessionIndex.getOrBuild(spark, s"ivf_centroids|$dir") {
      Similarity.centroidVectors(Tables.embeddings(spark, dir))
    }

  /** Primary-cell assignment: (vec_id, cell, embedding). */
  def assigned(spark: SparkSession, dir: String): DataFrame = {
    val cents = centroids(spark, dir)
    SessionIndex.getOrBuild(spark, s"ivf_assigned|$dir") {
      Similarity.assignCells(Tables.embeddings(spark, dir), cents)
    }
  }

  /** PQ sub-codebooks: (s, code, cvec). */
  def pqCodebooks(spark: SparkSession, dir: String): DataFrame =
    SessionIndex.getOrBuild(spark, s"pq_codebooks|$dir") {
      Similarity.pqCodebooks(Tables.embeddings(spark, dir))
    }

  /** PQ codes: (vec_id, s, code) — each vector as m codebook indices. */
  def pqCodes(spark: SparkSession, dir: String): DataFrame = {
    val cb = pqCodebooks(spark, dir)
    SessionIndex.getOrBuild(spark, s"pq_codes|$dir") {
      Similarity.pqEncodeWith(Tables.embeddings(spark, dir), cb)
    }
  }

  /** The composed IVF-PQ index: (cell, vec_id, s, code) — PQ code stripes
    * partitioned by coarse cell, the billion-vector serving layout. */
  def ivfPqIndex(spark: SparkSession, dir: String): DataFrame = {
    val codes = pqCodes(spark, dir)
    val asg = assigned(spark, dir)
    SessionIndex.getOrBuild(spark, s"ivfpq_index|$dir") {
      codes.join(asg.select(col("vec_id"), col("cell")), Seq("vec_id"))
    }
  }

  /** Eagerly build every artifact (bench/session warm-up hook — the
    * steady-state a serving deployment pays at index build, not query,
    * time). */
  def warm(spark: SparkSession, dir: String): Unit = ivfPqIndex(spark, dir)

  // ---- serving ops against the session artifacts --------------------

  def annTopKIvf(spark: SparkSession, dir: String, queryId: Long, k: Int,
      nProbe: Int): DataFrame =
    Similarity.annTopKIvfCore(Tables.embeddings(spark, dir),
      centroids(spark, dir), assigned(spark, dir), queryId, k, nProbe)

  def annTopKBatch(spark: SparkSession, dir: String, nQueries: Long, k: Int,
      nProbe: Int): DataFrame =
    Similarity.annTopKBatchCore(Tables.embeddings(spark, dir),
      centroids(spark, dir), assigned(spark, dir), nQueries, k, nProbe)

  def ivfPqShortlist(spark: SparkSession, dir: String, queryId: Long,
      nProbe: Int, depth: Int): DataFrame =
    Similarity.ivfPqShortlistCore(Tables.embeddings(spark, dir),
      centroids(spark, dir), pqCodebooks(spark, dir), ivfPqIndex(spark, dir),
      queryId, nProbe, depth)

  def annTopKIvfPq(spark: SparkSession, dir: String, queryId: Long, k: Int,
      nProbe: Int, rescoreDepth: Int): DataFrame =
    Similarity.rescoreShortlist(Tables.embeddings(spark, dir),
      ivfPqShortlist(spark, dir, queryId, nProbe, rescoreDepth), queryId, k)
}
