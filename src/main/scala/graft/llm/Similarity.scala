package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * Two paths (SURVEY.md §2B X16):
  *  - `topK`: brute-force cosine top-k — the correctness baseline; a single
  *    broadcast of the query vector + TakeOrderedAndProject, so even this
  *    "brute force" streams at full scan speed with no shuffle.
  *  - `annTopK`: random-hyperplane LSH bucketing; only the query's bucket is
  *    scanned exactly. The hyperplanes come from a deterministic LCG so the
  *    DuckDB oracle reproduces the same buckets bit-for-bit.
  *
  * Background: incremental top-k similarity (EDBT 2020,
  * /root/repo/PAPERS.md:7) and distributed top-k with local reference
  * structures (REPOSE, ICDE 2021, PAPERS.md:8) — the bucket-then-rescore
  * decomposition here is the degenerate single-probe variant.
  */
object Similarity {

  /** LCG-derived hyperplane weights, exactly reproducible in SQL:
    * w(k,d) = ((1103515245·(k·64+d) + 12345) mod 2³¹) / 2³¹ − 0.5. */
  def lshWeights(bit: Int, dim: Int = 64): Seq[Double] =
    (0 until dim).map { d =>
      ((1103515245L * (bit * dim + d) + 12345L) % 2147483648L).toDouble / 2147483648.0 - 0.5
    }

  /** LSH bucket id: bit k set iff the projection onto hyperplane k is ≥ 0. */
  def bucket(v: Column, nBits: Int): Column =
    (0 until nBits).map { k =>
      when(VectorOps.dotConst(v, lshWeights(k)) >= 0, 1L << k).otherwise(0L)
    }.reduce(_ + _)

  /** Brute-force cosine top-k against the vector with id `queryId`. */
  def topK(emb: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = emb.where(col("vec_id") === queryId)
      .select(col("embedding").as("q_vec"))
    emb.crossJoin(broadcast(q))
      .where(col("vec_id") =!= queryId)
      .select(col("vec_id"), col("label"),
        round(VectorOps.cosine(col("embedding"), col("q_vec")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Per-label centroids — the IVF coarse-quantizer build step (assign →
    * average per cell). Emitted as (label, pos, cval) rows rather than
    * re-assembled arrays: posexplode → one partial+final average per
    * (label, dimension), fully distributed, and directly joinable as a
    * quantizer table. */
  def labelCentroids(emb: DataFrame): DataFrame =
    emb.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg(round(avg(col("v").cast("double")), 6).as("cval"))
      .orderBy("label", "pos")

  /** ANN top-k: exact rescoring restricted to the query's LSH bucket. At
    * scale the bucket column is a partition key, so a query touches one
    * partition instead of the full corpus. */
  def annTopK(emb: DataFrame, queryId: Long, k: Int, nBits: Int = 8): DataFrame = {
    val bucketed = emb.withColumn("bucket", bucket(col("embedding"), nBits))
    val q = bucketed.where(col("vec_id") === queryId)
      .select(col("embedding").as("q_vec"), col("bucket").as("q_bucket"))
    bucketed.join(broadcast(q),
        col("bucket") === col("q_bucket") && col("vec_id") =!= queryId)
      .select(col("vec_id"), col("bucket"),
        round(VectorOps.cosine(col("embedding"), col("q_vec")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }
}
