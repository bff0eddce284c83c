package graft

import org.scalatest.matchers.should.Matchers

import graft.llm.{Similarity, VectorIndex}
import graft.relational.SessionIndex

/** The index-once/query-many contract for the ANN serving artifacts
  * (VectorIndex), mirroring SessionIndexSpec's postings assertions. */
class VectorIndexSpec extends SparkSpec with Matchers {

  test("second IVF probe: no quantizer rebuild") {
    VectorIndex.annTopKIvf(spark, sf0001, queryId = 0L, k = 5, nProbe = 2)
      .collect()
    val cBuilds = SessionIndex.buildCount(spark, s"ivf_centroids|$sf0001")
    val aBuilds = SessionIndex.buildCount(spark, s"ivf_assigned|$sf0001")
    cBuilds should be >= 1L
    VectorIndex.annTopKIvf(spark, sf0001, queryId = 1L, k = 5, nProbe = 2)
      .collect()
    SessionIndex.buildCount(spark, s"ivf_centroids|$sf0001") shouldBe cBuilds
    SessionIndex.buildCount(spark, s"ivf_assigned|$sf0001") shouldBe aBuilds
  }

  test("indexed IVF / IVF-PQ results equal the inline-built results") {
    val emb = model.Tables.embeddings(spark, sf0001)
    val inlineIvf = Similarity.annTopKIvf(emb, queryId = 0L, k = 5, nProbe = 2)
      .collect().toSeq
    val indexedIvf = VectorIndex.annTopKIvf(spark, sf0001, 0L, 5, 2)
      .collect().toSeq
    indexedIvf shouldBe inlineIvf
    val inlinePq = Similarity.annTopKIvfPq(emb, queryId = 0L, k = 5)
      .collect().toSeq
    val indexedPq = VectorIndex.annTopKIvfPq(spark, sf0001, 0L, 5, 2, 20)
      .collect().toSeq
    indexedPq shouldBe inlinePq
  }

  test("the composed index chain builds each artifact exactly once") {
    SessionIndex.reset(spark)
    VectorIndex.warm(spark, sf0001)
    Seq("ivf_centroids", "ivf_assigned", "pq_codebooks", "pq_codes",
      "ivfpq_index").foreach { a =>
      SessionIndex.buildCount(spark, s"$a|$sf0001") shouldBe 1L
    }
    // a second warm rebuilds nothing
    VectorIndex.warm(spark, sf0001)
    SessionIndex.buildCount(spark, s"ivfpq_index|$sf0001") shouldBe 1L
  }
}
