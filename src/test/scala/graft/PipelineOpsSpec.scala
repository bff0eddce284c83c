package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.llm.{Dedup, Multimodal, TextAnalysis}
import graft.relational.Sampling

/** Semantics pins for the round-2 pipeline operators (the DuckDB oracle
  * checks full results; these pin the edge behavior that makes them
  * correct). */
class PipelineOpsSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("duplicateClusters resolves a chain graph to one component (diameter > 1)") {
    // 1-2, 2-3, 3-4, 4-5: min-label must propagate end to end, which takes
    // multiple fixpoint iterations — exercises the loop, not just init
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("da", "db")
    val got = Dedup.duplicateClusters(pairs)
      .as[(Long, Long)].collect().toMap
    Seq(1L, 2L, 3L, 4L, 5L).map(got) shouldBe Seq(1L, 1L, 1L, 1L, 1L)
    Seq(10L, 11L).map(got) shouldBe Seq(10L, 10L)
  }

  test("hash sampling is deterministic and stratified rates nest") {
    val orders = graft.model.Tables.orders(spark, sf0001)
    val s1 = Sampling.hashSample(orders, col("o_orderkey"), 20)
      .select("o_orderkey").as[Long].collect().toSet
    val s2 = Sampling.hashSample(orders, col("o_orderkey"), 20)
      .select("o_orderkey").as[Long].collect().toSet
    s1 shouldBe s2 // same sample on every run — no RNG, no partitioning dependence
    val s10 = Sampling.hashSample(orders, col("o_orderkey"), 10)
      .select("o_orderkey").as[Long].collect().toSet
    s10.subsetOf(s1) shouldBe true // rate increase only ADDS rows (nested buckets)
    val total = orders.count()
    s1.size.toDouble / total shouldBe 0.20 +- 0.05
  }

  test("BPE-ish token count splits letter/digit/punct runs") {
    val df = Seq((1L, "ab12 cd!", 8)).toDF("doc_id", "text", "n_chars")
    val got = TextAnalysis.tokenCounts(df).collect().head
    got.getAs[Int]("ws_tokens") shouldBe 2
    // "ab" | "12" | " cd" | "!" → 4 BPE-ish tokens
    got.getAs[Int]("bpe_tokens") shouldBe 4
    got.getAs[Long]("cpt_e4") shouldBe 20000L // 8 chars / 4 tokens = 2.0
  }

  test("frame sampling keeps every stride-th frame") {
    val text = "x" * 300 // 300 chars → 5 frames of 64; stride 4 keeps frames 0 and 4
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val got = Multimodal.frameSample(df).collect().head
    got.getAs[Int]("n_frames") shouldBe 5
    got.getAs[String]("fp_csv").split(",").length shouldBe 2
  }

  test("rolling fingerprint: identical docs share sketches, distinct docs do not") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the dog"),
      (2L, "the quick brown fox jumps over the dog"),
      (3L, "completely different words entirely here now")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.rollingFingerprint(df)
      .select("doc_id", "fp_min", "fp_max").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    rows(1L) shouldBe rows(2L)
    rows(1L) should not be rows(3L)
  }
}
