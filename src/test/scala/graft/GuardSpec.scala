package graft

import org.scalatest.matchers.should.Matchers

import graft.llm.LlmQueries
import graft.relational.StatsOps

/** Planted-data specs for the degenerate-input guards: the differential
  * gate can only exercise what the synthetic tables contain, so slices
  * with no positives / no negatives / zero variance need their NULL
  * contract pinned here (the session_window lesson: boundary claims need
  * planted specs, not just the differential gate).
  */
class GuardSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("AUC is NULL on a single-class slice, defined otherwise") {
    val onlyPos = Seq((1L, true, 5L), (2L, true, 3L))
      .toDF("doc_id", "pos", "score")
    val onlyNeg = Seq((1L, false, 5L), (2L, false, 3L))
      .toDF("doc_id", "pos", "score")
    LlmQueries.aucRankSum(onlyPos).collect()(0).isNullAt(2) shouldBe true
    LlmQueries.aucRankSum(onlyNeg).collect()(0).isNullAt(2) shouldBe true

    // perfect ranking → AUC 1.0; anti-ranking → 0.0 (exact ×10⁶ integers)
    val perfect = Seq((1L, false, 1L), (2L, false, 2L), (3L, true, 3L),
      (4L, true, 4L)).toDF("doc_id", "pos", "score")
    LlmQueries.aucRankSum(perfect).select("auc_e6").as[Long].head() shouldBe
      1000000L
    val anti = Seq((1L, true, 1L), (2L, true, 2L), (3L, false, 3L),
      (4L, false, 4L)).toDF("doc_id", "pos", "score")
    LlmQueries.aucRankSum(anti).select("auc_e6").as[Long].head() shouldBe 0L
  }

  test("cross-correlation is NULL at zero variance, defined otherwise") {
    // constant y: every lag has zero y-variance → xcorr NULL, never NaN
    val flatY = Seq((0, 1L, 7L), (1, 2L, 7L), (2, 3L, 7L), (3, 4L, 7L))
      .toDF("d", "x", "y")
    val rows = StatsOps.crossCorrFromSeries(spark, flatY, 2)
      .select("lag", "xcorr").collect()
    rows.length shouldBe 2
    all(rows.map(_.isNullAt(1))) shouldBe true

    // y == x: lag-0 correlation is exactly 1.0
    val identical = Seq((0, 1L, 1L), (1, 2L, 2L), (2, 3L, 3L), (3, 5L, 5L))
      .toDF("d", "x", "y")
    val lag0 = StatsOps.crossCorrFromSeries(spark, identical, 1)
      .select("xcorr").as[Double].head()
    lag0 shouldBe 1.0
  }
}
