package graft

import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.matchers.should.Matchers

import graft.llm.CorpusStats
import graft.relational.SpatialOps

class CorpusStatsSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("spanDuplication sees boilerplate repeated inside distinct documents") {
    val boiler = "all rights reserved contact us for more info"  // 8 words
    // Chunks are DISJOINT 8-word windows, so the boilerplate sits as the
    // FIRST chunk of docs 0 and 1 (a trailing placement would straddle the
    // chunk boundary and be invisible — that blindness is inherent to
    // disjoint chunking and exactly why ChunkWords stays small).
    val docs2 = Seq(
      (0L, s"$boiler completely original tail words"),
      (1L, s"$boiler another different unique tail"),
      (2L, "third document with no shared spans at all present")
    ).toDF("doc_id", "text")
    val got2 = CorpusStats.spanDuplication(docs2)
      .select("doc_id", "n_dup").as[(Long, Long)].collect().toMap
    got2(0L) shouldBe 1L
    got2(1L) shouldBe 1L
    got2(2L) shouldBe 0L
  }

  test("surprisal ranks corpus-typical word sequences below one-off ones") {
    val common = "the quick brown fox jumps over the lazy dog"
    val docs = (
      (0 until 20).map(i => (i.toLong, common)) :+
        (99L, "zyx wvu tsr qpo nml kji hgf edc ba")
      ).toDF("doc_id", "text")
    val bits = CorpusStats.surprisal(docs)
      .select("doc_id", "bits_per_bigram_e3").as[(Long, Long)].collect().toMap
    // Every bigram of the common sentence occurs 20×; the gibberish doc's
    // bigrams occur once. Smoothed: common ⌊log2((40+V)/21)⌋ < gibberish
    // ⌊log2((1+V)/2)⌋ — without add-one smoothing both would be 0 bits.
    bits(99L) should be > bits(0L)
  }

  test("grid containment join equals the naive theta join, without a BNLJ") {
    val p = SpatialOps.points(model.Tables.customer(spark, sf0001))
    val r = SpatialOps.rects(model.Tables.nation(spark, sf0001))
    val blocked = SpatialOps.containmentJoin(p, r)
    val naive = p.join(r,
        $"px" >= $"x0" && $"px" <= $"x1" && $"py" >= $"y0" && $"py" <= $"y1")
      .groupBy("rid")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_points"),
        org.apache.spark.sql.functions.min("pid").as("min_pid"),
        org.apache.spark.sql.functions.max("pid").as("max_pid"))
      .orderBy("rid")
    blocked.collect().map(_.toSeq) shouldBe naive.collect().map(_.toSeq)

    val plan = blocked.queryExecution.executedPlan
    val bnlj = plan.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
        case b: BroadcastNestedLoopJoinExec => b
      }
      case b: BroadcastNestedLoopJoinExec => Seq(b)
    }.flatten
    bnlj shouldBe empty
  }
}
