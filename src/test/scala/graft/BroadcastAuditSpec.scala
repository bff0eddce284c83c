package graft

import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.functions.{broadcast, col}
import org.scalatest.matchers.should.Matchers

/** Gated broadcast audit — the mechanization of the r09 lesson ("the
  * correctness gate and the SinglePartition audit are both blind to a wrong
  * broadcast"). Two rounds in a row found the same trap by hand: a relation
  * derived from a SESSION ARTIFACT (LogicalRDD checkpoint / cached
  * InMemoryRelation) carries underestimated stats, so the planner happily
  * builds a `BroadcastExchange` over what is actually a corpus-scale
  * relation — locally a few seconds of hashed-relation build, at 100 TB a
  * driver OOM. r08 fixed it in the WAND/trigram chain, r09 in the prefix
  * verification joins, r10 in the prefix df-ranking and candidate
  * self-joins (llm/Dedup.scala). This spec turns the manual plan read into
  * a build gate.
  *
  * Detector: for every query key, walk the STATIC physical plan (AQE off —
  * the static planner's stats-driven broadcast decisions are exactly the
  * audited class; AQE-introduced broadcasts use true runtime sizes and are
  * safe by construction) including subquery plans, and flag every
  * `BroadcastExchange` whose subtree reads a session artifact
  * (`RDDScanExec` = Scan ExistingRDD, or `InMemoryTableScan`) UNLESS the
  * subtree is provably bounded:
  *   - it contains a grouping-less aggregate (global scalar → ≤ 1 row per
  *     grouping of zero keys) — the crossJoin(broadcast(1-row-total))
  *     plumbing pattern used across the corpus-rate keys; or
  *   - it contains a Limit / TakeOrderedAndProject (top-k shortlists,
  *     seed rows).
  * File-scan-only broadcasts are NOT flagged: FileSourceScan stats are
  * accurate, so at real scale the planner would correctly refuse the same
  * broadcast — the trap class is exactly the misestimated artifacts.
  *
  * Anything still flagged must be allowlisted HERE with a rationale naming
  * why the relation is bounded at 100 TB. Counts are pinned so a key
  * acquiring an additional artifact broadcast fails even if allowlisted.
  */
class BroadcastAuditSpec extends SparkSpec with Matchers {

  /** Flagged-but-deliberate artifact broadcasts, key -> max count, each
    * bounded by CONSTRUCTION (not by corpus size). Categories, verified by
    * reading each flagged subtree (r10):
    *
    *   A. HOT SET: `df > maxDf` document-frequency filter keeps only
    *      stopword-like shingles above a high cutoff — the engineered
    *      common-shingle exclusion set (llm/Dedup.scala ngram/containment/
    *      incremental builders; judged clean in r08/r09).
    *   B. CENTROID / CODEBOOK: k-row (k ≤ 256) coarse-quantizer or
    *      m×256-row PQ codebook artifacts (llm/VectorIndex.scala) — the
    *      IVF/PQ family broadcasts them by design.
    *   C. QUERY-BOUNDED: relations filtered to the FIXED query upstream in
    *      every subtree — ≤|q|-row term weights/bounds, ≤k·|q| seed rows
    *      (WindowGroupLimit), 1-row query vectors, conjunction candidate
    *      sets (docs containing ALL query trigrams — broadcasting the
    *      intersection avoids shuffling the corpus text relation, the
    *      right trade for a serving probe).
    *   D. BOUNDED EVAL SLICE: the `doc_id < 1500` instrument slice the
    *      recall/sweep keys deliberately evaluate on (documented at their
    *      definition sites).
    *   E. CALENDAR-BOUNDED: per-day aggregates, ≤366 rows/year.
    */
  private val allowed: Map[String, Int] = Map(
    "x_cross_corr" -> 1,          // E: per-day (d, y) aggregate
    "x_dedup_containment" -> 1,   // A: df>maxDf hot set
    "x_dedup_incremental" -> 1,   // A: df>maxDf hot set
    "x_dedup_ngram" -> 1,         // A: df>maxDf hot set
    "x_edit_distance" -> 1,       // A: df>maxDf hot set (shared ngram chain)
    "x_dedup_embed" -> 1,         // B: centroid table (cell, cvec)
    "x_kmeans_step" -> 1,         // B: centroid table
    "x_ivf_append" -> 2,          // B: base + delta centroid tables
    "x_ivfpq_recall" -> 4,        // B: 2× centroids + 2× (codebook ⋈ 1-row query)
    "x_near_dup_eval_ivf" -> 3,   // B: centroid tables ×3 probe settings
    "x_pq_adc" -> 1,              // B+C: ADC table = codebook × 1-row query
    "x_sim_ann_ivfpq" -> 2,       // B+C: centroids + (codebook ⋈ 1-row query)
    "x_sim_ann_batch" -> 2,       // B+C: centroids + (q_id, cell) probe rows
                                  //      (WindowGroupLimit rk ≤ nprobe)
    "x_sim_mips" -> 3,            // B+C: per-cell max-norm (k rows) + 1-row
                                  //      query vector ×2 consumers
    "x_wand_topk" -> 7,           // C: every subtree filters term ∈ query —
                                  //    3-row wt/ub/terms ×5, ≤k·|q| θ-seed
    "x_trigram_search" -> 1,      // C: conjunction candidate set
    "x_regex_search" -> 1,        // C: conjunction candidate set
    "x_lsh_band_sweep" -> 4,      // D: doc_id<1500 slice signatures + hot sets
    "x_near_dup_eval" -> 1)       // D: doc_id<1500 slice hot set

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val here = p.collect { case n => n }
    here ++ here.flatMap(n => n.subqueries.flatMap(allNodes))
  }

  private def scansArtifact(p: SparkPlan): Boolean =
    allNodes(p).exists {
      case _: RDDScanExec           => true // Scan ExistingRDD (checkpoints)
      case _: ExternalRDDScanExec[_] => true // Scan[obj] (createDataFrame(rdd))
      case _: InMemoryTableScanExec => true // cached relations
      case _                        => false
    }

  private def bounded(p: SparkPlan): Boolean =
    allNodes(p).exists {
      case agg: BaseAggregateExec => agg.groupingExpressions.isEmpty
      case _: GlobalLimitExec | _: LocalLimitExec |
          _: TakeOrderedAndProjectExec | _: CollectLimitExec => true
      case _ => false
    }

  private def unboundedArtifactBroadcasts(plan: SparkPlan): Seq[SparkPlan] =
    allNodes(plan).collect {
      case b: BroadcastExchangeExec if scansArtifact(b) && !bounded(b) => b
    }

  test("detector sanity: an unbounded ExistingRDD broadcast IS flagged") {
    import spark.implicits._
    // an RDD-backed relation (LogicalRDD → Scan ExistingRDD) force-broadcast
    // into a join — the exact shape of the r08/r09/r10 production bugs
    val artifact = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq((1L, "a"), (2L, "b")))).toDF("k", "v")
    val probe = Seq((1L, 10), (2L, 20)).toDF("k", "n")
    val bad = probe.join(broadcast(artifact), "k")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      unboundedArtifactBroadcasts(bad.queryExecution.executedPlan) should not be empty
      // and the bounded forms are exempt: scalar-aggregate and limited
      val scalar = probe.crossJoin(broadcast(artifact.groupBy().count()))
      unboundedArtifactBroadcasts(scalar.queryExecution.executedPlan) shouldBe empty
      val limited = probe.join(broadcast(artifact.limit(5)), "k")
      unboundedArtifactBroadcasts(limited.queryExecution.executedPlan) shouldBe empty
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("no unexplained artifact broadcasts across the full query surface") {
    val flagged = scala.collection.mutable.SortedMap.empty[String, Int]
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val hits = unboundedArtifactBroadcasts(
          fn(spark, sf0001).queryExecution.executedPlan)
        if (hits.nonEmpty) flagged(name) = hits.size
        spark.catalog.clearCache()
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    graft.llm.Dedup.releaseSharedClusters(spark)
    val unexplained = flagged.keySet.diff(allowed.keySet)
    withClue(s"keys broadcasting UNBOUNDED session artifacts: $flagged — " +
      "pin shuffle_hash on the artifact side (the r08-r10 fix) or allowlist " +
      "WITH a boundedness rationale: ") {
      unexplained shouldBe empty
    }
    val grown = flagged.filter { case (k, n) => n > allowed.getOrElse(k, 0) }
    withClue(s"allowlisted keys that GREW artifact broadcasts: $grown: ") {
      grown shouldBe empty
    }
    allowed.keySet.diff(SparkEntry.queries.keySet) shouldBe empty
  }
}
