package graft

import org.scalatest.matchers.should.Matchers

/** Gated plan audit: every query key's physical plan is scanned for
  * `SinglePartition` exchanges — the classic hidden scale-killer — and any
  * hit must be on the explicit allowlist below with its observed exchange
  * count. A future key that funnels the data path through one partition
  * (or a new funnel inside an allowlisted key) fails the build here, the
  * same insurance BucketingSpec gives the no-exchange join plans.
  *
  * Why the allowlisted exchanges are NOT scale bugs — every entry is one
  * of these shapes, none of which moves the data path through a funnel:
  *
  *   1. GLOBAL-SCALAR FINAL: the key's answer IS a single row (or a fixed
  *      handful of rows) of global statistics — x_auc, x_corr, x_ols2,
  *      x_chisq, x_kmv_jaccard, x_dataset_card, x_profile, agg_count,
  *      sketch unions (x_sketch_*, x_bitmap_incremental), eval summaries
  *      (x_near_dup_eval, x_near_dup_eval_ivf, x_ann_recall_sweep,
  *      x_split_leakage, x_sample_bias) … The exchange merges map-side
  *      PARTIALS of a global aggregate: its input volume is one row per
  *      upstream partition, not the data; the distributed work happened
  *      in the partial stage. This is how any engine computes a scalar.
  *   2. BROADCAST-SCALAR PLUMBING: a 1-row aggregate feeding
  *      `crossJoin(broadcast(…))` — corpus totals for rates/thresholds
  *      (x_c4_filters, x_bm25, x_tfidf, x_mix_*, x_curation_pipeline,
  *      x_ngram_lm, x_surprisal, x_target_encode, x_tokenizer_fertility,
  *      x_vocab_*, x_negative_sample, x_shard_balance …). The exchange
  *      carries partials of that scalar; the fact stream never funnels.
  *   3. BOUNDED-METADATA WINDOW/SORT: an un-partitioned window or global
  *      cumulative over a relation bounded by the CALENDAR or a fixed
  *      grid, not the corpus — days (x_cumulative_uniques, x_anomaly,
  *      x_interpolate, x_drift, x_pop, x_wau, x_time_to_convert),
  *      length/score buckets (x_batch_pad, x_calibration, x_freq_items,
  *      x_sketch_hh, x_k_anonymity), planted semantics probes
  *      (x_null_ordering, x_sql_not_in), rule/report relations
  *      (x_dq_rules, x_skew_report, x_basket, x_benford, x_funnel).
  *   4. CONTROL/AUDIT ARTIFACT WRITES: single-file control-plane outputs
  *      (sink_overwrite, x_targeted_delete, x_cdc_apply audit rows,
  *      x_source_corrupt quarantine) — deliberate 1-file artifacts of
  *      bounded size, documented at their definition sites.
  *
  * Counts are pinned (`<=`) so an allowlisted key acquiring an ADDITIONAL
  * funnel also fails. Audited at sf0.001 — plan SHAPE is what's asserted,
  * and SinglePartition presence does not depend on the scale factor.
  */
class PlanAuditSpec extends SparkSpec with Matchers {

  private val allowed: Map[String, Int] = Map(
    "agg_count" -> 1,
    "sink_overwrite" -> 1,
    "x_ann_recall_sweep" -> 2,
    "x_anomaly" -> 1,
    "x_auc" -> 1,
    "x_basket" -> 1,
    "x_batch_pad" -> 2,
    "x_benford" -> 1,
    "x_bitmap_incremental" -> 1,
    "x_bloom_filter" -> 1,
    "x_bm25" -> 1,
    "x_bm25_prf" -> 1, // category 2: the same n/avgdl scalar broadcast
    "x_c4_filters" -> 1,
    "x_calibration" -> 1,
    "x_cdc_apply" -> 2,
    "x_chisq" -> 2,
    "x_corr" -> 1,
    "x_cumulative_uniques" -> 1,
    "x_curation_pipeline" -> 1,
    "x_dataset_card" -> 3,
    // category 1: two global-scalar finals (count+sum per snapshot version)
    "x_delta_time_travel" -> 2,
    "x_iceberg_time_travel" -> 2,
    // category 3+1: cumulative window over the ≤50-row quantity grid +
    // the label-total scalar; the corpus pass is the partial-first per-
    // quantity aggregate upstream
    "x_stump" -> 3,
    // category 1+2: post-merge scalar aggregate × 1-row audit-count
    // aggregate, crossJoined into the single output row
    "x_delta_merge" -> 2,
    "x_decay_counts" -> 1, // category 2: 1-row max-day broadcast
    // category 1: 1-row global summary over the skip-planned file set
    "x_delta_skipping" -> 1,
    "x_delta_delete" -> 1, // category 1: 1-row post-delete summary
    // category 1: 1-row post-compaction summary (the data path is the
    // staged coalesce write, which is a shuffle-free narrow plan)
    "x_delta_optimize" -> 1,
    "x_iceberg_optimize" -> 1, // category 1: same shape on the Iceberg side
    "x_iceberg_merge" -> 1, // category 1: post-merge global count+sum
    "x_iceberg_sort_order" -> 1, // category 1: global count+sum final
    "x_delta_append_only" -> 1, // category 1: global count+sum final
    "x_delta_zorder" -> 1,     // category 1: 1-row box-aggregate final
    "x_delta_restore" -> 1, // category 1: 1-row post-restore summary
    // category 1: 1-row post-rename/drop summary over the mapped read
    "x_delta_column_mapping" -> 1,
    // category 1: 1-row current-read summary after the rename→widen
    // lifecycle (the widened appends themselves are narrow writes)
    "x_delta_cm_evolution" -> 1,
    // category 1: 1-row post-expireLog summary read through the V2
    // checkpoint + sidecars
    "x_delta_checkpoint_v2" -> 1,
    // category 1: 1-row summary of the timestamp-resolved read
    "x_delta_ict" -> 1,
    // category 1: 1-row post-DML summary of the evolved clone
    "x_delta_clone" -> 1,
    // category 1: 1-row summary of the rolled-back head
    "x_iceberg_rollback" -> 1,
    // category 1: five scalar-subquery finals, each a 1-row aggregate
    // over a control-plane metadata relation (rows ∝ snapshots/
    // manifests) — data never enters the plan
    "x_iceberg_sql_meta" -> 5,
    "x_delta_vacuum" -> 1, // category 1: 1-row post-vacuum summary
    "x_iceberg_expire" -> 1, // category 1: 1-row post-expire summary
    // category 1: four 1-row scalar finals, one per metadata table kind
    // (snapshots/files/manifests/refs) — each aggregates a metadata-sized
    // relation (a few rows of manifest inventory), never table data
    "x_iceberg_meta_tables" -> 4,
    // category 1: two scalar-subquery finals (entries recount, all_files
    // recount) over control-plane metadata relations — rows ∝ manifests
    "x_iceberg_meta_all" -> 2,
    // category 1: 1-row post-OPTIMIZE summary (the re-cluster itself is
    // the staged range/Morton sort-write, a distributed narrow plan)
    "x_delta_optimize_clustered" -> 1,
    "x_iceberg_skipping" -> 1, // category 1: 1-row planned-scan summary
    // categories 1+2: daily-totals scalar broadcast feeding the 1-row
    // jackknife reduction (the corpus pass is the per-day partial-first
    // aggregate upstream)
    "x_jackknife" -> 1,
    "x_dq_rules" -> 3,
    "x_drift" -> 1,
    "x_dict_encode" -> 6, // category 2: per-column 1-row (rows × dict) aggregate finals ×3 columns
    "x_join_strategies" -> 3, // category 2: one global 1-row aggregate final per strategy leg
    "x_mrl_recall" -> 3, // category 2: one 1-row hits-count final per dims leg over the bounded eval slice
    "x_anchor_text" -> 1, // category 2: 1-row corpus-count broadcast
    "x_cusum" -> 4, // categories 2+3: n/tot + max-|cusum| scalar broadcasts, calendar-bounded daily windows
    "x_ks_test" -> 2, // categories 2+3: n1/n2 scalar broadcast, value-grid windows
    "x_mannwhitney" -> 1, // category 3: value-grid running-count window
    "x_ab_test" -> 1, // category 1: 1-row global variant-counts final
    // categories 1+3: global-scalar totals broadcast + the x_calibration
    // global-ntile caveat (range-partitioned ranks at corpus scale) + the
    // 10-row decile cumulative window
    "x_gains" -> 3,
    "x_rolling_var" -> 1, // category 3: calendar-bounded daily rolling frame
    // categories 2+3: median-rank scalar broadcast + calendar-bounded
    // (≤366-row) daily rank/lag windows + 1-row global final
    "x_runs_test" -> 4,
    "x_freq_items" -> 1,
    "x_freshness" -> 1, // category 2: 1-row global-max broadcast
    "x_funnel" -> 1,
    "x_interpolate" -> 1,
    // categories 1+3: the ADC shortlist cut — a global top-`depth` (20-row)
    // ordered limit over per-candidate ADC aggregates feeding the exact
    // rescore; input volume is the probed cells' candidate partials, the
    // data path (code stripes) never funnels
    "x_sim_ann_ivfpq" -> 1,
    "x_ivfpq_recall" -> 1, // same shortlist cut inside the instrument
    // category 1: a 5-column audit report of global artifact counts — 4
    // artifacts × (before/after/residual) scalar finals; every count's
    // distributed work is in its partial stage, the corpora never funnel
    "x_delete_propagation" -> 12,
    "x_ivf_append" -> 2, // category 2: base/delta total-count broadcasts
    "x_join_size_est" -> 1,
    // category 2: the corpus n/avgdl scalar broadcast (as in x_bm25) plus
    // the broadcast build of the per-(q_id, term) df relation — request-
    // batch-sized, never the corpus
    "x_rag_context" -> 2,
    "x_k_anonymity" -> 1,
    "x_kmv_jaccard" -> 1,
    "x_lsh_band_sweep" -> 1, // category 2: 1-row n_exact broadcast
    "x_mix_budget" -> 1,
    "x_mix_temperature" -> 1,
    "x_near_dup_eval" -> 1,
    "x_near_dup_eval_ivf" -> 3,
    "x_negative_sample" -> 1,
    "x_ngram_lm" -> 1,
    "x_null_ordering" -> 1,
    "x_ols2" -> 1,
    "x_pop" -> 1,
    "x_profile" -> 1,
    "x_sample_bias" -> 2,
    "x_shard_balance" -> 1,
    "x_sketch_hh" -> 1,
    "x_sketch_kll" -> 2,
    "x_sketch_theta" -> 2,
    "x_sketch_union" -> 2,
    "x_skew_report" -> 5,
    "x_skyline" -> 1, // category 3: frontier scan over |distinct n_chars| candidates
    "x_source_corrupt" -> 1,
    "x_spearman" -> 1,
    "x_split_leakage" -> 1,
    "x_sql_not_in" -> 2,
    "x_surprisal" -> 1,
    "x_target_encode" -> 1,
    "x_targeted_delete" -> 1,
    "x_tfidf" -> 1,
    "x_time_to_convert" -> 3,
    "x_tokenizer_fertility" -> 1,
    "x_vocab_coverage" -> 1,
    "x_vocab_growth" -> 1,
    "x_wau" -> 1)

  test("no unexplained SinglePartition exchanges across the full query surface") {
    val flagged = scala.collection.mutable.SortedMap.empty[String, Int]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sf0001).queryExecution.executedPlan.toString
      val n = plan.linesIterator.count(_.contains("SinglePartition"))
      if (n > 0) flagged(name) = n
      spark.catalog.clearCache()
    }
    graft.llm.Dedup.releaseSharedClusters(spark)
    // detection sanity: a global count MUST show its partial-merge exchange
    flagged.keySet should contain ("agg_count")
    val unexplained = flagged.keySet.diff(allowed.keySet)
    withClue(s"keys with UNDOCUMENTED SinglePartition exchanges: $unexplained — " +
      "either remove the funnel or add the key here WITH a category above: ") {
      unexplained shouldBe empty
    }
    val grown = flagged.filter { case (k, n) => n > allowed.getOrElse(k, 0) }
    withClue(s"allowlisted keys that GREW new SinglePartition exchanges: $grown: ") {
      grown shouldBe empty
    }
    // allowlist hygiene: every entry still names a live query key
    allowed.keySet.diff(SparkEntry.queries.keySet) shouldBe empty
  }
}
