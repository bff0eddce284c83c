package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{SketchAggregates, StableHash}
import graft.model.Tables

/** Statistical / data-quality operators: mergeable quantile + set-algebra
  * sketches (DataSketches KLL and Theta), KMV distinct estimation, exact
  * integer-arithmetic correlation, log2 histograms, and a declarative
  * data-quality rule suite.
  *
  * The reference has no statistics surface beyond row counts
  * (`Sites/DataProc_Script/spark_ingest_slmandicprd.py:88`); these are the
  * profile/verify primitives a 100 TB lakehouse needs around ingestion.
  * Design rules as elsewhere in the engine: aggregation is partial
  * map-side, one-row globals are the only SinglePartition exchanges, and
  * anything float crossing the oracle is either IEEE-exact (single
  * correctly-rounded ops on identical integer inputs) or guarded by an
  * explicit error contract.
  */
object StatsOps {

  /** X75: KLL quantile sketch with an error contract. Per-group sketches
    * (mergeable, persistable — the per-partition stats pattern) union into
    * a global median estimate; the estimate's TRUE rank, computed exactly,
    * must sit within 5% of 0.5 (k=200 guarantees ≈1.65% at 99% — KLL
    * compaction is randomized, so the contract, not the value, is the
    * invariant). Scale path for percentiles where a per-group window sort
    * would funnel one reducer (the X40b/x_quantile_norm caveat). */
  private def kllMedianContract(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val perGroup = li.groupBy("l_returnflag")
      .agg(SketchAggregates.kllBuild(col("l_extendedprice")).as("sk"))
    val est = perGroup.agg(
      SketchAggregates.kllUnionQuantile(col("sk"), 0.5).as("est"))
    val rank = li.select(col("l_extendedprice").as("v"))
      .crossJoin(broadcast(est))
      .agg((sum(when(col("v") <= col("est"), 1L).otherwise(0L)).cast("double") /
        count(lit(1))).as("r"))
    rank.select(
      (abs(col("r") - 0.5) <= 0.05).as("within_tol"),
      floor(abs(col("r") - 0.5) / 0.05).cast("long").as("tol_excess"))
  }

  /** X76: Theta-sketch INTERSECTION — the set operation HLL cannot do.
    * Per-status customer sketches intersect into "customers with orders in
    * EVERY status" without rescanning the fact table; contract-checked
    * against the exact intersection (theta is deterministic under the
    * library's fixed seed; lgK=12 ⇒ rsd ≈1.6%, tolerance 5% ≈ 3σ). */
  private def thetaIntersectContract(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val perStatus = o.groupBy("o_orderstatus")
      .agg(SketchAggregates.thetaBuild(col("o_custkey")).as("sk"))
    val est = perStatus.agg(SketchAggregates.thetaIntersect(col("sk")).as("est"))
    val exact = o.groupBy("o_custkey")
      .agg(countDistinct("o_orderstatus").as("ns"))
      .where(col("ns") === 3)
      .agg(count(lit(1)).cast("double").as("exact"))
    est.crossJoin(exact).select(
      (abs(col("est") - col("exact")) / col("exact") <= 0.05).as("within_tol"),
      floor(abs(col("est") - col("exact")) / col("exact") / 0.05)
        .cast("long").as("tol_excess"))
  }

  /** X77: KMV (k-minimum-values) distinct estimation — fully DETERMINISTIC
    * and engine-reproducible, unlike HLL/KLL: the estimate is a pure
    * function of the k smallest md5-derived 60-bit hashes, so the ORACLE
    * COMPUTES THE SAME ESTIMATE and the whole row hash-matches (no pinned
    * contract). est = (k−1)·2⁶⁰ / h_k; below k distinct values the sketch
    * is exact. (k−1)·2⁶⁰ = 255·2⁶⁰ has 8 significant bits — exactly
    * representable in a double — and every subsequent op is one correctly-
    * rounded IEEE step on identical inputs, so the doubles agree bitwise. */
  private def kmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    val k = 256
    val pairs = Tables.orders(spark, dir)
      .select(col("o_orderstatus").as("st"), col("o_custkey")).distinct()
    val hashed = pairs.select(col("st"),
      StableHash.md5Prefix60(col("o_custkey").cast("string")).as("h"))
    val w = Window.partitionBy("st").orderBy("h")
    val stats = hashed
      .withColumn("rn", row_number().over(w).cast("long"))
      .groupBy("st")
      .agg(count(lit(1)).as("exact_n"),
        max(when(col("rn") <= k, col("h"))).as("hk"))
    stats
      .withColumn("est",
        when(col("exact_n") < k, col("exact_n").cast("double"))
          .otherwise(lit((k - 1).toDouble * 1152921504606846976.0) /
            col("hk").cast("double")))
      .select(col("st"), col("exact_n"),
        floor(col("est")).cast("long").as("kmv_est"),
        (abs(col("est") - col("exact_n")) / col("exact_n") <= 0.20)
          .as("within_tol"))
      .orderBy("st")
  }

  /** X78: Pearson correlation + OLS slope in EXACT integer sums. The five
    * sufficient statistics (Σx, Σy, Σxy, Σx², Σy²) are BIGINT-exact and
    * aggregation-order-independent — the one place floats appear is the
    * final one-row combination, where every op (int→double conversion,
    * sqrt, ×, ÷) is a single correctly-rounded IEEE step on identical
    * inputs, so both engines produce the same double bit-for-bit. A
    * float-summed corr() would be aggregation-order-dependent and could
    * never hash-match. BIGINT ceiling: n·Σxy < 2⁶³ holds to ~10⁸ rows at
    * these magnitudes (x ≤ 50, y ≤ 10⁵). */
  /** X126: mergeable heavy-hitters (DataSketches frequent-items) with the
    * Misra–Gries contract. Per-source sketches (O(maxMapSize) state each,
    * any vocabulary size) union into a corpus sketch; the exact top-10
    * tokens must all appear in the union's NO_FALSE_NEGATIVES output with
    * their true counts inside [lb, ub]. The contract, never the raw
    * estimates, is what's asserted: purge retention is merge-order
    * sensitive below the error floor (see [[graft.functions.FreqSketch]]).
    * Guarantee scope: an item is certain to survive when its true count
    * exceeds maxError ≈ N/maxMapSize — holds for any vocabulary whose
    * top-10 clears N/64; the forced-purge regime is spec-covered with
    * planted heavy items. Exact x_top_tokens pays a full token-count
    * shuffle for the same answer; this state is 64 entries per group. */
  private def heavyHittersContract(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
    val perSource = toks.groupBy("source")
      .agg(graft.functions.FreqSketch.freqBuild(col("w"), 64).as("sk"))
    val hh = perSource
      .agg(graft.functions.FreqSketch.freqUnionRows(col("sk"), 64).as("rows"))
      .select(explode(col("rows")).as("r"))
      .select(col("r.token").as("w"), col("r.est"), col("r.lb"), col("r.ub"))
    val exactTop = toks.groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(10)
    exactTop.join(hh, Seq("w"), "left")
      .select(col("w"), col("c"),
        col("est").isNotNull.as("in_sketch"),
        (col("c") >= col("lb") && col("c") <= col("ub")).as("bracketed"))
      .orderBy(col("c").desc, col("w"))
  }

  /** X125: Spearman rank correlation — x_corr's robust sibling (monotone,
    * not linear, association; immune to the price outliers that drag
    * Pearson). Ranks are EXACT integers via `row_number` with a
    * deterministic tie-break (value, then the unique line key), so
    * Σd² is integer and ρ is a rational — emitted as (1+ρ)·10⁶ because
    * 6Σd² ≤ 2n(n²−1) keeps THAT dividend non-negative, making Spark's
    * truncating `div` equal DuckDB's flooring `//` (the x_interpolate
    * trick; a raw ρ < 0 would floor/truncate differently). The big
    * products run in DECIMAL(38,0)/HUGEINT — n³·10⁶ passes 2⁶³ at only
    * ~16k rows (the x_anomaly discipline). Scope: one month, because the
    * two ranking windows are GLOBAL sorts — the exact-global-rank funnel
    * documented at x_quantile_norm; corpus-wide Spearman at scale should
    * range-partition ranks (the x_pack cumsum shape) or use KLL ranks. */
  private def spearman(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1995-03-01") &&
        col("l_shipdate") < lit("1995-04-01"))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long").as("x"),
        expr("CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)").as("y"))
    val rxw = Window.orderBy("x", "l_orderkey", "l_linenumber")
    val ryw = Window.orderBy("y", "l_orderkey", "l_linenumber")
    d.withColumn("rx", row_number().over(rxw).cast("long"))
      .withColumn("ry", row_number().over(ryw).cast("long"))
      .select(expr("(rx - ry) * (rx - ry)").as("d2"))
      .agg(count(lit(1)).as("n"), sum("d2").as("sd2"))
      .select(col("n"),
        expr("""CAST((2 * CAST(n AS DECIMAL(38,0)) * (CAST(n AS DECIMAL(38,0)) * n - 1)
               |       - 6 * CAST(sd2 AS DECIMAL(38,0))) * 1000000
               |     div (CAST(n AS DECIMAL(38,0)) * (CAST(n AS DECIMAL(38,0)) * n - 1))
               |     AS BIGINT)""".stripMargin).as("rho_p1_e6"))
  }

  private def corrExact(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1995-03-01") &&
        col("l_shipdate") < lit("1995-04-01"))
      .select(col("l_quantity").cast("long").as("x"),
        floor(col("l_extendedprice")).cast("long").as("y"))
    li.agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))), 6)
          .as("corr"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), 6)
          .as("slope"))
  }

  /** X79: log2-bucketed histogram — the scale-free length profile. The
    * bucket key is floor(log2(v))+1 computed WITHOUT libm (`ln` diverges
    * across engines): it is the digit count of the binary rendering, an
    * integer-exact string op both engines share. */
  private def histLog2(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("n_chars"))
      .withColumn("bucket", length(bin(col("n_chars"))))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        min("n_chars").as("lo"), max("n_chars").as("hi"))
      .orderBy("bucket")

  /** X80: declarative data-quality rule suite, evaluated in THREE plans
    * total regardless of rule count: every row-level predicate folds into
    * ONE conditional aggregation pass (adding a rule adds a column, not a
    * scan), plus one anti-join (referential integrity) and one group-count
    * (uniqueness). The dbt/Deequ-style contract surface: (rule,
    * violations, pass), ordered for a stable report. */
  private def dqRules(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val rowLevel = o.agg(
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("v1"),
        sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("v2"),
        sum(when(!col("o_orderstatus").isin("F", "O", "P"), 1L).otherwise(0L))
          .as("v3"),
        sum(when(col("o_orderdate") < lit("1992-01-01") ||
          col("o_orderdate") >= lit("2010-01-01"), 1L).otherwise(0L)).as("v4"))
      .select(expr(
        """stack(4,
          |  'not_null: o_custkey', v1,
          |  'range: o_totalprice > 0', v2,
          |  'accepted_values: o_orderstatus', v3,
          |  'range: o_orderdate in [1992, 2010)', v4) AS (rule, violations)"""
          .stripMargin))
    val fk = o.join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit("fk: o_custkey -> customer.c_custkey").as("rule"),
        col("violations"))
    val dup = o.groupBy("o_orderkey").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > 1)
      .agg(coalesce(sum("cnt"), lit(0L)).as("violations"))
      .select(lit("unique: o_orderkey").as("rule"), col("violations"))
    rowLevel.unionByName(fk).unionByName(dup)
      .withColumn("pass", col("violations") === 0)
      .orderBy("rule")
  }

  /** X82: KMV Jaccard similarity between two key sets — like X77, the
    * estimate is a pure function of the md5 hash order, so the oracle
    * reproduces it EXACTLY (integer ×10⁶, no contract pinning). The
    * bottom-k of the union is a `TakeOrderedAndProject` (distributed
    * top-k, k bounded), never a global sort; membership flags ride along
    * from one grouped pass over the facts. rse ≈ √(J(1−J)/k) ≈ 3% at
    * k=256 — tolerance 0.1 ≈ 3σ, checked as an integer inequality. */
  private def kmvJaccard(spark: SparkSession, dir: String): DataFrame = {
    val k = 256
    val flags = Tables.orders(spark, dir)
      .where(col("o_orderstatus").isin("F", "O"))
      .groupBy("o_custkey")
      .agg(max(col("o_orderstatus") === "F").as("in_a"),
        max(col("o_orderstatus") === "O").as("in_b"))
    val hashed = flags.select(
      StableHash.md5Prefix60(col("o_custkey").cast("string")).as("h"),
      col("in_a"), col("in_b"))
    val sample = hashed.orderBy("h").limit(k)
    val est = sample.agg(count(lit(1)).as("m"),
      sum(when(col("in_a") && col("in_b"), 1L).otherwise(0L)).as("both"))
      .select(expr("both * 1000000 div m").as("kmv_j_e6"))
    val exact = flags.agg(
        sum(when(col("in_a") && col("in_b"), 1L).otherwise(0L)).as("inter"),
        count(lit(1)).as("uni"))
      .select(expr("inter * 1000000 div uni").as("exact_j_e6"))
    est.crossJoin(exact).select(col("kmv_j_e6"), col("exact_j_e6"),
      (abs(col("kmv_j_e6") - col("exact_j_e6")) <= 100000).as("within_tol"))
  }

  /** X83: winsorized mean — robust-statistics cleaning for heavy-tailed
    * value columns. Nearest-rank p05/p95 cut points (ceil-index, an exact
    * integer rule both engines share), values clamped, all arithmetic in
    * integer cents. The per-group window sorts each group on one reducer —
    * fine for bounded group counts; for huge groups the X75 KLL path
    * supplies the cut points instead (same caveat as x_quantile_norm). */
  private def winsorizedMean(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(col("l_returnflag").as("flag"),
      expr("CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)").as("cents"))
    val w = Window.partitionBy("flag").orderBy("cents")
    val ranked = li
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("flag")))
    val cuts = ranked.groupBy("flag").agg(
      max("n").as("n"),
      max(when(col("rn") === expr("(n * 5 + 99) div 100"), col("cents"))).as("lo_cents"),
      max(when(col("rn") === expr("(n * 95 + 99) div 100"), col("cents"))).as("hi_cents"))
    li.join(cuts, "flag")
      .groupBy("flag")
      .agg(max("n").as("n"), max("lo_cents").as("lo_cents"),
        max("hi_cents").as("hi_cents"),
        expr("sum(greatest(lo_cents, least(hi_cents, cents))) div max(n)")
          .as("wins_mean_cents"))
      .orderBy("flag")
  }

  /** X84: per-group quantile BANDS (p50/p95/p99) read from ONE KLL sketch
    * per group via the scalar [[graft.functions.KllQuantilesExpr]] — the
    * monitoring-dashboard shape (latency bands per service) computed
    * without any per-group sort. Contract per group: each band's TRUE rank
    * within 5% of its target (KLL randomization ⇒ contract, not value). */
  private def kllBands(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag").as("flag"), col("l_extendedprice").as("v"))
    val bands = li.groupBy("flag")
      .agg(SketchAggregates.kllBuild(col("v")).as("sk"))
      .select(col("flag"),
        SketchAggregates.kllQuantiles(col("sk"), Seq(0.5, 0.95, 0.99)).as("qs"))
      .select(col("flag"), col("qs")(0).as("p50"), col("qs")(1).as("p95"),
        col("qs")(2).as("p99"))
    li.join(broadcast(bands), "flag")
      .groupBy("flag")
      .agg(avg(when(col("v") <= col("p50"), 1.0).otherwise(0.0)).as("r50"),
        avg(when(col("v") <= col("p95"), 1.0).otherwise(0.0)).as("r95"),
        avg(when(col("v") <= col("p99"), 1.0).otherwise(0.0)).as("r99"))
      .select(col("flag"),
        (abs(col("r50") - 0.5) <= 0.05 && abs(col("r95") - 0.95) <= 0.05 &&
          abs(col("r99") - 0.99) <= 0.05).as("within_tol"),
        floor(greatest(abs(col("r50") - 0.5), abs(col("r95") - 0.95),
          abs(col("r99") - 0.99)) / 0.05).cast("long").as("tol_excess"))
      .orderBy("flag")
  }

  /** X88: join-key skew diagnosis — the report to read BEFORE picking a
    * salting factor (X45) or AQE thresholds (X45b). Exact group-size
    * percentiles WITHOUT sorting the key table: group counts collapse to
    * the COUNT-OF-COUNTS table (one row per distinct size — a bounded 1-D
    * CDF), and percentiles are nearest-rank lookups on its running sum.
    * The only window runs over that CDF, never over keys or rows.
    * skew_e6 = max·n_keys·10⁶ / total — 10⁶ means perfectly even. */
  private def skewReport(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.lineitem(spark, dir)
      .groupBy("l_partkey").agg(count(lit(1)).as("c"))
    val coc = counts.groupBy("c").agg(count(lit(1)).as("nk"))
    val tot = coc.agg(sum("nk").as("n_keys"),
      sum(col("c") * col("nk")).as("total_rows"), max("c").as("max_size"))
    val cdf = coc.withColumn("cum", sum("nk").over(
      Window.orderBy("c").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(tot))
    val p50 = cdf.where(col("cum") >= expr("(n_keys + 1) div 2"))
      .agg(min("c").as("p50_size"))
    val p99 = cdf.where(col("cum") >= expr("(n_keys * 99 + 99) div 100"))
      .agg(min("c").as("p99_size"))
    tot.crossJoin(p50).crossJoin(p99)
      .select(col("n_keys"), col("total_rows"), col("max_size"),
        col("p50_size"), col("p99_size"),
        expr("max_size * n_keys * 1000000 div total_rows").as("skew_e6"))
  }

  /** X98: MAD (median absolute deviation) outlier screen — the robust
    * dispersion measure that, unlike stddev, a single corrupt value cannot
    * inflate (breakdown point 50% vs 0%). Per group: nearest-rank median
    * (ceil-index rule, X83's exact integer convention), then the median of
    * |v − med|, then the outlier count at the 3·MAD fence — every
    * comparison in integer cents, so both engines agree row-for-row. Two
    * per-group windows; same bounded-group-count caveat as X83, with the
    * X75 KLL sketch as the huge-group path. */
  private def madOutliers(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(col("l_returnflag").as("flag"),
      expr("CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)").as("cents"))
    val w = Window.partitionBy("flag").orderBy("cents")
    val med = li
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("flag")))
      .groupBy("flag").agg(
        max("n").as("n"),
        max(when(col("rn") === expr("(n * 50 + 99) div 100"), col("cents")))
          .as("med_cents"))
    val dev = li.join(med, "flag")
      .select(col("flag"), col("cents"), col("n"), col("med_cents"),
        abs(col("cents") - col("med_cents")).as("adev"))
    val wd = Window.partitionBy("flag").orderBy("adev")
    val mad = dev
      .withColumn("rn", row_number().over(wd).cast("long"))
      .groupBy("flag").agg(
        max("n").as("n"), max("med_cents").as("med_cents"),
        max(when(col("rn") === expr("(n * 50 + 99) div 100"), col("adev")))
          .as("mad_cents"))
    dev.select(col("flag"), col("adev")).join(mad, "flag")
      .groupBy("flag")
      .agg(max("n").as("n"), max("med_cents").as("med_cents"),
        max("mad_cents").as("mad_cents"),
        sum(when(col("adev") > lit(3) * col("mad_cents"), 1L).otherwise(0L))
          .as("n_outliers"))
      .orderBy("flag")
  }

  /** X99: z-score standardization (feature scaling) with the X78 exactness
    * argument: μ and σ come from BIGINT/DECIMAL(38,0) sufficient statistics
    * (aggregation-order-independent), and the per-row z is a FIXED sequence
    * of correctly-rounded IEEE steps on identical integer inputs — so
    * floor(z·10⁴) is engine-exact, where a float-accumulated avg/stddev
    * would differ run-to-run, let alone engine-to-engine. The one-row
    * per-group stats broadcast back onto the stream: standardization of a
    * 100 TB column is one partial-first aggregation + one projection. */
  private def zscore(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_orderpriority").as("pri"),
      expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)").as("cents"))
    val stats = o.groupBy("pri").agg(
      count(lit(1)).as("n"), sum("cents").as("s"),
      sum(col("cents").cast("decimal(38,0)") * col("cents")).as("ssq"))
    o.join(broadcast(stats), "pri")
      .select(col("o_orderkey"), col("pri"),
        // num = n·Σv² − (Σv)² stays EXACT in DECIMAL(38,0); every double op
        // after the cast is one correctly-rounded IEEE step (see scaladoc)
        expr("""CAST(floor(
          (CAST(cents AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
          / sqrt(CAST(CAST(n AS DECIMAL(38,0)) * ssq - CAST(s AS DECIMAL(38,0)) * s
                      AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
          * 10000.0) AS BIGINT)""").as("z_e4"))
      .where(col("o_orderkey") <= 1000)
      .orderBy("o_orderkey")
  }

  /** X106: null imputation with the per-group nearest-rank median — the
    * cleaning step between X80's detection and model input: NULLs (here
    * synthesized deterministically so the oracle sees the same holes) are
    * filled with their group's exact median of OBSERVED values. Group
    * medians are one windowed pass over non-null rows (X83/X98 rule);
    * broadcast-back + coalesce is a projection — imputing a 100 TB column
    * never rescans it. The imputed flag stays queryable (imputation must be
    * auditable, not silent). */
  private def imputeMedian(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_orderpriority").as("pri"),
      when(col("o_orderkey") % 13 === 0, lit(null).cast("long"))
        .otherwise(expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)"))
        .as("cents"))
    val obs = o.where(col("cents").isNotNull)
    val w = Window.partitionBy("pri").orderBy("cents")
    val med = obs
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("pri")))
      .groupBy("pri").agg(
        max(when(col("rn") === expr("(n * 50 + 99) div 100"), col("cents")))
          .as("med_cents"))
    o.join(broadcast(med), "pri")
      .select(col("o_orderkey"), col("pri"),
        col("cents").isNull.as("was_null"),
        coalesce(col("cents"), col("med_cents")).as("imputed_cents"))
      .where(col("o_orderkey") <= 1500)
      .orderBy("o_orderkey")
  }

  /** X132: Gini impurity per group — the split-quality / class-balance
    * measure (1 − Σpᵢ²) for monitoring label or language mix per corpus
    * slice. Fully RATIONAL: gini·10⁶ = (n² − Σcᵢ²)·10⁶ div n², so the key
    * is engine-exact with no float anywhere. Two partial-first
    * aggregations (class counts, then per-group moments); products run in
    * DECIMAL(38,0)/HUGEINT — n²·10⁶ passes 2⁶³ at n ≈ 3·10⁶ rows per
    * group (the x_anomaly discipline); DECIMAL(38,0) carries it to
    * n ≈ 10¹⁶. */
  private def giniImpurity(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_classes"), sum("c").as("n"),
        sum(col("c").cast("decimal(38,0)") * col("c")).as("sc2"))
      .select(col("source"), col("n_classes"), col("n"),
        expr("""CAST((CAST(n AS DECIMAL(38,0)) * n - sc2) * 1000000
               |     div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)""".stripMargin)
          .as("gini_e6"))
      .orderBy("source")

  /** X133: chi-square test of independence over a contingency table
    * (order status × priority) — the drift/association test behind
    * feature-target dependence screens. The full grid INCLUDING empty
    * cells is materialized (distinct-rows × distinct-cols, left-joined to
    * observed counts: a zero cell still contributes E = R·C/n to the
    * statistic, which a bare groupBy would silently drop). Per-cell terms
    * are floored rationals — term·10⁶ = ⌊(n·O − R·C)²·10⁶ / (n·R·C)⌋ —
    * summed as integers, so both engines agree exactly. Products in
    * DECIMAL(38,0)/HUGEINT; (n·O)²·10⁶ passes DECIMAL(38,0) at
    * n ≈ 4·10¹⁵ cell observations. Margins are metadata-sized relations
    * (r + c + 1 rows) and broadcast onto the grid. */
  private def chiSquare(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderstatus").as("s"), col("o_orderpriority").as("p"))
    val cells = o.groupBy("s", "p").agg(count(lit(1)).as("obs"))
    val rows = o.groupBy("s").agg(count(lit(1)).as("r"))
    val colsM = o.groupBy("p").agg(count(lit(1)).as("cl"))
    val tot = o.agg(count(lit(1)).as("n"))
    rows.crossJoin(colsM)
      .join(cells, Seq("s", "p"), "left")
      .select(col("s"), col("p"), col("r"), col("cl"),
        coalesce(col("obs"), lit(0L)).as("obs"))
      .crossJoin(broadcast(tot))
      .select(expr(
        """CAST((CAST(n AS DECIMAL(38,0)) * obs - CAST(r AS DECIMAL(38,0)) * cl)
          |     * (CAST(n AS DECIMAL(38,0)) * obs - CAST(r AS DECIMAL(38,0)) * cl)
          |     * 1000000
          |     div (CAST(n AS DECIMAL(38,0)) * r * cl) AS BIGINT)""".stripMargin)
        .as("term_e6"), col("n"))
      .agg(max("n").as("n_obs"), count(lit(1)).as("n_cells"),
        sum("term_e6").as("chi2_e6"))
  }

  /** X134: lagged cross-correlation between two event-count series (clicks
    * leading errors at lags 0–3 days) — the lead/lag dependence scan for
    * monitoring pipelines. The raw stream reduces to a per-day count table
    * FIRST (the series length is calendar-bounded metadata, not data), the
    * lag alignment is a generator-driven self-join on day ordinals, and
    * per-lag sufficient statistics are exact BIGINTs with the one-row IEEE
    * final written in x_corr's association order — engine-exact doubles. */
  private def crossCorrelation(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(datediff(col("ts").cast("date"), lit("2024-01-01")).as("d"),
        col("event_type"))
      .groupBy("d")
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("y"))
      .cache()
    crossCorrFromSeries(spark, daily, 4)
  }

  /** X135 core: lagged Pearson cross-correlation of a `(d, x, y)` integer
    * series for lags `0 until maxLag`, from one pass of BIGINT sufficient
    * sums per lag. A zero-variance slice (constant x or y at some lag) has
    * no defined correlation — NULL on both engines, never a NaN-vs-error
    * divergence (spec-pinned on planted data). */
  def crossCorrFromSeries(spark: SparkSession, daily: DataFrame,
      maxLag: Int): DataFrame = {
    val lags = spark.range(0, maxLag).select(col("id").cast("int").as("lag"))
    val aligned = daily.as("a").crossJoin(broadcast(lags))
      .join(daily.as("b"), col("b.d") === col("a.d") + col("lag"))
      .select(col("lag"), col("a.x").as("x"), col("b.y").as("y"))
    aligned.groupBy("lag")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("lag"), col("n"),
        // zero-variance guard: a constant series has no defined correlation —
        // NULL on both engines, never a NaN-vs-error divergence
        round(when((col("n") * col("sxx") - col("sx") * col("sx")) > 0 &&
            (col("n") * col("syy") - col("sy") * col("sy")) > 0,
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
              sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double")))), 6)
          .as("xcorr"))
      .orderBy("lag")
  }

  /** X143: two-feature OLS regression by the closed-form normal equations —
    * distributed model fitting with NO iteration: one pass of BIGINT
    * sufficient sums (Σx₁, Σx₂, Σy, Σx₁², Σx₂², Σx₁x₂, Σx₁y, Σx₂y), then a
    * one-row 2×2 Cramer solve. The centered normal-matrix entries
    * (n·Σx₁² − (Σx₁)², …) and BOTH Cramer numerators stay EXACT integers
    * in DECIMAL(38,0)/HUGEINT, so each coefficient is a single
    * correctly-rounded IEEE division of identical exact integers —
    * engine-bit-exact, where an iterative or float-accumulated fit never
    * could be. Ceilings at these magnitudes (x₁ ≤ 50, x₂ ≤ 10, y ≤ 10⁷):
    * numerator ≈ n²·Σx₁y ≲ 10³⁸ holds to n ≈ 10⁸ rows; beyond that,
    * pre-scale y. */
  private def ols2(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(
      col("l_quantity").cast("long").as("x1"),
      expr("CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)").as("x2"),
      expr("CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)").as("y"))
    li.agg(count(lit(1)).as("n"), sum("x1").as("sx1"), sum("x2").as("sx2"),
        sum("y").as("sy"),
        sum(col("x1") * col("x1")).as("s11r"),
        sum(col("x2") * col("x2")).as("s22r"),
        sum(col("x1") * col("x2")).as("s12r"),
        sum(col("x1") * col("y")).as("s1y"),
        sum(col("x2") * col("y")).as("s2y"))
      .selectExpr("n", "sx1", "sx2", "sy",
        "CAST(n AS DECIMAL(38,0)) * s11r - CAST(sx1 AS DECIMAL(38,0)) * sx1 AS m11",
        "CAST(n AS DECIMAL(38,0)) * s22r - CAST(sx2 AS DECIMAL(38,0)) * sx2 AS m22",
        "CAST(n AS DECIMAL(38,0)) * s12r - CAST(sx1 AS DECIMAL(38,0)) * sx2 AS m12",
        "CAST(n AS DECIMAL(38,0)) * s1y - CAST(sx1 AS DECIMAL(38,0)) * sy AS my1",
        "CAST(n AS DECIMAL(38,0)) * s2y - CAST(sx2 AS DECIMAL(38,0)) * sy AS my2")
      .selectExpr("n",
        "round(CAST(my1 * m22 - my2 * m12 AS DOUBLE) / CAST(m11 * m22 - m12 * m12 AS DOUBLE), 6) AS b1",
        "round(CAST(my2 * m11 - my1 * m12 AS DOUBLE) / CAST(m11 * m22 - m12 * m12 AS DOUBLE), 6) AS b2",
        """round((CAST(sy AS DOUBLE)
          |  - CAST(my1 * m22 - my2 * m12 AS DOUBLE) / CAST(m11 * m22 - m12 * m12 AS DOUBLE) * CAST(sx1 AS DOUBLE)
          |  - CAST(my2 * m11 - my1 * m12 AS DOUBLE) / CAST(m11 * m22 - m12 * m12 AS DOUBLE) * CAST(sx2 AS DOUBLE))
          |  / CAST(n AS DOUBLE), 6) AS b0""".stripMargin)
  }

  /** X144: Benford first-digit audit — the fraud/corruption screen for
    * "organically grown" numeric columns: the observed first-significant-
    * digit distribution against Benford's log₁₀(1+1/d) expectation. The
    * digit is a string operation on the floored integer (engine-identical,
    * no libm); expected shares are ×10⁶ literal constants on both sides,
    * so the whole report is exact integers. One groupBy(digit) + a 1-row
    * broadcast total — scan-bound at any scale. */
  private def benford(spark: SparkSession, dir: String): DataFrame = {
    val bexp = "CASE digit WHEN '1' THEN 301030 WHEN '2' THEN 176091 " +
      "WHEN '3' THEN 124939 WHEN '4' THEN 96910 WHEN '5' THEN 79181 " +
      "WHEN '6' THEN 66947 WHEN '7' THEN 57992 WHEN '8' THEN 51153 " +
      "ELSE 45757 END"
    val d = Tables.orders(spark, dir)
      .select(substring(floor(col("o_totalprice")).cast("long").cast("string"),
        1, 1).as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val tot = d.agg(sum("n").as("total"))
    d.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        expr("n * 1000000 div total").as("share_e6"),
        expr(s"CAST($bexp AS BIGINT)").as("benford_e6"),
        expr(s"n * 1000000 div total - ($bexp)").as("dev_e6"))
      .orderBy("digit")
  }

  /** X155: market-basket association rules — top co-purchased part pairs
    * with confidence and lift, the classic recsys/assortment miner. The
    * pair space is bounded by BASKET SIZE, not catalog size: the self-join
    * on order key emits |basket|²/2 pairs per order (TPC-H ≤ 7 lines ⇒
    * ≤ 21), so candidate volume is linear in order count at any scale.
    * Support counts, confidence c_ab·10⁶ div c_a, and lift
    * c_ab·n·10⁶ div (c_a·c_b) are all exact integers (lift products in
    * DECIMAL(38,0)/HUGEINT — c_a·c_b·10⁶ passes 2⁶³ at c ≈ 3·10⁶). */
  private def marketBasket(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val cnt = li.groupBy("pk").agg(count(lit(1)).as("c"))
    val nOrders = li.agg(countDistinct("ok").as("n"))
    // pinned-width exchange for the pair-generating self-join: the ok
    // shuffle is byte-light, so AQE's byte-based coalescing would run
    // the within-order pair expansion + count on 1-2 cores; one
    // explicit exchange feeds BOTH sides (reused subtree)
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val byOk = li.repartition(n, col("ok"))
    // hash, not sort-merge: per-order groups are tiny (≤ lines/order),
    // sorting 0.5M-row sides per run would cost more than the join
    byOk.as("a").join(byOk.as("b").hint("shuffle_hash"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("pa"), col("b.pk").as("pb"))
      .agg(count(lit(1)).as("c_ab"))
      .join(cnt.select(col("pk").as("pa"), col("c").as("ca")), "pa")
      .join(cnt.select(col("pk").as("pb"), col("c").as("cb")), "pb")
      .crossJoin(broadcast(nOrders))
      .select(col("pa"), col("pb"), col("c_ab"), col("ca"), col("cb"),
        expr("c_ab * 1000000 div ca").as("conf_e6"),
        expr("""CAST(CAST(c_ab AS DECIMAL(38,0)) * n * 1000000
               |     div (CAST(ca AS DECIMAL(38,0)) * cb) AS BIGINT)"""
          .stripMargin).as("lift_e6"))
      .orderBy(col("c_ab").desc, col("pa"), col("pb"))
      .limit(20)
  }

  /** X168: k-anonymity / l-diversity audit — the re-identification risk
    * report data governance runs before sharing a table: group by the
    * quasi-identifier tuple (nation, market segment, balance bucket) and
    * flag groups smaller than k (linkable to an individual) or with fewer
    * than l distinct sensitive values (attribute disclosure even when
    * k-anonymous). Two partial-first aggregations + a one-row report —
    * scan-bound at any table size; the quasi-identifier space is the
    * GROUP count, not the row count. */
  private def kAnonymity(spark: SparkSession, dir: String,
      k: Int = 5, l: Int = 3): DataFrame = {
    val c = Tables.customer(spark, dir).select(
      col("c_nationkey").as("nat"), col("c_mktsegment").as("seg"),
      expr("CAST(floor(c_acctbal / 1000.0) AS BIGINT)").as("bal_bucket"),
      expr("CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)").as("sensitive"))
    c.groupBy("nat", "seg", "bal_bucket")
      .agg(count(lit(1)).as("sz"), countDistinct("sensitive").as("ldiv"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("sz") < k, 1L).otherwise(0L)).as("n_groups_lt_k"),
        coalesce(sum(when(col("sz") < k, col("sz"))), lit(0L))
          .as("rows_at_risk"),
        min("sz").as("min_group_size"),
        sum(when(col("ldiv") < l, 1L).otherwise(0L)).as("n_groups_lt_l"),
        min("ldiv").as("min_l_diversity"))
  }

  /** X172: join-size estimation from KMV sketches — the CBO input
    * computed WITHOUT running the join: the distinct-key overlap of the
    * two join sides estimated from one bottom-k pass over the union of
    * key sets (X82's membership-flag trick), |A∩B|_est = Ĵ·Û where Û is
    * the X77 KMV cardinality of the union. Fully deterministic (a pure
    * function of the md5 hash order), so the ORACLE REPRODUCES THE
    * ESTIMATE ITSELF and the exact overlap rides along for the error
    * check. This is how a planner sizes an FK join from per-table
    * sketches before choosing broadcast vs shuffle. */
  private def joinSizeEstimate(spark: SparkSession, dir: String): DataFrame = {
    val k = 256
    val a = Tables.orders(spark, dir)
      .where(col("o_custkey") % 3 === 0)
      .select(col("o_custkey").as("key")).distinct()
      .withColumn("in_a", lit(true))
    val b = Tables.customer(spark, dir)
      .where(col("c_custkey") % 2 === 0)
      .select(col("c_custkey").as("key")).distinct()
      .withColumn("in_b", lit(true))
    val flags = a.join(b, Seq("key"), "full_outer")
      .select(col("key"), coalesce(col("in_a"), lit(false)).as("in_a"),
        coalesce(col("in_b"), lit(false)).as("in_b"))
    val hashed = flags.select(
      StableHash.md5Prefix60(col("key").cast("string")).as("h"),
      col("key"), col("in_a"), col("in_b"))
    // (h, key) tie-break: a 60-bit prefix collision at the k-th boundary
    // must not make the bottom-k selection engine-dependent
    val sample = hashed.orderBy("h", "key").limit(k)
    val est = sample.agg(count(lit(1)).as("m"), max("h").as("hk"),
        sum(when(col("in_a") && col("in_b"), 1L).otherwise(0L)).as("both"))
      .select(
        expr(s"""CASE WHEN m < $k THEN m
                |  ELSE CAST(floor(${(k - 1).toDouble} * 1152921504606846976.0
                |       / CAST(hk AS DOUBLE)) AS BIGINT) END""".stripMargin)
          .as("u_est"),
        expr("both * 1000000 div m").as("j_e6"))
      .select(col("u_est"), col("j_e6"),
        expr("j_e6 * u_est div 1000000").as("inter_est"))
    val exact = flags.agg(
      sum(when(col("in_a") && col("in_b"), 1L).otherwise(0L)).as("inter_exact"))
    est.crossJoin(exact).select(
      col("u_est"), col("j_e6"), col("inter_est"), col("inter_exact"),
      (abs(col("inter_est") - col("inter_exact")).cast("double") <=
        col("inter_exact") * 0.25).as("within_tol"))
  }

  /** X184: sampling-bias audit — does the 10% hash sample preserve the
    * population's language mix? Per-language share in sample vs full
    * corpus, deviations in exact ×10⁶ integers: the validity check every
    * sampled-eval pipeline owes its consumers (a biased key column makes
    * hash sampling silently non-representative). Two aggregations + a
    * language-bounded join. */
  private def sampleBias(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val full = d.groupBy("lang").agg(count(lit(1)).as("n_full"))
    val samp = graft.relational.Sampling
      .hashSample(d, col("doc_id"), 10)
      .groupBy("lang").agg(count(lit(1)).as("n_samp"))
    val tot = full.agg(sum("n_full").as("t_full"))
    val totS = samp.agg(sum("n_samp").as("t_samp"))
    full.join(samp, Seq("lang"), "left")
      .select(col("lang"), col("n_full"),
        coalesce(col("n_samp"), lit(0L)).as("n_samp"))
      .crossJoin(broadcast(tot)).crossJoin(broadcast(totS))
      .select(col("lang"), col("n_full"), col("n_samp"),
        expr("n_full * 1000000 div t_full").as("share_full_e6"),
        expr("CASE WHEN t_samp > 0 THEN n_samp * 1000000 div t_samp ELSE 0 END")
          .as("share_samp_e6"),
        abs(expr("n_full * 1000000 div t_full") -
          expr("CASE WHEN t_samp > 0 THEN n_samp * 1000000 div t_samp ELSE 0 END"))
          .as("dev_e6"))
      .orderBy("lang")
  }

  /** X207: skyline (Pareto frontier) — documents not dominated on
    * (maximize token count, minimize char count): no other doc has
    * ≥ tokens AND ≤ chars with one strict. The multi-criteria shortlist
    * operator (cheapest-yet-densest docs, best quality-per-cost) that the
    * naive formulation computes as an O(n²) NOT EXISTS dominance
    * self-join.
    *
    * Scale shape, the distributed-skyline pattern: (1) a PARALLEL
    * per-x reduction — groupBy(n_chars).max(n_tok) — collapses the corpus
    * to ≤ |distinct n_chars| candidate points (value-bounded metadata,
    * not row-bounded), since for a given char count only the max-token
    * doc can be undominated; (2) one running-max window over that bounded
    * relation (sorted by chars asc, the frontier is where tokens exceed
    * every preceding max) — a deliberate, allowlisted SinglePartition
    * over metadata; (3) an equi join back tags the winning documents
    * (ties at a frontier point all surface). No dominance pair space
    * anywhere. */
  private def skyline(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables.documents(spark, dir).select(col("doc_id"), col("n_chars"),
      size(split(col("text"), " ")).cast("long").as("n_tok"))
    val cand = m.groupBy("n_chars").agg(max("n_tok").as("n_tok"))
    val w = Window.orderBy(col("n_chars").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = cand.withColumn("prev_max", max("n_tok").over(w))
      .where(col("prev_max").isNull || col("n_tok") > col("prev_max"))
      .drop("prev_max")
    m.join(frontier, Seq("n_chars", "n_tok"))
      .select("doc_id", "n_chars", "n_tok").orderBy("doc_id")
  }

  /** X210: count-min sketch AS A RELATION — the mergeable frequency
    * sketch (Cormode & Muthukrishnan) held as (depth, bucket, count) rows
    * instead of an opaque blob: depth×width = 4×256 counters built in one
    * fan-out-4 pass (each item increments one bucket per depth row);
    * merging two sketches is a UNION + re-sum on the same 1024 keys —
    * exactly the per-partition/per-day stats pattern X53/X53b use for
    * distincts, here for point frequency. A probe key's estimate is the
    * MIN of its 4 buckets; the one-sided CMS guarantee (never an
    * undercount) is asserted per probe in the output, with the exact
    * count alongside — contract measured, not assumed (the X75/X5e
    * discipline for sketches). Hashes are the engine-portable
    * [[StableHash]], so the sketch is reproducible across engines and
    * retries. */
  private def cmsEstimate(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val depths = spark.range(4).select(col("id").as("d"))
    val cms = ev.select(col("user_id").cast("string").as("k"))
      .crossJoin(broadcast(depths))
      .select(col("d"), (StableHash.md5Prefix60(
        concat(col("d").cast("string"), lit(":"), col("k"))) % 256).as("b"))
      .groupBy("d", "b").agg(count(lit(1)).as("c"))
    val probe = ev.where(col("user_id") < 10)
      .groupBy("user_id").agg(count(lit(1)).as("true_c"))
    probe.crossJoin(broadcast(depths))
      .select(col("user_id"), col("true_c"), col("d"),
        (StableHash.md5Prefix60(concat(col("d").cast("string"), lit(":"),
          col("user_id").cast("string"))) % 256).as("b"))
      .join(cms, Seq("d", "b"), "left")
      .groupBy("user_id")
      .agg(max("true_c").as("true_c"),
        min(coalesce(col("c"), lit(0L))).as("est_c"))
      .select(col("user_id"), col("true_c"), col("est_c"),
        (col("est_c") >= col("true_c")).as("no_undercount"))
      .orderBy("user_id")
  }

  /** X212: keyed pseudonymization with a referential-integrity proof —
    * the GDPR-pipeline primitive: replace the natural key with a keyed
    * hash (rotate the key to break old linkage; drop it to anonymize)
    * while JOINS KEEP WORKING, because every table maps the key through
    * the same function. The output is the audit: per-segment join
    * cardinality on the original key vs the pseudonymized key, with the
    * preserved flag — if the keyed hash collided inside the key domain,
    * the counts would diverge (measured, not assumed, per the sketch
    * discipline). Pure projection on both sides; the join shape (and its
    * shuffle) is IDENTICAL pre/post — pseudonymization costs nothing at
    * plan level. */
  private def pseudonymize(spark: SparkSession, dir: String): DataFrame = {
    val rotationKey = "rot-2025Q3"
    def pid(c: org.apache.spark.sql.Column) =
      StableHash.md5Prefix60(concat(lit(rotationKey), lit(":"), c.cast("string")))
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val ord = Tables.orders(spark, dir).select(col("o_custkey"))
    val orig = ord.join(cust, ord("o_custkey") === cust("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_orig"))
    val pseudo = ord.select(pid(col("o_custkey")).as("pk"))
      .join(cust.select(pid(col("c_custkey")).as("pk"), col("c_mktsegment")), "pk")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_pseudo"))
    orig.join(pseudo, Seq("c_mktsegment"))
      .select(col("c_mktsegment").as("segment"), col("n_orig"), col("n_pseudo"),
        (col("n_orig") === col("n_pseudo")).as("preserved"))
      .orderBy("segment")
  }

  /** X216: CUSUM changepoint detection — the level-shift detector over a
    * daily series, kept EXACT in integers: instead of the textbook
    * cumsum of (x_i − mean) (a float division), the cusum is scaled by
    * n: C_k = n·Σ_{i≤k}x_i − k·Σx, which is n× the textbook curve and
    * shares its argmax. The day where |C_k| peaks is the maximum-
    * likelihood single changepoint. Scale shape: the corpus-sized work
    * is one daily groupBy; the running windows ride the CALENDAR-bounded
    * daily relation (category-3 metadata window), and the n/total scalar
    * broadcasts. */
  private def cusum(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("ts").cast("date").as("dy"))
      .agg(count(lit(1)).as("c"))
    val tot = daily.agg(count(lit(1)).as("n"), sum("c").as("tot"))
    val w = Window.orderBy("dy")
    val s = daily.crossJoin(broadcast(tot))
      .withColumn("cusum",
        col("n") * sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)) -
          row_number().over(w) * col("tot"))
    val mx = s.agg(max(abs(col("cusum"))).as("mx"))
    s.crossJoin(broadcast(mx))
      .select(col("dy"), col("c"), col("cusum"),
        (abs(col("cusum")) === col("mx")).as("is_changepoint"))
      .orderBy("dy")
  }

  /** X217: exact rolling variance — the 7-day volatility band with no
    * order-dependent float sum: daily revenue is quantized to integer
    * cents, and the rolling variance travels as its integer NUMERATOR
    * n·Σs² − (Σs)² (= n²·variance) over a ROWS frame — comparisons and
    * thresholds on the numerator are exactly the comparisons on the
    * variance. One corpus groupBy to days; the rolling frame rides the
    * calendar-bounded daily relation. Magnitudes: daily cents ≤ ~10⁷ at
    * bench scale → n·Σs² ≤ ~10¹⁶, inside int64. */
  private def rollingVar(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .where(col("value").isNotNull)
      .groupBy(col("ts").cast("date").as("dy"))
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("s"))
    val w = Window.orderBy("dy").rowsBetween(-6, 0)
    daily.select(col("dy"), col("s"),
        count(lit(1)).over(w).as("n"),
        sum("s").over(w).as("win_sum"),
        (count(lit(1)).over(w) * sum(col("s") * col("s")).over(w) -
          sum("s").over(w) * sum("s").over(w)).as("var_num"))
      .orderBy("dy")
  }

  /** X218: Mann–Whitney U (rank-sum test) — the nonparametric
    * two-sample location test, computed the 100 TB way: values bucket to
    * a VALUE-BOUNDED grid (deci-units: floor(v·10)), the corpus reduces
    * to per-bucket counts (c1, c2), and tie-averaged ranks come from the
    * grid's running count — 2·avgrank(q) = 2·cum_before(q) + cnt(q) + 1
    * stays integral (the ×2 trick). U₁ and U₂ are derived INDEPENDENTLY
    * from their own rank sums, so the output's u1+u2 = 2·n1·n2 identity
    * is a genuine cross-check, not a tautology. No rank() over the raw
    * corpus: the only unpartitioned window rides the grid relation. */
  private def mannWhitney(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables.events(spark, dir)
      .where(col("event_type").isin("click", "purchase") &&
        col("value").isNotNull)
      .select(col("event_type").as("t"),
        floor(col("value") * 10).cast("long").as("q"))
    val g = v.groupBy("q").agg(
      sum(when(col("t") === "click", 1L).otherwise(0L)).as("c1"),
      sum(when(col("t") === "purchase", 1L).otherwise(0L)).as("c2"))
    val w = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, -1)
    val r = g.withColumn("cumb",
        coalesce(sum(col("c1") + col("c2")).over(w), lit(0L)))
      .withColumn("r2", lit(2L) * col("cumb") + col("c1") + col("c2") + 1L)
    r.agg(sum("c1").as("n1"), sum("c2").as("n2"),
        sum(col("c1") * col("r2")).as("rs1"),
        sum(col("c2") * col("r2")).as("rs2"))
      .select(col("n1"), col("n2"),
        (col("rs1") - col("n1") * (col("n1") + 1)).as("u1_x2"),
        (col("rs2") - col("n2") * (col("n2") + 1)).as("u2_x2"))
      .withColumn("consistent",
        col("u1_x2") + col("u2_x2") === lit(2L) * col("n1") * col("n2"))
  }

  /** X219: two-sample Kolmogorov–Smirnov distance — the distribution-
    * drift test with the ECDF gap kept exact: on the value-bounded grid
    * (floor(v·10)), D's numerator is max|n2·cum1 − n1·cum2| over the
    * grid (= n1·n2·D for the binned ECDFs, exact integers; the binned D
    * lower-bounds the continuous one and refines with the grid). The
    * corpus collapses to grid counts in one groupBy; cumulatives and the
    * argmax ride the bounded grid relation. Also reports the location
    * (min grid point attaining the max — deterministic tie-break). */
  private def ksTest(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables.events(spark, dir)
      .where(col("event_type").isin("click", "purchase") &&
        col("value").isNotNull)
      .select(col("event_type").as("t"),
        floor(col("value") * 10).cast("long").as("q"))
    val g = v.groupBy("q").agg(
      sum(when(col("t") === "click", 1L).otherwise(0L)).as("c1"),
      sum(when(col("t") === "purchase", 1L).otherwise(0L)).as("c2"))
    val w = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, 0)
    val s = g.select(col("q"),
      sum("c1").over(w).as("cum1"), sum("c2").over(w).as("cum2"))
    val n = g.agg(sum("c1").as("n1"), sum("c2").as("n2"))
    val diffs = s.crossJoin(broadcast(n))
      .select(col("n1"), col("n2"), col("q"),
        abs(col("n2") * col("cum1") - col("n1") * col("cum2")).as("diff"))
    diffs.withColumn("mxd", max("diff").over(Window.partitionBy(lit(1))))
      .groupBy("n1", "n2")
      .agg(max("diff").as("d_num"),
        min(when(col("diff") === col("mxd"), col("q"))).as("at_q"))
  }

  /** X239: weighted percentile — revenue-weighted quantity quantiles per
    * return flag ("the median order size by dollar volume", the pricing/
    * capacity answer an unweighted median gets wrong whenever big-ticket
    * rows are rare). Exact integer formulation: weights are
    * `floor(l_extendedprice)` (floor is a correctly-rounded IEEE op on the
    * shared double, so both engines derive the same integer), the weighted
    * CDF is a per-flag cumulative sum over the (flag, qty) rollup — ≤50
    * distinct quantities per flag, so the window is metadata-scale — and
    * p-th percentile = smallest qty whose cumulative weight reaches
    * ⌈p·W⌉ (integer cross-multiplied: `cum·100 ≥ tot·p`). One corpus
    * aggregation + one bounded window; no global sort of rows. */
  private def weightedPercentile(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag").as("flag"),
        col("l_quantity").cast("long").as("qty"),
        expr("CAST(floor(l_extendedprice) AS BIGINT)").as("w"))
    val byQty = li.groupBy("flag", "qty").agg(sum("w").as("wq"))
    val cdf = byQty
      .withColumn("cum", sum("wq").over(
        Window.partitionBy("flag").orderBy("qty")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("tot", sum("wq").over(Window.partitionBy("flag")))
    cdf.groupBy("flag")
      .agg(max("tot").as("total_w"),
        min(when(col("cum") * 100 >= col("tot") * 50, col("qty"))).as("p50_qty"),
        min(when(col("cum") * 100 >= col("tot") * 90, col("qty"))).as("p90_qty"))
      .orderBy("flag")
  }

  /** X240: per-group OLS trend — slope/intercept of daily event volume per
    * event type, the "is this stream growing and how fast" fleet query.
    * Exact integers end to end: x is the day ordinal vs 2024-01-01, y the
    * daily count; slope/intercept come from the closed-form normal
    * equations ((nΣxy−ΣxΣy)/(nΣxx−Σx²)) as ×10⁶ truncating divisions —
    * the X143 (global OLS) discipline, here grouped. One partial-first
    * rollup to (type, day), one per-type aggregation; no windows. */
  private def groupOls(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type").as("t"),
        datediff(col("ts").cast("date"), lit("2024-01-01")).cast("long").as("x"))
      .groupBy("t", "x").agg(count(lit(1)).as("y"))
    daily.groupBy("t")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * x")).as("sxx"), sum(expr("x * y")).as("sxy"))
      // n ≥ 2 distinct days ⇒ nΣx² > (Σx)² strictly, so the divisions are
      // safe; a 1-day group has no trend to fit
      .where(col("n") >= 2)
      .select(col("t"), col("n"),
        expr("(n * sxy - sx * sy) * 1000000 div (n * sxx - sx * sx)")
          .as("slope_e6"),
        expr("(sy * sxx - sx * sxy) * 1000000 div (n * sxx - sx * sx)")
          .as("intercept_e6"))
      .orderBy("t")
  }

  /** X241: Wald–Wolfowitz runs test over daily event volume — the
    * randomness audit that catches autocorrelated load (ramps, weekly
    * cycles, incident plateaus) that mean/variance monitoring misses: too
    * FEW runs of above/below-median days means trending, too many means
    * oscillation. Exact integers: the median is the positional value at
    * rank ⌈n/2⌉ of the ≤366-row daily relation (ties at the median drop,
    * the standard treatment), a run boundary is a lag() sign change, and
    * the expected-runs reference 1 + 2·na·nb/(na+nb) ships as a ×10⁶
    * division. Calendar-bounded windows only (category-3 scale shape). */
  private def runsTest(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(datediff(col("ts").cast("date"), lit("2024-01-01"))
        .cast("long").as("d"))
      .groupBy("d").agg(count(lit(1)).as("c"))
    val ranked = daily.withColumn("rk",
      row_number().over(Window.orderBy("c", "d")))
    val med = ranked
      .crossJoin(broadcast(ranked.agg(count(lit(1)).as("n"))))
      .where(col("rk") === expr("(n + 1) div 2"))
      .select(col("c").as("med"))
    val signed = daily.crossJoin(broadcast(med))
      .where(col("c") =!= col("med"))
      .select(col("d"), when(col("c") > col("med"), 1).otherwise(0).as("s"))
    signed
      .withColumn("prev", lag("s", 1).over(Window.orderBy("d")))
      .agg(
        sum(when(col("prev").isNull || col("prev") =!= col("s"), 1L)
          .otherwise(0L)).as("n_runs"),
        sum(when(col("s") === 1, 1L).otherwise(0L)).as("n_above"),
        sum(when(col("s") === 0, 1L).otherwise(0L)).as("n_below"))
      .select(col("n_runs"), col("n_above"), col("n_below"),
        // nullif: a corpus where every day equals the median empties the
        // signed relation; both engines must then emit NULL, not one NULL
        // and one division error
        expr("1000000 + 2 * n_above * n_below * 1000000 div nullif(n_above + n_below, 0)")
          .as("expected_e6"))
  }

  /** X259: decision-stump training INSIDE the engine — the best 1-level
    * split of label (l_returnflag = 'R') on feature l_quantity by weighted
    * Gini impurity, exactly (CART's split-search step, public algorithm;
    * the building block of tree ensembles and of feature-importance
    * audits). Minimizing weighted Gini Σ nₛ·(1−Σp²) is equivalent to
    * MAXIMIZING Σₛ (posₛ² + negₛ²)/nₛ, kept as an exact ×10⁶ integer so
    * the argmax is engine-deterministic (ties break to the smallest
    * threshold). Shape: ONE pass aggregates per feature value (the domain
    * is the bounded 1..50 quantity grid), a 50-row cumulative window turns
    * value counts into left-split counts, totals broadcast — the corpus is
    * never re-scanned per candidate threshold, the trick that makes
    * histogram-based tree learners (LightGBM-style) scale. ×10⁶ products
    * bound: pos² · 10⁶ needs pos ≤ 3·10⁶ per side — at larger corpora
    * drop the ×10⁶ (or widen to DECIMAL); the argmax is unaffected. */
  private def stump(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("v_li_stump")
    spark.sql(
      """WITH c AS (SELECT CAST(l_quantity AS BIGINT) AS q,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM v_li_stump),
        |pq AS (SELECT q, CAST(count(*) AS BIGINT) AS nq,
        |    CAST(sum(y) AS BIGINT) AS posq
        |  FROM c GROUP BY q),
        |cum AS (SELECT q, sum(nq) OVER (ORDER BY q) AS n_l,
        |    sum(posq) OVER (ORDER BY q) AS pos_l FROM pq),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS pos FROM c),
        |sc AS (SELECT q AS threshold, n_l, pos_l,
        |    n - n_l AS n_r, pos - pos_l AS pos_r
        |  FROM cum CROSS JOIN tot WHERE n_l < n)
        |SELECT threshold,
        |  (pos_l * pos_l + (n_l - pos_l) * (n_l - pos_l)) * 1000000 div n_l
        |    + (pos_r * pos_r + (n_r - pos_r) * (n_r - pos_r)) * 1000000 div n_r
        |    AS score_e6,
        |  n_l AS n_left, pos_l AS pos_left, n_r AS n_right, pos_r AS pos_right
        |FROM sc ORDER BY score_e6 DESC, threshold LIMIT 1""".stripMargin)
  }

  /** X243: A/B test readout — two-proportion z² over per-user conversion
    * (any purchase), variants assigned by user_id parity (production swaps
    * in the experiment-assignment column). Counts are exact integers; the
    * z² statistic (c₁n₂−c₂n₁)²·N / (n₁n₂·c·(N−c)) is ONE double division
    * over products of exact integers written in identical association
    * order on both engines, rounded at 6dp — the cosine keys' exactness
    * recipe. Degenerate cases (zero or universal conversion) short-circuit
    * to 0. Shape: one user rollup (shuffle on user_id), then scalars. */
  private def abTest(spark: SparkSession, dir: String): DataFrame = {
    val u = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("conv"))
      .select(expr("user_id % 2").as("variant"), col("conv"))
    // degenerate corpora (an absent parity class, zero/universal
    // conversion) must produce the SAME row on both engines, not a
    // DuckDB division error vs a Spark NULL — hence the nullif guards
    // and the n0/n1 = 0 short-circuit
    val z2 =
      """CASE WHEN n0 = 0 OR n1 = 0 OR c0 + c1 = 0 OR c0 + c1 = n0 + n1 THEN 0.0
        |ELSE round(
        |  (CAST(c0 * n1 - c1 * n0 AS DOUBLE) * CAST(c0 * n1 - c1 * n0 AS DOUBLE)
        |    * CAST(n0 + n1 AS DOUBLE)) /
        |  (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE) * CAST(c0 + c1 AS DOUBLE)
        |    * CAST(n0 + n1 - c0 - c1 AS DOUBLE)), 6)
        |END""".stripMargin
    u.agg(
        sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("variant") === 0, col("conv")).otherwise(0L)).as("c0"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("variant") === 1, col("conv")).otherwise(0L)).as("c1"))
      .select(col("n0"), col("c0"), col("n1"), col("c1"),
        expr("c0 * 1000000 div nullif(n0, 0)").as("rate0_e6"),
        expr("c1 * 1000000 div nullif(n1, 0)").as("rate1_e6"),
        expr(z2).as("z2"))
  }

  /** X245: IQR (Tukey-fence) outlier screen per group — the box-plot rule
    * (1.5×IQR beyond the quartiles) that complements MAD (X98, robust to
    * the outliers themselves) and z-score (X99, assumes normality).
    * Exact: quartiles via percentile_disc over integer cents (an actual
    * member value, so the ×3/2 fence arithmetic stays in BIGINTs); one
    * quantile aggregation + one counting join per group, no global sort.
    * Spark's percentile_disc surfaces DOUBLE — cast back to BIGINT, exact
    * for cents < 2⁵³. */
  private def iqrOutliers(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("v_li_iqr")
    // pinned-width repartition (session shuffle parallelism — scale-
    // adaptive, not a local constant): the single-row-group scan gives
    // the percentile build ONE input split, and AQE's byte-based
    // coalescing would fold the byte-light shuffle back to ~1 partition;
    // the shared c subtree also lets both consumers reuse one exchange
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    spark.sql(
      s"""WITH c AS (SELECT /*+ REPARTITION($n, flag, cents) */
        |    l_returnflag AS flag,
        |    CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM v_li_iqr),
        |q AS (SELECT flag,
        |    CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS q1,
        |    CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS q3
        |  FROM c GROUP BY flag)
        |SELECT c.flag, q1, q3, q3 - q1 AS iqr,
        |  q1 - 3 * (q3 - q1) div 2 AS lo_fence,
        |  q3 + 3 * (q3 - q1) div 2 AS hi_fence,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN cents < q1 - 3 * (q3 - q1) div 2
        |                  OR cents > q3 + 3 * (q3 - q1) div 2
        |            THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM c JOIN q ON c.flag = q.flag
        |GROUP BY c.flag, q1, q3 ORDER BY c.flag""".stripMargin)
  }

  /** X264: delete-one jackknife variance of the mean daily revenue
    * (Tukey 1958 — the resampling estimator that needs NO second pass:
    * for the mean, every leave-one-out estimate is a linear function of
    * the totals). Exact integers end-to-end: with per-day cent sums s_i,
    * n days and T = Σs_i, the jackknife variance
    * (n−1)/n · Σ(θ̂₍ᵢ₎ − θ̂₍·₎)² reduces algebraically to
    * Σ(T − n·s_i)² / (n³(n−1)) — one daily rollup, one 1-row totals
    * broadcast, one global sum; no per-replicate recompute (the naive
    * form re-aggregates the corpus n times). Magnitude bound: |T − n·s_i|
    * ≤ n·max|s_i − s̄|, so the squared sum stays in int64 through ~10⁹
    * total cents at bench scale; beyond that, compute via DECIMAL. */
  private def jackknife(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .where(col("value").isNotNull)
      .groupBy(col("ts").cast("date").as("dy"))
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("s"))
    val tot = daily.agg(count(lit(1)).as("n"), sum("s").as("t"))
    daily.crossJoin(broadcast(tot))
      .select(col("n"), col("t"),
        ((col("t") - col("n") * col("s")) *
          (col("t") - col("n") * col("s"))).as("sq"))
      .groupBy("n", "t").agg(sum("sq").as("ssq"))
      .select(col("n").as("n_days"),
        expr("t div n").as("mean_daily_cents"),
        expr("ssq div nullif(n * n * n * (n - 1), 0)").as("jk_var_cents2"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_jackknife" -> ((s, dir) => jackknife(s, dir)),
    "x_outlier_iqr" -> ((s, dir) => iqrOutliers(s, dir)),
    "x_stump" -> ((s, dir) => stump(s, dir)),
    "x_ab_test" -> ((s, dir) => abTest(s, dir)),
    "x_weighted_percentile" -> ((s, dir) => weightedPercentile(s, dir)),
    "x_group_ols" -> ((s, dir) => groupOls(s, dir)),
    "x_runs_test" -> ((s, dir) => runsTest(s, dir)),
    "x_cusum" -> ((s, dir) => cusum(s, dir)),
    "x_rolling_var" -> ((s, dir) => rollingVar(s, dir)),
    "x_mannwhitney" -> ((s, dir) => mannWhitney(s, dir)),
    "x_ks_test" -> ((s, dir) => ksTest(s, dir)),
    "x_pseudonymize" -> ((s, dir) => pseudonymize(s, dir)),
    "x_cms_estimate" -> ((s, dir) => cmsEstimate(s, dir)),
    "x_skyline" -> ((s, dir) => skyline(s, dir)),
    "x_sample_bias" -> ((s, dir) => sampleBias(s, dir)),
    "x_join_size_est" -> ((s, dir) => joinSizeEstimate(s, dir)),
    "x_k_anonymity" -> ((s, dir) => kAnonymity(s, dir)),
    "x_basket" -> ((s, dir) => marketBasket(s, dir)),
    "x_ols2" -> ((s, dir) => ols2(s, dir)),
    "x_benford" -> ((s, dir) => benford(s, dir)),
    "x_gini" -> ((s, dir) => giniImpurity(s, dir)),
    "x_chisq" -> ((s, dir) => chiSquare(s, dir)),
    "x_cross_corr" -> ((s, dir) => crossCorrelation(s, dir)),
    "x_impute" -> ((s, dir) => imputeMedian(s, dir)),
    "x_mad" -> ((s, dir) => madOutliers(s, dir)),
    "x_zscore" -> ((s, dir) => zscore(s, dir)),
    "x_skew_report" -> ((s, dir) => skewReport(s, dir)),
    "x_kll_bands" -> ((s, dir) => kllBands(s, dir)),
    "x_kmv_jaccard" -> ((s, dir) => kmvJaccard(s, dir)),
    "x_winsorize" -> ((s, dir) => winsorizedMean(s, dir)),
    "x_sketch_kll" -> ((s, dir) => kllMedianContract(s, dir)),
    "x_sketch_theta" -> ((s, dir) => thetaIntersectContract(s, dir)),
    "x_kmv_distinct" -> ((s, dir) => kmvDistinct(s, dir)),
    "x_corr" -> ((s, dir) => corrExact(s, dir)),
    "x_spearman" -> ((s, dir) => spearman(s, dir)),
    "x_sketch_hh" -> ((s, dir) => heavyHittersContract(s, dir)),
    "x_hist_log2" -> ((s, dir) => histLog2(s, dir)),
    "x_dq_rules" -> ((s, dir) => dqRules(s, dir)))

  val oracles: Map[String, String] = Map(
    "x_outlier_iqr" ->
      """WITH c AS (SELECT l_returnflag AS flag,
        |    CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM lineitem),
        |q AS (SELECT flag,
        |    CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS q1,
        |    CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS q3
        |  FROM c GROUP BY flag)
        |SELECT c.flag AS flag, q1, q3, q3 - q1 AS iqr,
        |  q1 - 3 * (q3 - q1) // 2 AS lo_fence,
        |  q3 + 3 * (q3 - q1) // 2 AS hi_fence,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN cents < q1 - 3 * (q3 - q1) // 2
        |                  OR cents > q3 + 3 * (q3 - q1) // 2
        |            THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM c JOIN q ON c.flag = q.flag
        |GROUP BY c.flag, q1, q3 ORDER BY flag""".stripMargin,
    "x_stump" ->
      """WITH c AS (SELECT CAST(l_quantity AS BIGINT) AS q,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM lineitem),
        |pq AS (SELECT q, CAST(count(*) AS BIGINT) AS nq,
        |    CAST(sum(y) AS BIGINT) AS posq
        |  FROM c GROUP BY q),
        |cum AS (SELECT q, CAST(sum(nq) OVER (ORDER BY q) AS BIGINT) AS n_l,
        |    CAST(sum(posq) OVER (ORDER BY q) AS BIGINT) AS pos_l FROM pq),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS pos FROM c),
        |sc AS (SELECT q AS threshold, n_l, pos_l,
        |    n - n_l AS n_r, pos - pos_l AS pos_r
        |  FROM cum CROSS JOIN tot WHERE n_l < n)
        |SELECT threshold,
        |  (pos_l * pos_l + (n_l - pos_l) * (n_l - pos_l)) * 1000000 // n_l
        |    + (pos_r * pos_r + (n_r - pos_r) * (n_r - pos_r)) * 1000000 // n_r
        |    AS score_e6,
        |  n_l AS n_left, pos_l AS pos_left, n_r AS n_right, pos_r AS pos_right
        |FROM sc ORDER BY score_e6 DESC, threshold LIMIT 1""".stripMargin,
    "x_ab_test" ->
      """WITH u AS (SELECT user_id,
        |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS conv
        |  FROM events GROUP BY user_id),
        |v AS (SELECT user_id % 2 AS variant, conv FROM u),
        |s AS (SELECT
        |    CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS BIGINT) AS c0,
        |    CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS BIGINT) AS c1
        |  FROM v)
        |SELECT n0, c0, n1, c1,
        |  c0 * 1000000 // nullif(n0, 0) AS rate0_e6,
        |  c1 * 1000000 // nullif(n1, 0) AS rate1_e6,
        |  CASE WHEN n0 = 0 OR n1 = 0 OR c0 + c1 = 0 OR c0 + c1 = n0 + n1 THEN 0.0
        |  ELSE round(
        |    (CAST(c0 * n1 - c1 * n0 AS DOUBLE) * CAST(c0 * n1 - c1 * n0 AS DOUBLE)
        |      * CAST(n0 + n1 AS DOUBLE)) /
        |    (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE) * CAST(c0 + c1 AS DOUBLE)
        |      * CAST(n0 + n1 - c0 - c1 AS DOUBLE)), 6)
        |  END AS z2
        |FROM s""".stripMargin,
    "x_weighted_percentile" ->
      """WITH li AS (SELECT l_returnflag AS flag,
        |    CAST(l_quantity AS BIGINT) AS qty,
        |    CAST(floor(l_extendedprice) AS BIGINT) AS w FROM lineitem),
        |bq AS (SELECT flag, qty, CAST(sum(w) AS BIGINT) AS wq
        |  FROM li GROUP BY 1, 2),
        |c AS (SELECT flag, qty,
        |    CAST(sum(wq) OVER (PARTITION BY flag ORDER BY qty) AS BIGINT) AS cum,
        |    CAST(sum(wq) OVER (PARTITION BY flag) AS BIGINT) AS tot FROM bq)
        |SELECT flag, max(tot) AS total_w,
        |  min(CASE WHEN cum * 100 >= tot * 50 THEN qty END) AS p50_qty,
        |  min(CASE WHEN cum * 100 >= tot * 90 THEN qty END) AS p90_qty
        |FROM c GROUP BY flag ORDER BY flag""".stripMargin,
    "x_group_ols" ->
      """WITH daily AS (SELECT event_type AS t,
        |    CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS x,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT t, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM daily GROUP BY 1 HAVING count(*) >= 2)
        |SELECT t, n,
        |  (n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx) AS slope_e6,
        |  (sy * sxx - sx * sxy) * 1000000 // (n * sxx - sx * sx) AS intercept_e6
        |FROM s ORDER BY t""".stripMargin,
    "x_runs_test" ->
      """WITH daily AS (SELECT
        |    CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |rk AS (SELECT c, row_number() OVER (ORDER BY c, d) AS rk FROM daily),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
        |med AS (SELECT c AS med FROM rk, n WHERE rk = (n + 1) // 2),
        |sg AS (SELECT d, CASE WHEN c > med THEN 1 ELSE 0 END AS s
        |  FROM daily, med WHERE c <> med),
        |lagged AS (SELECT s, lag(s) OVER (ORDER BY d) AS prev FROM sg)
        |SELECT
        |  CAST(sum(CASE WHEN prev IS NULL OR prev <> s THEN 1 ELSE 0 END) AS BIGINT) AS n_runs,
        |  CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
        |  CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
        |  1000000 + 2 * CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) *
        |    CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) * 1000000 //
        |    nullif(CAST(count(*) AS BIGINT), 0) AS expected_e6
        |FROM lagged""".stripMargin,
    "x_jackknife" ->
      """WITH d AS (SELECT CAST(ts AS DATE) AS dy,
        |    CAST(sum(CAST(floor(value*100+0.5) AS BIGINT)) AS BIGINT) AS s
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(s) AS BIGINT) AS t FROM d),
        |q AS (SELECT n, t,
        |    CAST(sum((t - n*s) * (t - n*s)) AS BIGINT) AS ssq
        |  FROM d, t GROUP BY n, t)
        |SELECT n AS n_days, t // n AS mean_daily_cents,
        |  ssq // nullif(n*n*n*(n-1), 0) AS jk_var_cents2
        |FROM q""".stripMargin,
    "x_cusum" ->
      """WITH dd AS (SELECT CAST(ts AS DATE) AS dy, count(*) AS c
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(c) AS BIGINT) AS tot FROM dd),
        |s AS (SELECT dy, CAST(c AS BIGINT) AS c,
        |    CAST(n * sum(c) OVER (ORDER BY dy) -
        |      row_number() OVER (ORDER BY dy) * tot AS BIGINT) AS cusum
        |  FROM dd, t),
        |mx AS (SELECT max(abs(cusum)) AS mxv FROM s)
        |SELECT dy, c, cusum, abs(cusum) = mxv AS is_changepoint
        |FROM s, mx ORDER BY dy""".stripMargin,
    "x_rolling_var" ->
      """WITH dd AS (SELECT CAST(ts AS DATE) AS dy,
        |    CAST(sum(CAST(floor(value*100+0.5) AS BIGINT)) AS BIGINT) AS s
        |  FROM events WHERE value IS NOT NULL GROUP BY 1)
        |SELECT dy, s, CAST(count(*) OVER w AS BIGINT) AS n,
        |  CAST(sum(s) OVER w AS BIGINT) AS win_sum,
        |  CAST(count(*) OVER w * sum(s*s) OVER w -
        |    sum(s) OVER w * sum(s) OVER w AS BIGINT) AS var_num
        |FROM dd
        |WINDOW w AS (ORDER BY dy ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY dy""".stripMargin,
    "x_mannwhitney" ->
      """WITH v AS (SELECT event_type AS t,
        |    CAST(floor(value*10) AS BIGINT) AS q FROM events
        |  WHERE event_type IN ('click','purchase') AND value IS NOT NULL),
        |g AS (SELECT q,
        |    CAST(sum(CASE WHEN t='click' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(sum(CASE WHEN t='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c2
        |  FROM v GROUP BY 1),
        |r AS (SELECT q, c1, c2,
        |    coalesce(sum(c1+c2) OVER (ORDER BY q
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
        |  FROM g),
        |r2 AS (SELECT c1, c2, 2*cumb + c1 + c2 + 1 AS r2v FROM r),
        |f AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
        |    CAST(sum(c2) AS BIGINT) AS n2,
        |    CAST(sum(c1*r2v) AS BIGINT) AS rs1,
        |    CAST(sum(c2*r2v) AS BIGINT) AS rs2 FROM r2)
        |SELECT n1, n2, rs1 - n1*(n1+1) AS u1_x2, rs2 - n2*(n2+1) AS u2_x2,
        |  (rs1 - n1*(n1+1)) + (rs2 - n2*(n2+1)) = 2*n1*n2 AS consistent
        |FROM f""".stripMargin,
    "x_ks_test" ->
      """WITH v AS (SELECT event_type AS t,
        |    CAST(floor(value*10) AS BIGINT) AS q FROM events
        |  WHERE event_type IN ('click','purchase') AND value IS NOT NULL),
        |g AS (SELECT q,
        |    CAST(sum(CASE WHEN t='click' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(sum(CASE WHEN t='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c2
        |  FROM v GROUP BY 1),
        |n AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
        |    CAST(sum(c2) AS BIGINT) AS n2 FROM g),
        |s AS (SELECT q, sum(c1) OVER (ORDER BY q) AS cum1,
        |    sum(c2) OVER (ORDER BY q) AS cum2 FROM g),
        |d AS (SELECT n1, n2, q,
        |    CAST(abs(n2*cum1 - n1*cum2) AS BIGINT) AS diff FROM s, n),
        |mx AS (SELECT max(diff) AS mxd FROM d)
        |SELECT n1, n2, max(diff) AS d_num,
        |  min(CASE WHEN diff = mxd THEN q END) AS at_q
        |FROM d, mx GROUP BY n1, n2""".stripMargin,
    "x_pseudonymize" ->
      s"""WITH orig AS (SELECT c_mktsegment,
         |    CAST(count(*) AS BIGINT) AS n_orig
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  GROUP BY c_mktsegment),
         |op AS (SELECT ${StableHash.md5Prefix60Sql(
              "concat('rot-2025Q3:', CAST(o_custkey AS VARCHAR))")} AS pk
         |  FROM orders),
         |cp AS (SELECT ${StableHash.md5Prefix60Sql(
              "concat('rot-2025Q3:', CAST(c_custkey AS VARCHAR))")} AS pk,
         |    c_mktsegment FROM customer),
         |pseudo AS (SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_pseudo
         |  FROM op JOIN cp USING (pk) GROUP BY c_mktsegment)
         |SELECT orig.c_mktsegment AS segment, n_orig, n_pseudo,
         |  n_orig = n_pseudo AS preserved
         |FROM orig JOIN pseudo ON orig.c_mktsegment = pseudo.c_mktsegment
         |ORDER BY segment""".stripMargin,
    "x_cms_estimate" ->
      s"""WITH tok AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
         |cms AS (SELECT CAST(d AS BIGINT) AS d,
         |    ${StableHash.md5Prefix60Sql("concat(CAST(d AS VARCHAR), ':', k)")} % 256 AS b,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM tok CROSS JOIN range(4) r(d) GROUP BY 1, 2),
         |probe AS (SELECT user_id, CAST(count(*) AS BIGINT) AS true_c
         |  FROM events WHERE user_id < 10 GROUP BY user_id),
         |pb AS (SELECT user_id, true_c, CAST(d AS BIGINT) AS d,
         |    ${StableHash.md5Prefix60Sql(
                "concat(CAST(d AS VARCHAR), ':', CAST(user_id AS VARCHAR))")} % 256 AS b
         |  FROM probe CROSS JOIN range(4) r(d)),
         |est AS (SELECT user_id, max(true_c) AS true_c,
         |    CAST(min(coalesce(c, 0)) AS BIGINT) AS est_c
         |  FROM pb LEFT JOIN cms USING (d, b) GROUP BY user_id)
         |SELECT user_id, true_c, est_c, est_c >= true_c AS no_undercount
         |FROM est ORDER BY user_id""".stripMargin,
    "x_skyline" ->
      """WITH m AS (SELECT doc_id, n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |cand AS (SELECT n_chars, max(n_tok) AS n_tok FROM m GROUP BY n_chars),
        |w AS (SELECT n_chars, n_tok,
        |    max(n_tok) OVER (ORDER BY n_chars ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        |  FROM cand),
        |f AS (SELECT n_chars, n_tok FROM w
        |  WHERE prev_max IS NULL OR n_tok > prev_max)
        |SELECT m.doc_id, m.n_chars, m.n_tok
        |FROM m JOIN f USING (n_chars, n_tok) ORDER BY m.doc_id""".stripMargin,
    "x_sample_bias" ->
      s"""WITH d AS (SELECT lang,
         |    ${StableHash.md5Prefix60Sql("CAST(doc_id AS VARCHAR)")} % 100 AS hb
         |  FROM documents),
         |full_c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_full
         |  FROM d GROUP BY lang),
         |samp_c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_samp
         |  FROM d WHERE hb < 10 GROUP BY lang),
         |t AS (SELECT CAST(sum(n_full) AS BIGINT) AS t_full FROM full_c),
         |ts AS (SELECT CAST(coalesce(sum(n_samp), 0) AS BIGINT) AS t_samp
         |  FROM samp_c)
         |SELECT lang, n_full, coalesce(n_samp, 0) AS n_samp,
         |  CAST(n_full * 1000000 // t_full AS BIGINT) AS share_full_e6,
         |  CAST(CASE WHEN t_samp > 0
         |    THEN coalesce(n_samp, 0) * 1000000 // t_samp ELSE 0 END AS BIGINT)
         |    AS share_samp_e6,
         |  CAST(abs(n_full * 1000000 // t_full
         |    - CASE WHEN t_samp > 0
         |      THEN coalesce(n_samp, 0) * 1000000 // t_samp ELSE 0 END)
         |    AS BIGINT) AS dev_e6
         |FROM full_c LEFT JOIN samp_c USING (lang), t, ts
         |ORDER BY lang""".stripMargin,
    "x_join_size_est" ->
      s"""WITH a AS (SELECT DISTINCT o_custkey AS key FROM orders
         |  WHERE o_custkey % 3 = 0),
         |b AS (SELECT DISTINCT c_custkey AS key FROM customer
         |  WHERE c_custkey % 2 = 0),
         |flags AS (SELECT coalesce(a.key, b.key) AS key,
         |    a.key IS NOT NULL AS in_a, b.key IS NOT NULL AS in_b
         |  FROM a FULL JOIN b ON a.key = b.key),
         |h AS (SELECT ${StableHash.md5Prefix60Sql("CAST(key AS VARCHAR)")} AS h,
         |    key, in_a, in_b FROM flags),
         |sample AS (SELECT * FROM h ORDER BY h, key LIMIT 256),
         |e AS (SELECT CAST(count(*) AS BIGINT) AS m, max(h) AS hk,
         |    CAST(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS BIGINT) AS nb
         |  FROM sample),
         |est AS (SELECT
         |    CASE WHEN m < 256 THEN m
         |      ELSE CAST(floor(255.0 * 1152921504606846976.0
         |           / CAST(hk AS DOUBLE)) AS BIGINT) END AS u_est,
         |    CAST(nb * 1000000 // m AS BIGINT) AS j_e6
         |  FROM e),
         |x AS (SELECT CAST(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END)
         |    AS BIGINT) AS inter_exact FROM flags)
         |SELECT u_est, j_e6,
         |  CAST(j_e6 * u_est // 1000000 AS BIGINT) AS inter_est, inter_exact,
         |  abs(j_e6 * u_est // 1000000 - inter_exact)
         |    <= inter_exact * 0.25 AS within_tol
         |FROM est, x""".stripMargin,
    "x_k_anonymity" ->
      """WITH c AS (SELECT c_nationkey AS nat, c_mktsegment AS seg,
        |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
        |    CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS sensitive
        |  FROM customer),
        |g AS (SELECT nat, seg, bal_bucket, CAST(count(*) AS BIGINT) AS sz,
        |    CAST(count(DISTINCT sensitive) AS BIGINT) AS ldiv
        |  FROM c GROUP BY 1, 2, 3)
        |SELECT CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_groups_lt_k,
        |  CAST(coalesce(sum(CASE WHEN sz < 5 THEN sz END), 0) AS BIGINT)
        |    AS rows_at_risk,
        |  min(sz) AS min_group_size,
        |  CAST(sum(CASE WHEN ldiv < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_groups_lt_l,
        |  min(ldiv) AS min_l_diversity
        |FROM g""".stripMargin,
    "x_basket" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |cnt AS (SELECT pk, CAST(count(*) AS BIGINT) AS c FROM li GROUP BY pk),
        |n AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n FROM li),
        |pairs AS (SELECT a.pk AS pa, b.pk AS pb, CAST(count(*) AS BIGINT) AS c_ab
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2)
        |SELECT pa, pb, c_ab, ca.c AS ca, cb.c AS cb,
        |  CAST(c_ab * 1000000 // ca.c AS BIGINT) AS conf_e6,
        |  CAST(CAST(c_ab AS HUGEINT) * n.n * 1000000
        |       // (CAST(ca.c AS HUGEINT) * cb.c) AS BIGINT) AS lift_e6
        |FROM pairs
        |JOIN cnt ca ON ca.pk = pairs.pa
        |JOIN cnt cb ON cb.pk = pairs.pb, n
        |ORDER BY c_ab DESC, pa, pb LIMIT 20""".stripMargin,
    "x_ols2" ->
      """WITH li AS (SELECT CAST(l_quantity AS BIGINT) AS x1,
        |    CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS x2,
        |    CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS y
        |  FROM lineitem),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x1) AS BIGINT) AS sx1, CAST(sum(x2) AS BIGINT) AS sx2,
        |    CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x1 * x1) AS BIGINT) AS s11r,
        |    CAST(sum(x2 * x2) AS BIGINT) AS s22r,
        |    CAST(sum(x1 * x2) AS BIGINT) AS s12r,
        |    CAST(sum(x1 * y) AS BIGINT) AS s1y,
        |    CAST(sum(x2 * y) AS BIGINT) AS s2y
        |  FROM li),
        |m AS (SELECT n, sx1, sx2, sy,
        |    CAST(n AS HUGEINT) * s11r - CAST(sx1 AS HUGEINT) * sx1 AS m11,
        |    CAST(n AS HUGEINT) * s22r - CAST(sx2 AS HUGEINT) * sx2 AS m22,
        |    CAST(n AS HUGEINT) * s12r - CAST(sx1 AS HUGEINT) * sx2 AS m12,
        |    CAST(n AS HUGEINT) * s1y - CAST(sx1 AS HUGEINT) * sy AS my1,
        |    CAST(n AS HUGEINT) * s2y - CAST(sx2 AS HUGEINT) * sy AS my2
        |  FROM s)
        |SELECT n,
        |  round(CAST(my1 * m22 - my2 * m12 AS DOUBLE) / CAST(m11 * m22 - m12 * m12 AS DOUBLE), 6) AS b1,
        |  round(CAST(my2 * m11 - my1 * m12 AS DOUBLE) / CAST(m11 * m22 - m12 * m12 AS DOUBLE), 6) AS b2,
        |  round((CAST(sy AS DOUBLE)
        |    - CAST(my1 * m22 - my2 * m12 AS DOUBLE) / CAST(m11 * m22 - m12 * m12 AS DOUBLE) * CAST(sx1 AS DOUBLE)
        |    - CAST(my2 * m11 - my1 * m12 AS DOUBLE) / CAST(m11 * m22 - m12 * m12 AS DOUBLE) * CAST(sx2 AS DOUBLE))
        |    / CAST(n AS DOUBLE), 6) AS b0
        |FROM m""".stripMargin,
    "x_benford" ->
      """WITH d AS (SELECT substring(CAST(CAST(floor(o_totalprice) AS BIGINT)
        |      AS VARCHAR), 1, 1) AS digit,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM d),
        |b AS (SELECT digit, n, total,
        |    CASE digit WHEN '1' THEN 301030 WHEN '2' THEN 176091
        |      WHEN '3' THEN 124939 WHEN '4' THEN 96910 WHEN '5' THEN 79181
        |      WHEN '6' THEN 66947 WHEN '7' THEN 57992 WHEN '8' THEN 51153
        |      ELSE 45757 END AS benford_e6
        |  FROM d, t)
        |SELECT digit, n,
        |  CAST(n * 1000000 // total AS BIGINT) AS share_e6,
        |  CAST(benford_e6 AS BIGINT) AS benford_e6,
        |  CAST(n * 1000000 // total - benford_e6 AS BIGINT) AS dev_e6
        |FROM b ORDER BY digit""".stripMargin,
    "x_gini" ->
      """WITH cc AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_classes,
        |    CAST(sum(c) AS BIGINT) AS n,
        |    sum(CAST(c AS HUGEINT) * c) AS sc2
        |  FROM cc GROUP BY source)
        |SELECT source, n_classes, n,
        |  CAST((CAST(n AS HUGEINT) * n - sc2) * 1000000
        |       // (CAST(n AS HUGEINT) * n) AS BIGINT) AS gini_e6
        |FROM g ORDER BY source""".stripMargin,
    "x_chisq" ->
      """WITH o AS (SELECT o_orderstatus AS s, o_orderpriority AS p FROM orders),
        |cells AS (SELECT s, p, CAST(count(*) AS BIGINT) AS obs FROM o GROUP BY 1, 2),
        |r AS (SELECT s, CAST(count(*) AS BIGINT) AS r FROM o GROUP BY 1),
        |c AS (SELECT p, CAST(count(*) AS BIGINT) AS cl FROM o GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM o),
        |grid AS (SELECT r.s, c.p, r.r, c.cl, coalesce(cells.obs, 0) AS obs, t.n
        |  FROM r CROSS JOIN c
        |  LEFT JOIN cells ON cells.s = r.s AND cells.p = c.p, t)
        |SELECT max(n) AS n_obs, CAST(count(*) AS BIGINT) AS n_cells,
        |  CAST(sum((CAST(n AS HUGEINT) * obs - CAST(r AS HUGEINT) * cl)
        |           * (CAST(n AS HUGEINT) * obs - CAST(r AS HUGEINT) * cl)
        |           * 1000000
        |           // (CAST(n AS HUGEINT) * r * cl)) AS BIGINT) AS chi2_e6
        |FROM grid""".stripMargin,
    "x_cross_corr" ->
      """WITH daily AS (SELECT
        |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |aligned AS (SELECT l.lag, a.x, b.y
        |  FROM daily a
        |  CROSS JOIN (SELECT unnest(range(4)) AS lag) l
        |  JOIN daily b ON b.d = a.d + l.lag),
        |s AS (SELECT lag, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM aligned GROUP BY lag)
        |SELECT CAST(lag AS INTEGER) AS lag, n,
        |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
        |    round(CAST(n * sxy - sx * sy AS DOUBLE) /
        |      (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |       sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
        |  ELSE NULL END AS xcorr
        |FROM s ORDER BY lag""".stripMargin,
    "x_impute" ->
      """WITH o AS (SELECT o_orderkey, o_orderpriority AS pri,
        |    CASE WHEN o_orderkey % 13 = 0 THEN NULL
        |         ELSE CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) END
        |      AS cents
        |  FROM orders),
        |obs AS (SELECT pri, cents,
        |    CAST(row_number() OVER (PARTITION BY pri ORDER BY cents) AS BIGINT) AS rn,
        |    CAST(count(*) OVER (PARTITION BY pri) AS BIGINT) AS n
        |  FROM o WHERE cents IS NOT NULL),
        |med AS (SELECT pri,
        |    max(CASE WHEN rn = (n * 50 + 99) // 100 THEN cents END) AS med_cents
        |  FROM obs GROUP BY pri)
        |SELECT o_orderkey, pri, cents IS NULL AS was_null,
        |  coalesce(cents, med_cents) AS imputed_cents
        |FROM o JOIN med USING (pri)
        |WHERE o_orderkey <= 1500 ORDER BY o_orderkey""".stripMargin,
    "x_mad" ->
      """WITH li AS (SELECT l_returnflag AS flag,
        |    CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM lineitem),
        |ranked AS (SELECT flag, cents,
        |    CAST(row_number() OVER (PARTITION BY flag ORDER BY cents) AS BIGINT) AS rn,
        |    CAST(count(*) OVER (PARTITION BY flag) AS BIGINT) AS n
        |  FROM li),
        |med AS (SELECT flag, max(n) AS n,
        |    max(CASE WHEN rn = (n * 50 + 99) // 100 THEN cents END) AS med_cents
        |  FROM ranked GROUP BY flag),
        |dev AS (SELECT li.flag, med.n, med.med_cents,
        |    abs(cents - med_cents) AS adev
        |  FROM li JOIN med USING (flag)),
        |devranked AS (SELECT flag, n, med_cents, adev,
        |    CAST(row_number() OVER (PARTITION BY flag ORDER BY adev) AS BIGINT) AS rn
        |  FROM dev),
        |mad AS (SELECT flag, max(n) AS n, max(med_cents) AS med_cents,
        |    max(CASE WHEN rn = (n * 50 + 99) // 100 THEN adev END) AS mad_cents
        |  FROM devranked GROUP BY flag)
        |SELECT d.flag, max(m.n) AS n, max(m.med_cents) AS med_cents,
        |  max(m.mad_cents) AS mad_cents,
        |  CAST(sum(CASE WHEN d.adev > 3 * m.mad_cents THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers
        |FROM dev d JOIN mad m ON d.flag = m.flag
        |GROUP BY d.flag ORDER BY d.flag""".stripMargin,
    "x_zscore" ->
      """WITH o AS (SELECT o_orderkey, o_orderpriority AS pri,
        |    CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |stats AS (SELECT pri, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(cents) AS BIGINT) AS s,
        |    sum(CAST(cents AS HUGEINT) * cents) AS ssq
        |  FROM o GROUP BY pri)
        |SELECT o_orderkey, pri,
        |  CAST(floor(
        |    (CAST(cents AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |    / sqrt(CAST(CAST(n AS HUGEINT) * ssq - CAST(s AS HUGEINT) * s
        |                AS DOUBLE)
        |           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
        |    * 10000.0) AS BIGINT) AS z_e4
        |FROM o JOIN stats USING (pri)
        |WHERE o_orderkey <= 1000
        |ORDER BY o_orderkey""".stripMargin,
    "x_skew_report" ->
      """WITH counts AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1),
        |coc AS (SELECT c, CAST(count(*) AS BIGINT) AS nk FROM counts GROUP BY 1),
        |tot AS (SELECT CAST(sum(nk) AS BIGINT) AS n_keys,
        |    CAST(sum(c * nk) AS BIGINT) AS total_rows, max(c) AS max_size FROM coc),
        |cdf AS (SELECT c, CAST(sum(nk) OVER (ORDER BY c) AS BIGINT) AS cum FROM coc),
        |p50 AS (SELECT min(c) AS p50_size FROM cdf, tot WHERE cum >= (n_keys + 1) // 2),
        |p99 AS (SELECT min(c) AS p99_size FROM cdf, tot
        |  WHERE cum >= (n_keys * 99 + 99) // 100)
        |SELECT n_keys, total_rows, max_size, p50_size, p99_size,
        |  CAST(max_size * n_keys * 1000000 // total_rows AS BIGINT) AS skew_e6
        |FROM tot, p50, p99""".stripMargin,
    "x_kll_bands" ->
      """SELECT DISTINCT l_returnflag AS flag, true AS within_tol,
        |  CAST(0 AS BIGINT) AS tol_excess
        |FROM lineitem ORDER BY flag""".stripMargin,
    "x_kmv_jaccard" ->
      s"""WITH flags AS (SELECT o_custkey,
         |    max(o_orderstatus = 'F') AS in_a, max(o_orderstatus = 'O') AS in_b
         |  FROM orders WHERE o_orderstatus IN ('F', 'O') GROUP BY 1),
         |h AS (SELECT ${StableHash.md5Prefix60Sql("CAST(o_custkey AS VARCHAR)")} AS h,
         |    in_a, in_b FROM flags),
         |sample AS (SELECT * FROM h ORDER BY h LIMIT 256),
         |e AS (SELECT CAST(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) * 1000000
         |      // count(*) AS BIGINT) AS kmv_j_e6 FROM sample),
         |x AS (SELECT CAST(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) * 1000000
         |      // count(*) AS BIGINT) AS exact_j_e6 FROM flags)
         |SELECT kmv_j_e6, exact_j_e6,
         |  abs(kmv_j_e6 - exact_j_e6) <= 100000 AS within_tol
         |FROM e, x""".stripMargin,
    "x_winsorize" ->
      """WITH li AS (SELECT l_returnflag AS flag,
        |    CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM lineitem),
        |r AS (SELECT flag, cents,
        |    CAST(row_number() OVER (PARTITION BY flag ORDER BY cents) AS BIGINT) AS rn,
        |    CAST(count(*) OVER (PARTITION BY flag) AS BIGINT) AS n
        |  FROM li),
        |cuts AS (SELECT flag, max(n) AS n,
        |    max(CASE WHEN rn = (n * 5 + 99) // 100 THEN cents END) AS lo_cents,
        |    max(CASE WHEN rn = (n * 95 + 99) // 100 THEN cents END) AS hi_cents
        |  FROM r GROUP BY flag)
        |SELECT li.flag, max(cuts.n) AS n, max(lo_cents) AS lo_cents,
        |  max(hi_cents) AS hi_cents,
        |  CAST(sum(greatest(lo_cents, least(hi_cents, cents))) // max(cuts.n) AS BIGINT)
        |    AS wins_mean_cents
        |FROM li JOIN cuts USING (flag)
        |GROUP BY li.flag ORDER BY flag""".stripMargin,
    "x_sketch_kll" ->
      "SELECT true AS within_tol, CAST(0 AS BIGINT) AS tol_excess",
    "x_sketch_theta" ->
      "SELECT true AS within_tol, CAST(0 AS BIGINT) AS tol_excess",
    "x_kmv_distinct" ->
      s"""WITH pairs AS (SELECT DISTINCT o_orderstatus AS st, o_custkey FROM orders),
         |h AS (SELECT st, ${StableHash.md5Prefix60Sql("CAST(o_custkey AS VARCHAR)")} AS h
         |  FROM pairs),
         |r AS (SELECT st, h, row_number() OVER (PARTITION BY st ORDER BY h) AS rn FROM h),
         |s AS (SELECT st, CAST(count(*) AS BIGINT) AS exact_n,
         |    max(CASE WHEN rn <= 256 THEN h END) AS hk
         |  FROM r GROUP BY st),
         |e AS (SELECT st, exact_n,
         |    CASE WHEN exact_n < 256 THEN CAST(exact_n AS DOUBLE)
         |         ELSE (255.0 * 1152921504606846976.0) / CAST(hk AS DOUBLE) END AS est
         |  FROM s)
         |SELECT st, exact_n, CAST(floor(est) AS BIGINT) AS kmv_est,
         |  abs(est - exact_n) / exact_n <= 0.20 AS within_tol
         |FROM e ORDER BY st""".stripMargin,
    "x_corr" ->
      """WITH d AS (SELECT CAST(l_quantity AS BIGINT) AS x,
        |    CAST(floor(l_extendedprice) AS BIGINT) AS y
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1995-03-01' AND l_shipdate < TIMESTAMP '1995-04-01'),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x*y) AS BIGINT) AS sxy,
        |    CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(y*y) AS BIGINT) AS syy
        |  FROM d)
        |SELECT n,
        |  round(CAST(n*sxy - sx*sy AS DOUBLE) /
        |    (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) * sqrt(CAST(n*syy - sy*sy AS DOUBLE))), 6) AS corr,
        |  round(CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE), 6) AS slope
        |FROM s""".stripMargin,
    "x_sketch_hh" ->
      """WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |top10 AS (SELECT w, CAST(count(*) AS BIGINT) AS c
        |  FROM toks GROUP BY w ORDER BY c DESC, w LIMIT 10)
        |SELECT w, c, true AS in_sketch, true AS bracketed
        |FROM top10 ORDER BY c DESC, w""".stripMargin,
    "x_spearman" ->
      """WITH d AS (SELECT l_orderkey, l_linenumber,
        |    CAST(l_quantity AS BIGINT) AS x,
        |    CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS y
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1995-03-01'
        |    AND l_shipdate < TIMESTAMP '1995-04-01'),
        |r AS (SELECT
        |    CAST(row_number() OVER (ORDER BY x, l_orderkey, l_linenumber) AS BIGINT) AS rx,
        |    CAST(row_number() OVER (ORDER BY y, l_orderkey, l_linenumber) AS BIGINT) AS ry
        |  FROM d),
        |s AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum((rx - ry) * (rx - ry)) AS HUGEINT) AS sd2 FROM r)
        |SELECT CAST(n AS BIGINT) AS n,
        |  CAST((2 * n * (n * n - 1) - 6 * sd2) * 1000000
        |       // (n * (n * n - 1)) AS BIGINT) AS rho_p1_e6
        |FROM s""".stripMargin,
    "x_hist_log2" ->
      """SELECT CAST(length(bin(n_chars)) AS INTEGER) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  min(n_chars) AS lo, max(n_chars) AS hi
        |FROM documents GROUP BY 1 ORDER BY bucket""".stripMargin,
    "x_dq_rules" ->
      """WITH rules(rule, violations) AS (
        |  SELECT 'not_null: o_custkey',
        |    (SELECT CAST(count(*) AS BIGINT) FROM orders WHERE o_custkey IS NULL)
        |  UNION ALL SELECT 'range: o_totalprice > 0',
        |    (SELECT CAST(count(*) AS BIGINT) FROM orders WHERE o_totalprice <= 0)
        |  UNION ALL SELECT 'accepted_values: o_orderstatus',
        |    (SELECT CAST(count(*) AS BIGINT) FROM orders
        |     WHERE o_orderstatus NOT IN ('F', 'O', 'P'))
        |  UNION ALL SELECT 'range: o_orderdate in [1992, 2010)',
        |    (SELECT CAST(count(*) AS BIGINT) FROM orders
        |     WHERE o_orderdate < TIMESTAMP '1992-01-01'
        |        OR o_orderdate >= TIMESTAMP '2010-01-01')
        |  UNION ALL SELECT 'fk: o_custkey -> customer.c_custkey',
        |    (SELECT CAST(count(*) AS BIGINT) FROM orders
        |     WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
        |  UNION ALL SELECT 'unique: o_orderkey',
        |    (SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) FROM (
        |       SELECT count(*) AS cnt FROM orders GROUP BY o_orderkey
        |       HAVING count(*) > 1)))
        |SELECT rule, violations, violations = 0 AS pass
        |FROM rules ORDER BY rule""".stripMargin)
}
