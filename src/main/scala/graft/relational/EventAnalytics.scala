package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.relational.AsOfJoin

/** Behavioral event analytics: funnel, cohort retention, and the binned
  * interval join — the product-analytics query family a warehouse engine is
  * expected to answer over an append-only event stream.
  *
  * The reference's event handling stops at audit counts per ingestion run
  * (`Sites/DataProc_Script/spark_ingest_slmandicprd.py:88` writes one
  * `Historico_Execucao` row per table); these operators answer the questions
  * an analyst asks OF that event history. All three are built to hold at
  * 100 TB: every shuffle is on a high-cardinality key (`user_id`, day-bin),
  * aggregation is partial map-side, and the interval join replaces the
  * O(N·M) inequality nested loop with an equi-join on a bounded bin key.
  */
object EventAnalytics {

  /** Ordered conversion funnel: first view → first click at-or-after that
    * view → first purchase at-or-after that click. Three aggregations, all
    * hash-partitioned on `user_id` (a 100 TB event table funnels with three
    * co-partitioned shuffles and no window sort). Timestamps are truncated
    * to seconds on both engines so stage comparisons are bit-identical.
    * One-row final is a legitimate single-row global (PlanAudit-sanctioned),
    * unpivoted to a row per stage. */
  private def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("second", col("ts")).as("tss"),
        col("event_type"))
    val s1 = ev.where(col("event_type") === "view")
      .groupBy("user_id").agg(min("tss").as("t1"))
    val s2 = ev.where(col("event_type") === "click")
      .join(s1, "user_id").where(col("tss") >= col("t1"))
      .groupBy("user_id").agg(min("tss").as("t2"))
    val s3 = ev.where(col("event_type") === "purchase")
      .join(s2, "user_id").where(col("tss") >= col("t2"))
      .groupBy("user_id").agg(min("tss").as("t3"))
    ev.select("user_id").distinct()
      .join(s1, Seq("user_id"), "left")
      .join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .agg(count(lit(1)).as("c0"), count(col("t1")).as("c1"),
        count(col("t2")).as("c2"), count(col("t3")).as("c3"))
      .select(expr(
        """stack(4,
          |  0, 'all_users', c0,
          |  1, 'first_view', c1,
          |  2, 'click_after_view', c2,
          |  3, 'purchase_after_click', c3) AS (stage_ord, stage, users)"""
          .stripMargin))
      .orderBy("stage_ord")
  }

  /** Weekly cohort retention: users bucketed by first-seen week, counted
    * distinct per (cohort_week, week_offset). Integer week ordinals from a
    * fixed epoch keep the grid engine-exact. Two shuffles: one on `user_id`
    * (first-seen), one on the small (cohort, offset) key — both partial
    * map-side first. */
  /** X127: trailing-7-day active users (WAU) per day — the sliding
    * DISTINCT count, which unlike sums does NOT decompose over window
    * frames. Exact formulation: each distinct (user, active-day) pair
    * contributes to the 7 window-end days it covers (explode over a
    * 7-element sequence), then one countDistinct per window-end — cost
    * |user-days| × 7, all equi-shuffles, no window sort anywhere. At
    * larger windows (MAU ×30) or when approximation suffices, the
    * mergeable path is per-day HLL/Theta sketches unioned per window
    * (the X53 layer) — state per day instead of ×w row fan-out. Day
    * ordinals are integers vs 2024-01-01 (the x_gapfill convention) so
    * the grid is engine-identical. */
  private def wau(spark: SparkSession, dir: String): DataFrame = {
    val ad = Tables.events(spark, dir)
      .select(col("user_id"),
        datediff(col("ts").cast("date"), lit("2024-01-01")).cast("long").as("d"))
      .distinct()
    val maxD = ad.agg(max("d").as("dmax"))
    ad.select(col("user_id"), explode(expr("sequence(d, d + 6)")).as("wd"))
      .groupBy("wd").agg(countDistinct("user_id").as("wau"))
      .join(broadcast(maxD), col("wd") <= col("dmax"))
      .select(col("wd"), col("wau"))
      .orderBy("wd")
  }

  private def retention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val weeks = ev
      .withColumn("w", expr("CAST(datediff(d, DATE '2024-01-01') div 7 AS BIGINT)"))
      .select("user_id", "w")
    val firsts = weeks.groupBy("user_id").agg(min("w").as("cohort_week"))
    weeks.distinct().join(firsts, "user_id")
      .groupBy(col("cohort_week"), (col("w") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Binned interval join: each interval [s, e] is exploded onto the fixed
    * day-bins it covers (`sequence(s div B, e div B)` — a generator, at most
    * ceil(len/B)+1 rows), points carry their single bin, and the join is a
    * plain equi-join on the bin key refined by the exact BETWEEN. This is
    * the scale-safe form of the inequality join: the naive `p BETWEEN s AND
    * e` condition forces a broadcast nested loop (O(N·M) compares), while
    * the bin form shuffles both sides evenly on an integer key and compares
    * only within-bin pairs. Each (point, interval) pair meets exactly once —
    * in the point's bin — so no post-join dedup is needed. Oracle: DuckDB's
    * native IEJoin on the raw inequality. */
  private def intervalJoin(spark: SparkSession, dir: String): DataFrame = {
    // bin width (days) ≥ max interval length (8) => ≤ 2 bins/interval.
    // 8, not 16: candidate pairs per bin scale with points/bin ×
    // intervals/bin, so halving the width halves the per-bin cross
    // product the BETWEEN filter then discards — same result, half the
    // compare volume (guide §1.2: the distributed algorithm first).
    val B = 8
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val iv = Tables.orders(spark, dir)
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderstatus"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01') AS BIGINT)").as("s"))
      .withColumn("e", col("s") + col("o_orderkey") % 7 + lit(1))
      .withColumn("bin", explode(expr(s"sequence(s div $B, e div $B)")))
    val pt = Tables.lineitem(spark, dir)
      .where(col("l_returnflag") === "R")
      .select(
        expr("CAST(datediff(CAST(l_shipdate AS DATE), DATE '1995-01-01') AS BIGINT)").as("p"),
        col("l_quantity"))
      .withColumn("bin", expr(s"p div $B"))
    // pin the exchange width: the shuffle is only ~MBs so AQE's
    // byte-based coalescing folds it to 1-2 partitions, serializing the
    // compute-dense within-bin compare loop; an explicit partition count
    // (the session's shuffle parallelism — scale-adaptive, not a local
    // constant) keeps the probe parallel
    pt.repartition(n, col("bin"))
      .join(iv.repartition(n, col("bin")), Seq("bin"))
      .where(col("p").between(col("s"), col("e")))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct("o_orderkey").as("n_orders"),
        round(sum("l_quantity"), 2).as("qty"))
      .orderBy("o_orderstatus")
  }

  /** Path (sequence) mining: the top event-type journeys per (user, day).
    * The per-key sequence is assembled by `array_sort` over (ts, event_id,
    * type) structs — event_id makes the order total, so both engines build
    * the identical string; no window sort, one aggregation per level. The
    * final top-10 is a TakeOrdered over the path-count table (already
    * aggregated — tiny), with a total ORDER BY so LIMIT is deterministic. */
  private def topPaths(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      col("user_id"), to_date(col("ts")).as("d"),
      struct(date_trunc("second", col("ts")).as("tss"), col("event_id"),
        col("event_type")).as("s"))
    ev.groupBy("user_id", "d")
      .agg(array_sort(collect_list("s")).as("seq"))
      .select(concat_ws(">", expr("transform(seq, x -> x.event_type)")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(10)
  }

  /** Markov transition matrix over the event stream: P(next | current) per
    * adjacent event pair within a user's timeline, in exact ×10⁶ integers.
    * One `lead` window per user (high-cardinality partition — each user's
    * slice sorts locally, nothing global), one pair aggregation, and a
    * window over the 25-row transition table for row-normalization. */
  private def transitions(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"),
      date_trunc("second", col("ts")).as("tss"), col("event_id"),
      col("event_type"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("tss"), col("event_id"))
    val counts = ev.withColumn("nxt", lead("event_type", 1).over(w))
      .where(col("nxt").isNotNull)
      .groupBy(col("event_type").as("cur"), col("nxt"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("tot", sum("n").over(
        org.apache.spark.sql.expressions.Window.partitionBy("cur")))
      .select(col("cur"), col("nxt"), col("n"),
        expr("n * 1000000 div tot").as("p_e6"))
      .orderBy("cur", "nxt")
  }

  /** The NAIVE inequality formulation of [[intervalJoin]] — exactly what a
    * user writes, and the shape Spark plans as a nested loop. Input to the
    * X60b rewrite rule. */
  private def naiveIntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val iv = Tables.orders(spark, dir)
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderstatus"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01') AS BIGINT)").as("s"))
      .withColumn("e", col("s") + col("o_orderkey") % 7 + lit(1))
    val pt = Tables.lineitem(spark, dir)
      .where(col("l_returnflag") === "R")
      .select(
        expr("CAST(datediff(CAST(l_shipdate AS DATE), DATE '1995-01-01') AS BIGINT)").as("p"),
        col("l_quantity"))
    pt.join(iv, col("p").between(col("s"), col("e")))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct("o_orderkey").as("n_orders"),
        round(sum("l_quantity"), 2).as("qty"))
      .orderBy("o_orderstatus")
  }

  /** X60b end-to-end through the driver gate: the naive BETWEEN join is
    * rewritten by `IntervalJoinRewrite` into the binned equi-join and must
    * hash-match the same oracle as the hand-built [[intervalJoin]]. The
    * rule is applied explicitly (conf restored immediately) so no session
    * state leaks into other keys; `require` makes a silently-unfired
    * rewrite a loud failure rather than a nested-loop fallback. */
  private def intervalJoinAuto(spark: SparkSession, dir: String): DataFrame = {
    val naive = naiveIntervalJoin(spark, dir)
    val key = graft.plans.IntervalJoinRewrite.BinWidthKey
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "8") // same width as intervalJoin — see there
      val rewritten = graft.plans.IntervalJoinRewrite(naive.queryExecution.analyzed)
      require(rewritten.toString.contains("__graft_bin_p"),
        "IntervalJoinRewrite did not fire on the naive BETWEEN join")
      org.apache.spark.sql.graftshim.PlanBridge.ofRows(
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], rewritten)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Gaps-and-islands: per-user runs of CONSECUTIVE active days, reduced to
    * a streak-length distribution. The classic trick — day_ordinal minus the
    * per-user row_number is constant within a run — needs only one window
    * over the (user, day) DISTINCT set (partitioned by user_id: each user's
    * slice sorts locally, nothing global) and two partial-first
    * aggregations. row_number is INT in Spark and BIGINT in DuckDB, so the
    * subtraction casts explicitly. */
  private def islands(spark: SparkSession, dir: String): DataFrame = {
    val active = Tables.events(spark, dir)
      .select(col("user_id"),
        expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS BIGINT)").as("ord"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("ord")
    active
      .withColumn("g", col("ord") - row_number().over(w).cast("long"))
      .groupBy("user_id", "g")
      .agg(count(lit(1)).as("streak_len"))
      .groupBy("streak_len")
      .agg(count(lit(1)).as("n_streaks"),
        countDistinct("user_id").as("n_users"))
      .orderBy("streak_len")
  }

  /** Slowly-changing-dimension (type 2) build from a change stream: collapse
    * each user's event-type timeline to its state CHANGES, then derive
    * validity intervals [valid_from, valid_to) with `lead` — the
    * merge-free way to construct a versioned dimension from raw events.
    * Two windows, both partitioned on the high-cardinality user_id; output
    * is the per-state version summary (bounded), not the row stream, so
    * the key's hash stays scale-independent. Timestamps truncate to seconds
    * and order by (tss, event_id) — a total order, so lag/lead are
    * engine-deterministic. */
  private def scd2(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"),
      date_trunc("second", col("ts")).as("tss"), col("event_id"),
      col("event_type"))
    val w = Window.partitionBy("user_id").orderBy("tss", "event_id")
    val changes = ev
      .withColumn("prev", lag("event_type", 1).over(w))
      .where(col("prev").isNull || col("prev") =!= col("event_type"))
    val scd = changes
      .withColumn("valid_to", lead("tss", 1).over(w))
      .select(col("event_type").as("state"), col("tss").as("valid_from"),
        col("valid_to"))
    scd.groupBy("state")
      .agg(count(lit(1)).as("n_versions"),
        sum(when(col("valid_to").isNull, 1L).otherwise(0L)).as("n_current"),
        sum(expr("timestampdiff(SECOND, valid_from, valid_to)")).as("dur_seconds"))
      .orderBy("state")
  }

  /** Last-touch attribution: each purchase is credited to the user's most
    * recent PRECEDING non-purchase event. One window per user with an
    * explicit `rowsBetween(unboundedPreceding, -1)` frame and
    * `last(..., ignoreNulls)` — the running "last marketing touch" is
    * computed in a single pass, no self-join of purchases against the
    * event history (which would re-shuffle the full stream per purchase).
    * Revenue is exact integer cents. */
  private def attribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"),
      date_trunc("second", col("ts")).as("tss"), col("event_id"),
      col("event_type"), col("value"))
    val w = Window.partitionBy("user_id").orderBy("tss", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.withColumn("touch",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase")
      .groupBy(coalesce(col("touch"), lit("none")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)")).as("revenue_cents"))
      .orderBy("channel")
  }

  /** Anomalous-day detection in EXACT integer arithmetic: a day whose event
    * count deviates from the mean by more than k standard deviations
    * satisfies (n·c − s)² > k²·(n·ssq − s²) — the z-score inequality with
    * both sides multiplied by n², which removes every division and square
    * root. Squares are computed in DECIMAL(38,0) (Spark) / HUGEINT-width
    * integers (the oracle), so the comparison is exact cross-engine at any
    * volume below ~10¹⁹ events/day. One daily aggregation, one 1-row global
    * (PlanAudit-sanctioned), one broadcast-out comparison. */
  private def anomalousDays(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("c"))
    val glob = daily.agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(col("c").cast("decimal(38,0)")).as("s"),
      sum((col("c") * col("c")).cast("decimal(38,0)")).as("ssq"))
    daily.crossJoin(broadcast(glob))
      .withColumn("dev2",
        (col("n") * col("c") - col("s")) * (col("n") * col("c") - col("s")))
      .withColumn("varn2", col("n") * col("ssq") - col("s") * col("s"))
      .select(col("d"), col("c"),
        when(col("dev2") > col("varn2") * 9, 3)
          .when(col("dev2") > col("varn2") * 4, 2)
          .when(col("dev2") > col("varn2"), 1)
          .otherwise(0).as("sigma_class"))
      .orderBy("d")
  }

  /** X85 end-to-end through the driver gate: a daily rollup written against
    * the RAW events table is routed by `MaterializedViewRewrite` to a
    * pre-built daily summary, and must hash-match the oracle computed from
    * the raw events — proving routed ≡ direct. The summary is built here
    * (standing in for X72's maintained view), the rule is applied
    * explicitly with conf restored, and a silent non-fire is a loud
    * failure: the routed plan must contain NO base-table scan. */
  private def mvRoute(spark: SparkSession, dir: String): DataFrame =
    routeThroughMv(spark, dir) { ev =>
      ev.groupBy(to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n_events"), sum(mvCents).as("value_cents"))
        .orderBy("d")
    }

  /** X85b: GRAIN COARSENING through the same router — a WEEKLY rollup is
    * answered from the daily summary by re-truncating its day column
    * (every TruncDate grain is a function of the day, and count/sum
    * re-aggregate). The oracle is again computed from the raw events. */
  private def mvRouteCoarse(spark: SparkSession, dir: String): DataFrame =
    routeThroughMv(spark, dir) { ev =>
      ev.groupBy(trunc(to_date(col("ts")), "week").as("wk"))
        .agg(count(lit(1)).as("n_events"), sum(mvCents).as("value_cents"))
        .orderBy("wk")
    }

  private val mvCents = expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)")

  private def routeThroughMv(spark: SparkSession, dir: String)(
      build: DataFrame => DataFrame): DataFrame = {
    val ev = Tables.events(spark, dir)
    val summaryDir = graft.ingest.Sinks.tempDir("mv_summary")
    ev.groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("cnt"), sum(mvCents).as("cents"))
      .write.mode("overwrite").parquet(summaryDir)
    val naive = build(ev)
    val rule = graft.plans.MaterializedViewRewrite
    val prev = Seq(rule.BasePathKey, rule.SummaryPathKey)
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set(rule.BasePathKey, s"$dir/events.parquet")
      spark.conf.set(rule.SummaryPathKey, summaryDir)
      val routed = rule(naive.queryExecution.analyzed)
      val baseScans = routed.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation
          if r.relation.isInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation] &&
            r.relation.asInstanceOf[
              org.apache.spark.sql.execution.datasources.HadoopFsRelation]
              .location.rootPaths.exists(_.toString.contains("events.parquet")) => r
      }
      require(baseScans.isEmpty,
        "MaterializedViewRewrite did not route the daily rollup to the summary")
      org.apache.spark.sql.graftshim.PlanBridge.ofRows(
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], routed)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** X90: distribution drift between two corpus snapshots (first vs second
    * half of the event history): per-category ×10⁶ share in each snapshot
    * and the absolute share delta — the monitoring primitive behind
    * training-data drift alerts. One conditional aggregation pass builds
    * both distributions; shares are integer division (engine-exact). */
  private def drift(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"),
        (to_date(col("ts")) < lit("2024-01-16")).as("is_a"))
    val counts = ev.groupBy("event_type").agg(
      sum(when(col("is_a"), 1L).otherwise(0L)).as("ca"),
      sum(when(!col("is_a"), 1L).otherwise(0L)).as("cb"))
    val tot = counts.agg(sum("ca").as("ta"), sum("cb").as("tb"))
    counts.crossJoin(broadcast(tot))
      .select(col("event_type"),
        expr("ca * 1000000 div ta").as("share_a_e6"),
        expr("cb * 1000000 div tb").as("share_b_e6"),
        abs(expr("ca * 1000000 div ta") - expr("cb * 1000000 div tb"))
          .as("drift_e6"))
      .orderBy("event_type")
  }

  /** X91: time-weighted average value (TWAP) per user — each observation
    * weighted by how long it was "current" (seconds until the next event),
    * the right average for irregularly sampled series. One `lead` window
    * per user, integer cents × integer seconds, one aggregation; the last
    * observation has no duration and drops in both engines. */
  private def twap(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tss", "event_id")
    Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("second", col("ts")).as("tss"),
        col("event_id"),
        expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)").as("cents"))
      .withColumn("nxt", lead("tss", 1).over(w))
      .where(col("nxt").isNotNull)
      .withColumn("dt", expr("timestampdiff(SECOND, tss, nxt)"))
      .groupBy("user_id")
      .agg(sum("dt").as("total_dt"),
        expr("sum(cents * dt) div sum(dt)").as("twap_cents"))
      .orderBy("user_id")
  }

  /** X92: resample to a regular daily grid with LINEAR interpolation — the
    * gapfill (X54) upgrade from step-hold to lerp, in exact integers:
    * v = v₀ + (v₁−v₀)(t−t₀) div (t₁−t₀). Observed days keep their value;
    * interior gaps interpolate between the surrounding observations
    * (running `last(ignoreNulls)` backward + `first(ignoreNulls)` forward
    * over the same per-user window); edges hold the nearest observation.
    * Grid days come from a `sequence` generator, never a calendar join. */
  private def interpolate(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"),
      expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS BIGINT)").as("d"),
      date_trunc("second", col("ts")).as("tss"), col("event_id"),
      expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)").as("cents"))
    // one observation per (user, day): the day's LAST event (total order)
    val wDay = Window.partitionBy("user_id", "d")
      .orderBy(col("tss").desc, col("event_id").desc)
    val obs = ev.withColumn("rn", row_number().over(wDay))
      .where(col("rn") === 1).select("user_id", "d", "cents")
    // COMMON panel grid (corpus-wide span) — users inactive at the corpus
    // edges get leading/trailing gaps, exercising the edge-hold branch
    val span = obs.agg(min("d").as("d0"), max("d").as("d1"))
    val grid = obs.select("user_id").distinct()
      .crossJoin(broadcast(span))
      .select(col("user_id"), explode(expr("sequence(d0, d1)")).as("d"))
    val joined = grid.join(obs, Seq("user_id", "d"), "left")
    val wB = Window.partitionBy("user_id").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy("user_id").orderBy("d")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    joined
      .withColumn("pv", last(col("cents"), ignoreNulls = true).over(wB))
      .withColumn("pd", last(when(col("cents").isNotNull, col("d")),
        ignoreNulls = true).over(wB))
      .withColumn("nv", first(col("cents"), ignoreNulls = true).over(wF))
      .withColumn("nd", first(when(col("cents").isNotNull, col("d")),
        ignoreNulls = true).over(wF))
      .select(col("user_id"), col("d"),
        when(col("cents").isNotNull, col("cents"))
          // weighted-average form keeps the dividend non-negative, so
          // Spark's truncating div and DuckDB's flooring // agree
          .when(col("pv").isNotNull && col("nv").isNotNull,
            expr("(pv * (nd - d) + nv * (d - pd)) div (nd - pd)"))
          .otherwise(coalesce(col("pv"), col("nv"))).as("interp_cents"))
      .orderBy("user_id", "d")
  }

  /** X100: OHLC resampling — irregular event values downsampled to 5-minute
    * open/high/low/close/volume bars per event type, the canonical
    * time-series summarization. Open/close are `min_by`/`max_by` on a
    * composite integer order key (epoch_seconds·10⁷ + event_id — unique, so
    * the argmin is deterministic; a bare-timestamp argmin would be
    * tie-nondeterministic and could never hash-match). ONE partial-first
    * aggregation: min_by/max_by carry (key, value) partials map-side, so a
    * 100 TB stream reduces to #bars rows with no window sort — the window
    * formulation would sort every bar's rows on a reducer. */
  private def ohlc(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        expr("(unix_timestamp(ts) div 300) * 300").as("bar_epoch"),
        (unix_timestamp(col("ts")) * 10000000L + col("event_id")).as("okey"),
        expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)").as("cents"))
      .groupBy("event_type", "bar_epoch")
      .agg(min_by(col("cents"), col("okey")).as("open_cents"),
        max("cents").as("high_cents"), min("cents").as("low_cents"),
        max_by(col("cents"), col("okey")).as("close_cents"),
        count(lit(1)).as("n_trades"))
      .select(col("event_type"), to_timestamp(col("bar_epoch")).as("bar_ts"),
        col("open_cents"), col("high_cents"), col("low_cents"),
        col("close_cents"), col("n_trades"))
      .orderBy("event_type", "bar_ts")

  /** X110: period-over-period — monthly revenue with absolute and ×10⁶
    * relative deltas vs the prior month (`lag` over the month series). The
    * window is a GLOBAL order, which is exactly right here: the windowed
    * relation is the months table (≤ a few hundred rows after the
    * partial-first aggregation), not the fact stream — the one-reducer
    * sort touches metadata-scale data, the X40b caveat does not apply. */
  private def periodOverPeriod(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(spark, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(expr("sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))")
        .as("rev_cents"))
    monthly
      .withColumn("prev_cents",
        lag("rev_cents", 1).over(Window.orderBy("month")))
      .select(col("month"), col("rev_cents"),
        (col("rev_cents") - col("prev_cents")).as("delta_cents"),
        expr("(rev_cents - prev_cents) * 1000000 div prev_cents").as("pop_e6"))
      .orderBy("month")
  }

  /** X111: bounded-window EWMA — an 8-tap exponentially-weighted moving
    * average with decay 1/2, entirely in integers: weights 2⁷…2⁰ over the
    * last 8 observations, normalized by the sum of PRESENT taps (edges use
    * fewer). The infinite-memory EWMA recurrence is inherently sequential
    * (and float-accumulation order-dependent — it could never hash-match);
    * the bounded FIR form keeps >99% of the mass at depth 8, is one
    * per-user window of 8 `lag`s, and is engine-exact. */
  private def ewma(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tss", "event_id")
    val taps = 8
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("second", col("ts")).as("tss"),
        col("event_id"),
        expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)").as("cents"))
    val lagged = (0 until taps).foldLeft(ev) { (d, i) =>
      d.withColumn(s"l_$i",
        if (i == 0) col("cents") else lag("cents", i).over(w))
    }
    val num = (0 until taps).map(i =>
      coalesce(col(s"l_$i") * (1L << (taps - 1 - i)), lit(0L))).reduce(_ + _)
    val den = (0 until taps).map(i =>
      when(col(s"l_$i").isNotNull, 1L << (taps - 1 - i)).otherwise(0L))
      .reduce(_ + _)
    lagged
      .withColumn("num", num).withColumn("den", den)
      .select(col("user_id"), col("tss"), col("event_id"), col("cents"),
        expr("num div den").as("ewma_cents"))
      .where(col("user_id") <= 100)
      .orderBy("user_id", "tss", "event_id")
  }

  /** X153: peak concurrency (sweep-line over bounded activity windows) —
    * capacity planning's core question: the per-day maximum of
    * simultaneously active 5-minute event windows. Each event explodes to
    * the ≤5 minute-buckets it covers (the X127 bounded-explode shape — a
    * true sweep line's global running sum would funnel one reducer), the
    * per-minute count is one partial-first aggregation, and the per-day
    * argmax window runs over ≤1440 minute rows per day (calendar-bounded).
    * Minute ordinals are integer seconds-since-epoch div 60, identical in
    * both engines. */
  private def peakConcurrency(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(expr("CAST(ts AS LONG) div 60").as("m0"))
    val active = ev
      .select(explode(expr("sequence(m0, m0 + 4)")).as("m"))
      .groupBy("m").agg(count(lit(1)).as("active"))
    active.withColumn("day", expr("m div 1440"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("day").orderBy(col("active").desc, col("m"))))
      .where(col("rk") === 1)
      .select(col("day"), col("m").as("peak_minute"), col("active").as("peak_active"))
      .orderBy("day")
  }

  /** X154: out-of-order arrival audit — the batch-side measurement that
    * sizes streaming watermarks (X18/X70): per user, how many events
    * arrived with a timestamp more than 60 s behind the high-water mark of
    * everything already received (arrival order = event_id), and the worst
    * regression. One per-user window over arrival order; the high-water
    * mark is an UNBOUNDED-PRECEDING running max — no self-join. Integer
    * seconds throughout; the first event's null mark coalesces to its own
    * ts (lateness 0) to keep null semantics out of the oracle. */
  private def outOfOrder(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"), col("event_id"),
      expr("CAST(ts AS LONG)").as("sec"))
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.withColumn("hwm", coalesce(max("sec").over(w), col("sec")))
      .select(col("user_id"),
        when(col("hwm") - col("sec") > 60, 1L).otherwise(0L).as("late"),
        greatest(col("hwm") - col("sec"), lit(0L)).as("lateness"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum("late").as("n_late"),
        max("lateness").as("max_late_s"))
      .where(col("user_id") <= 50)
      .orderBy("user_id")
  }

  /** X166: interval union (coverage) — total ACTIVE time per user after
    * merging overlapping 5-minute activity windows: the billing/uptime
    * primitive where summing raw durations double-counts overlaps. The
    * classic sweep is sequential; the distributed form is the X57b island
    * trick on intervals: a new island starts where an interval's start
    * exceeds the running max of all PRECEDING ends (one per-user window),
    * islands collapse with min(start)/max(end), and coverage is an exact
    * integer-seconds sum. Two per-user windows + two aggregations — no
    * pair joins, no sequential state. */
  private def intervalUnion(spark: SparkSession, dir: String): DataFrame = {
    val iv = Tables.events(spark, dir)
      .select(col("user_id"), expr("CAST(ts AS LONG)").as("s0"))
      .withColumn("s1", col("s0") + 300)
    val w = Window.partitionBy("user_id").orderBy("s0", "s1")
    val marked = iv
      .withColumn("maxend",
        max("s1").over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_iv",
        when(col("maxend").isNull || col("s0") > col("maxend"), 1L)
          .otherwise(0L))
    marked
      .withColumn("iid",
        sum("new_iv").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "iid")
      .agg(min("s0").as("a"), max("s1").as("b"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("b") - col("a")).as("covered_s"))
      .where(col("user_id") <= 50)
      .orderBy("user_id")
  }

  /** X167: SCD2 point-in-time lookup — the consumption half of the X57
    * dimension build: each purchase is enriched with the state version
    * valid AT its timestamp. Because SCD2 validity intervals PARTITION
    * the timeline per key, interval containment degenerates to an as-of
    * join on valid_from (X23's union + running-window shape — one shuffle,
    * no interval join needed). Simultaneous changes collapse to the last
    * writer (max event_id) before the lookup, mirrored exactly in the
    * oracle. */
  private def scd2Lookup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"),
      date_trunc("second", col("ts")).as("tss"), col("event_id"),
      col("event_type"))
    val w = Window.partitionBy("user_id").orderBy("tss", "event_id")
    val dim = ev
      .withColumn("prev", lag("event_type", 1).over(w))
      .where(col("prev").isNull || col("prev") =!= col("event_type"))
      .groupBy("user_id", "tss")
      .agg(max_by(col("event_type"), col("event_id")).as("state"))
    val facts = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("tss"), col("event_id"))
    AsOfJoin.asof(facts, dim, "user_id", "tss", "state",
        "state_since", "state_at_purchase")
      .where(col("user_id") <= 30)
      .select(col("event_id"), col("user_id"), col("tss"),
        col("state_at_purchase"))
      .orderBy("user_id", "tss", "event_id")
  }

  /** X170: conversion-window rate — the time-bound funnel: a view
    * converts if the SAME user purchases within 1 hour. The "next
    * purchase after each view" is one forward as-of join (X23b shape —
    * union + running window, one shuffle, never a views×purchases
    * inequality join); the window bound is a residual filter; the report
    * is a per-day aggregation. Timestamps compare at second grain,
    * boundary inclusive on both ends (>= at the as-of, <= 3600 at the
    * window), mirrored exactly in the oracle's forward ASOF. */
  private def conversionWindow(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"),
      date_trunc("second", col("ts")).as("tss"), col("event_type"))
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("tss"))
    val purch = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("tss")).distinct()
      .withColumn("pts", col("tss"))
    val joined = AsOfJoin.asofForward(views, purch, "user_id", "tss",
      "pts", "np_ts", "next_purchase")
    joined
      .select(col("tss").cast("date").as("day"),
        when(col("next_purchase").isNotNull &&
          expr("CAST(next_purchase AS LONG) - CAST(tss AS LONG)") <= 3600, 1L)
          .otherwise(0L).as("conv"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_views"), sum("conv").as("n_conv"))
      .select(col("day"), col("n_views"), col("n_conv"),
        expr("n_conv * 1000000 div n_views").as("conv_rate_e6"))
      .orderBy("day")
  }

  /** X171: temporal pattern pairs — for every ordered event-type pair
    * (a, b): of the users who did both, how many did their FIRST a before
    * their LAST b (the "a can lead to b" sequence signal). The stream
    * reduces to one (user, type) min/max aggregation first; the pair join
    * fans out ≤ |type-vocabulary|² per user — bounded by construction,
    * never an event-level self-join. Second-grain integer comparisons. */
  private def sequencePairs(spark: SparkSession, dir: String): DataFrame = {
    val ut = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        expr("CAST(ts AS LONG)").as("sec"))
      .groupBy("user_id", "event_type")
      .agg(min("sec").as("first_s"), max("sec").as("last_s"))
    ut.as("a").join(ut.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") =!= col("b.event_type"))
      .groupBy(col("a.event_type").as("ta"), col("b.event_type").as("tb"))
      .agg(count(lit(1)).as("n_users_both"),
        sum(when(col("a.first_s") < col("b.last_s"), 1L).otherwise(0L))
          .as("n_seq"))
      .select(col("ta"), col("tb"), col("n_users_both"), col("n_seq"),
        expr("n_seq * 1000000 div n_users_both").as("seq_share_e6"))
      .orderBy("ta", "tb")
  }

  /** X182: windowed (bucketed) deduplication — keep the FIRST event per
    * (user, type) per tumbling hour: the batch twin of the streaming
    * dropDuplicatesWithinWatermark state discipline, with the crisp
    * bucket-based definition a batch recompute can reproduce exactly
    * (the trailing-gap form depends on which prior duplicates were
    * themselves kept — well-defined only with sequential state). One
    * per-(user,type,bucket) window; report per type. */
  private def windowedDedup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"),
      col("event_type"), col("event_id"),
      expr("CAST(ts AS LONG)").as("sec"))
      .withColumn("bucket", expr("sec div 3600"))
    ev.withColumn("rk", row_number().over(
        Window.partitionBy("user_id", "event_type", "bucket")
          .orderBy("sec", "event_id")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_raw"),
        sum(when(col("rk") === 1, 1L).otherwise(0L)).as("n_kept"))
      .select(col("event_type"), col("n_raw"), col("n_kept"),
        expr("(n_raw - n_kept) * 1000000 div n_raw").as("suppressed_e6"))
      .orderBy("event_type")
  }

  /** X183: time-to-convert — from each user's FIRST view to their first
    * purchase at-or-after it: funnel latency, reported as conversion rate,
    * integer mean, and the exact median via the count-of-counts CDF over
    * minute buckets (X88's trick — latencies collapse to one row per
    * distinct minute, no global sort of users). The per-user reduction is
    * one conditional min aggregation; everything downstream is
    * metadata-scale. */
  private def timeToConvert(spark: SparkSession, dir: String): DataFrame = {
    val f = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        expr("CAST(ts AS LONG)").as("sec"))
      .groupBy("user_id")
      .agg(min(when(col("event_type") === "view", col("sec"))).as("fv"),
        min(when(col("event_type") === "purchase", col("sec"))).as("fp"))
      .where(col("fv").isNotNull)
      .withColumn("delta",
        when(col("fp").isNotNull && col("fp") >= col("fv"),
          col("fp") - col("fv")))
      .cache()
    val base = f.agg(count(lit(1)).as("n_viewed"),
      count(col("delta")).as("n_converted"),
      coalesce(sum("delta"), lit(0L)).as("delta_sum"))
    val cdf = f.where(col("delta").isNotNull)
      .select(expr("delta div 60").as("dm"))
      .groupBy("dm").agg(count(lit(1)).as("nk"))
      .withColumn("cum", sum("nk").over(
        Window.orderBy("dm").rowsBetween(Window.unboundedPreceding, 0)))
    val p50 = cdf.crossJoin(broadcast(base.select("n_converted")))
      .where(col("cum") >= expr("(n_converted + 1) div 2"))
      .agg(min("dm").as("p50_delta_min"))
    base.crossJoin(p50).select(col("n_viewed"), col("n_converted"),
      expr("n_converted * 1000000 div n_viewed").as("conv_rate_e6"),
      expr("CASE WHEN n_converted > 0 THEN delta_sum div n_converted ELSE 0 END")
        .as("mean_delta_s"),
      col("p50_delta_min"))
  }

  /** X185: weekly churn — active / retained / new / churned user counts
    * per calendar week: the product-health dashboard's top row, computed
    * as ONE full-outer self-join of the (user, week) activity relation
    * against itself shifted a week (16-byte rows), never a per-user
    * window over history. Complements X59's cohort retention (fixed
    * cohorts) with the rolling week-over-week view. */
  private def weeklyChurn(spark: SparkSession, dir: String): DataFrame = {
    val uw = Tables.events(spark, dir)
      .select(col("user_id"),
        expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS BIGINT) div 7")
          .as("wk"))
      .distinct().cache()
    val shifted = uw.select(col("user_id"), (col("wk") + 1).as("wk"))
      .withColumn("prev_active", lit(true))
    val cur = uw.withColumn("now_active", lit(true))
    cur.join(shifted, Seq("user_id", "wk"), "full_outer")
      .select(col("wk"),
        coalesce(col("now_active"), lit(false)).as("now"),
        coalesce(col("prev_active"), lit(false)).as("prev"))
      .where(col("wk") >= 1)
      .groupBy("wk")
      .agg(sum(when(col("now"), 1L).otherwise(0L)).as("active"),
        sum(when(col("now") && col("prev"), 1L).otherwise(0L)).as("retained"),
        sum(when(col("now") && !col("prev"), 1L).otherwise(0L)).as("new_users"),
        sum(when(!col("now") && col("prev"), 1L).otherwise(0L)).as("churned"))
      .orderBy("wk")
  }

  /** X211: geometric-decay activity counters — each user's events count
    * with per-day halving (a day-old event is worth 1/2, two days 1/4 …):
    * the recency-weighted engagement score that exponential-decay counters
    * approximate in streaming systems, here EXACT in integers because the
    * decay is a right-shift (`c div 2^age`) instead of a float power — no
    * libm crosses the oracle (age is capped at 62 so the shift stays in
    * BIGINT; older events contribute 0 anyway). One groupBy to day
    * granularity, a broadcast 1-row max-day, one partial-first
    * re-aggregation; top-k via TakeOrdered. */
  private def decayCounts(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val mx = d.agg(max("day").as("mday"))
    d.groupBy("user_id", "day").agg(count(lit(1)).as("c"))
      .crossJoin(broadcast(mx))
      .select(col("user_id"), col("c"),
        least(datediff(col("mday"), col("day")), lit(62)).cast("int").as("age"))
      .groupBy("user_id")
      .agg(sum("c").as("total"),
        sum(expr("c div shiftleft(CAST(1 AS BIGINT), age)")).as("decayed"))
      .orderBy(col("decayed").desc, col("user_id"))
      .limit(10)
  }

  /** X215: freshness / staleness SLA audit — per stream (event_type), the
    * last-seen event time, its lag behind the freshest stream, and the
    * SLA verdict: the ingestion-health dashboard row every scheduled
    * pipeline owes its operators (the reference's audit table records
    * load timestamps for exactly this question,
    * Sites/DataProc_Script/spark_ingest_slmandicprd.py:88-96). One
    * partial-first max per stream + a broadcast 1-row global max;
    * second-granularity timestamps so the oracle hash-matches. */
  private def freshness(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val per = e.groupBy("event_type")
      .agg(date_trunc("second", max("ts")).as("last_ts"))
    val g = e.agg(date_trunc("second", max("ts")).as("gmax"))
    per.crossJoin(broadcast(g))
      .select(col("event_type"), col("last_ts"),
        (unix_timestamp(col("gmax")) - unix_timestamp(col("last_ts")))
          .as("lag_sec"),
        ((unix_timestamp(col("gmax")) - unix_timestamp(col("last_ts"))) <=
          86400L).as("sla_ok"))
      .orderBy("event_type")
  }

  /** X244: multi-granularity time rollup — hour/day/week event counts and
    * distinct users in ONE corpus pass via GROUPING SETS (Expand + a
    * single hash aggregation), vs the three separate scans the naive
    * union-of-GROUP-BYs pays. Buckets are integer ordinals (epoch-second
    * division), the grain label decodes from grouping(); at 100 TB the
    * Expand triples rows BEFORE partial aggregation but the map-side
    * combine collapses them within the task, so the shuffle carries one
    * row per (grain, bucket) partial — the standard cube economics. */
  private def timeRollup(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir).select(
        expr("CAST(ts AS LONG) div 3600").as("h"),
        expr("CAST(ts AS LONG) div 86400").as("d"),
        expr("CAST(ts AS LONG) div 604800").as("w"),
        col("user_id"))
      .createOrReplaceTempView("v_time_rollup")
    spark.sql(
      """SELECT
        |  CASE WHEN grouping(h) = 0 THEN 'hour'
        |       WHEN grouping(d) = 0 THEN 'day' ELSE 'week' END AS grain,
        |  coalesce(h, d, w) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM v_time_rollup
        |GROUP BY GROUPING SETS ((h), (d), (w))
        |ORDER BY grain, bucket""".stripMargin)
  }

  /** X246: weekly seasonality profile — mean daily volume per
    * (event_type, day-of-week), the load-shape fingerprint behind
    * capacity planning and the X241 runs test's "too few runs" verdicts.
    * Day-of-week is derived ARITHMETICALLY from the integer day ordinal
    * (2024-01-01 is a Monday, so dow = d % 7 with 0 = Monday) — Spark's
    * dayofweek() (1=Sunday) and DuckDB's dow (0=Sunday) disagree, integer
    * modulus cannot. Mean is a ×10⁶ truncating division. Two partial-first
    * rollups; output is type×7 rows. */
  private def seasonalProfile(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type").as("t"),
        datediff(col("ts").cast("date"), lit("2024-01-01")).cast("long").as("d"))
      .groupBy("t", "d").agg(count(lit(1)).as("c"))
    daily.select(col("t"), expr("d % 7").as("dow"), col("c"))
      .groupBy("t", "dow")
      .agg(count(lit(1)).as("n_days"), sum("c").as("total"))
      .select(col("t"), col("dow"), col("n_days"), col("total"),
        expr("total * 1000000 div n_days").as("mean_daily_e6"))
      .orderBy("t", "dow")
  }

  /** X247: naive-forecast backtest — per event type, yesterday's value
    * (naive) vs the value a week earlier (seasonal-naive) as day-ahead
    * forecasts, scored by MAE over the days where both are defined: the
    * baseline every real forecasting model must beat, and the quickest
    * measurement of HOW seasonal a stream is (seasonal MAE ≪ naive MAE ⇒
    * strong weekly cycle). lag(1)/lag(7) windows partition by type over
    * the calendar-bounded daily relation; MAE ships ×10⁶. The lags are
    * ROW offsets on the daily grid — exact calendar offsets here because
    * the stream has no empty days; a sparse stream gap-fills first (X54)
    * so row-lag and calendar-lag coincide. */
  private def forecastBacktest(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type").as("t"),
        datediff(col("ts").cast("date"), lit("2024-01-01")).cast("long").as("d"))
      .groupBy("t", "d").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("t").orderBy("d")
    daily
      .withColumn("f_naive", lag("c", 1).over(w))
      .withColumn("f_seasonal", lag("c", 7).over(w))
      .where(col("f_naive").isNotNull && col("f_seasonal").isNotNull)
      .groupBy("t")
      .agg(count(lit(1)).as("n_eval"),
        sum(abs(col("c") - col("f_naive"))).as("ae_naive"),
        sum(abs(col("c") - col("f_seasonal"))).as("ae_seasonal"))
      .select(col("t"), col("n_eval"),
        expr("ae_naive * 1000000 div n_eval").as("mae_naive_e6"),
        expr("ae_seasonal * 1000000 div n_eval").as("mae_seasonal_e6"),
        (col("ae_seasonal") < col("ae_naive")).as("seasonal_wins"))
      .orderBy("t")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_seasonal_profile" -> ((s, dir) => seasonalProfile(s, dir)),
    "x_forecast_backtest" -> ((s, dir) => forecastBacktest(s, dir)),
    "x_time_rollup" -> ((s, dir) => timeRollup(s, dir)),
    "x_freshness" -> ((s, dir) => freshness(s, dir)),
    "x_decay_counts" -> ((s, dir) => decayCounts(s, dir)),
    "x_churn" -> ((s, dir) => weeklyChurn(s, dir)),
    "x_windowed_dedup" -> ((s, dir) => windowedDedup(s, dir)),
    "x_time_to_convert" -> ((s, dir) => timeToConvert(s, dir)),
    "x_conversion_window" -> ((s, dir) => conversionWindow(s, dir)),
    "x_seq_pairs" -> ((s, dir) => sequencePairs(s, dir)),
    "x_interval_union" -> ((s, dir) => intervalUnion(s, dir)),
    "x_scd2_lookup" -> ((s, dir) => scd2Lookup(s, dir)),
    "x_concurrency" -> ((s, dir) => peakConcurrency(s, dir)),
    "x_out_of_order" -> ((s, dir) => outOfOrder(s, dir)),
    "x_pop" -> ((s, dir) => periodOverPeriod(s, dir)),
    "x_ewma" -> ((s, dir) => ewma(s, dir)),
    "x_ohlc" -> ((s, dir) => ohlc(s, dir)),
    "x_interpolate" -> ((s, dir) => interpolate(s, dir)),
    "x_drift" -> ((s, dir) => drift(s, dir)),
    "x_twap" -> ((s, dir) => twap(s, dir)),
    "x_mv_route" -> ((s, dir) => mvRoute(s, dir)),
    "x_mv_route_coarse" -> ((s, dir) => mvRouteCoarse(s, dir)),
    "x_islands" -> ((s, dir) => islands(s, dir)),
    "x_scd2" -> ((s, dir) => scd2(s, dir)),
    "x_attribution" -> ((s, dir) => attribution(s, dir)),
    "x_anomaly" -> ((s, dir) => anomalousDays(s, dir)),
    "x_interval_join_auto" -> ((s, dir) => intervalJoinAuto(s, dir)),
    "x_transitions" -> ((s, dir) => transitions(s, dir)),
    "x_paths" -> ((s, dir) => topPaths(s, dir)),
    "x_funnel" -> ((s, dir) => funnel(s, dir)),
    "x_retention" -> ((s, dir) => retention(s, dir)),
    "x_wau" -> ((s, dir) => wau(s, dir)),
    "x_interval_join" -> ((s, dir) => intervalJoin(s, dir)))

  val oracles: Map[String, String] = Map(
    "x_seasonal_profile" ->
      """WITH daily AS (SELECT event_type AS t,
        |    CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2)
        |SELECT t, d % 7 AS dow,
        |  CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(c) AS BIGINT) AS total,
        |  CAST(sum(c) AS BIGINT) * 1000000 // CAST(count(*) AS BIGINT)
        |    AS mean_daily_e6
        |FROM daily GROUP BY t, dow ORDER BY t, dow""".stripMargin,
    "x_forecast_backtest" ->
      """WITH daily AS (SELECT event_type AS t,
        |    CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |lagged AS (SELECT t, d, c,
        |    lag(c, 1) OVER (PARTITION BY t ORDER BY d) AS f_naive,
        |    lag(c, 7) OVER (PARTITION BY t ORDER BY d) AS f_seasonal
        |  FROM daily),
        |e AS (SELECT t, c, f_naive, f_seasonal FROM lagged
        |  WHERE f_naive IS NOT NULL AND f_seasonal IS NOT NULL)
        |SELECT t, CAST(count(*) AS BIGINT) AS n_eval,
        |  CAST(sum(abs(c - f_naive)) AS BIGINT) * 1000000 //
        |    CAST(count(*) AS BIGINT) AS mae_naive_e6,
        |  CAST(sum(abs(c - f_seasonal)) AS BIGINT) * 1000000 //
        |    CAST(count(*) AS BIGINT) AS mae_seasonal_e6,
        |  CAST(sum(abs(c - f_seasonal)) AS BIGINT) <
        |    CAST(sum(abs(c - f_naive)) AS BIGINT) AS seasonal_wins
        |FROM e GROUP BY t ORDER BY t""".stripMargin,
    "x_time_rollup" ->
      """WITH es AS (SELECT
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS s, user_id
        |  FROM events),
        |v AS (SELECT s // 3600 AS h, s // 86400 AS d, s // 604800 AS w,
        |    user_id
        |  FROM es)
        |SELECT
        |  CASE WHEN grouping(h) = 0 THEN 'hour'
        |       WHEN grouping(d) = 0 THEN 'day' ELSE 'week' END AS grain,
        |  coalesce(h, d, w) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM v
        |GROUP BY GROUPING SETS ((h), (d), (w))
        |ORDER BY grain, bucket""".stripMargin,
    "x_freshness" ->
      """WITH e AS (SELECT event_type,
        |    date_trunc('second', max(ts)) AS last_ts
        |  FROM events GROUP BY 1),
        |g AS (SELECT date_trunc('second', max(ts)) AS gmax FROM events)
        |SELECT event_type, last_ts,
        |  CAST(date_diff('second', last_ts, gmax) AS BIGINT) AS lag_sec,
        |  date_diff('second', last_ts, gmax) <= 86400 AS sla_ok
        |FROM e, g ORDER BY event_type""".stripMargin,
    "x_decay_counts" ->
      """WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |mx AS (SELECT max(day) AS mday FROM d),
        |cd AS (SELECT user_id, day, CAST(count(*) AS BIGINT) AS c
        |  FROM d GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(c) AS BIGINT) AS total,
        |  CAST(sum(c // (CAST(1 AS BIGINT) <<
        |    least(date_diff('day', day, mday), 62))) AS BIGINT) AS decayed
        |FROM cd, mx GROUP BY user_id
        |ORDER BY decayed DESC, user_id LIMIT 10""".stripMargin,
    "x_churn" ->
      """WITH uw AS (SELECT DISTINCT user_id,
        |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT)
        |      // 7 AS wk
        |  FROM events),
        |cur AS (SELECT user_id, wk, true AS now_active FROM uw),
        |prev AS (SELECT user_id, wk + 1 AS wk, true AS prev_active FROM uw),
        |j AS (SELECT coalesce(cur.wk, prev.wk) AS wk,
        |    coalesce(now_active, false) AS now, coalesce(prev_active, false) AS prev
        |  FROM cur FULL JOIN prev
        |    ON cur.user_id = prev.user_id AND cur.wk = prev.wk)
        |SELECT wk,
        |  CAST(sum(CASE WHEN now THEN 1 ELSE 0 END) AS BIGINT) AS active,
        |  CAST(sum(CASE WHEN now AND prev THEN 1 ELSE 0 END) AS BIGINT) AS retained,
        |  CAST(sum(CASE WHEN now AND NOT prev THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
        |  CAST(sum(CASE WHEN NOT now AND prev THEN 1 ELSE 0 END) AS BIGINT) AS churned
        |FROM j WHERE wk >= 1
        |GROUP BY wk ORDER BY wk""".stripMargin,
    "x_windowed_dedup" ->
      """WITH ev AS (SELECT user_id, event_type, event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS bucket
        |  FROM events),
        |r AS (SELECT event_type,
        |    row_number() OVER (PARTITION BY user_id, event_type, bucket
        |      ORDER BY sec, event_id) AS rk
        |  FROM ev)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_raw,
        |  CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST((count(*) - sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END)) * 1000000
        |       // count(*) AS BIGINT) AS suppressed_e6
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,
    "x_time_to_convert" ->
      """WITH f AS (SELECT user_id,
        |    min(CASE WHEN event_type = 'view'
        |      THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS fv,
        |    min(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS fp
        |  FROM events GROUP BY user_id),
        |d AS (SELECT user_id, fv, fp,
        |    CASE WHEN fp IS NOT NULL AND fp >= fv THEN fp - fv END AS delta
        |  FROM f WHERE fv IS NOT NULL),
        |base AS (SELECT CAST(count(*) AS BIGINT) AS n_viewed,
        |    CAST(count(delta) AS BIGINT) AS n_converted,
        |    CAST(coalesce(sum(delta), 0) AS BIGINT) AS delta_sum
        |  FROM d),
        |cdf AS (SELECT delta // 60 AS dm,
        |    CAST(sum(count(*)) OVER (ORDER BY delta // 60) AS BIGINT) AS cum
        |  FROM d WHERE delta IS NOT NULL GROUP BY 1),
        |p50 AS (SELECT min(dm) AS p50_delta_min FROM cdf, base
        |  WHERE cum >= (n_converted + 1) // 2)
        |SELECT n_viewed, n_converted,
        |  CAST(n_converted * 1000000 // n_viewed AS BIGINT) AS conv_rate_e6,
        |  CAST(CASE WHEN n_converted > 0 THEN delta_sum // n_converted
        |    ELSE 0 END AS BIGINT) AS mean_delta_s,
        |  p50_delta_min
        |FROM base, p50""".stripMargin,
    "x_conversion_window" ->
      """WITH ev AS (SELECT user_id,
        |    CAST(date_trunc('second', ts) AS TIMESTAMP) AS tss, event_type
        |  FROM events),
        |v AS (SELECT user_id, tss FROM ev WHERE event_type = 'view'),
        |p AS (SELECT DISTINCT user_id, tss AS pts FROM ev
        |  WHERE event_type = 'purchase'),
        |j AS (SELECT v.tss, p.pts
        |  FROM v ASOF LEFT JOIN p ON v.user_id = p.user_id AND v.tss <= p.pts),
        |c AS (SELECT CAST(tss AS DATE) AS day,
        |    CASE WHEN pts IS NOT NULL
        |      AND CAST(floor(epoch(pts)) - floor(epoch(tss)) AS BIGINT) <= 3600
        |      THEN 1 ELSE 0 END AS conv
        |  FROM j)
        |SELECT day, CAST(count(*) AS BIGINT) AS n_views,
        |  CAST(sum(conv) AS BIGINT) AS n_conv,
        |  CAST(sum(conv) * 1000000 // count(*) AS BIGINT) AS conv_rate_e6
        |FROM c GROUP BY day ORDER BY day""".stripMargin,
    "x_seq_pairs" ->
      """WITH ut AS (SELECT user_id, event_type,
        |    CAST(min(floor(epoch(ts))) AS BIGINT) AS first_s,
        |    CAST(max(floor(epoch(ts))) AS BIGINT) AS last_s
        |  FROM events GROUP BY 1, 2)
        |SELECT a.event_type AS ta, b.event_type AS tb,
        |  CAST(count(*) AS BIGINT) AS n_users_both,
        |  CAST(sum(CASE WHEN a.first_s < b.last_s THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_seq,
        |  CAST(sum(CASE WHEN a.first_s < b.last_s THEN 1 ELSE 0 END) * 1000000
        |       // count(*) AS BIGINT) AS seq_share_e6
        |FROM ut a JOIN ut b
        |  ON a.user_id = b.user_id AND a.event_type <> b.event_type
        |GROUP BY 1, 2 ORDER BY ta, tb""".stripMargin,
    "x_interval_union" ->
      """WITH iv AS (SELECT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS s0,
        |    CAST(floor(epoch(ts)) AS BIGINT) + 300 AS s1
        |  FROM events),
        |m AS (SELECT user_id, s0, s1,
        |    max(s1) OVER (PARTITION BY user_id ORDER BY s0, s1
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS maxend
        |  FROM iv),
        |f AS (SELECT user_id, s0, s1,
        |    CASE WHEN maxend IS NULL OR s0 > maxend THEN 1 ELSE 0 END AS new_iv
        |  FROM m),
        |g AS (SELECT user_id, s0, s1,
        |    sum(new_iv) OVER (PARTITION BY user_id ORDER BY s0, s1
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS iid
        |  FROM f),
        |isl AS (SELECT user_id, iid, min(s0) AS a, max(s1) AS b
        |  FROM g GROUP BY user_id, iid)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
        |  CAST(sum(b - a) AS BIGINT) AS covered_s
        |FROM isl WHERE user_id <= 50
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "x_scd2_lookup" ->
      """WITH ev AS (SELECT user_id,
        |    CAST(date_trunc('second', ts) AS TIMESTAMP) AS tss,
        |    event_id, event_type
        |  FROM events),
        |ch AS (SELECT user_id, tss, event_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY tss, event_id) AS prev
        |  FROM ev),
        |dim AS (SELECT user_id, tss, max_by(event_type, event_id) AS state
        |  FROM ch WHERE prev IS NULL OR prev <> event_type
        |  GROUP BY user_id, tss),
        |facts AS (SELECT user_id, tss, event_id FROM ev
        |  WHERE event_type = 'purchase')
        |SELECT f.event_id, f.user_id, f.tss, d.state AS state_at_purchase
        |FROM facts f
        |ASOF LEFT JOIN dim d ON f.user_id = d.user_id AND f.tss >= d.tss
        |WHERE f.user_id <= 30
        |ORDER BY f.user_id, f.tss, f.event_id""".stripMargin,
    "x_concurrency" ->
      """WITH e AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) // 60 AS m0 FROM events),
        |mins AS (SELECT m0 + x AS m
        |  FROM e, LATERAL (SELECT unnest(range(5)) AS x) s),
        |act AS (SELECT m, CAST(count(*) AS BIGINT) AS active FROM mins GROUP BY m),
        |r AS (SELECT m // 1440 AS day, m, active,
        |    row_number() OVER (PARTITION BY m // 1440
        |      ORDER BY active DESC, m) AS rk
        |  FROM act)
        |SELECT day, m AS peak_minute, active AS peak_active
        |FROM r WHERE rk = 1 ORDER BY day""".stripMargin,
    "x_out_of_order" ->
      """WITH ev AS (SELECT user_id, event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |  FROM events),
        |h AS (SELECT user_id, sec,
        |    coalesce(max(sec) OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), sec) AS hwm
        |  FROM ev)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CASE WHEN hwm - sec > 60 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
        |  CAST(max(greatest(hwm - sec, 0)) AS BIGINT) AS max_late_s
        |FROM h WHERE user_id <= 50
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "x_interpolate" ->
      """WITH ev AS (SELECT user_id,
        |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS d,
        |    CAST(date_trunc('second', ts) AS TIMESTAMP) AS tss, event_id,
        |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |obs AS (SELECT user_id, d, cents FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, d
        |        ORDER BY tss DESC, event_id DESC) AS rn FROM ev)
        |  WHERE rn = 1),
        |span AS (SELECT min(d) AS d0, max(d) AS d1 FROM obs),
        |grid AS (SELECT user_id, unnest(generate_series(d0, d1)) AS d
        |  FROM (SELECT DISTINCT user_id FROM obs), span),
        |j AS (SELECT g.user_id, g.d, o.cents FROM grid g
        |  LEFT JOIN obs o ON g.user_id = o.user_id AND g.d = o.d),
        |f AS (SELECT user_id, d, cents,
        |    last_value(cents IGNORE NULLS) OVER w AS pv,
        |    last_value(CASE WHEN cents IS NOT NULL THEN d END IGNORE NULLS) OVER w AS pd,
        |    first_value(cents IGNORE NULLS) OVER wf AS nv,
        |    first_value(CASE WHEN cents IS NOT NULL THEN d END IGNORE NULLS) OVER wf AS nd
        |  FROM j
        |  WINDOW w AS (PARTITION BY user_id ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wf AS (PARTITION BY user_id ORDER BY d
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, d,
        |  CAST(CASE WHEN cents IS NOT NULL THEN cents
        |       WHEN pv IS NOT NULL AND nv IS NOT NULL
        |         THEN (pv * (nd - d) + nv * (d - pd)) // (nd - pd)
        |       ELSE coalesce(pv, nv) END AS BIGINT) AS interp_cents
        |FROM f ORDER BY user_id, d""".stripMargin,
    "x_drift" ->
      """WITH c AS (SELECT event_type,
        |    CAST(sum(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16' THEN 0 ELSE 1 END) AS BIGINT) AS cb
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS ta, CAST(sum(cb) AS BIGINT) AS tb FROM c)
        |SELECT event_type,
        |  CAST(ca * 1000000 // ta AS BIGINT) AS share_a_e6,
        |  CAST(cb * 1000000 // tb AS BIGINT) AS share_b_e6,
        |  abs(CAST(ca * 1000000 // ta AS BIGINT) - CAST(cb * 1000000 // tb AS BIGINT)) AS drift_e6
        |FROM c, t ORDER BY event_type""".stripMargin,
    "x_pop" ->
      """WITH monthly AS (SELECT
        |    CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
        |    CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS rev_cents
        |  FROM orders GROUP BY 1),
        |lagged AS (SELECT month, rev_cents,
        |    lag(rev_cents, 1) OVER (ORDER BY month) AS prev_cents
        |  FROM monthly)
        |SELECT month, rev_cents,
        |  rev_cents - prev_cents AS delta_cents,
        |  CAST((rev_cents - prev_cents) * 1000000 // prev_cents AS BIGINT)
        |    AS pop_e6
        |FROM lagged ORDER BY month""".stripMargin,
    "x_ewma" ->
      """WITH ev AS (SELECT user_id,
        |    CAST(date_trunc('second', ts) AS TIMESTAMP) AS tss, event_id,
        |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |lagged AS (SELECT user_id, tss, event_id, cents,
        |    lag(cents, 1) OVER w AS l_1, lag(cents, 2) OVER w AS l_2,
        |    lag(cents, 3) OVER w AS l_3, lag(cents, 4) OVER w AS l_4,
        |    lag(cents, 5) OVER w AS l_5, lag(cents, 6) OVER w AS l_6,
        |    lag(cents, 7) OVER w AS l_7
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tss, event_id))
        |SELECT user_id, tss, event_id, cents,
        |  CAST((coalesce(cents * 128, 0) + coalesce(l_1 * 64, 0)
        |      + coalesce(l_2 * 32, 0) + coalesce(l_3 * 16, 0)
        |      + coalesce(l_4 * 8, 0) + coalesce(l_5 * 4, 0)
        |      + coalesce(l_6 * 2, 0) + coalesce(l_7 * 1, 0))
        |    // (CASE WHEN cents IS NOT NULL THEN 128 ELSE 0 END
        |      + CASE WHEN l_1 IS NOT NULL THEN 64 ELSE 0 END
        |      + CASE WHEN l_2 IS NOT NULL THEN 32 ELSE 0 END
        |      + CASE WHEN l_3 IS NOT NULL THEN 16 ELSE 0 END
        |      + CASE WHEN l_4 IS NOT NULL THEN 8 ELSE 0 END
        |      + CASE WHEN l_5 IS NOT NULL THEN 4 ELSE 0 END
        |      + CASE WHEN l_6 IS NOT NULL THEN 2 ELSE 0 END
        |      + CASE WHEN l_7 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS ewma_cents
        |FROM lagged WHERE user_id <= 100
        |ORDER BY user_id, tss, event_id""".stripMargin,
    "x_ohlc" ->
      """WITH ev AS (SELECT event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es,
        |    event_id, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |keyed AS (SELECT event_type, (es // 300) * 300 AS bar_epoch,
        |    es * 10000000 + event_id AS okey, cents FROM ev)
        |SELECT event_type, make_timestamp(bar_epoch * 1000000) AS bar_ts,
        |  arg_min(cents, okey) AS open_cents,
        |  max(cents) AS high_cents, min(cents) AS low_cents,
        |  arg_max(cents, okey) AS close_cents,
        |  CAST(count(*) AS BIGINT) AS n_trades
        |FROM keyed GROUP BY event_type, bar_epoch
        |ORDER BY event_type, bar_ts""".stripMargin,
    "x_twap" ->
      """WITH ev AS (SELECT user_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS tss,
        |    event_id, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |n AS (SELECT *, lead(tss) OVER (PARTITION BY user_id ORDER BY tss, event_id) AS nxt
        |  FROM ev),
        |d AS (SELECT user_id, cents, date_diff('second', tss, nxt) AS dt
        |  FROM n WHERE nxt IS NOT NULL)
        |SELECT user_id, CAST(sum(dt) AS BIGINT) AS total_dt,
        |  CAST(sum(cents * dt) // sum(dt) AS BIGINT) AS twap_cents
        |FROM d GROUP BY 1 ORDER BY user_id""".stripMargin,
    "x_mv_route" ->
      """SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1 ORDER BY d""".stripMargin,
    "x_mv_route_coarse" ->
      """SELECT CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS wk,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1 ORDER BY wk""".stripMargin,
    "x_islands" ->
      """WITH active AS (SELECT DISTINCT user_id,
        |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS ord
        |  FROM events),
        |runs AS (SELECT user_id,
        |    ord - CAST(row_number() OVER (PARTITION BY user_id ORDER BY ord) AS BIGINT) AS g
        |  FROM active),
        |streaks AS (SELECT user_id, g, CAST(count(*) AS BIGINT) AS streak_len
        |  FROM runs GROUP BY 1, 2)
        |SELECT streak_len, CAST(count(*) AS BIGINT) AS n_streaks,
        |  count(DISTINCT user_id) AS n_users
        |FROM streaks GROUP BY 1 ORDER BY streak_len""".stripMargin,
    "x_scd2" ->
      """WITH ev AS (SELECT user_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS tss,
        |    event_id, event_type FROM events),
        |c AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id ORDER BY tss, event_id) AS prev
        |  FROM ev),
        |chg AS (SELECT * FROM c WHERE prev IS NULL OR prev <> event_type),
        |scd AS (SELECT user_id, event_type AS state, tss AS valid_from,
        |    lead(tss) OVER (PARTITION BY user_id ORDER BY tss, event_id) AS valid_to
        |  FROM chg)
        |SELECT state, CAST(count(*) AS BIGINT) AS n_versions,
        |  CAST(sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_current,
        |  CAST(sum(date_diff('second', valid_from, valid_to)) AS BIGINT) AS dur_seconds
        |FROM scd GROUP BY 1 ORDER BY state""".stripMargin,
    "x_attribution" ->
      """WITH ev AS (SELECT user_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS tss,
        |    event_id, event_type, value FROM events),
        |t AS (SELECT *,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY tss, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |  FROM ev)
        |SELECT coalesce(touch, 'none') AS channel, CAST(count(*) AS BIGINT) AS n_purchases,
        |  CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM t WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY channel""".stripMargin,
    "x_anomaly" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |gs AS (SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(c) AS HUGEINT) AS s,
        |    CAST(sum(c * c) AS HUGEINT) AS ssq FROM daily)
        |SELECT d, c,
        |  CAST(CASE WHEN (n*c - s)*(n*c - s) > 9 * (n*ssq - s*s) THEN 3
        |       WHEN (n*c - s)*(n*c - s) > 4 * (n*ssq - s*s) THEN 2
        |       WHEN (n*c - s)*(n*c - s) > (n*ssq - s*s) THEN 1
        |       ELSE 0 END AS INTEGER) AS sigma_class
        |FROM daily, gs ORDER BY d""".stripMargin,
    "x_transitions" ->
      """WITH ev AS (SELECT user_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS tss,
        |    event_id, event_type FROM events),
        |p AS (SELECT event_type AS cur,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY tss, event_id) AS nxt
        |  FROM ev),
        |c AS (SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n
        |  FROM p WHERE nxt IS NOT NULL GROUP BY 1, 2)
        |SELECT cur, nxt, n,
        |  CAST(n * 1000000 // sum(n) OVER (PARTITION BY cur) AS BIGINT) AS p_e6
        |FROM c ORDER BY cur, nxt""".stripMargin,
    "x_paths" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d,
        |    CAST(date_trunc('second', ts) AS TIMESTAMP) AS tss, event_id, event_type
        |  FROM events),
        |paths AS (SELECT user_id, d,
        |    string_agg(event_type, '>' ORDER BY tss, event_id) AS path
        |  FROM ev GROUP BY 1, 2)
        |SELECT path, CAST(count(*) AS BIGINT) AS n
        |FROM paths GROUP BY 1 ORDER BY n DESC, path LIMIT 10""".stripMargin,
    "x_funnel" ->
      """WITH ev AS (SELECT user_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS tss, event_type FROM events),
        |s1 AS (SELECT user_id, min(tss) AS t1 FROM ev WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT ev.user_id, min(tss) AS t2 FROM ev JOIN s1 USING (user_id)
        |  WHERE event_type = 'click' AND tss >= t1 GROUP BY 1),
        |s3 AS (SELECT ev.user_id, min(tss) AS t3 FROM ev JOIN s2 USING (user_id)
        |  WHERE event_type = 'purchase' AND tss >= t2 GROUP BY 1)
        |SELECT 0 AS stage_ord, 'all_users' AS stage, count(DISTINCT user_id) AS users FROM ev
        |UNION ALL SELECT 1, 'first_view', count(*) FROM s1
        |UNION ALL SELECT 2, 'click_after_view', count(*) FROM s2
        |UNION ALL SELECT 3, 'purchase_after_click', count(*) FROM s3
        |ORDER BY stage_ord""".stripMargin,
    "x_wau" ->
      """WITH ad AS (SELECT DISTINCT user_id,
        |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS d
        |  FROM events),
        |mx AS (SELECT max(d) AS dmax FROM ad),
        |x AS (SELECT user_id, unnest(generate_series(d, d + 6)) AS wd FROM ad)
        |SELECT wd, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
        |FROM x, mx WHERE wd <= dmax GROUP BY wd ORDER BY wd""".stripMargin,
    "x_retention" ->
      """WITH ev AS (SELECT DISTINCT user_id,
        |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS BIGINT) AS w
        |  FROM events),
        |firsts AS (SELECT user_id, min(w) AS cohort_week FROM ev GROUP BY 1)
        |SELECT cohort_week, w - cohort_week AS week_offset,
        |  count(DISTINCT ev.user_id) AS n_users
        |FROM ev JOIN firsts USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin,
    "x_interval_join_auto" -> intervalOracle,
    "x_interval_join" -> intervalOracle)

  /** Shared by the hand-built and rule-rewritten interval-join keys. */
  private lazy val intervalOracle: String =
      """WITH iv AS (SELECT o_orderkey, o_orderstatus,
        |    CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS s
        |  FROM orders WHERE o_orderpriority = '1-URGENT'),
        |iv2 AS (SELECT o_orderkey, o_orderstatus, s, s + o_orderkey % 7 + 1 AS e FROM iv),
        |pt AS (SELECT CAST(date_diff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) AS p,
        |    l_quantity
        |  FROM lineitem WHERE l_returnflag = 'R')
        |SELECT o_orderstatus, count(*) AS n_pairs,
        |  count(DISTINCT o_orderkey) AS n_orders,
        |  round(CAST(sum(l_quantity) AS DOUBLE), 2) AS qty
        |FROM pt JOIN iv2 ON p BETWEEN s AND e
        |GROUP BY 1 ORDER BY o_orderstatus""".stripMargin
}
