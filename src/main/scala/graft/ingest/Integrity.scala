package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.StableHash
import graft.model.Tables

/** Data-integrity primitives for replicated / migrated tables: an
  * order-independent table checksum and a snapshot diff (anti-entropy).
  *
  * The reference trusts its ingestion blindly — it records row counts in
  * `Historico_Execucao` (`Sites/DataProc_Script/spark_ingest_slmandicprd
  * .py:88`) but never verifies content. At 100 TB, "did the copy match?"
  * must be answerable without sorting or collecting anything: both
  * operators here are a pure per-row projection followed by one partial
  * map-side aggregation (checksum), or one co-partitioned full-outer join
  * (diff). XOR and bounded-sum are commutative/associative, so per-group
  * checksums re-aggregate to table checksums without rescanning — the same
  * incremental pattern as the X53/X53b sketches.
  */
object Integrity {

  /** Canonical row serialization for `orders` — engine-portable: integer
    * and string columns verbatim, the double price as exact cents (the ×100
    * value sits within 1e-9 of an integer, so `round` agrees bit-exactly
    * across engines), the timestamp as an ISO date string. */
  private def canon(price: Column): Column = concat_ws("|",
    col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
    round(price * 100).cast("long"),
    col("o_orderdate").cast("date").cast("string"),
    col("o_orderpriority"))

  /** DuckDB rendition of [[canon]]. */
  private def canonSql(price: String): String =
    "concat_ws('|', o_orderkey, o_custkey, o_orderstatus, " +
      s"CAST(round($price * 100) AS BIGINT), " +
      "CAST(CAST(o_orderdate AS DATE) AS VARCHAR), o_orderpriority)"

  /** Per-status + grand-total content checksum: row count, XOR of the
    * 60-bit row hashes, and a bounded hash sum (mod ~2³⁰ per row, so the
    * BIGINT sum holds past 10¹² rows). One scan, one hash aggregation;
    * the rollup row proves re-aggregability (global = XOR of group XORs). */
  private def tableChecksum(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderstatus"),
        StableHash.md5Prefix60(canon(col("o_totalprice"))).as("h"))
      .rollup("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        expr("bit_xor(h)").as("h_xor"),
        sum(col("h") % 1000000007L).as("h_sum"))
      .orderBy(col("o_orderstatus").asc_nulls_first)

  /** Snapshot diff (anti-entropy): classify every key as added / removed /
    * changed / unchanged between two snapshots by comparing per-row content
    * hashes under a co-partitioned full-outer join — never row payloads, so
    * the shuffle moves 16 bytes per row regardless of row width. Snapshots
    * are derived deterministically from `orders` (v1 drops keys ≡0 mod 7;
    * v2 drops ≡0 mod 11 and bumps the price of keys ≡0 mod 5) so both
    * engines build identical inputs. */
  private def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
    val v1 = base.where(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey"),
        StableHash.md5Prefix60(canon(col("o_totalprice"))).as("h1"))
    val v2 = base.where(col("o_orderkey") % 11 =!= 0)
      .withColumn("pr", when(col("o_orderkey") % 5 === 0,
        col("o_totalprice") + 1).otherwise(col("o_totalprice")))
      .select(col("o_orderkey"), StableHash.md5Prefix60(canon(col("pr"))).as("h2"))
    v1.join(v2, Seq("o_orderkey"), "full_outer")
      .select(when(col("h1").isNull, "added")
        .when(col("h2").isNull, "removed")
        .when(col("h1") =!= col("h2"), "changed")
        .otherwise("unchanged").as("change_type"))
      .groupBy("change_type").agg(count(lit(1)).as("n"))
      .orderBy("change_type")
  }

  /** X105: CDC change-data feed — the ROW-LEVEL companion of
    * [[snapshotDiff]]'s summary: full-outer join of two snapshots on the
    * key emits (op, key, before, after) for every insert/update/delete,
    * the Change Data Feed contract downstream incremental consumers
    * (X20 merge, X72 view maintenance) replay. Unchanged rows never enter
    * the feed; only keys + two integer images shuffle, independent of row
    * width (hash-compare first at scale — X62 — then fetch images for the
    * changed minority). */
  private def cdcFeed(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)").as("cents"))
    val v1 = base.where(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey"), col("cents").as("before_cents"))
    val v2 = base.where(col("o_orderkey") % 11 =!= 0)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 5 === 0, col("cents") + 100)
          .otherwise(col("cents")).as("after_cents"))
    v1.join(v2, Seq("o_orderkey"), "full_outer")
      .withColumn("op",
        when(col("before_cents").isNull, "insert")
          .when(col("after_cents").isNull, "delete")
          .when(col("before_cents") =!= col("after_cents"), "update"))
      .where(col("op").isNotNull)
      .select(col("op"), col("o_orderkey"), col("before_cents"),
        col("after_cents"))
      .orderBy("op", "o_orderkey")
  }

  /** Targeted delete (GDPR erasure shape) verified by content checksum:
    * a deletion-vector relation anti-joins the table, and the surviving
    * rows' checksum must equal the oracle's independent computation — the
    * "prove the rewrite dropped exactly the requested keys and nothing
    * else" audit. Anti join + one aggregation; the deletion vector shuffles
    * as keys only. */
  private def targetedDelete(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
    val dv = base.where(col("o_orderkey") % 97 === 0).select("o_orderkey")
    base.join(dv, Seq("o_orderkey"), "left_anti")
      .select(StableHash.md5Prefix60(canon(col("o_totalprice"))).as("h"))
      .agg(count(lit(1)).as("n_remaining"),
        expr("bit_xor(h)").as("h_xor"),
        sum(col("h") % 1000000007L).as("h_sum"))
  }

  /** X124: incremental partition-level recompute — the "don't rescan 100 TB
    * for today's 200 GB" operator. Yesterday's materialized per-day
    * aggregate is combined with a recompute of ONLY the days touched by
    * new arrivals: changed days come from the arrival feed (one distinct
    * over the delta), recompute scans just those partitions (the day
    * filter prunes a date-partitioned fact — cf. x_dpp), and untouched
    * days are served verbatim from the old aggregate via an anti join.
    * The differential oracle computes the FULL aggregate directly, so a
    * hash match PROVES incremental == full recompute — the invariant that
    * makes incremental maintenance trustworthy. (Streaming twin:
    * IncrementalView's per-batch partials; this is the batch/backfill
    * form.) Arrivals are derived deterministically: event_id ≡ 0 mod 17
    * rows are "today's load", the rest the prior snapshot. */
  private def incrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    val full = Tables.events(spark, dir).select(
      col("ts").cast("date").as("day"),
      expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)").as("cents"),
      col("event_id"))
    val prior = full.where(col("event_id") % 17 =!= 0)
    val priorAgg = prior.groupBy("day")
      .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
    val changedDays = full.where(col("event_id") % 17 === 0)
      .select("day").distinct()
    val recomputed = full.join(broadcast(changedDays), Seq("day"))
      .groupBy("day").agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
    val untouched = priorAgg.join(broadcast(changedDays), Seq("day"), "left_anti")
    untouched.unionByName(recomputed).orderBy("day")
  }

  /** X179: CDC apply with a roundtrip PROOF — the consumption half of
    * [[cdcFeed]]: the derived insert/update/delete feed is applied back
    * onto snapshot v1 (anti-join the delete/update keys, union the
    * insert/update after-images), and the result's checksum is computed
    * ALONGSIDE the target snapshot v2's checksum — `roundtrip_ok` is a
    * genuinely computed equality in both engines, so any apply-logic
    * defect (lost delete, double-applied update) flips the key red.
    * Apply cost: one anti join on keys + one union — row-width-
    * independent, the same shape a MERGE executes. */
  private def cdcApply(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)").as("cents"))
    val v1 = base.where(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey"), col("cents"))
    val v2 = base.where(col("o_orderkey") % 11 =!= 0)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 5 === 0, col("cents") + 100)
          .otherwise(col("cents")).as("cents"))
    val feed = v1.withColumnRenamed("cents", "before_cents")
      .join(v2.withColumnRenamed("cents", "after_cents"),
        Seq("o_orderkey"), "full_outer")
      .withColumn("op",
        when(col("before_cents").isNull, "insert")
          .when(col("after_cents").isNull, "delete")
          .when(col("before_cents") =!= col("after_cents"), "update"))
      .where(col("op").isNotNull)
    val applied = v1
      .join(feed.where(col("op").isin("delete", "update"))
        .select("o_orderkey"), Seq("o_orderkey"), "left_anti")
      .unionByName(feed.where(col("op").isin("insert", "update"))
        .select(col("o_orderkey"), col("after_cents").as("cents")))
    def checksum(df: DataFrame, n: String, x: String) = df
      .select(StableHash.md5Prefix60(
        concat_ws("_", col("o_orderkey"), col("cents"))).as("h"))
      .agg(count(lit(1)).as(n), expr("bit_xor(h)").as(x))
    checksum(applied, "n_applied", "x_applied")
      .crossJoin(checksum(v2, "n_target", "x_target"))
      .select(col("n_applied"), col("n_target"),
        (col("n_applied") === col("n_target") &&
          col("x_applied") === col("x_target")).as("roundtrip_ok"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_cdc_apply" -> ((s, dir) => cdcApply(s, dir)),
    "x_cdc_feed" -> ((s, dir) => cdcFeed(s, dir)),
    "x_checksum" -> ((s, dir) => tableChecksum(s, dir)),
    "x_incremental_agg" -> ((s, dir) => incrementalAgg(s, dir)),
    "x_snapshot_diff" -> ((s, dir) => snapshotDiff(s, dir)),
    "x_targeted_delete" -> ((s, dir) => targetedDelete(s, dir)))

  private val hashSql = StableHash.md5Prefix60Sql(canonSql("o_totalprice"))

  val oracles: Map[String, String] = Map(
    // Full recompute — a hash match proves the incremental splice exact.
    "x_incremental_agg" ->
      """SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS sum_cents
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "x_cdc_apply" ->
      s"""WITH base AS (SELECT o_orderkey,
         |    CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
         |  FROM orders),
         |v1 AS (SELECT o_orderkey, cents FROM base WHERE o_orderkey % 7 <> 0),
         |v2 AS (SELECT o_orderkey,
         |    CASE WHEN o_orderkey % 5 = 0 THEN cents + 100 ELSE cents END AS cents
         |  FROM base WHERE o_orderkey % 11 <> 0),
         |feed AS (SELECT coalesce(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
         |    v1.cents AS before_cents, v2.cents AS after_cents,
         |    CASE WHEN v1.cents IS NULL THEN 'insert'
         |         WHEN v2.cents IS NULL THEN 'delete'
         |         WHEN v1.cents <> v2.cents THEN 'update' END AS op
         |  FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey),
         |f AS (SELECT * FROM feed WHERE op IS NOT NULL),
         |applied AS (
         |  SELECT o_orderkey, cents FROM v1
         |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM f
         |                           WHERE op IN ('delete', 'update'))
         |  UNION ALL
         |  SELECT o_orderkey, after_cents AS cents FROM f
         |  WHERE op IN ('insert', 'update')),
         |ca AS (SELECT CAST(count(*) AS BIGINT) AS n_applied,
         |    bit_xor(${StableHash.md5Prefix60Sql(
             "concat_ws('_', o_orderkey, cents)")}) AS x_applied
         |  FROM applied),
         |ct AS (SELECT CAST(count(*) AS BIGINT) AS n_target,
         |    bit_xor(${StableHash.md5Prefix60Sql(
             "concat_ws('_', o_orderkey, cents)")}) AS x_target
         |  FROM v2)
         |SELECT n_applied, n_target,
         |  (n_applied = n_target AND x_applied = x_target) AS roundtrip_ok
         |FROM ca, ct""".stripMargin,
    "x_cdc_feed" ->
      """WITH base AS (SELECT o_orderkey,
        |    CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |v1 AS (SELECT o_orderkey, cents AS before_cents FROM base
        |  WHERE o_orderkey % 7 <> 0),
        |v2 AS (SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 5 = 0 THEN cents + 100 ELSE cents END
        |      AS after_cents
        |  FROM base WHERE o_orderkey % 11 <> 0),
        |feed AS (SELECT coalesce(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
        |    before_cents, after_cents,
        |    CASE WHEN before_cents IS NULL THEN 'insert'
        |         WHEN after_cents IS NULL THEN 'delete'
        |         WHEN before_cents <> after_cents THEN 'update' END AS op
        |  FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey)
        |SELECT op, o_orderkey, before_cents, after_cents
        |FROM feed WHERE op IS NOT NULL
        |ORDER BY op, o_orderkey""".stripMargin,
    "x_checksum" ->
      s"""WITH h AS (SELECT o_orderstatus, $hashSql AS h FROM orders)
         |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
         |  bit_xor(h) AS h_xor,
         |  CAST(sum(h % 1000000007) AS BIGINT) AS h_sum
         |FROM h GROUP BY ROLLUP (o_orderstatus)
         |ORDER BY o_orderstatus NULLS FIRST""".stripMargin,
    "x_targeted_delete" ->
      s"""WITH h AS (SELECT $hashSql AS h FROM orders WHERE o_orderkey % 97 <> 0)
         |SELECT CAST(count(*) AS BIGINT) AS n_remaining,
         |  bit_xor(h) AS h_xor,
         |  CAST(sum(h % 1000000007) AS BIGINT) AS h_sum
         |FROM h""".stripMargin,
    "x_snapshot_diff" ->
      s"""WITH v1 AS (SELECT o_orderkey, $hashSql AS h1
         |  FROM orders WHERE o_orderkey % 7 <> 0),
         |adj AS (SELECT * REPLACE (CASE WHEN o_orderkey % 5 = 0
         |    THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice)
         |  FROM orders WHERE o_orderkey % 11 <> 0),
         |v2 AS (SELECT o_orderkey, $hashSql AS h2 FROM adj)
         |SELECT CASE WHEN h1 IS NULL THEN 'added'
         |    WHEN h2 IS NULL THEN 'removed'
         |    WHEN h1 <> h2 THEN 'changed'
         |    ELSE 'unchanged' END AS change_type,
         |  CAST(count(*) AS BIGINT) AS n
         |FROM v1 FULL JOIN v2 USING (o_orderkey)
         |GROUP BY 1 ORDER BY change_type""".stripMargin)
}
