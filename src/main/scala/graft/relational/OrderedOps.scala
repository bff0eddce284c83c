package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Order-sensitive relational surface: schema-flexible unions, keyset
  * pagination, deterministic mode, rolling medians, and higher-moment
  * statistics in exact integer sufficient sums.
  *
  * The reference pipeline materializes whole tables per run
  * (`Sites/DataProc_Script/spark_ingest_slmandicprd.py:96-99`) and leaves
  * pagination/statistics to the downstream warehouse; these are the
  * operators a consumer of the lake needs to page, profile and align
  * heterogeneous snapshots WITHOUT a warehouse round-trip. Engine-wide
  * discipline applies: no global sorts (top-k only), windows partitioned by
  * high-cardinality keys, one-row finals as the only IEEE float steps.
  */
object OrderedOps {

  private def cents(c: String) =
    expr(s"CAST(floor($c * 100.0 + 0.5) AS BIGINT)")

  /** X114: schema-evolution union — `unionByName(allowMissingColumns)`
    * aligns two snapshot projections whose columns differ (the day-N vs
    * day-N+1 export problem); absent columns become NULL, matching
    * DuckDB's `UNION ALL BY NAME`. A positional `union` here would be a
    * silent data-corruption bug (status would land in the pri column).
    * Pure projection + union — no shuffle at any scale. */
  private def unionByNameQ(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).where(col("o_orderkey") <= 300)
    val v1 = o.select(col("o_orderkey"), col("o_orderstatus").as("status"),
      cents("o_totalprice").as("total_cents"), lit("a").as("src"))
    val v2 = o.select(col("o_orderkey"), lit("b").as("src"),
      col("o_orderpriority").as("pri"))
    v1.unionByName(v2, allowMissingColumns = true)
      .orderBy("o_orderkey", "src")
  }

  /** X115: keyset (seek) pagination — page 3 of size 100 over the total
    * order (o_orderdate, o_orderkey). The boundary row is fetched with two
    * chained top-k's (TakeOrderedAndProject — bounded heap per partition,
    * never a global sort), broadcast as ONE row, and the page predicate
    * `(d, k) > (bd, bk)` reaches the parquet scan as a pushed filter. The
    * OFFSET formulation this replaces sorts and skips the whole prefix on
    * one reducer — at 100 TB, page 1000 of an OFFSET scan reads 10⁵ rows
    * per partition through a global sort; the keyset scan reads only rows
    * past the boundary. */
  private def keysetPage(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_orderdate"), cents("o_totalprice").as("total_cents"))
    val boundary = ord
      .orderBy(col("o_orderdate"), col("o_orderkey")).limit(200)
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc).limit(1)
      .select(col("o_orderdate").as("bd"), col("o_orderkey").as("bk"))
    ord.join(broadcast(boundary),
        col("o_orderdate") > col("bd") ||
          (col("o_orderdate") === col("bd") && col("o_orderkey") > col("bk")))
      .select("o_orderkey", "o_orderdate", "total_cents")
      .orderBy("o_orderdate", "o_orderkey").limit(100)
  }

  /** X116: deterministic per-group mode. DuckDB's `mode()` and any
    * hash-ordered argmax leave ties unspecified; here the tie-break is
    * explicit (highest count, then lexicographically smallest value) via
    * `row_number` over the COUNTS relation — |groups × distinct values|
    * rows, already aggregated map-side, so the window sorts a tiny
    * relation no matter the fact-table size. */
  def modeOf(df: DataFrame, grp: String, value: String): DataFrame = {
    val counts = df.groupBy(grp, value).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(grp).orderBy(col("cnt").desc, col(value))
    counts.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col(grp), col(value).as("mode_value"), col("cnt"))
  }

  private def modeQ(spark: SparkSession, dir: String): DataFrame =
    modeOf(Tables.orders(spark, dir), "o_orderpriority", "o_orderstatus")
      .select(col("o_orderpriority").as("pri"),
        col("mode_value").as("mode_status"), col("cnt"))
      .orderBy("pri")

  /** X117: rolling 7-row median price per part — the robust-trend
    * alternative to x_ewma's mean. Exact without a percentile UDAF: the
    * ROWS frame is collected (7 elements, bounded), sorted, and the middle
    * element taken — integer cents in, integer cents out, engine-identical.
    * Scale shape: the window partitions by l_partkey (corpus-proportional
    * key count, bounded rows per key), so every group sorts locally — and
    * the output predicate on the PARTITION key pushes below the Window to
    * the scan, so pruning survives the window. Contrast x_quantile_norm's
    * caveat: a window over few huge groups funnels; many bounded groups
    * shard. */
  private def rollingMedian(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(
      col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
      col("l_shipdate"), cents("l_extendedprice").as("pcents"))
    val order = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    val frame = Window.partitionBy("l_partkey").orderBy(order: _*)
      .rowsBetween(-6, Window.currentRow)
    val seq7 = Window.partitionBy("l_partkey").orderBy(order: _*)
    li.withColumn("rn", row_number().over(seq7))
      .withColumn("med7_cents",
        element_at(sort_array(collect_list(col("pcents")).over(frame)), 4))
      .where(col("rn") >= 7 && col("l_partkey") <= 50)
      .select("l_partkey", "l_orderkey", "l_linenumber", "med7_cents")
      .orderBy("l_partkey", "l_orderkey", "l_linenumber")
  }

  /** X118: skewness + excess kurtosis from EXACT integer sufficient sums
    * (Σx…Σx⁴ in BIGINT — x = l_quantity ≤ 50, so Σx⁴ stays under 2⁶³ to
    * ~10¹¹ rows; beyond that move the two highest moments to DECIMAL(38)).
    * The five sums are aggregation-order-independent; the one-row final
    * combines them in doubles where every op (+,−,×,÷,sqrt) is a single
    * correctly-rounded IEEE step on identical inputs WRITTEN IN THE SAME
    * ASSOCIATION ORDER as the oracle — so the doubles agree bitwise
    * (`pow(v, 1.5)` is libm, NOT correctly rounded; v·sqrt(v) is). */
  private def momentsQ(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag").as("flag"), col("l_quantity").cast("long").as("x"))
    li.groupBy("flag")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("x") * col("x")).as("sxxx"),
        sum(col("x") * col("x") * col("x") * col("x")).as("sxxxx"))
      .select(col("flag"), col("n"),
        expr("""round((CAST(sxxx AS DOUBLE) / n
                 - 3.0 * (CAST(sx AS DOUBLE) / n) * (CAST(sxx AS DOUBLE) / n)
                 + 2.0 * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)
                     * (CAST(sx AS DOUBLE) / n))
                / ((CAST(sxx AS DOUBLE) / n
                    - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
                   * sqrt(CAST(sxx AS DOUBLE) / n
                     - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))), 6)
               AS skewness"""),
        expr("""round((CAST(sxxxx AS DOUBLE) / n
                 - 4.0 * (CAST(sx AS DOUBLE) / n) * (CAST(sxxx AS DOUBLE) / n)
                 + 6.0 * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)
                     * (CAST(sxx AS DOUBLE) / n)
                 - 3.0 * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)
                     * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
                / ((CAST(sxx AS DOUBLE) / n
                    - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
                   * (CAST(sxx AS DOUBLE) / n
                    - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)))
                - 3.0, 6) AS kurtosis_excess"""))
      .orderBy("flag")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_union_by_name" -> unionByNameQ _,
    "x_keyset_page" -> keysetPage _,
    "x_mode" -> modeQ _,
    "x_rolling_median" -> rollingMedian _,
    "x_moments" -> momentsQ _)

  val oracles: Map[String, String] = Map(
    "x_union_by_name" ->
      """SELECT * FROM (
        |  SELECT o_orderkey, o_orderstatus AS status,
        |    CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS total_cents,
        |    'a' AS src
        |  FROM orders WHERE o_orderkey <= 300
        |  UNION ALL BY NAME
        |  SELECT o_orderkey, 'b' AS src, o_orderpriority AS pri
        |  FROM orders WHERE o_orderkey <= 300)
        |ORDER BY o_orderkey, src""".stripMargin,
    "x_keyset_page" ->
      """WITH ord AS (SELECT o_orderkey, o_orderdate,
        |    CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS total_cents
        |  FROM orders),
        |b AS (SELECT o_orderdate AS bd, o_orderkey AS bk FROM ord
        |  ORDER BY o_orderdate, o_orderkey LIMIT 1 OFFSET 199)
        |SELECT o_orderkey, o_orderdate, total_cents
        |FROM ord, b
        |WHERE o_orderdate > bd OR (o_orderdate = bd AND o_orderkey > bk)
        |ORDER BY o_orderdate, o_orderkey LIMIT 100""".stripMargin,
    "x_mode" ->
      """WITH counts AS (SELECT o_orderpriority AS pri, o_orderstatus AS st,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM orders GROUP BY 1, 2),
        |r AS (SELECT pri, st, cnt,
        |    row_number() OVER (PARTITION BY pri ORDER BY cnt DESC, st) AS rn
        |  FROM counts)
        |SELECT pri, st AS mode_status, cnt FROM r WHERE rn = 1 ORDER BY pri""".stripMargin,
    "x_rolling_median" ->
      """WITH li AS (SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate,
        |    CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS pcents
        |  FROM lineitem),
        |w AS (SELECT l_partkey, l_orderkey, l_linenumber,
        |    row_number() OVER win AS rn,
        |    list_sort(list(pcents) OVER
        |      (win ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))[4] AS med7_cents
        |  FROM li
        |  WINDOW win AS (PARTITION BY l_partkey
        |                 ORDER BY l_shipdate, l_orderkey, l_linenumber))
        |SELECT l_partkey, l_orderkey, l_linenumber, med7_cents
        |FROM w WHERE rn >= 7 AND l_partkey <= 50
        |ORDER BY l_partkey, l_orderkey, l_linenumber""".stripMargin,
    "x_moments" ->
      """WITH d AS (SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS x
        |  FROM lineitem),
        |s AS (SELECT flag, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x*x) AS BIGINT) AS sxx,
        |    CAST(sum(x*x*x) AS BIGINT) AS sxxx,
        |    CAST(sum(x*x*x*x) AS BIGINT) AS sxxxx
        |  FROM d GROUP BY flag)
        |SELECT flag, n,
        |  round((CAST(sxxx AS DOUBLE) / n
        |     - 3.0 * (CAST(sx AS DOUBLE) / n) * (CAST(sxx AS DOUBLE) / n)
        |     + 2.0 * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)
        |         * (CAST(sx AS DOUBLE) / n))
        |    / ((CAST(sxx AS DOUBLE) / n
        |        - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
        |       * sqrt(CAST(sxx AS DOUBLE) / n
        |         - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))), 6)
        |    AS skewness,
        |  round((CAST(sxxxx AS DOUBLE) / n
        |     - 4.0 * (CAST(sx AS DOUBLE) / n) * (CAST(sxxx AS DOUBLE) / n)
        |     + 6.0 * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)
        |         * (CAST(sxx AS DOUBLE) / n)
        |     - 3.0 * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)
        |         * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
        |    / ((CAST(sxx AS DOUBLE) / n
        |        - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
        |       * (CAST(sxx AS DOUBLE) / n
        |        - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)))
        |    - 3.0, 6) AS kurtosis_excess
        |FROM s ORDER BY flag""".stripMargin)
}
