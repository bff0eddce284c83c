package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change detection — the reference pipeline's core semantic.
  *
  * The reference computes "which source tables changed since the last
  * ingestion?" with a driver-side Python dict loop
  * (`Sites/DataProc_Script/verifica_carga_slmandicprd.py:87-100`, identical at
  * `TOTVS/DataProc_Script/verifica_carga_TOTVSAUDIT.py:91-104`). Its tri-state
  * rules, preserved here exactly:
  *
  *   1. table has no history row (never ingested)       → INCLUDE
  *      (checked FIRST, `verifica_carga_slmandicprd.py:95-96` — so a
  *      never-ingested table is included even when its source
  *      `update_time` is NULL, as with InnoDB `information_schema`
  *      where `update_time` is often unset)
  *   2. source `update_time` IS NULL                    → SKIP
  *      (`verifica_carga_slmandicprd.py:97-98`)
  *   3. source `update_time` strictly > last execution  → INCLUDE
  *      (`:99` — strict `>`, not `>=`)
  *
  * Spark-native re-expression: latest-run aggregation (MAX GROUP BY, reference
  * A1) + left-outer join + filter, fully distributed — no `collect()`, no
  * driver loop, so it scales to catalogs of any size. The history side is
  * aggregated to one row per table *before* the join, so the join input is
  * bounded by the number of distinct tables and Catalyst/AQE will broadcast it
  * when small.
  */
object ChangeDetection {

  /** Latest execution per table from the raw audit history
    * (reference A1: `SELECT table_name, MAX(execution_time) AS last_exec
    * ... GROUP BY table_name`, `verifica_carga_slmandicprd.py:74-79`).
    * Expects columns (table_name, execution_time). */
  def latestRuns(history: DataFrame): DataFrame =
    history.groupBy("table_name")
      .agg(max("execution_time").as("last_exec"))

  /** The CDC join: catalog (table_name, update_time) vs raw history
    * (table_name, execution_time) → changed tables with their timestamps,
    * ordered by table_name for determinism. */
  def changedTables(catalog: DataFrame, history: DataFrame): DataFrame = {
    val latest = latestRuns(history)
    // branch order matches the reference: the never-ingested branch wins
    // before the NULL-update_time skip
    catalog.join(latest, Seq("table_name"), "left_outer")
      .where(col("last_exec").isNull ||
        (col("update_time").isNotNull && col("update_time") > col("last_exec")))
      .select("table_name", "update_time", "last_exec")
      .orderBy("table_name")
  }

  /** Never-ingested tables alone (reference J3, the `bq_time is None` branch
    * at `verifica_carga_slmandicprd.py:95-96`) ≡ left-anti join. */
  def neverIngested(catalog: DataFrame, history: DataFrame): DataFrame =
    catalog.join(history, Seq("table_name"), "left_anti")
      .orderBy("table_name")
}
