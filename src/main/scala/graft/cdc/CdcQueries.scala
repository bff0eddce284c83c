package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** CDC query keys over the testdata stand-ins.
  *
  * The `events` table plays the source catalog: each `event_type` is a
  * "table", its latest event timestamp the catalog `update_time`
  * (reference reads `information_schema.tables(table_name, update_time)`,
  * `Sites/DataProc_Script/verifica_carga_slmandicprd.py:56-62`). A filtered
  * subset plays the audit history; the engine re-aggregates it with
  * MAX/GROUP BY exactly like the reference's BigQuery query
  * (`verifica_carga_slmandicprd.py:74-79`).
  *
  * `date_trunc(second)` everywhere `ts` surfaces: events.ts is
  * nanosecond-precision parquet; Spark truncates to µs — truncating to whole
  * seconds on both engine and oracle sides makes the comparison exact
  * (SURVEY.md §7.4).
  */
object CdcQueries {

  /** Catalog stand-in: (table_name, update_time). */
  def catalog(spark: SparkSession, sfDir: String): DataFrame =
    catalogOf(Tables.events(spark, sfDir))

  /** Catalog from an already-loaded (possibly cached) events relation —
    * composite pipelines scan events several times and shouldn't pay the
    * source read per derivation. */
  def catalogOf(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type").as("table_name"))
      .agg(max(date_trunc("second", col("ts"))).as("update_time"))

  /** Raw history stand-in: (table_name, execution_time) — many rows per
    * table; 'click' never ingested (exercises the anti-join branch), only
    * even-user events ingested (so some tables have strictly newer source
    * data → the strict-`>` branch fires at every SF, checked empirically). */
  def history(spark: SparkSession, sfDir: String): DataFrame =
    historyOf(Tables.events(spark, sfDir))

  /** History from an already-loaded events relation (see [[catalogOf]]). */
  def historyOf(events: DataFrame): DataFrame =
    events
      .where(col("user_id") % 2 === 0 && col("event_type") =!= "click")
      .select(col("event_type").as("table_name"),
        date_trunc("second", col("ts")).as("execution_time"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_changed_tables" -> ((s, dir) =>
      ChangeDetection.changedTables(catalog(s, dir), history(s, dir))),
    "join_anti" -> ((s, dir) =>
      ChangeDetection.neverIngested(catalog(s, dir), history(s, dir))),
    "agg_max_groupby" -> ((s, dir) =>
      ChangeDetection.latestRuns(history(s, dir)).orderBy("table_name"))
  )

  private val catalogSql =
    """SELECT event_type AS table_name, CAST(date_trunc('second', max(ts)) AS TIMESTAMP) AS update_time
      |FROM events GROUP BY event_type""".stripMargin
  private val historySql =
    """SELECT event_type AS table_name, CAST(date_trunc('second', ts) AS TIMESTAMP) AS execution_time
      |FROM events WHERE user_id % 2 = 0 AND event_type <> 'click'""".stripMargin

  val oracles: Map[String, String] = Map(
    "cdc_changed_tables" ->
      s"""WITH catalog AS ($catalogSql), history AS ($historySql)
         |SELECT c.table_name, c.update_time, h.last_exec
         |FROM catalog c LEFT JOIN
         |  (SELECT table_name, max(execution_time) AS last_exec FROM history GROUP BY table_name) h
         |  USING (table_name)
         |WHERE h.last_exec IS NULL OR (c.update_time IS NOT NULL AND c.update_time > h.last_exec)
         |ORDER BY c.table_name""".stripMargin,
    "join_anti" ->
      s"""WITH catalog AS ($catalogSql), history AS ($historySql)
         |SELECT c.table_name, c.update_time FROM catalog c
         |WHERE NOT EXISTS (SELECT 1 FROM history h WHERE h.table_name = c.table_name)
         |ORDER BY c.table_name""".stripMargin,
    "agg_max_groupby" ->
      s"""WITH history AS ($historySql)
         |SELECT table_name, max(execution_time) AS last_exec
         |FROM history GROUP BY table_name ORDER BY table_name""".stripMargin
  )
}
