package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.{CdcQueries, ChangeDetection}
import graft.model.Tables

/** End-to-end ingestion round (reference E1→E3 composite, SURVEY.md §3):
  * detect changed tables → "ingest" each (count its rows, reference A2) →
  * append one audit row per run with the exact `Historico_Execucao` shape
  * (`spark_ingest_slmandicprd.py:104-141`) → the enriched history makes a
  * re-check come back empty.
  *
  * Unlike the reference's serial per-table Dataproc jobs
  * (`Sites/Dag_ingest/ingest_slmandicprd.py:54-83` — README flags the
  * serialism as its scale limit), all tables are processed in ONE distributed
  * plan: semi-join to keep only changed tables' rows, then a single
  * partial+final hash aggregation for every per-table count.
  */
object AuditPipeline {

  /** Audit rows for the current round's changed tables. */
  def auditRows(spark: SparkSession, sfDir: String): DataFrame = {
    // one cached scan feeds catalog, history, AND the row counting — the
    // composite otherwise reads the source table three times here alone
    val events = Tables.events(spark, sfDir).cache()
    val catalog = CdcQueries.catalogOf(events)
    val history = CdcQueries.historyOf(events)
    // changed feeds both the semi-join and the timestamp lookup — cache the
    // (tiny) result instead of re-running the CDC chain per consumer
    val changed = ChangeDetection.changedTables(catalog, history)
      .select("table_name", "update_time").cache()
    val counts = events
      .join(changed, events("event_type") === changed("table_name"), "left_semi")
      .groupBy(col("event_type").as("table_name"))
      .agg(count(lit(1)).as("row_count"))
    counts.join(changed, Seq("table_name"))
      .select(
        col("table_name"),
        lit("events_db").as("name_dataBase"),
        col("row_count"),
        to_date(col("update_time")).as("execution_date"),
        col("update_time").as("execution_time"))
      .orderBy("table_name")
  }

  /** Full round: append audit rows through the K2 sink, then re-run change
    * detection against history ∪ new-audit. Returns (auditLog, recheck);
    * recheck must be empty — asserted in AuditPipelineSpec. */
  def run(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    val sink = Sinks.tempDir("audit")
    Sinks.append(auditRows(spark, sfDir), sink)
    val audit = Sinks.read(spark, sink)
    // the cache populated inside auditRows serves the re-check reads too
    val events = Tables.events(spark, sfDir)
    val newHistory = CdcQueries.historyOf(events)
      .unionByName(audit.select("table_name", "execution_time"))
    val recheck = ChangeDetection.changedTables(
      CdcQueries.catalogOf(events), newHistory)
    (audit.orderBy("table_name"), recheck)
  }
}
