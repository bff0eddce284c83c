package graft.model

import java.time.{Instant, LocalDate}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Audit/lineage record — one row per ingestion run.
  *
  * Exact 5-field schema of the reference's `Historico_Execucao` audit table
  * (`Sites/DataProc_Script/spark_ingest_slmandicprd.py:115-132`): every field
  * nullable, appended after each per-table load, later consumed by the CDC
  * check's MAX/GROUP BY (`verifica_carga_slmandicprd.py:74-79`).
  */
final case class IngestionRun(
    table_name: String,
    name_dataBase: String,
    row_count: java.lang.Long,
    execution_date: LocalDate,   // java.time: tz-unambiguous literals
    execution_time: Instant)

object Audit {
  /** In-memory source with explicit schema (reference S5,
    * `spark_ingest_slmandicprd.py:114-132`) — typed Dataset instead of a
    * hand-built StructType. */
  def runs(spark: SparkSession, rows: Seq[IngestionRun]): Dataset[IngestionRun] = {
    import spark.implicits._
    spark.createDataset(rows)
  }

  def toDF(spark: SparkSession, rows: Seq[IngestionRun]): DataFrame =
    runs(spark, rows).toDF()
}
