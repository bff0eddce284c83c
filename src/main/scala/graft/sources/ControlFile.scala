package graft.sources

import scala.util.Try

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Changed-tables control file — the handoff between change detection and
  * ingestion.
  *
  * The reference serializes the changed-table list as a JSON blob on GCS
  * (`Sites/DataProc_Script/verifica_carga_slmandicprd.py:102-111`) and the
  * ingest DAG downloads + parses it with defensive handling: missing file or
  * bad JSON → empty list → no-op run
  * (`Sites/Dag_ingest/ingest_slmandicprd.py:28-51`). Re-expressed as a
  * one-column DataFrame JSON round-trip; the defensive branch becomes
  * `Try(...).getOrElse(empty)`.
  */
object ControlFile {
  val schema: StructType = StructType(Seq(StructField("table_name", StringType)))

  def write(changed: DataFrame, path: String): Unit =
    changed.select("table_name").coalesce(1).write.mode("overwrite").json(path)

  /** Missing path / unparseable content → empty DataFrame (reference O8).
    * FAILFAST mode makes corrupt JSON throw (default PERMISSIVE would
    * silently yield null rows instead of the documented empty no-op). */
  def read(spark: SparkSession, path: String): DataFrame =
    Try {
      val df = spark.read.schema(schema)
        .option("mode", "FAILFAST").json(path)
      df.count() // force the read so missing paths / corrupt JSON throw here
      df
    }.getOrElse(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
}
