package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Spark-type → warehouse-DDL-type mapping + DDL synthesis.
  *
  * The reference walks `df.schema.fields` and maps each Spark type name to a
  * BigQuery DDL type through a hand-written dict with a STRING fallback
  * (`Sites/DataProc_Script/spark_ingest_slmandicprd.py:68-97`, identical at
  * `TOTVS/DataProc_Script/spark_ingest_TOTVSAUDIT.py:64-77`), then emits
  * `CREATE TABLE IF NOT EXISTS ...`. Re-expressed as a total function over
  * `DataType` (ScalaCheck-checked for totality in TypeMappingSpec).
  */
object TypeMapping {

  /** Total: every DataType maps to a DDL type string; unknowns fall back to
    * STRING exactly like the reference's dict default
    * (`spark_ingest_slmandicprd.py:81`). */
  def ddlType(dt: DataType): String = dt match {
    case StringType                            => "STRING"
    case IntegerType | LongType | ShortType    => "INT64"
    case ByteType                              => "INT64"
    case DoubleType | FloatType                => "FLOAT64"
    case BooleanType                           => "BOOL"
    case TimestampType | TimestampNTZType      => "TIMESTAMP"
    case DateType                              => "DATE"
    case BinaryType                            => "BYTES"
    case _                                     => "STRING"
  }

  /** (column, ddl_type) pairs for a schema — reference F3 introspection
    * (`spark_ingest_slmandicprd.py:65,84-87`). */
  def schemaDdl(schema: StructType): Seq[(String, String)] =
    schema.fields.toSeq.map(f => f.name -> ddlType(f.dataType))

  /** Full CREATE TABLE statement — reference K3 DDL synthesis
    * (`spark_ingest_slmandicprd.py:83-97`). */
  def createTableSql(table: String, schema: StructType): String = {
    val cols = schemaDdl(schema).map { case (n, t) => s"`$n` $t" }.mkString(", ")
    s"CREATE TABLE IF NOT EXISTS `$table` ($cols)"
  }

  /** DDL of a DataFrame as a DataFrame (column_name, ddl_type, ordinal) —
    * lets the mapping participate in the oracle-checked query matrix. */
  def ddlAsDataFrame(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    schemaDdl(df.schema).zipWithIndex
      .map { case ((n, t), i) => (n, t, i + 1) }
      .toDF("column_name", "ddl_type", "ordinal")
  }
}
