package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Ingest-time data-cleaning rules.
  *
  * The reference maps MySQL zero-dates to NULL with
  * `zeroDateTimeBehavior=CONVERT_TO_NULL` in its JDBC URL
  * (`Sites/DataProc_Script/spark_ingest_slmandicprd.py:28`) — the driver
  * does the cleaning. Over file-based sources the same rule has to live in
  * the engine, applied before any date parse or comparison.
  */
object Cleaning {

  /** MySQL zero-date / zero-datetime string → NULL, anything else kept. */
  def zeroDateToNull(c: Column): Column =
    when(c.startsWith("0000-00-00"), lit(null).cast("string")).otherwise(c)

  /** Parse a string date column with zero-dates cleaned to NULL first
    * (to_date on "0000-00-00" would otherwise fail or mis-parse). */
  def parseDate(c: Column, fmt: String = "yyyy-MM-dd"): Column =
    to_date(zeroDateToNull(c), fmt)
}
