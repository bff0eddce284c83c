package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row-level upsert (SURVEY.md §2B X20) — the step beyond the reference's
  * table-granularity full overwrite (`spark_ingest_slmandicprd.py:99-103`).
  *
  * Without a transactional table format on the classpath this is the
  * window-latest MERGE: union target with updates, keep the newest version
  * per key. On Delta/Iceberg the same call becomes `MERGE INTO … WHEN
  * MATCHED UPDATE WHEN NOT MATCHED INSERT`; the keyed-latest semantics are
  * identical, which is exactly what the oracle checks.
  */
object Upsert {

  /** Latest row per key, versions ordered by `version` columns descending
    * (first column is the primary version; ties broken by the rest —
    * callers must make the full ordering unique for determinism). */
  def latestByKey(df: DataFrame, keys: Seq[String], version: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(version.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** MERGE: apply `updates` over `target`, keyed; newest version wins. */
  def merge(target: DataFrame, updates: DataFrame, keys: Seq[String],
      version: Seq[Column]): DataFrame =
    latestByKey(target.unionByName(updates), keys, version)
}
