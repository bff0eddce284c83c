package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (time-travel) join: each left row picks the latest right row with
  * `right.ts <= left.ts` for the same key — the operator Spark lacks
  * natively (SURVEY.md §2 "custom operators" note; DuckDB ships it as
  * `ASOF JOIN`, which is the oracle).
  *
  * Per the preference order (compose built-ins before custom plans), this
  * is the union + running-`last` composition: tag both sides, union, and
  * take the last non-null right payload over a per-key window ordered by
  * (ts, side) — right rows sort before left rows at equal timestamps, which
  * yields the inclusive `>=` match. One shuffle on the key, no join
  * explosion, and the window is a running frame, so it streams: the shape
  * survives 100 TB. Right-side (key, ts) duplicates must be pre-aggregated
  * by the caller for determinism.
  */
object AsOfJoin {

  /** @param left      rows to enrich (must contain `key` and `ts`)
    * @param right     reference rows (exactly (key, ts, value); one row per
    *                  (key, ts))
    * @param outTs     output column holding the matched right timestamp
    * @param outValue  output column holding the matched right value */
  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
      value: String, outTs: String, outValue: String): DataFrame =
    asofImpl(left, right, key, ts, value, outTs, outValue, forward = false)

  /** Forward variant: each left row picks the EARLIEST right row with
    * `right.ts >= left.ts` — "what happened next" enrichment (next
    * deployment after an alert, next purchase after a click). Same
    * union + running-window shape, time reversed. */
  def asofForward(left: DataFrame, right: DataFrame, key: String, ts: String,
      value: String, outTs: String, outValue: String): DataFrame =
    asofImpl(left, right, key, ts, value, outTs, outValue, forward = true)

  private def asofImpl(left: DataFrame, right: DataFrame, key: String, ts: String,
      value: String, outTs: String, outValue: String, forward: Boolean): DataFrame = {
    val tsType = right.schema(ts).dataType
    val valType = right.schema(value).dataType
    val leftTagged = left
      .withColumn("__left", lit(1))
      .withColumn("__r_ts", lit(null).cast(tsType))
      .withColumn("__r_val", lit(null).cast(valType))
    val rightTagged = right.select(
      col(key), col(ts), lit(0).as("__left"),
      col(ts).as("__r_ts"), col(value).as("__r_val"))
    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)
    // at equal timestamps the right row sorts before the left row in both
    // directions, so the match is inclusive (<= backward, >= forward)
    val timeOrder = if (forward) col(ts).desc else col(ts).asc
    val w = Window.partitionBy(key)
      .orderBy(timeOrder, col("__left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(outTs, last(col("__r_ts"), ignoreNulls = true).over(w))
      .withColumn(outValue, last(col("__r_val"), ignoreNulls = true).over(w))
      .where(col("__left") === 1)
      .drop("__left", "__r_ts", "__r_val")
  }
}
