package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowing over the `events` stream table (SURVEY.md §2B
  * X18/X19), batch mode — the same expressions run under Structured
  * Streaming (see [[EventStream]]).
  *
  * All timestamps are second-truncated before windowing so batch, streaming,
  * and the DuckDB oracle agree on boundary decisions regardless of the
  * source's nanosecond precision.
  */
object TimeWindows {

  private def tsSec = date_trunc("second", col("ts"))

  /** Tumbling windows: one aggregation row per (bucket, event_type). */
  def tumbling(events: DataFrame, width: String): DataFrame =
    events.groupBy(window(tsSec, width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("w_start", "event_type")

  /** Sliding windows (width > slide ⇒ each event lands in width/slide
    * buckets — Spark expands via an internal generator, no self-join). */
  def sliding(events: DataFrame, width: String, slide: String): DataFrame =
    events.groupBy(window(tsSec, width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("w_start", "event_type")

  /** Gap-based sessions per user (`session_window`): a session extends while
    * successive events arrive within `gap` of the previous one — an event
    * exactly `gap` later still merges; only a strictly larger gap starts a
    * new session (pinned in StreamingSpec). */
  def sessionize(events: DataFrame, gap: String): DataFrame =
    events.groupBy(col("user_id"), session_window(tsSec, gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        min(tsSec).as("sess_start"),
        max(tsSec).as("sess_end"),
        round(sum("value"), 2).as("sum_value"))
      .select(col("user_id"), col("sess_start"), col("sess_end"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "sess_start")
}
