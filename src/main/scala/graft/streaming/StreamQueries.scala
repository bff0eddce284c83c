package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.Upsert
import graft.model.Tables

/** Query keys + oracles for event-time windowing, sessionization, and
  * row-level upsert. Batch mode here (DuckDB-checkable); EventStreamSpec
  * asserts the streaming twins produce identical results.
  */
object StreamQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_win_tumbling" -> ((s, dir) =>
      TimeWindows.tumbling(Tables.events(s, dir), "10 minutes")),

    "x_win_sliding" -> ((s, dir) =>
      TimeWindows.sliding(Tables.events(s, dir), "10 minutes", "5 minutes")),

    "x_sessionize" -> ((s, dir) =>
      TimeWindows.sessionize(Tables.events(s, dir), "30 minutes")),

    // X232: INCREMENTAL sessionization — the daily-ingest shape for
    // session tables: the base corpus's sessions are already materialized
    // (the expensive pass, paid once); a delta batch recomputes sessions
    // ONLY for the users it touches (semi-join bounded — a delta event can
    // extend or merge that user's old sessions, so their full history
    // re-sessionizes), and every untouched user's sessions carry over via
    // an anti-join with zero recompute. The oracle sessionizes the WHOLE
    // corpus from scratch: the hash match is the differential proof that
    // incremental == full recompute (the X191 dedup discipline applied to
    // stateful windows).
    "x_session_incremental" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val cut = lit("2024-01-16").cast("date")
      val base = ev.where(col("ts").cast("date") < cut)
      val delta = ev.where(col("ts").cast("date") >= cut)
      val deltaUsers = delta.select("user_id").distinct()
      val carried = TimeWindows.sessionize(base, "30 minutes")
        .join(deltaUsers, Seq("user_id"), "left_anti")
      val touched = TimeWindows.sessionize(
        base.join(deltaUsers, Seq("user_id"), "left_semi").unionByName(delta),
        "30 minutes")
      carried.unionByName(touched).orderBy("user_id", "sess_start")
    }),

    // X159: Spark's NATIVE session_window aggregation pinned against the
    // gap-island SQL formulation. Boundary semantics (pinned empirically
    // in StreamingSpec — an assertion of the opposite FAILED): despite the
    // window end being start+gap "exclusive", an event at exactly
    // gap-distance MERGES; a new session starts only at diff > gap — the
    // same convention as the hand-rolled X19 islands, so the two
    // formulations are interchangeable and the oracle's island form uses
    // the strict `>` test. Comparison runs in exact µs integers
    // (epoch_us both sides); output timestamps truncate to seconds at
    // the boundary (the ns-parquet convention).
    "x_session_window" -> ((s, dir) =>
      Tables.events(s, dir)
        .where(col("user_id") <= 10)
        .groupBy(col("user_id"), session_window(col("ts"), "10 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          date_trunc("second", col("w.start")).as("sess_start"),
          expr("CAST(w.end AS LONG) - CAST(w.start AS LONG)").as("dur_s"),
          col("n_events"))
        .orderBy("user_id", "sess_start")),

    // X20: merge odd-event "updates" over even-event "target"; newest
    // (ts, event_id) per user wins.
    "x_upsert_latest" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          date_trunc("second", col("ts")).as("ts_s"), col("value"))
      val target = ev.where(col("event_id") % 2 === 0)
      val updates = ev.where(col("event_id") % 2 === 1)
      Upsert.merge(target, updates, Seq("user_id"), Seq(col("ts_s"), col("event_id")))
        .orderBy("user_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "x_win_tumbling" ->
      """SELECT CAST(time_bucket(INTERVAL '10 minutes', date_trunc('second', ts)) AS TIMESTAMP) AS w_start,
        |  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,
    "x_win_sliding" ->
      """WITH ev AS (SELECT CAST(date_trunc('second', ts) AS TIMESTAMP) AS tss, event_type, value FROM events),
        |expanded AS (
        |  SELECT time_bucket(INTERVAL '5 minutes', tss) AS w_start, event_type, value FROM ev
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL '5 minutes', tss) - INTERVAL '5 minutes' AS w_start,
        |    event_type, value FROM ev)
        |SELECT w_start, event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM expanded GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,
    // full-recompute oracle: identical to x_sessionize — the incremental
    // path must be indistinguishable from sessionizing everything
    "x_session_incremental" ->
      """WITH ev AS (SELECT user_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS tss, value FROM events),
        |marked AS (SELECT user_id, tss, value,
        |    CASE WHEN lag(tss) OVER w IS NULL
        |         OR tss - lag(tss) OVER w > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_sess
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tss)),
        |sessed AS (SELECT user_id, tss, value,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY tss
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked)
        |SELECT user_id, min(tss) AS sess_start, max(tss) AS sess_end,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM sessed GROUP BY user_id, sid ORDER BY user_id, sess_start""".stripMargin,
    "x_sessionize" ->
      """WITH ev AS (SELECT user_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS tss, value FROM events),
        |marked AS (SELECT user_id, tss, value,
        |    CASE WHEN lag(tss) OVER w IS NULL
        |         OR tss - lag(tss) OVER w > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_sess
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tss)),
        |sessed AS (SELECT user_id, tss, value,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY tss
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked)
        |SELECT user_id, min(tss) AS sess_start, max(tss) AS sess_end,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM sessed GROUP BY user_id, sid ORDER BY user_id, sess_start""".stripMargin,
    "x_session_window" ->
      """WITH e AS (SELECT user_id, ts FROM events WHERE user_id <= 10),
        |m AS (SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 600000000
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM m),
        |g AS (SELECT user_id, min(ts) AS t0, max(ts) AS t1,
        |    CAST(count(*) AS BIGINT) AS n_events
        |  FROM s GROUP BY user_id, sid)
        |SELECT user_id,
        |  CAST(date_trunc('second', t0) AS TIMESTAMP) AS sess_start,
        |  CAST(epoch_us(t1) // 1000000 + 600 - epoch_us(t0) // 1000000 AS BIGINT)
        |    AS dur_s,
        |  n_events
        |FROM g ORDER BY user_id, sess_start""".stripMargin,
    "x_upsert_latest" ->
      """WITH ev AS (SELECT event_id, user_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts_s, value
        |  FROM events),
        |merged AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts_s DESC, event_id DESC) AS rn
        |  FROM ev)
        |SELECT event_id, user_id, ts_s, value FROM merged
        |WHERE rn = 1 ORDER BY user_id""".stripMargin
  )
}
