package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode,
  TimerValues, ValueState}

/** Custom stateful streaming: per-user running aggregates via
  * `flatMapGroupsWithState` — the escape hatch when built-in windowed
  * aggregations can't express the state machine (SURVEY.md §2B X18/X19
  * streaming mode). State is per-key and bounded; at scale the state store
  * shards by the grouping key across executors.
  *
  * Unit-tested in StatefulSpec (no SQL oracle — state semantics are a
  * streaming-only concern; the batch twin is a plain groupBy).
  */
object StatefulOps {

  final case class UserEvent(user_id: Long, event_type: String, value: Double)
  final case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /** Emit the updated running (count, sum) for each user on every batch. */
  def runningTotals(events: Dataset[UserEvent]): Dataset[UserRunning] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[UserEvent], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(userId, 0L, 0.0))
          var n = prev.n_events
          var total = prev.total_value
          batch.foreach { e => n += 1; total += e.value }
          val next = UserRunning(userId, n, total)
          state.update(next)
          Iterator.single(next)
      }
  }

  /** State-v2 twin of [[runningTotals]]: the Spark 4 `transformWithState`
    * API (SPARK-46815). Unlike GroupState, the processor owns named,
    * individually-typed state handles with per-state TTL, can register
    * timers, and can evolve state schema — the surface long-lived 100 TB
    * streaming jobs need. Requires the RocksDB state-store provider (the
    * backend that holds at-scale state off-heap); spec-checked equal to the
    * GroupState implementation and the batch groupBy. */
  final class RunningTotalsProcessor
      extends StatefulProcessor[Long, UserEvent, UserRunning] {
    @transient private var state: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Double)]("running",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble), TTLConfig.NONE)

    override def handleInputRows(userId: Long, batch: Iterator[UserEvent],
        timerValues: TimerValues): Iterator[UserRunning] = {
      val (n0, total0) = Option(state.get()).getOrElse((0L, 0.0))
      var n = n0
      var total = total0
      batch.foreach { e => n += 1; total += e.value }
      state.update((n, total))
      Iterator.single(UserRunning(userId, n, total))
    }
  }

  /** [[runningTotals]] on the state-v2 engine. */
  def runningTotalsV2(events: Dataset[UserEvent]): Dataset[UserRunning] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  final case class TimedEvent(user_id: Long, ts: java.sql.Timestamp)
  final case class ClosedSession(user_id: Long, n_events: Long,
      start_ms: Long, end_ms: Long)

  /** X65b: TIMER-driven session expiry — the state-v2 capability the
    * GroupState API only approximates with per-key timeouts. The processor
    * keeps (n, start, last) per user; on every input batch it re-arms an
    * EVENT-TIME timer at (last event + gap) (deleting the stale one —
    * timers are per-(key, timestamp), not a single slot); when the
    * WATERMARK passes the armed timestamp, `handleExpiredTimer` fires and
    * the CLOSED session is emitted exactly once, state cleared. Sessions
    * therefore close from stream-time progress alone — no poll, no
    * sentinel event, and (unlike processing-time timeouts) replays produce
    * identical output. At scale timers live in the RocksDB state store
    * next to the value state, sharded by key like everything else. */
  final class SessionTimerProcessor(gapMs: Long)
      extends StatefulProcessor[Long, TimedEvent, ClosedSession] {
    @transient private var sess: ValueState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[(Long, Long, Long)]("session",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
          Encoders.scalaLong), TTLConfig.NONE)

    override def handleInputRows(userId: Long, batch: Iterator[TimedEvent],
        timerValues: TimerValues): Iterator[ClosedSession] = {
      var (n, start, last) = Option(sess.get()).getOrElse((0L, Long.MaxValue, 0L))
      batch.foreach { e =>
        val t = e.ts.getTime
        n += 1
        if (t < start) start = t
        if (t > last) last = t
      }
      sess.update((n, start, last))
      // re-arm: exactly one live timer per key, at last-seen + gap.
      // Materialize the listing BEFORE deleting — deleting under a live
      // state-store iterator is the classic invalidation trap.
      val stale = getHandle.listTimers().map(_.asInstanceOf[Long]).toList
      stale.foreach(getHandle.deleteTimer)
      getHandle.registerTimer(last + gapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(userId: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[ClosedSession] = {
      Option(sess.get()) match {
        case Some((n, start, last)) if last + gapMs <= expiredTimerInfo.getExpiryTimeInMs =>
          sess.clear()
          Iterator.single(ClosedSession(userId, n, start, last))
        case _ => Iterator.empty // stale timer raced a fresher session
      }
    }
  }

  /** Sessionize with event-time timers; `events` must carry a watermark on
    * `ts` (the timer clock). Emits only CLOSED sessions (append mode). */
  def sessionsWithTimers(events: Dataset[TimedEvent], gapMs: Long): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new SessionTimerProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
