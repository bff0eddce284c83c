package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
}
