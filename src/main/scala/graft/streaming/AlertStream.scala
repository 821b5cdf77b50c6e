package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Typed event projection consumed by the alert operator. */
case class UserEvent(user_id: Long, value: Double, ts: java.sql.Timestamp)

/** Per-user activity-session state (top-level: encoder codegen needs
  * public, non-nested case classes).
  */
case class UserActivity(count: Long, total: Double, lastEpochSec: Long)

/** An emitted alert: `kind` is "velocity" (burst inside a session) or
  * "went_silent" (event-time timer fired past the silence horizon).
  */
case class FraudAlert(user_id: Long, kind: String, n_events: Long,
    total_value: Double, at_epoch: Long)

/** Timer-driven fraud alerting — the `flatMapGroupsWithState` member of the
  * stateful-operator family (CorpusStream covers `mapGroupsWithState` and
  * the Spark 4 `transformWithState`): 0..N outputs per group invocation,
  * and the EVENT-TIME TIMEOUT path, which is the piece a velocity/
  * silence monitor genuinely needs — "this card went quiet" is an alert
  * with NO triggering row, so it can only come from a timer, never from
  * `handleInputRows`-style per-record logic.
  *
  * Semantics (mirrors the alerting stage the reference's streaming roadmap
  * sketches on top of `streaming/kafka_to_influxdb.py`'s parse→derive
  * chain): per user, accumulate events into an activity session; the
  * FIRST time the session's event count crosses [[VelocityThreshold]]
  * emit a "velocity" alert (once per session — a monitor that re-fires
  * every batch is noise); when the watermark passes the last event by
  * [[SilenceHorizonSec]] the timer fires, a "went_silent" alert carries
  * the session totals out, and the state is removed — so state size is
  * bounded by ACTIVE users within the horizon, not all users ever seen.
  *
  * Scale: one shuffle per micro-batch on user_id; state is one small row
  * per active user; timeout eviction is what keeps a year-long query's
  * store from accreting every card ever swiped. Output mode is Append —
  * alerts are immutable facts, safe for an at-least-once sink.
  */
object AlertStream {

  /** Session event count that trips the "velocity" alert. */
  val VelocityThreshold = 3L

  /** Seconds of event-time silence after which a session closes. */
  val SilenceHorizonSec = 120L

  /** Watermark delay for the event stream (late-data allowance). */
  val WatermarkDelay = "1 minute"

  /** Parsed events (StreamPipeline.parse shape) → alert stream. */
  def alerts(parsed: DataFrame)(implicit s: SparkSession): Dataset[FraudAlert] = {
    import s.implicits._
    parsed
      .withWatermark("ts", WatermarkDelay)
      .select(col("user_id"), col("value"), col("ts"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserActivity, FraudAlert](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[UserEvent], state: GroupState[UserActivity]) =>
          if (state.hasTimedOut) {
            // timer path: no input rows exist for this group in this batch
            val st = state.get
            state.remove()
            Iterator.single(
              FraudAlert(uid, "went_silent", st.count, st.total, st.lastEpochSec))
          } else {
            val prev = state.getOption.getOrElse(UserActivity(0L, 0.0, 0L))
            val evs = rows.toSeq
            val next = UserActivity(
              prev.count + evs.size,
              prev.total + evs.map(_.value).sum,
              math.max(prev.lastEpochSec, evs.map(_.ts.getTime / 1000L).max))
            state.update(next)
            // arm/extend the silence timer past the newest event seen
            state.setTimeoutTimestamp(
              (next.lastEpochSec + SilenceHorizonSec) * 1000L)
            if (prev.count < VelocityThreshold && next.count >= VelocityThreshold)
              Iterator.single(FraudAlert(uid, "velocity", next.count,
                next.total, next.lastEpochSec))
            else Iterator.empty
          }
      }
  }

  /** Output mode contract: alerts are append-only facts. */
  val AlertOutputMode: OutputMode = OutputMode.Append()
}
