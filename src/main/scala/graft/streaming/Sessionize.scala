package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Event-time stateful processing over the event stream — the Structured
  * Streaming surface SURVEY §2.8 maps to (`withWatermark`, `session_window`,
  * `mapGroupsWithState`). The reference has no event-time processing at all
  * (§2.8); these are the Spark-native capabilities the engine adds on top.
  *
  * Scale: both paths are keyed-state operators — state is partitioned by
  * user across executors, watermarks bound state retention, nothing is
  * driver-side.
  */
object Sessionize {

  final case class UserEvent(userId: Long, eventType: String, ts: Timestamp)

  final case class SessionSummary(
      userId: Long,
      nEvents: Long,
      sessionStartMs: Long,
      sessionEndMs: Long
  )

  /** Declarative sessionization: `session_window` with a gap + watermark.
    * Works on a streaming Dataset (append mode after watermark close). */
  def sessionCounts(events: Dataset[UserEvent], gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("userId"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("userId"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))

  /** Imperative sessionization via mapGroupsWithState: custom per-user
    * state with a processing-time idle timeout — the
    * `KeyValueGroupedDataset` stateful extension point. Emits one summary
    * per user per trigger; state evicts on timeout. */
  def statefulSessions(events: Dataset[UserEvent], gapMs: Long = 30 * 60 * 1000L,
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout)
      : Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    val useTimeout = timeout != GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.userId)
      .mapGroupsWithState[SessionSummary, SessionSummary](timeout) {
        (userId: Long, batch: Iterator[UserEvent], state: GroupState[SessionSummary]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            last
          } else {
            val times = batch.map(_.ts.getTime).toSeq
            val prev = state.getOption
            val updated = prev match {
              case Some(sess) if times.isEmpty => sess
              case Some(sess) if times.min - sess.sessionEndMs <= gapMs =>
                // a cross-batch late event may precede the open session's
                // start — min() keeps the span correct (ADVICE r4)
                SessionSummary(userId, sess.nEvents + times.length,
                  math.min(sess.sessionStartMs, times.min),
                  math.max(sess.sessionEndMs, times.max))
              case _ if times.nonEmpty =>
                SessionSummary(userId, times.length.toLong, times.min, times.max)
              case _ => SessionSummary(userId, 0, 0, 0)
            }
            state.update(updated)
            if (useTimeout) state.setTimeoutDuration(gapMs)
            updated
          }
      }
  }

  /** Imperative sessionization via flatMapGroupsWithState — the 0..N-emit
    * stateful extension point (§2.8): a batch of events may CLOSE any
    * number of finished sessions (each emitted exactly once, when a later
    * event arrives past the gap) while the live session stays in state.
    * Contrast with [[statefulSessions]], which re-emits the running
    * session every trigger. Append mode: only closed, final sessions flow
    * downstream.
    *
    * With `eventTimeTimeout=true` (requires `withWatermark` upstream) an
    * idle session also closes when the watermark passes its end + gap —
    * the final session per user EMITS and its state EXPIRES, bounding
    * state for continuous ingest (ADVICE r4; with NoTimeout the last open
    * session per user stays in state forever and never emits). */
  def closedSessions(events: Dataset[UserEvent], gapMs: Long = 30 * 60 * 1000L,
      eventTimeTimeout: Boolean = false): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    val timeout =
      if (eventTimeTimeout) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionSummary, SessionSummary](
        OutputMode.Append(), timeout) {
        (userId: Long, batch: Iterator[UserEvent], state: GroupState[SessionSummary]) =>
          if (state.hasTimedOut) { // watermark passed end + gap: final close
            val last = state.get
            state.remove()
            Iterator.single(last)
          } else {
            // fold this batch's events (in event-time order) through the
            // open session, closing + emitting whenever a gap is crossed
            val closed = Vector.newBuilder[SessionSummary]
            var open = state.getOption.orNull
            batch.map(_.ts.getTime).toSeq.sorted.foreach { t =>
              open match {
                case null =>
                  open = SessionSummary(userId, 1L, t, t)
                case sess if t - sess.sessionEndMs <= gapMs =>
                  // a cross-batch late event may precede the open session's
                  // start — min() keeps the span correct (ADVICE r4)
                  open = SessionSummary(userId, sess.nEvents + 1,
                    math.min(sess.sessionStartMs, t), math.max(sess.sessionEndMs, t))
                case sess =>
                  closed += sess // gap crossed → the previous session is final
                  open = SessionSummary(userId, 1L, t, t)
              }
            }
            if (open != null) {
              state.update(open) // live session stays in state
              if (eventTimeTimeout)
                state.setTimeoutTimestamp(open.sessionEndMs + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  final case class UserCount(userId: Long, nEvents: Long)

  /** Per-user running totals on `transformWithState` — Spark 4's
    * successor to `mapGroupsWithState` (typed named-state handles, TTL,
    * timers; RocksDB-backed state store required). State here is one
    * `ValueState[Long]` per user with an optional TTL so idle users
    * age out of the store — the bounded-state discipline a 100 TB
    * continuous pipeline needs. */
  final class RunningCountProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, UserEvent, UserCount] {
    @transient private var count: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong, ttl)
    override def handleInputRows(userId: Long, rows: Iterator[UserEvent],
        timerValues: TimerValues): Iterator[UserCount] = {
      val c = (if (count.exists()) count.get() else 0L) + rows.size
      count.update(c)
      Iterator.single(UserCount(userId, c))
    }
  }

  /** Running per-user event counts with TTL'd state. Requires
    * `spark.sql.streaming.stateStore.providerClass =
    * ...RocksDBStateStoreProvider` on the session. */
  def runningCounts(events: Dataset[UserEvent],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[UserCount] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .transformWithState(new RunningCountProcessor(ttl),
        TimeMode.None(), OutputMode.Update())
  }

  /** Output-mode helper for the declarative path (append after watermark). */
  val sessionOutputMode: OutputMode = OutputMode.Append()
}
