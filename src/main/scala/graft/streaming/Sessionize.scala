package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
                SessionSummary(userId, sess.nEvents + times.length,
                  sess.sessionStartMs, math.max(sess.sessionEndMs, times.max))
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

  /** Output-mode helper for the declarative path (append after watermark). */
  val sessionOutputMode: OutputMode = OutputMode.Append()
}
