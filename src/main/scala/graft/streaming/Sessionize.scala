package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: per-user activity sessions.
  *
  * Two implementations of session semantics, in preference order
  * (SURVEY §7.4):
  *  1. [[sessionWindowAgg]] — the built-in `session_window` grouping
  *     (Spark merges overlapping windows in the state store; state is
  *     watermark-bounded).
  *  2. [[sessions]] — explicit `flatMapGroupsWithState` with
  *     event-time timeout, for session logic the built-in can't
  *     express (custom close conditions, per-session payloads).
  *     State per key is O(1) (aggregates only, never the event list),
  *     so keyed state scales to any number of users; the watermark
  *     bounds how long an idle key's state lives.
  */
object Sessionize {

  final case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)

  final case class SessionState(
      startMs: Long,
      lastMs: Long,
      nEvents: Int,
      totalValue: Double,
  )

  final case class SessionOut(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Int,
      total_value: Double,
  )

  /** Built-in session windows: events within `gap` of each other
    * merge into one window per user.
    */
  def sessionWindowAgg(events: DataFrame, gap: String, watermarkDelay: String = "1 minute"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"),
        col("total_value"),
      )

  /** Explicit sessionization: a session closes when the event-time
    * watermark passes last-event + gap; the closed session is emitted
    * exactly once (append semantics).
    */
  def sessions(events: Dataset[SessionEvent], gapMs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout,
      ) { (userId: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
        if (state.hasTimedOut) {
          // watermark passed the session deadline → close and emit
          val s = state.get
          state.remove()
          Iterator.single(
            SessionOut(userId, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.nEvents, s.totalValue)
          )
        } else {
          // flatMapGroupsWithState does NOT auto-drop late rows: an
          // event below the watermark could set a timeout timestamp
          // <= the current watermark, which Spark rejects with an
          // IllegalArgumentException that kills the whole query.
          // Drop genuinely-late rows here (same semantics the built-in
          // session_window applies) and belt-and-braces clamp the
          // timeout past the watermark below.
          val wm = state.getCurrentWatermarkMs()
          val sorted = rows.toSeq.filter(_.ts.getTime >= wm).sortBy(_.ts.getTime)
          var closed = List.empty[SessionOut]
          var cur = state.getOption
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.lastMs <= gapMs =>
                // min/max guards: a cross-batch out-of-order (but not
                // yet late) event must never regress the session
                // bounds or the timeout deadline
                cur = Some(
                  SessionState(
                    math.min(s.startMs, t),
                    math.max(s.lastMs, t),
                    s.nEvents + 1,
                    s.totalValue + e.value,
                  ))
              case Some(s) =>
                closed ::= SessionOut(userId, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.nEvents, s.totalValue)
                cur = Some(SessionState(t, t, 1, e.value))
              case None =>
                cur = Some(SessionState(t, t, 1, e.value))
            }
          }
          cur.foreach { s =>
            state.update(s)
            state.setTimeoutTimestamp(math.max(s.lastMs + gapMs, wm + 1))
          }
          closed.reverseIterator
        }
      }
  }
}
