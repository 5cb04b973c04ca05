package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization with explicit keyed state — the
  * Structured Streaming counterpart of `graft.ops.Sessionize` (batch) and
  * the streaming generalization of the reference's replay sessions
  * (src/replay/types.rs:275-300).
  *
  * State design for scale: one `SessionState` per ACTIVE key, bounded by
  * the event-time timeout — the watermark closes idle sessions and removes
  * their state, so state size tracks concurrently-active users, not
  * history. In-batch gaps close sessions immediately; cross-batch gaps
  * close via `GroupStateTimeout.EventTimeTimeout` when the watermark
  * passes lastSeen + gap. All processing is per-key inside
  * `flatMapGroupsWithState`; the only shuffle is the groupByKey hash
  * partition on userId.
  */
object Sessionizer {

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp,
                                event_type: String)
  final case class SessionState(startMs: Long, lastSeenMs: Long, nEvents: Long)
  final case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
                                 session_end: java.sql.Timestamp,
                                 n_events: Long, duration_ms: Long)

  private def close(userId: Long, s: SessionState): ClosedSession =
    ClosedSession(userId, new java.sql.Timestamp(s.startMs),
      new java.sql.Timestamp(s.lastSeenMs), s.nEvents, s.lastSeenMs - s.startMs)

  def processKey(gapMs: Long)(
      userId: Long, events: Iterator[SessionEvent],
      state: GroupState[SessionState]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(close(userId, _))
      state.remove()
      out.iterator
    } else {
      // micro-batch events arrive unordered — order by event time first
      val evs = events.toArray.sortBy(e => (e.ts.getTime, e.event_type))
      var closed = List.empty[ClosedSession]
      var cur = state.getOption
      evs.foreach { e =>
        val ms = e.ts.getTime
        cur match {
          case Some(s) if ms - s.lastSeenMs <= gapMs =>
            // min() on start: a cross-batch late event (older than the
            // session start but above the watermark) must extend the
            // session backwards, not silently inherit the later start
            cur = Some(SessionState(math.min(s.startMs, ms),
              math.max(s.lastSeenMs, ms), s.nEvents + 1))
          case Some(s) => // in-batch gap: close and start fresh
            closed ::= close(userId, s)
            cur = Some(SessionState(ms, ms, 1))
          case None =>
            cur = Some(SessionState(ms, ms, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // close when the watermark passes the gap after the last event
        state.setTimeoutTimestamp(s.lastSeenMs + gapMs)
      }
      closed.reverse.iterator
    }
  }

  /** events(user_id, ts, event_type) stream → closed sessions stream */
  def sessionize(events: Dataset[SessionEvent], gapSeconds: Long,
                 watermark: String): Dataset[ClosedSession] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[ClosedSession]
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        processKey(gapSeconds * 1000L))
  }
}
