package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming gap-based sessionization with CUSTOM STATE — the
 * `flatMapGroupsWithState` surface of the engine (build brief: "watermarks +
 * windowed aggs; mapGroupsWithState/flatMapGroupsWithState for custom
 * state"). Batch-side sessionization lives in
 * [[graft.ops.TextOps.sessionize]] (one window, SQL-oracled); this is the
 * unbounded-stream variant where a session must close when the event-time
 * watermark passes its gap horizon.
 *
 * State per user = the one OPEN session (start/end/count). An incoming
 * micro-batch's events are sorted by (ts, event_id) and folded: events
 * within `gapSeconds` of the open session extend it; a larger gap CLOSES
 * the session (emitted downstream) and opens a new one. On event-time
 * timeout (watermark > session end + gap) the final open session is
 * emitted and the state removed — so every session is emitted exactly
 * once, and state size is O(active users), not O(history).
 */
object StreamSessions {

  final case class Ev(user_id: Long, event_id: Long, ts: java.sql.Timestamp)
  final case class OpenSession(startMs: Long, endMs: Long, n: Int)
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Int)

  def sessionize(events: Dataset[Ev], gapSeconds: Long,
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    implicit val sessEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val longEnc = Encoders.scalaLong
    val gapMs = gapSeconds * 1000L

    def fold(userId: Long, evs: Iterator[Ev],
        state: GroupState[OpenSession]): Iterator[Session] = {
      def emit(s: OpenSession) = Session(userId,
        new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.endMs), s.n)
      if (state.hasTimedOut) {
        // watermark passed end+gap: no event can extend this session anymore
        val out = state.getOption.map(emit).toSeq
        state.remove()
        out.iterator
      } else {
        val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        val closed = Seq.newBuilder[Session]
        var open = state.getOption
        sorted.foreach { e =>
          val t = e.ts.getTime
          open match {
            case Some(s) if t - s.endMs <= gapMs =>
              open = Some(OpenSession(s.startMs, math.max(s.endMs, t), s.n + 1))
            case Some(s) =>
              closed += emit(s)
              open = Some(OpenSession(t, t, 1))
            case None =>
              open = Some(OpenSession(t, t, 1))
          }
        }
        open.foreach { s =>
          state.update(s)
          // a timeout at-or-before the current watermark is rejected by
          // Spark; if late events put the session's horizon behind the
          // watermark, arm the earliest legal timeout so it closes on the
          // next trigger instead of crashing the query
          state.setTimeoutTimestamp(
            math.max(s.endMs + gapMs, state.getCurrentWatermarkMs() + 1))
        }
        closed.result().iterator
      }
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fold)
  }
}
