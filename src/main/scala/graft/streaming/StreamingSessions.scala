package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Sessions]] — gap sessionization
  * as `flatMapGroupsWithState` custom state with an EVENT-TIME timeout:
  * a user's open session lives in the state store; a closed session is
  * emitted the moment the batch shows a super-gap successor, or when
  * the WATERMARK passes `end + gap` (the session can provably never
  * grow again — any event that could extend it is behind the watermark
  * and would be dropped). Same emission discipline as Spark's own
  * sessionization canon, same arithmetic as the batch operator: the
  * StreamingSpec parity gate replays a stream and checks the emitted
  * rollups are IDENTICAL to [[graft.operators.Sessions.sessionStats]]
  * on the same rows.
  *
  * State per user is five longs — bounded by the user universe, not
  * the stream. On timeout the state SHRINKS to the session counter
  * instead of being removed (the statefulIngest discipline): a
  * re-appearing user CONTINUES session ids instead of re-issuing
  * (user, session_id) keys that collide with already-emitted rows.
  *
  * Contract vs batch: batch sees all data at once; the stream closes a
  * session once the watermark passes its horizon. An event arriving
  * later than `lateness` behind max-seen ts may be dropped by the
  * watermark — exactly the rows whose batch/stream session assignment
  * could diverge. Within a micro-batch, rows apply in (ts, event_id)
  * order, so intra-batch disorder is free.
  */
object StreamingSessions {

  /** Open-session state: next session id to issue, whether a session
    * is open, and its (n, start, end) in event-time micros. */
  case class SessionState(nextId: Long, open: Boolean,
                          n: Long, startUs: Long, endUs: Long)

  /** The batch `sessionStats` rollup shape. */
  case class SessionRow(user_id: Long, session_id: Long, n_events: Long,
                        start_ts: Long, end_ts: Long, duration: Long)

  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos % 1000000L) / 1000L

  /** stream = (user_id, event time, event_id tie-break); gap in
    * event-time MICROS (inclusive: delta == gap stays in-session, the
    * batch boundary rule). Emits one row per CLOSED session. */
  def sessions(stream: Dataset[(Long, java.sql.Timestamp, Long)],
               gapUs: Long, lateness: String = "1 hour")
      : Dataset[SessionRow] = {
    import stream.sparkSession.implicits._
    require(gapUs >= 1, s"gap must be >= 1 micro, got $gapUs")
    val gapMs = gapUs / 1000L + 1L // ceil to ms for the timeout clock

    val func = (userId: Long,
                rows: Iterator[(Long, java.sql.Timestamp, Long)],
                state: GroupState[SessionState]) => {
      if (state.hasTimedOut) {
        // the watermark passed end + gap: the open session is final
        val s = state.get
        val out =
          if (s.open) Iterator.single(SessionRow(userId, s.nextId, s.n,
            s.startUs, s.endUs, s.endUs - s.startUs))
          else Iterator.empty
        state.update(SessionState(s.nextId + (if (s.open) 1 else 0),
          open = false, 0L, 0L, 0L))
        out
      } else {
        var s = state.getOption
          .getOrElse(SessionState(1L, open = false, 0L, 0L, 0L))
        val closed = Seq.newBuilder[SessionRow]
        // full-precision intra-batch order, tie-broken like the batch op
        val sorted = rows.toSeq.map { case (_, ts, id) => (micros(ts), id) }
          .sortBy(identity)
        sorted.foreach { case (us, _) =>
          if (!s.open)
            s = SessionState(s.nextId, open = true, 1L, us, us)
          else if (us - s.endUs > gapUs) {
            closed += SessionRow(userId, s.nextId, s.n, s.startUs, s.endUs,
              s.endUs - s.startUs)
            s = SessionState(s.nextId + 1, open = true, 1L, us, us)
          } else
            s = s.copy(n = s.n + 1, endUs = math.max(s.endUs, us))
        }
        state.update(s)
        if (s.open)
          // strictly ahead of the current watermark or Spark rejects it
          state.setTimeoutTimestamp(math.max(
            state.getCurrentWatermarkMs() + 1L,
            s.endUs / 1000L + gapMs))
        closed.result().iterator
      }
    }

    stream.withWatermark("_2", lateness)
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(func)
  }
}
