package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Arbitrary-stateful streaming sessionization via `flatMapGroupsWithState` —
 * the Structured Streaming analogue of a Kafka Streams `Processor` with a
 * state store (an API surface the reference leaves unused, SURVEY.md §2.12;
 * provided here because gap-sessions are the canonical custom-state op).
 *
 * Semantics: per user, events closer than `gapMs` belong to one session; a
 * session closes when a later event arrives past the gap (emitted
 * immediately) or when the event-time watermark passes `last + gapMs`
 * (emitted via timeout). Exactly the batch semantics of
 * [[graft.operators.Sessions.sessionize]], incrementally.
 *
 * State per key is O(1) (one open session), so total state is bounded by
 * active users, not event volume — the property that keeps this runnable
 * against an unbounded stream on a 1000-executor cluster.
 */
object StreamingSessions {

  case class Ev(user_id: Long, ts: Timestamp)
  case class OpenSession(start: Long, last: Long, n: Long)
  case class Session(user_id: Long, session_start: Timestamp, session_end: Timestamp,
                     n_events: Long)

  /** Events must already carry a watermark on `ts` (see [[sessions]]). */
  private def updateUser(gapMs: Long)(
      uid: Long, evs: Iterator[Ev], state: GroupState[OpenSession]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator(Session(uid, new Timestamp(s.start), new Timestamp(s.last), s.n))
    } else {
      val sorted = evs.toArray.sortBy(_.ts.getTime)
      val closed = Vector.newBuilder[Session]
      var open = state.getOption
      sorted.foreach { e =>
        val t = e.ts.getTime
        open match {
          case Some(s) if t - s.last <= gapMs =>
            open = Some(OpenSession(s.start, math.max(s.last, t), s.n + 1))
          case Some(s) =>
            closed += Session(uid, new Timestamp(s.start), new Timestamp(s.last), s.n)
            open = Some(OpenSession(t, t, 1))
          case None =>
            open = Some(OpenSession(t, t, 1))
        }
      }
      open.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.last + gapMs)
      }
      closed.result().iterator
    }
  }

  /** Append-mode stream of CLOSED sessions. `watermarkDelay` bounds how late
    * events may arrive; the session-close timeout rides the same watermark. */
  def sessions(events: Dataset[Ev], gapMs: Long,
               watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[OpenSession]
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(updateUser(gapMs))
  }
}
