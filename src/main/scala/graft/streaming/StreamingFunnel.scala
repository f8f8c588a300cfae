package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming ordered-funnel progression via `flatMapGroupsWithState` — the
 * incremental twin of [[graft.operators.EventAnalytics.funnelSteps]] (the
 * [[StreamingSessions]] custom-state pattern applied to conversion
 * tracking): per user, stage 1 fires at the first `steps(0)` event, stage
 * i at the first `steps(i-1)` event STRICTLY after stage i−1 and within
 * `withinHours` of it, and every stage-reach is emitted AS IT HAPPENS —
 * the funnel-at-ingest audit ("did this pipeline run reach stage k?")
 * instead of a nightly batch recompute.
 *
 * State per user is exactly k first-reach timestamps, SET-ONCE: under
 * in-event-time-order delivery (Kafka per-key ordering, or any
 * watermark-sorted feed) an event that could improve a first-reach has by
 * definition already arrived, so a set timestamp is final and each
 * (user, stage) emits exactly once — append-safe with no retraction.
 * In-batch arrival order does not matter (events are sorted per trigger);
 * cross-batch REGRESSIONS in event time follow at-arrival semantics, the
 * same documented bound as [[StreamingSessions]]. Ties are safe under any
 * order: every stage condition is strict (`ts > t_{i-1}`), so equal
 * timestamps resolve identically to the batch min().
 *
 * Total state is k longs × users that ENTERED the funnel (stage-1
 * reached) — the same per-user footprint as the batch operator's
 * aggregation row, with no event buffering. The opt-in
 * `expireStalled` flag adds an event-time timeout at
 * `t_lastReach + withinHours` (past it no further stage can fire, so
 * dropping the state loses nothing a stalled funnel could still emit).
 * It defaults OFF because expiry is a deliberate divergence from the
 * batch verdict: once state is dropped, a LATER stage-1 event (which
 * must carry ts > watermark > t_lastReach + withinHours to survive the
 * watermark filter) re-enters the funnel and re-emits stage reaches,
 * whereas batch pins each user to their FIRST stage-1 event forever —
 * restart-after-quiescence semantics vs first-attempt-only semantics.
 */
object StreamingFunnel {

  case class FEv(user_id: Long, event_type: String, ts: Timestamp)
  case class StageReach(user_id: Long, step_idx: Int, stage: String,
                        stage_ts: Timestamp)
  case class FunnelState(reached: Seq[Long]) // epoch MICROS; 0 = unset

  // java.sql.Timestamp.getTime is MILLIS — comparing on it would truncate
  // the micro component the event feed carries and flip strict `>`
  // comparisons at sub-milli gaps; carry exact micros end to end
  private def toMicros(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000
  private def fromMicros(us: Long): Timestamp = {
    val ts = new Timestamp(us / 1000)
    ts.setNanos(((us % 1000000L) * 1000L).toInt)
    ts
  }

  private def updateUser(steps: IndexedSeq[String], withinUs: Long,
                         expire: Boolean)(
      uid: Long, evs: Iterator[FEv],
      state: GroupState[FunnelState]): Iterator[StageReach] = {
    if (expire && state.hasTimedOut) {
      // watermark passed lastReach + within: no strict-within stage can
      // fire anymore — drop the k-long row (the stalled funnel stays
      // exactly as emitted; only re-entry by a genuinely-later stage-1
      // event becomes possible, the documented divergence)
      state.remove()
      return Iterator.empty
    }
    val k = steps.size
    val t = state.getOption.map(_.reached.toArray)
      .getOrElse(Array.fill(k)(0L))
    val out = Vector.newBuilder[StageReach]
    evs.toArray.map(e => (toMicros(e.ts), e.event_type))
      .sortBy(_._1).foreach { case (ts, tpe) =>
        val i = steps.indexOf(tpe)
        if (i >= 0 && t(i) == 0L) {
          val fires =
            if (i == 0) true
            else t(i - 1) != 0L && ts > t(i - 1) && ts <= t(i - 1) + withinUs
          if (fires) {
            t(i) = ts
            out += StageReach(uid, i + 1, steps(i), fromMicros(ts))
          }
        }
      }
    val res = out.result()
    if (res.nonEmpty) state.update(FunnelState(t.toSeq))
    if (expire && state.exists) {
      // reaches fill a prefix (stage i needs t(i-1) set), so the largest
      // set timestamp IS the last reach; ceil micros→millis so the
      // timeout never fires before the exact instant. A group that got
      // DATA after its deadline passed never times out (Spark only fires
      // timeouts for data-less groups) and setTimeoutTimestamp rejects
      // timestamps at/behind the watermark — drop such state directly.
      val deadlineMs = (t.max + withinUs + 999L) / 1000L
      if (deadlineMs > state.getCurrentWatermarkMs()) state.setTimeoutTimestamp(deadlineMs)
      else state.remove()
    }
    res.iterator
  }

  /** Append-mode stream of stage-reach records, exactly one per
    * (user, stage) while state lives. `steps` must be distinct; events of
    * other types are ignored (pre-filter for scan pruning — this method
    * only sees what the caller ships). `expireStalled` turns on the
    * event-time timeout documented above (state dropped once the
    * watermark passes lastReach + withinHours; funnels may then
    * re-enter — keep it off when batch-verdict equality matters). */
  def stageReaches(events: Dataset[FEv], steps: Seq[String],
                   withinHours: Int,
                   watermarkDelay: String = "10 minutes",
                   expireStalled: Boolean = false): Dataset[StageReach] = {
    require(steps.size >= 2, s"stageReaches: need >= 2 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size, "stageReaches: steps must be distinct")
    require(withinHours > 0, s"stageReaches: withinHours must be positive, got $withinHours")
    implicit val outEnc = Encoders.product[StageReach]
    implicit val stateEnc = Encoders.product[FunnelState]
    val timeout =
      if (expireStalled) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[FunnelState, StageReach](
        OutputMode.Append, timeout)(
        updateUser(steps.toIndexedSeq, withinHours * 3600000000L, expireStalled))
  }
}
