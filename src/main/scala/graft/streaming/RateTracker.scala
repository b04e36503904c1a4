package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Streaming counterpart of `ops.Sessionize.evBots`: the per-user
  * inter-arrival gap feed, emitted CONTINUOUSLY — every consecutive
  * per-user transition (ANY event type: bot cadence is a property of the
  * whole client, unlike GapsTracker's per-(user, type) spectra) emits one
  * (user_id, gap_us) increment row. The bot verdict needs n/Σgap/Σgap² —
  * all combinable — so aggregating the sink through
  * `ops.Sessionize.botsFromGaps` yields EXACTLY the batch operator's
  * per-user cv table (the GapsTracker preimage discipline; StreamingSpec
  * pins the parity hash-exactly, decimal sums and all).
  *
  * Per-user state is the last (ts, event_id) — O(1), independent of
  * volume. Within a trigger, events fold in (ts, event_id) order (the
  * batch LAG window's order); ACROSS triggers an in-watermark event that
  * sorts at-or-before the carried last cannot re-open an already emitted
  * gap with O(1) state — it is DROPPED rather than double-counted (the
  * StreaksTracker never-regress rule, this family's documented
  * cross-trigger approximation). [[rateStreamExact]] buffers each user's
  * (ts, event_id) pairs until the quiesce timeout and folds them whole —
  * exact for everything the watermark admitted, at O(events in window)
  * state. Batch mode ([[rateBatch]]) sees each group whole: EXACT.
  */
object RateTracker {

  case class REv(ts: Timestamp, event_id: Long, user_id: Long)

  /** lastUs = Long.MinValue means no event carried yet. */
  case class RState(lastUs: Long, lastEid: Long, tMax: Long)

  case class RBuf(us: Seq[Long], eids: Seq[Long], tMax: Long)

  case class RateRow(user_id: Long, gap: Long)

  private val Unset: Long = Long.MinValue

  private def tsToUs(t: Timestamp): Long = EventSessionizer.tsToUs(t)

  /** The shared pure core: fold (us, event_id) pairs SORTED by that order
    * onto the carried last, emitting one gap per consecutive transition.
    * Pairs at-or-before the carried last are skipped (the documented
    * drop; an exact replay of the carried event is a no-op).
    */
  private[streaming] def fold(user: Long, st: RState,
      sorted: Seq[(Long, Long)]): (RState, Seq[RateRow]) = {
    var s = st
    val out = Seq.newBuilder[RateRow]
    for ((us, eid) <- sorted) {
      if (s.lastUs == Unset) s = RState(us, eid, s.tMax)
      else if (us > s.lastUs || (us == s.lastUs && eid > s.lastEid)) {
        out += RateRow(user, us - s.lastUs)
        s = RState(us, eid, s.tMax)
      }
      // else: sorts at-or-before the carried last — dropped (documented)
    }
    (s, out.result())
  }

  private def armTimeout(state: GroupState[_], tMaxUs: Long): Unit =
    try {
      val desiredMs = tMaxUs / 1000 + EventSessionizer.GapMicros / 1000
      val timeoutMs =
        try math.max(desiredMs, state.getCurrentWatermarkMs() + 1)
        catch { case _: UnsupportedOperationException => desiredMs }
      state.setTimeoutTimestamp(timeoutMs)
    } catch {
      case _: UnsupportedOperationException => ()
    }

  private[streaming] def stateFn(user: Long, events: Iterator[REv],
      state: GroupState[RState]): Iterator[RateRow] = {
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val evs = events.map(e => (tsToUs(e.ts), e.event_id)).toArray
      if (evs.isEmpty) Iterator.empty
      else {
        val prev = state.getOption.getOrElse(RState(Unset, 0L, 0L))
        val (next0, rows) = fold(user, prev, evs.sorted.toSeq)
        val next = next0.copy(tMax = math.max(prev.tMax, evs.map(_._1).max))
        state.update(next)
        armTimeout(state, next.tMax)
        rows.iterator
      }
    }
  }

  /** Streaming entry: one increment row per transition; O(1) state. */
  def rateStream(events: Dataset[REv]): Dataset[RateRow] = {
    implicit val rowEnc = Encoders.product[RateRow]
    implicit val stEnc = Encoders.product[RState]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(stateFn)
  }

  private[streaming] def stateFnExact(user: Long, events: Iterator[REv],
      state: GroupState[RBuf]): Iterator[RateRow] = {
    if (state.hasTimedOut) {
      val out = state.getOption.toSeq.flatMap { b =>
        fold(user, RState(Unset, 0L, 0L), b.us.zip(b.eids).sorted)._2
      }
      state.remove()
      out.iterator
    } else {
      val evs = events.map(e => (tsToUs(e.ts), e.event_id)).toArray
      val prev = state.getOption.getOrElse(RBuf(Nil, Nil, 0L))
      val tMax =
        if (evs.isEmpty) prev.tMax
        else math.max(prev.tMax, evs.map(_._1).max)
      val next = RBuf(prev.us ++ evs.map(_._1), prev.eids ++ evs.map(_._2),
        tMax)
      state.update(next)
      armTimeout(state, tMax)
      Iterator.empty
    }
  }

  /** EXACT streaming entry: buffers (ts, event_id) until quiesce, folds
    * whole, emits every gap once.
    */
  def rateStreamExact(events: Dataset[REv]): Dataset[RateRow] = {
    implicit val rowEnc = Encoders.product[RateRow]
    implicit val stEnc = Encoders.product[RBuf]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(stateFnExact)
  }

  /** Batch entry: each group seen whole — exact; feeding the rows to
    * `ops.Sessionize.botsFromGaps` equals the evBots table (StreamingSpec
    * parity).
    */
  def rateBatch(events: Dataset[REv]): Dataset[RateRow] = {
    implicit val rowEnc = Encoders.product[RateRow]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroups { (user, it) =>
        fold(user, RState(Unset, 0L, 0L),
          it.map(e => (tsToUs(e.ts), e.event_id)).toSeq.sorted)._2.iterator
      }
  }
}
