package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Streaming counterpart of `ops.Sessionize.evEwma`: the per-type daily
  * volume EWMA (α = ½) maintained CONTINUOUSLY — each day ROLLOVER emits
  * the completed day's (type, day, n, ewma) row, so a monitor holds the
  * smoothed baseline without the batch recompute; the still-open day
  * flushes at the quiesce timeout. α = ½ keeps every carried value a
  * dyadic rational (the batch operator's exactness argument), so the
  * incremental multiply-add replays the batch closed form bit-for-bit:
  * StreamingSpec pins `ewmaBatch(events) == evEwma(events)` EXACTLY.
  *
  * Per-type state is (current day, its count, the running ewma) — O(1).
  * Days only advance: an in-watermark event for a day at-or-before an
  * already-completed day cannot reopen that day's count with O(1) state —
  * it is DROPPED rather than mis-averaged (the StreaksTracker
  * never-regress rule, this family's documented cross-trigger
  * approximation; an event for the OPEN day is never dropped).
  * [[ewmaStreamExact]] buffers per-day counts until quiesce and folds
  * them whole — exact for everything the watermark admitted, at O(active
  * days) state. Batch mode ([[ewmaBatch]]) sees each group whole: EXACT.
  * Days with zero events are skipped by the fold exactly as the batch
  * query's observed-days ROW_NUMBER skips them.
  */
object EwmaTracker {

  case class EEv(ts: Timestamp, event_type: String)

  /** curDay = Long.MinValue means no day carried yet; have = an ewma has
    * been seeded (distinguishes the first completed day).
    */
  case class EState(curDay: Long, n: Long, ewma: Double, have: Boolean,
                    tMax: Long)

  /** Buffered-exact state: parallel (day, count) seqs, merged per trigger. */
  case class EBuf(days: Seq[Long], ns: Seq[Long], tMax: Long)

  case class EwmaRow(event_type: String, day: Timestamp, n: Long,
                     ewma: Double)

  private val Unset: Long = Long.MinValue

  private val DayUs: Long = 86400000000L

  private def tsToUs(t: Timestamp): Long = EventSessionizer.tsToUs(t)

  private def dayOf(us: Long): Long = Math.floorDiv(us, DayUs)

  private def dayTs(day: Long): Timestamp = new Timestamp(day * DayUs / 1000)

  private def next(prev: EState, n: Long): Double =
    if (!prev.have) n.toDouble else 0.5 * n + 0.5 * prev.ewma

  /** The shared pure core: fold SORTED event days onto the carried state,
    * emitting one row per COMPLETED day. Events for a day before the
    * carried current are dropped (documented); events AT it accumulate.
    */
  private[streaming] def fold(tpe: String, st: EState,
      sortedDays: Seq[Long]): (EState, Seq[EwmaRow]) = {
    var s = st
    val out = Seq.newBuilder[EwmaRow]
    for (d <- sortedDays) {
      if (s.curDay == Unset) s = s.copy(curDay = d, n = 1L)
      else if (d == s.curDay) s = s.copy(n = s.n + 1)
      else if (d > s.curDay) {
        val e = next(s, s.n)
        out += EwmaRow(tpe, dayTs(s.curDay), s.n, e)
        s = s.copy(curDay = d, n = 1L, ewma = e, have = true)
      }
      // else: a day before the carried current — dropped (documented)
    }
    (s, out.result())
  }

  /** Flush the open day (quiesce / end-of-batch). */
  private[streaming] def flush(tpe: String, s: EState): Seq[EwmaRow] =
    if (s.curDay == Unset) Nil
    else Seq(EwmaRow(tpe, dayTs(s.curDay), s.n, next(s, s.n)))

  private def armTimeout(state: GroupState[_], tMaxUs: Long): Unit =
    try {
      val desiredMs = tMaxUs / 1000 + EventSessionizer.LifetimeQuiesceMicros / 1000
      val timeoutMs =
        try math.max(desiredMs, state.getCurrentWatermarkMs() + 1)
        catch { case _: UnsupportedOperationException => desiredMs }
      state.setTimeoutTimestamp(timeoutMs)
    } catch {
      case _: UnsupportedOperationException => ()
    }

  private[streaming] def stateFn(tpe: String, events: Iterator[EEv],
      state: GroupState[EState]): Iterator[EwmaRow] = {
    if (state.hasTimedOut) {
      val out = state.getOption.toSeq.flatMap(s => flush(tpe, s))
      state.remove()
      out.iterator
    } else {
      val days = events.map(e => dayOf(tsToUs(e.ts))).toArray
      if (days.isEmpty) Iterator.empty
      else {
        val prev = state.getOption.getOrElse(
          EState(Unset, 0L, 0.0, have = false, 0L))
        val (next0, rows) = fold(tpe, prev, days.sorted.toSeq)
        val tMax = math.max(prev.tMax, days.max * DayUs + DayUs - 1)
        state.update(next0.copy(tMax = tMax))
        armTimeout(state, tMax)
        rows.iterator
      }
    }
  }

  /** Streaming entry: one row per completed day; O(1) state; the open
    * day flushes at the quiesce timeout.
    */
  def ewmaStream(events: Dataset[EEv]): Dataset[EwmaRow] = {
    implicit val rowEnc = Encoders.product[EwmaRow]
    implicit val stEnc = Encoders.product[EState]
    events.groupByKey(_.event_type)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(stateFn)
  }

  private[streaming] def stateFnExact(tpe: String, events: Iterator[EEv],
      state: GroupState[EBuf]): Iterator[EwmaRow] = {
    if (state.hasTimedOut) {
      val out = state.getOption.toSeq.flatMap { b =>
        val merged = b.days.zip(b.ns).groupBy(_._1).toSeq.sortBy(_._1)
          .map { case (d, xs) => (d, xs.map(_._2).sum) }
        var s = EState(Unset, 0L, 0.0, have = false, 0L)
        val rows = Seq.newBuilder[EwmaRow]
        for ((d, n) <- merged) {
          val e = if (!s.have) n.toDouble else 0.5 * n + 0.5 * s.ewma
          rows += EwmaRow(tpe, dayTs(d), n, e)
          s = s.copy(ewma = e, have = true)
        }
        rows.result()
      }
      state.remove()
      out.iterator
    } else {
      val days = events.map(e => dayOf(tsToUs(e.ts))).toArray
      val prev = state.getOption.getOrElse(EBuf(Nil, Nil, 0L))
      // merge this trigger's counts into the buffered per-day counts
      val add = days.groupBy(identity).map { case (d, xs) =>
        (d, xs.length.toLong) }
      val asMap = prev.days.zip(prev.ns).toMap
      val merged = (asMap.keySet ++ add.keySet).toSeq.sorted.map { d =>
        (d, asMap.getOrElse(d, 0L) + add.getOrElse(d, 0L))
      }
      val tMax =
        if (days.isEmpty) prev.tMax
        else math.max(prev.tMax, days.max * DayUs + DayUs - 1)
      state.update(EBuf(merged.map(_._1), merged.map(_._2), tMax))
      armTimeout(state, tMax)
      Iterator.empty
    }
  }

  /** EXACT streaming entry: buffers per-day counts until quiesce (state
    * O(active days), not O(events)), folds the days whole.
    */
  def ewmaStreamExact(events: Dataset[EEv]): Dataset[EwmaRow] = {
    implicit val rowEnc = Encoders.product[EwmaRow]
    implicit val stEnc = Encoders.product[EBuf]
    events.groupByKey(_.event_type)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(stateFnExact)
  }

  /** Batch entry: each group seen whole — exact; equals evEwma row-for-row
    * (StreamingSpec parity).
    */
  def ewmaBatch(events: Dataset[EEv]): Dataset[EwmaRow] = {
    implicit val rowEnc = Encoders.product[EwmaRow]
    events.groupByKey(_.event_type)(Encoders.STRING)
      .flatMapGroups { (tpe, it) =>
        val (st, rows) = fold(tpe, EState(Unset, 0L, 0.0, have = false, 0L),
          it.map(e => dayOf(tsToUs(e.ts))).toSeq.sorted)
        (rows ++ flush(tpe, st)).iterator
      }
  }
}
