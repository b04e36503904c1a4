package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Streaming counterpart of `ops.Sessionize.evChangepoint`'s level-shift
  * question, in the sequential control-chart form a stream can actually
  * answer: a two-sided CUSUM per event type over its daily counts. The
  * batch operator localizes a shift retrospectively (argmax between-
  * segment gain over the WHOLE series); the tracker raises the alarm
  * while the shift is happening, with O(1) carried statistics — the
  * classic offline/online split for the same defect class.
  *
  * Semantics (all integer-exact): the first `baseDays` OBSERVED days
  * freeze the reference mean as the rational baseSum/baseDays; every
  * later observed day folds into
  *   sHi ← max(0, sHi + 100·den·x − (100+kPct)·num)
  *   sLo ← max(0, sLo + (100−kPct)·num − 100·den·x)
  * (the textbook CUSUM with slack k = kPct % of the reference mean,
  * scaled by 100·den so the state stays in Longs — no float drifts
  * between streaming, batch, and the spec's in-memory replay), and
  * `alarm` fires when either side reaches hTimes·100·num (h = hTimes
  * reference means of accumulated excess). Baseline days emit with
  * s = 0, alarm = false — visible but unscored.
  *
  * A (type, day) row emits exactly once, when the WATERMARK passes the
  * end of the day (the SpikeTracker finalization rule) — days therefore
  * fold into the CUSUM recursion in strict day order whatever the
  * trigger-arrival order, and an in-watermark late event lands in its
  * own day's count before that day is scored. Days with no events emit
  * nothing and advance nothing (the batch operator's observed-series
  * semantics).
  *
  * State per event_type: the in-flight day→count entries newer than the
  * watermark plus seven Longs — O(days in flight), independent of event
  * volume, co-partitioned by type. A type idle for 30 days past its last
  * scored day is garbage-collected (event-time timeout); if it later
  * resumes, it re-baselines from scratch — the one place the stream may
  * diverge from a whole-history batch replay, by declared GC policy.
  */
object CusumTracker {

  case class CuEv(ts: Timestamp, event_type: String)
  /** Parallel arrays keep the encoder flat; emitted = newest finalized
    * day (Long.MinValue before the first).
    */
  case class CuState(days: Seq[Long], ns: Seq[Long], emitted: Long,
                     baseN: Long, baseSum: Long, sHi: Long, sLo: Long)
  case class CusumRow(event_type: String, day: Long, n: Long,
                      s_hi: Long, s_lo: Long, alarm: Boolean)

  val DayUs: Long = 86400000000L
  val DayMs: Long = 86400000L

  /** Fold one CLOSED day into the recursion. Pure; shared by streaming,
    * batch, and the spec replay.
    */
  private[streaming] def step(baseDays: Int, kPct: Int, hTimes: Int,
      tpe: String, st: CuState, day: Long, x: Long): (CuState, CusumRow) =
    if (st.baseN < baseDays) {
      (st.copy(emitted = day, baseN = st.baseN + 1,
        baseSum = st.baseSum + x),
        CusumRow(tpe, day, x, 0L, 0L, alarm = false))
    } else {
      val (num, den) = (st.baseSum, st.baseN)
      val sHi = math.max(0L, st.sHi + 100L * den * x - (100L + kPct) * num)
      val sLo = math.max(0L, st.sLo + (100L - kPct) * num - 100L * den * x)
      val h = hTimes * 100L * num
      (st.copy(emitted = day, sHi = sHi, sLo = sLo),
        CusumRow(tpe, day, x, sHi, sLo, alarm = sHi >= h || sLo >= h))
    }

  private def merged(state: GroupState[CuState],
      events: Iterator[CuEv]): CuState = {
    val prev = state.getOption.getOrElse(
      CuState(Nil, Nil, Long.MinValue, 0L, 0L, 0L, 0L))
    val add = events.map(e => EventSessionizer.tsToUs(e.ts) / DayUs).toSeq
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val counts = prev.days.zip(prev.ns).toMap
    val next = (counts.keySet ++ add.keySet).toSeq.sorted.map { d =>
      d -> (counts.getOrElse(d, 0L) + add.getOrElse(d, 0L))
    }
    prev.copy(days = next.map(_._1), ns = next.map(_._2))
  }

  private def advance(baseDays: Int, kPct: Int, hTimes: Int, tpe: String,
      st: CuState, wmMs: Long,
      state: GroupState[CuState]): Iterator[CusumRow] = {
    val finalThrough = Math.floorDiv(wmMs, DayMs) - 1
    val counts = st.days.zip(st.ns).toMap
    var cur = st
    val out = Seq.newBuilder[CusumRow]
    for (d <- counts.keys.filter(d =>
        d > st.emitted && d <= finalThrough).toSeq.sorted) {
      val (next, row) = step(baseDays, kPct, hTimes, tpe, cur, d, counts(d))
      cur = next
      out += row
    }
    // an event for a day at-or-before `emitted` would re-open a scored
    // day — it was admitted by the watermark before the day closed, so
    // by construction none exists; only in-flight days are retained
    val keep = st.days.zip(st.ns).filter(_._1 > cur.emitted)
    val next = cur.copy(days = keep.map(_._1), ns = keep.map(_._2))
    // GC: drop a key with nothing in flight once the watermark has also
    // passed its 30-day idle horizon (the timeout below) — without the
    // second clause a once-scored type (baseN > 0) could never be
    // removed and the store would grow with event-type churn forever.
    // A type that resumes after removal re-baselines from scratch.
    if (keep.isEmpty && (next.baseN == 0 ||
        (cur.emitted != Long.MinValue &&
          wmMs >= (cur.emitted + 30) * DayMs))) state.remove()
    else {
      state.update(next)
      keep.map(_._1).minOption.foreach { d =>
        state.setTimeoutTimestamp(math.max((d + 1) * DayMs, wmMs + 1))
      }
      if (keep.isEmpty)
        state.setTimeoutTimestamp(
          math.max((cur.emitted + 30) * DayMs, wmMs + 1))
    }
    out.result().iterator
  }

  private[streaming] def stateFn(baseDays: Int, kPct: Int, hTimes: Int)(
      tpe: String, events: Iterator[CuEv],
      state: GroupState[CuState]): Iterator[CusumRow] = {
    val wmMs =
      try state.getCurrentWatermarkMs()
      catch { case _: UnsupportedOperationException => 0L }
    if (state.hasTimedOut)
      advance(baseDays, kPct, hTimes, tpe, state.get, wmMs, state)
    else {
      val st = merged(state, events)
      try advance(baseDays, kPct, hTimes, tpe, st, wmMs, state)
      catch {
        // batch mode has no timeout clock — cusumBatch emits directly
        case _: UnsupportedOperationException => Iterator.empty
      }
    }
  }

  /** Streaming entry: one row per observed day, emitted at watermark
    * finalization, folded in strict day order.
    */
  def cusumStream(events: Dataset[CuEv], baseDays: Int = 7,
      kPct: Int = 50, hTimes: Int = 4): Dataset[CusumRow] = {
    implicit val rowEnc = Encoders.product[CusumRow]
    implicit val stEnc = Encoders.product[CuState]
    events.groupByKey(_.event_type)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        stateFn(baseDays, kPct, hTimes))
  }

  /** Batch entry: each type is seen whole — every observed day final,
    * folded in day order. Equals the streaming output over the same
    * admitted events (StreamingSpec parity).
    */
  def cusumBatch(events: Dataset[CuEv], baseDays: Int = 7,
      kPct: Int = 50, hTimes: Int = 4): Dataset[CusumRow] = {
    implicit val rowEnc = Encoders.product[CusumRow]
    events.groupByKey(_.event_type)(Encoders.STRING)
      .flatMapGroups { (tpe, it) =>
        val counts = it.map(e => EventSessionizer.tsToUs(e.ts) / DayUs)
          .toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
        var cur = CuState(Nil, Nil, Long.MinValue, 0L, 0L, 0L, 0L)
        counts.keys.toSeq.sorted.map { d =>
          val (next, row) = step(baseDays, kPct, hTimes, tpe, cur, d,
            counts(d))
          cur = next
          row
        }.iterator
      }
  }
}
