package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Streaming counterpart of `ops.Sessionize.evSpike` (the daily
  * event-rate anomaly score): per event_type, today's count against the
  * mean of the strictly preceding `windowDays` OBSERVED days,
  * `rate_ratio = n·base_days/base_n`, `spike` iff
  * n·base_days ≥ threshold·base_n (the integer-exact comparison the
  * batch query uses).
  *
  * A (type, day) row emits exactly once, when the WATERMARK passes the
  * end of the day — at that point every event the watermark admits for
  * the day has been folded, so the emitted row equals the batch query
  * over the admitted prefix, whatever the trigger-arrival order (an
  * in-watermark event for an earlier, not-yet-final day lands in its
  * day's count like any other; StreamingSpec locks this). Days the
  * stream never observed emit nothing, and a day with no observed
  * baseline day in its trailing window emits nothing — exactly the
  * batch query's absence semantics.
  *
  * State per event_type is the trailing day→count ring: observed days
  * newer than (last-finalized − windowDays) — O(windowDays + days in
  * flight), independent of event volume, co-partitioned by type. The
  * per-event work is the same single combinable count the batch plan
  * locks; state is GC'd once the watermark outruns the ring by a full
  * window.
  */
object SpikeTracker {

  case class SpEv(ts: Timestamp, event_type: String)
  /** Parallel day/count arrays keep the state encoder flat; `emitted` is
    * the newest finalized day (Long.MinValue before the first emit).
    */
  case class SpState(days: Seq[Long], ns: Seq[Long], emitted: Long)
  case class SpikeRow(event_type: String, day: Long, n: Long, base_n: Long,
                      base_days: Long, rate_ratio: Double, spike: Boolean)

  val DayUs: Long = 86400000000L
  val DayMs: Long = 86400000L

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The shared pure core: emit rows for every OBSERVED day in
    * (state.emitted, finalThrough], baselined on the observed days in
    * its trailing window — identical arithmetic to the batch SQL.
    */
  private[streaming] def emitRows(tpe: String, counts: Map[Long, Long],
      emitted: Long, finalThrough: Long, windowDays: Int,
      threshold: Int): Seq[SpikeRow] =
    counts.keys.filter(d => d > emitted && d <= finalThrough).toSeq.sorted
      .flatMap { d =>
        val base = counts.filter { case (bd, _) =>
          bd >= d - windowDays && bd < d }
        if (base.isEmpty) None
        else {
          val (baseN, baseDays) = (base.values.sum, base.size.toLong)
          val n = counts(d)
          Some(SpikeRow(tpe, d, n, baseN, baseDays,
            round6(n.toDouble * baseDays / baseN),
            n * baseDays >= threshold.toLong * baseN))
        }
      }

  private def merged(state: GroupState[SpState],
      events: Iterator[SpEv]): SpState = {
    val prev = state.getOption.getOrElse(SpState(Nil, Nil, Long.MinValue))
    val add = events.map(e => EventSessionizer.tsToUs(e.ts) / DayUs).toSeq
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val counts = prev.days.zip(prev.ns).toMap
    val next = (counts.keySet ++ add.keySet).toSeq.sorted.map { d =>
      d -> (counts.getOrElse(d, 0L) + add.getOrElse(d, 0L))
    }
    SpState(next.map(_._1), next.map(_._2), prev.emitted)
  }

  private def advance(tpe: String, st: SpState, wmMs: Long,
      state: GroupState[SpState], windowDays: Int,
      threshold: Int): Iterator[SpikeRow] = {
    val finalThrough = Math.floorDiv(wmMs, DayMs) - 1
    val counts = st.days.zip(st.ns).toMap
    val out = emitRows(tpe, counts, st.emitted, finalThrough, windowDays,
      threshold)
    val newEmitted = math.max(st.emitted, finalThrough)
    // keep baseline days a FUTURE day inside the window could still cite
    val keep = st.days.zip(st.ns).filter(_._1 > newEmitted - windowDays)
    if (keep.isEmpty) state.remove()
    else {
      state.update(SpState(keep.map(_._1), keep.map(_._2), newEmitted))
      val minUnemitted = keep.map(_._1).filter(_ > newEmitted)
        .minOption
      // next wake: the first in-flight day's end, else the GC horizon a
      // full window past the newest retained day
      val desired = minUnemitted
        .map(d => (d + 1) * DayMs)
        .getOrElse((keep.map(_._1).max + windowDays + 1) * DayMs)
      state.setTimeoutTimestamp(math.max(desired, wmMs + 1))
    }
    out.iterator
  }

  private[streaming] def stateFn(windowDays: Int, threshold: Int)(
      tpe: String, events: Iterator[SpEv],
      state: GroupState[SpState]): Iterator[SpikeRow] = {
    val wmMs =
      try state.getCurrentWatermarkMs()
      catch { case _: UnsupportedOperationException => 0L }
    if (state.hasTimedOut)
      advance(tpe, state.get, wmMs, state, windowDays, threshold)
    else {
      val st = merged(state, events)
      try advance(tpe, st, wmMs, state, windowDays, threshold)
      catch {
        // batch mode has no timeout clock — spikeBatch emits directly
        case _: UnsupportedOperationException => Iterator.empty
      }
    }
  }

  /** Streaming entry: rows emit when the watermark finalizes their day. */
  def spikeStream(events: Dataset[SpEv], windowDays: Int = 7,
      threshold: Int = 2): Dataset[SpikeRow] = {
    implicit val rowEnc = Encoders.product[SpikeRow]
    implicit val stEnc = Encoders.product[SpState]
    events.groupByKey(_.event_type)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(stateFn(windowDays, threshold))
  }

  /** Batch entry: each type is seen whole, so every day is final. */
  def spikeBatch(events: Dataset[SpEv], windowDays: Int = 7,
      threshold: Int = 2): Dataset[SpikeRow] = {
    implicit val rowEnc = Encoders.product[SpikeRow]
    events.groupByKey(_.event_type)(Encoders.STRING)
      .flatMapGroups { (tpe, it) =>
        val counts = it.map(e => EventSessionizer.tsToUs(e.ts) / DayUs)
          .toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
        emitRows(tpe, counts, Long.MinValue, Long.MaxValue, windowDays,
          threshold).iterator
      }
  }
}
