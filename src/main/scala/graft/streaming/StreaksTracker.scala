package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Streaming counterpart of `ops.Sessionize.evStreaks`: the per-user
  * consecutive-day activity rollup (active days / number of streaks /
  * longest streak) maintained CONTINUOUSLY — each trigger in which a user
  * is active emits their updated rollup row, so a dashboard or feature
  * store always holds the current value instead of waiting for the batch
  * recompute. The last row emitted per user equals the batch result.
  *
  * Per-user state is (last active day, current run length, max run,
  * n runs, active days) — O(1), the gaps-and-islands fold carried
  * incrementally. Days only advance: an in-watermark event whose DAY
  * precedes the carried last day cannot retro-splice two islands with
  * O(1) state — it is DROPPED rather than mis-counted (the
  * MarkovTracker never-regress rule, this family's documented
  * cross-trigger approximation; a day AT the carried last is a no-op,
  * never a double count). [[streaksStreamExact]] buffers each user's
  * distinct days until the quiesce timeout and folds them whole — exact
  * for everything the watermark admitted, at O(active window) state.
  * Batch mode ([[streaksBatch]]) sees each group whole: EXACT, and
  * StreamingSpec parity-checks it against the oracle-checked SQL query.
  */
object StreaksTracker {

  case class SEv(ts: Timestamp, user_id: Long)

  /** lastDay = Long.MinValue means no day carried yet. */
  case class SState(lastDay: Long, runLen: Long, maxRun: Long, nRuns: Long,
                    activeDays: Long, tMax: Long)

  case class SBuf(days: Seq[Long], tMax: Long)

  case class StreakRow(user_id: Long, active_days: Long, n_streaks: Long,
                       max_streak: Long, as_of_day: Long)

  private val Unset: Long = Long.MinValue

  private val emptyState = SState(Unset, 0L, 0L, 0L, 0L, 0L)

  private def tsToUs(t: Timestamp): Long = EventSessionizer.tsToUs(t)

  private def day(us: Long): Long = Math.floorDiv(us, 86400000000L)

  /** The shared pure core: fold SORTED ascending distinct days onto the
    * carried state. Days at-or-before the carried last are skipped (at =
    * idempotent no-op, before = the documented drop).
    */
  private[streaming] def fold(st: SState, sortedDays: Seq[Long]): SState = {
    var s = st
    for (d <- sortedDays) {
      if (s.lastDay == Unset)
        s = SState(d, 1L, 1L, 1L, 1L, s.tMax)
      else if (d == s.lastDay + 1)
        s = SState(d, s.runLen + 1, math.max(s.maxRun, s.runLen + 1),
          s.nRuns, s.activeDays + 1, s.tMax)
      else if (d > s.lastDay)
        s = SState(d, 1L, s.maxRun, s.nRuns + 1, s.activeDays + 1, s.tMax)
      // else: at-or-before the carried last day — dropped (documented)
    }
    s
  }

  private def row(user: Long, s: SState): StreakRow =
    StreakRow(user, s.activeDays, s.nRuns, s.maxRun, s.lastDay)

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

  private[streaming] def stateFn(user: Long, events: Iterator[SEv],
      state: GroupState[SState]): Iterator[StreakRow] = {
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val us = events.map(e => tsToUs(e.ts)).toArray
      if (us.isEmpty) Iterator.empty
      else {
        val prev = state.getOption.getOrElse(emptyState)
        val next0 = fold(prev, us.map(day).distinct.sorted.toSeq)
        val next = next0.copy(tMax = math.max(prev.tMax, us.max))
        state.update(next)
        armTimeout(state, next.tMax)
        // emit only when the rollup moved (a replayed old day is silent)
        if (next0.activeDays != prev.activeDays ||
          next0.maxRun != prev.maxRun) Iterator.single(row(user, next))
        else Iterator.empty
      }
    }
  }

  /** Streaming entry: the updated rollup emits per active trigger;
    * O(1) state.
    */
  def streaksStream(events: Dataset[SEv]): Dataset[StreakRow] = {
    implicit val rowEnc = Encoders.product[StreakRow]
    implicit val stEnc = Encoders.product[SState]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(stateFn)
  }

  private[streaming] def stateFnExact(user: Long, events: Iterator[SEv],
      state: GroupState[SBuf]): Iterator[StreakRow] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map { b =>
        row(user, fold(emptyState, b.days.distinct.sorted))
      }.toSeq
      state.remove()
      out.iterator
    } else {
      val us = events.map(e => tsToUs(e.ts)).toArray
      val prev = state.getOption.getOrElse(SBuf(Nil, 0L))
      val tMax = if (us.isEmpty) prev.tMax else math.max(prev.tMax, us.max)
      val next = SBuf((prev.days ++ us.map(day)).distinct, tMax)
      state.update(next)
      armTimeout(state, tMax)
      Iterator.empty
    }
  }

  /** EXACT streaming entry: buffers distinct days until quiesce, folds
    * whole, emits the final rollup once.
    */
  def streaksStreamExact(events: Dataset[SEv]): Dataset[StreakRow] = {
    implicit val rowEnc = Encoders.product[StreakRow]
    implicit val stEnc = Encoders.product[SBuf]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(stateFnExact)
  }

  /** Batch entry: each group seen whole — exact; equals the evStreaks
    * SQL rollup (StreamingSpec parity).
    */
  def streaksBatch(events: Dataset[SEv]): Dataset[StreakRow] = {
    implicit val rowEnc = Encoders.product[StreakRow]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .mapGroups { (user, it) =>
        row(user, fold(emptyState,
          it.map(e => day(tsToUs(e.ts))).toSeq.distinct.sorted))
      }
  }
}
