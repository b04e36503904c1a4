package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Streaming counterpart of `ops.Sessionize.evAttribution` (last-touch
  * attribution: every purchase goes to the most recent PRECEDING click,
  * view fallback, organic else — "preceding" in strict (ts, event_id)
  * order, exactly the batch query's window frame).
  *
  * Per-user state is the last click (id, micros) and last view (id,
  * micros) — O(1); purchase rows emit AS THEY ARRIVE (each trigger folds
  * its ts-sorted slice on top of the carried lasts), and the state evicts
  * on the quiesce timeout. A cross-batch touch only replaces the carried
  * one when it is LATER in (ts, event_id) order, so an out-of-order
  * in-watermark touch never regresses the state; but a purchase already
  * emitted in an earlier trigger cannot be re-attributed when a later
  * trigger delivers the touch that truly preceded it — the same
  * in-watermark cross-trigger approximation class as
  * [[FunnelTracker.funnelStream]] (StreamingSpec documents the
  * divergence). [[attributionStreamExact]] buffers the user's events
  * until quiesce and folds them whole — exact for everything the
  * watermark admitted, at O(events in the active window) state. Batch
  * mode ([[attributionBatch]]) sees each group whole: EXACT, and
  * parity-checked against the oracle-checked SQL in StreamingSpec.
  */
object AttributionTracker {

  case class AEv(ts: Timestamp, user_id: Long, event_id: Long,
                 event_type: String, value: Double)

  /** -1 = unset; `tMax` = newest event micros ever seen (the monotone
    * quiesce deadline base, see [[FunnelTracker.FState]]).
    */
  case class AState(clickId: Long, clickUs: Long, viewId: Long,
                    viewUs: Long, tMax: Long)

  /** Buffered events awaiting quiesce (parallel seqs keep the encoder
    * flat), for the exact variant.
    */
  case class ABuf(ts: Seq[Long], ids: Seq[Long], types: Seq[String],
                  values: Seq[Double], tMax: Long)

  case class TouchRow(user_id: Long, purchase_id: Long,
                      t_purchase: Timestamp, value: Double,
                      touch_type: String, touch_id: Option[Long],
                      t_touch: Timestamp)

  val Unset: Long = -1L

  private def tsToUs(t: Timestamp): Long = EventSessionizer.tsToUs(t)

  private val emptyState = AState(Unset, Unset, Unset, Unset, 0L)

  /** The shared pure core: fold events sorted by (micros, event_id) onto
    * the carried lasts, emitting one row per purchase from the lasts AS OF
    * strictly before it. Touch updates apply only when later in (ts, id)
    * order than the carried touch, so replaying a prefix can never
    * regress the state.
    */
  private[streaming] def fold(user: Long, st: AState,
      sorted: Seq[(Long, Long, String, Double)]): (AState, Seq[TouchRow]) = {
    var (ci, cu, vi, vu) = (st.clickId, st.clickUs, st.viewId, st.viewUs)
    val out = scala.collection.mutable.ArrayBuffer.empty[TouchRow]
    for ((us, id, tpe, v) <- sorted) tpe match {
      case "purchase" =>
        val (touchType, touchId, touchUs) =
          if (cu != Unset) ("click", ci, cu)
          else if (vu != Unset) ("view", vi, vu)
          else ("organic", Unset, Unset)
        out += TouchRow(user, id, EventSessionizer.usToTs(us), v, touchType,
          if (touchId == Unset) None else Some(touchId),
          if (touchUs == Unset) null else EventSessionizer.usToTs(touchUs))
      case "click" =>
        if (cu == Unset || us > cu || (us == cu && id > ci)) { ci = id; cu = us }
      case "view" =>
        if (vu == Unset || us > vu || (us == vu && id > vi)) { vi = id; vu = us }
      case _ => ()
    }
    (AState(ci, cu, vi, vu, st.tMax), out.toSeq)
  }

  private def sortKey(e: AEv): (Long, Long) = (tsToUs(e.ts), e.event_id)

  /** Monotone quiesce deadline (the FunnelTracker rule): 30 min past the
    * newest event EVER seen, clamped above the current watermark.
    */
  private def armTimeout(state: GroupState[_], tMaxUs: Long): Unit =
    try {
      val desiredMs = tMaxUs / 1000 + EventSessionizer.GapMicros / 1000
      val timeoutMs =
        try math.max(desiredMs, state.getCurrentWatermarkMs() + 1)
        catch { case _: UnsupportedOperationException => desiredMs }
      state.setTimeoutTimestamp(timeoutMs)
    } catch {
      // batch mode: no event-time timeouts
      case _: UnsupportedOperationException => ()
    }

  private[streaming] def stateFn(user: Long, events: Iterator[AEv],
      state: GroupState[AState]): Iterator[TouchRow] = {
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val evs = events.toArray.sortBy(sortKey)
      val prev = state.getOption.getOrElse(emptyState)
      val batchMax = if (evs.isEmpty) 0L else evs.map(e => tsToUs(e.ts)).max
      val (next, rows) = fold(user, prev,
        evs.toSeq.map(e => (tsToUs(e.ts), e.event_id, e.event_type, e.value)))
      state.update(next.copy(tMax = math.max(prev.tMax, batchMax)))
      armTimeout(state, math.max(prev.tMax, batchMax))
      rows.iterator
    }
  }

  /** Streaming entry: purchase rows emit on arrival; O(1) state. */
  def attributionStream(events: Dataset[AEv]): Dataset[TouchRow] = {
    implicit val rowEnc = Encoders.product[TouchRow]
    implicit val stEnc = Encoders.product[AState]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(stateFn)
  }

  private[streaming] def stateFnExact(user: Long, events: Iterator[AEv],
      state: GroupState[ABuf]): Iterator[TouchRow] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map { b =>
        val sorted = b.ts.indices.map(i =>
          (b.ts(i), b.ids(i), b.types(i), b.values(i)))
          .sortBy(t => (t._1, t._2))
        fold(user, emptyState, sorted)._2
      }.getOrElse(Nil)
      state.remove()
      out.iterator
    } else {
      val evs = events.toArray
      val prev = state.getOption.getOrElse(ABuf(Nil, Nil, Nil, Nil, 0L))
      val batchMax =
        if (evs.isEmpty) prev.tMax else evs.map(e => tsToUs(e.ts)).max
      val next = ABuf(prev.ts ++ evs.map(e => tsToUs(e.ts)),
        prev.ids ++ evs.map(_.event_id), prev.types ++ evs.map(_.event_type),
        prev.values ++ evs.map(_.value), math.max(prev.tMax, batchMax))
      state.update(next)
      armTimeout(state, next.tMax)
      Iterator.empty
    }
  }

  /** EXACT streaming entry: buffers until quiesce, folds whole — rows
    * emit at timeout; the exactness/state trade of funnelStreamExact.
    */
  def attributionStreamExact(events: Dataset[AEv]): Dataset[TouchRow] = {
    implicit val rowEnc = Encoders.product[TouchRow]
    implicit val stEnc = Encoders.product[ABuf]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(stateFnExact)
  }

  /** Batch entry: each group seen whole — exact, SQL-parity-checked. */
  def attributionBatch(events: Dataset[AEv]): Dataset[TouchRow] = {
    implicit val rowEnc = Encoders.product[TouchRow]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroups { (user, it) =>
        val sorted = it.toArray.sortBy(sortKey).toSeq
          .map(e => (tsToUs(e.ts), e.event_id, e.event_type, e.value))
        fold(user, emptyState, sorted)._2.iterator
      }
  }
}
