package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Streaming counterpart of `ops.Sessionize.evFunnel` (the strict-order
  * view→click→purchase funnel) via `mapGroupsWithState`-family state:
  * per-user state is THREE micros timestamps (earliest view, earliest
  * click strictly after it, earliest purchase strictly after that) —
  * O(1), co-partitioned by user, evicted on event-time timeout, at which
  * point the user's final funnel row is emitted.
  *
  * Ordering: events within a trigger batch are sorted before folding (the
  * EventSessionizer discipline). The O(1) fold is order-robust for the
  * view step (an earlier view never invalidates a chosen click — the
  * eligibility window only widens) and for a late-but-in-time click that
  * slots between the view and the current click. It is APPROXIMATE under
  * any other cross-trigger disorder on the click/purchase steps — not
  * just watermark-late data: a purchase rejected against the then-current
  * click is unrecoverable even if a later trigger delivers an earlier
  * in-time click that would have admitted it (StreamingSpec documents the
  * divergence). Pipelines that need exactness under in-watermark disorder
  * use [[funnelStreamExact]], which buffers the user's events until the
  * quiesce timeout and folds them whole — O(events in the active window)
  * state instead of O(1), the classic exactness/state trade. Batch mode
  * (`funnelBatch`) sees each group whole, so it is EXACT and
  * parity-checked against the oracle-checked SQL query in StreamingSpec.
  */
object FunnelTracker {

  case class FEv(ts: Timestamp, user_id: Long, event_type: String)
  /** -1 = unset (plain longs keep the state encoder flat). `tMax` is the
    * newest event micros ever seen for the user — the quiesce deadline
    * must be computed from it, NOT from the current batch alone: a
    * late-arriving older event would otherwise SHRINK the deadline and
    * emit the funnel row prematurely (dropping later in-time events).
    */
  case class FState(tView: Long, tClick: Long, tPurchase: Long, tMax: Long)
  case class FunnelRow(user_id: Long, t_view: Timestamp, t_click: Timestamp,
                       t_purchase: Timestamp, depth: Int)

  val Unset: Long = -1L

  private[streaming] def tsToUs(t: Timestamp): Long =
    EventSessionizer.tsToUs(t)

  /** The shared pure core: fold ts-sorted events into the funnel state.
    * view keeps the global min; click the min strictly after the view;
    * purchase the min strictly after the click.
    */
  private[streaming] def fold(state: FState, sorted: Seq[(Long, String)]): FState = {
    var (v, c, p) = (state.tView, state.tClick, state.tPurchase)
    for ((us, tpe) <- sorted) tpe match {
      case "view" =>
        if (v == Unset || us < v) v = us
      case "click" =>
        if (v != Unset && us > v && (c == Unset || us < c)) c = us
      case "purchase" =>
        if (c != Unset && us > c && (p == Unset || us < p)) p = us
      case _ => ()
    }
    FState(v, c, p, state.tMax)
  }

  private def toRow(user: Long, s: FState): Option[FunnelRow] =
    if (s.tView == Unset) None
    else Some(FunnelRow(user,
      EventSessionizer.usToTs(s.tView),
      if (s.tClick == Unset) null else EventSessionizer.usToTs(s.tClick),
      if (s.tPurchase == Unset) null else EventSessionizer.usToTs(s.tPurchase),
      if (s.tPurchase != Unset) 3 else if (s.tClick != Unset) 2 else 1))

  private[streaming] def stateFn(user: Long, events: Iterator[FEv],
                                 state: GroupState[FState]): Iterator[FunnelRow] = {
    if (state.hasTimedOut) {
      val out = state.getOption.flatMap(toRow(user, _))
      state.remove()
      out.iterator
    } else {
      val sorted = events.toArray.map(e => (tsToUs(e.ts), e.event_type))
        .sortBy(_._1).toSeq
      val prev = state.getOption.getOrElse(FState(Unset, Unset, Unset, 0L))
      val batchMax = if (sorted.isEmpty) 0L else sorted.map(_._1).max
      val next = fold(prev, sorted)
        .copy(tMax = math.max(prev.tMax, batchMax))
      state.update(next)
      try {
        // quiesce rule: emit the funnel row once the user has been silent
        // past the watermark — 30 min after the newest event EVER seen
        // (monotone across batches even under late data)
        val desiredMs = next.tMax / 1000 + EventSessionizer.GapMicros / 1000
        val timeoutMs =
          try math.max(desiredMs, state.getCurrentWatermarkMs() + 1)
          catch { case _: UnsupportedOperationException => desiredMs }
        state.setTimeoutTimestamp(timeoutMs)
      } catch {
        // batch mode: no event-time timeouts — funnelBatch emits directly
        case _: UnsupportedOperationException => ()
      }
      Iterator.empty
    }
  }

  /** Streaming entry: rows emit when a user times out past the watermark. */
  def funnelStream(events: Dataset[FEv]): Dataset[FunnelRow] = {
    implicit val rowEnc = Encoders.product[FunnelRow]
    implicit val stEnc = Encoders.product[FState]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(stateFn)
  }

  /** Buffered per-user events awaiting the quiesce timeout (parallel
    * arrays keep the state encoder flat); `tMax` as in [[FState]].
    */
  case class FBuf(ts: Seq[Long], types: Seq[String], tMax: Long)

  private[streaming] def stateFnExact(user: Long, events: Iterator[FEv],
                                      state: GroupState[FBuf]): Iterator[FunnelRow] = {
    if (state.hasTimedOut) {
      val out = state.getOption.flatMap { b =>
        // the whole in-watermark event set, folded once in ts order —
        // cross-trigger disorder cannot have discarded anything
        toRow(user, fold(FState(Unset, Unset, Unset, 0L),
          b.ts.zip(b.types).sortBy(_._1)))
      }
      state.remove()
      out.iterator
    } else {
      val evs = events.toArray
      val prev = state.getOption.getOrElse(FBuf(Nil, Nil, 0L))
      val batchMax =
        if (evs.isEmpty) prev.tMax else evs.map(e => tsToUs(e.ts)).max
      val next = FBuf(prev.ts ++ evs.map(e => tsToUs(e.ts)),
        prev.types ++ evs.map(_.event_type),
        math.max(prev.tMax, batchMax))
      state.update(next)
      try {
        // same monotone quiesce rule as stateFn
        val desiredMs = next.tMax / 1000 + EventSessionizer.GapMicros / 1000
        val timeoutMs =
          try math.max(desiredMs, state.getCurrentWatermarkMs() + 1)
          catch { case _: UnsupportedOperationException => desiredMs }
        state.setTimeoutTimestamp(timeoutMs)
      } catch {
        case _: UnsupportedOperationException => ()
      }
      Iterator.empty
    }
  }

  /** EXACT streaming entry: buffers each user's events until the quiesce
    * timeout, then folds them whole — identical to [[funnelBatch]] for
    * every event the watermark admitted, whatever the trigger-arrival
    * order. State is O(events in the user's active window) — the
    * exactness price; [[funnelStream]] is the O(1) approximation.
    */
  def funnelStreamExact(events: Dataset[FEv]): Dataset[FunnelRow] = {
    implicit val rowEnc = Encoders.product[FunnelRow]
    implicit val stEnc = Encoders.product[FBuf]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(stateFnExact)
  }

  /** Batch entry: each group is seen whole, so the same fold is exact. */
  def funnelBatch(events: Dataset[FEv]): Dataset[FunnelRow] = {
    implicit val rowEnc = Encoders.product[FunnelRow]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroups { (user, it) =>
        val sorted = it.map(e => (tsToUs(e.ts), e.event_type)).toArray
          .sortBy(_._1).toSeq
        toRow(user, fold(FState(Unset, Unset, Unset, 0L), sorted)).iterator
      }
  }
}
