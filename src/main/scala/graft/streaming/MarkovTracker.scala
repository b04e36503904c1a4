package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Streaming counterpart of `ops.Sessionize.evMarkov`'s transition
  * STREAM: every consecutive (prev → cur) event-type pair of a user's
  * time-ordered stream emits as a row the moment `cur` arrives; the
  * |types|²-sized transition-matrix aggregate (counts / row-normalized
  * probabilities) is a downstream groupBy any sink can maintain
  * incrementally, so the model updates continuously instead of per
  * recompute.
  *
  * Per-user state is the LAST event (type, micros, id) — O(1). The
  * emit-on-arrival fold applies each trigger's ts-sorted slice on top of
  * the carried last; an in-watermark event arriving in a later trigger
  * but TIMED BEFORE the carried last cannot be retro-sequenced — its
  * transition is DROPPED rather than emitted out of order (the state
  * never regresses, the AttributionTracker monotonicity rule), which is
  * this family's documented cross-trigger approximation.
  * [[markovStreamExact]] buffers each user's events until the quiesce
  * timeout and folds them whole — exact for everything the watermark
  * admitted, at O(active window) state. Batch mode ([[markovBatch]])
  * sees each group whole: EXACT, and StreamingSpec parity-checks its
  * aggregate against the oracle-checked SQL query.
  */
object MarkovTracker {

  case class KEv(ts: Timestamp, user_id: Long, event_id: Long,
                 event_type: String)

  /** lastUs = -1 means no event carried yet; tMax as [[FunnelTracker]]. */
  case class KState(lastType: String, lastUs: Long, lastId: Long, tMax: Long)

  case class KBuf(ts: Seq[Long], ids: Seq[Long], types: Seq[String],
                  tMax: Long)

  case class TransRow(user_id: Long, prev: String, cur: String,
                      t_cur: Timestamp)

  val Unset: Long = -1L

  private def tsToUs(t: Timestamp): Long = EventSessionizer.tsToUs(t)

  private val emptyState = KState("", Unset, Unset, 0L)

  /** The shared pure core: fold (micros, id, type) rows SORTED by
    * (micros, id) onto the carried last, emitting a transition for every
    * event that extends the sequence. Events at-or-before the carried
    * last in (micros, id) order are skipped — never emitted out of
    * sequence, never regressing the state.
    */
  private[streaming] def fold(user: Long, st: KState,
      sorted: Seq[(Long, Long, String)]): (KState, Seq[TransRow]) = {
    var (lt, lu, li) = (st.lastType, st.lastUs, st.lastId)
    val out = scala.collection.mutable.ArrayBuffer.empty[TransRow]
    for ((us, id, tpe) <- sorted) {
      if (lu == Unset) { lt = tpe; lu = us; li = id }
      else if (us > lu || (us == lu && id > li)) {
        out += TransRow(user, lt, tpe, EventSessionizer.usToTs(us))
        lt = tpe; lu = us; li = id
      } // else: at-or-before the carried last — dropped (documented)
    }
    (KState(lt, lu, li, st.tMax), out.toSeq)
  }

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

  private[streaming] def stateFn(user: Long, events: Iterator[KEv],
      state: GroupState[KState]): Iterator[TransRow] = {
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val evs = events.toArray.sortBy(e => (tsToUs(e.ts), e.event_id))
      val prev = state.getOption.getOrElse(emptyState)
      val batchMax = if (evs.isEmpty) 0L else evs.map(e => tsToUs(e.ts)).max
      val (next, rows) = fold(user, prev,
        evs.toSeq.map(e => (tsToUs(e.ts), e.event_id, e.event_type)))
      state.update(next.copy(tMax = math.max(prev.tMax, batchMax)))
      armTimeout(state, math.max(prev.tMax, batchMax))
      rows.iterator
    }
  }

  /** Streaming entry: transitions emit on arrival; O(1) state. */
  def markovStream(events: Dataset[KEv]): Dataset[TransRow] = {
    implicit val rowEnc = Encoders.product[TransRow]
    implicit val stEnc = Encoders.product[KState]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(stateFn)
  }

  private[streaming] def stateFnExact(user: Long, events: Iterator[KEv],
      state: GroupState[KBuf]): Iterator[TransRow] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map { b =>
        val sorted = b.ts.indices.map(i => (b.ts(i), b.ids(i), b.types(i)))
          .sortBy(t => (t._1, t._2))
        fold(user, emptyState, sorted)._2
      }.getOrElse(Nil)
      state.remove()
      out.iterator
    } else {
      val evs = events.toArray
      val prev = state.getOption.getOrElse(KBuf(Nil, Nil, Nil, 0L))
      val batchMax =
        if (evs.isEmpty) prev.tMax else evs.map(e => tsToUs(e.ts)).max
      val next = KBuf(prev.ts ++ evs.map(e => tsToUs(e.ts)),
        prev.ids ++ evs.map(_.event_id), prev.types ++ evs.map(_.event_type),
        math.max(prev.tMax, batchMax))
      state.update(next)
      armTimeout(state, next.tMax)
      Iterator.empty
    }
  }

  /** EXACT streaming entry: buffers until quiesce, folds whole. */
  def markovStreamExact(events: Dataset[KEv]): Dataset[TransRow] = {
    implicit val rowEnc = Encoders.product[TransRow]
    implicit val stEnc = Encoders.product[KBuf]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(stateFnExact)
  }

  /** Batch entry: each group seen whole — exact; its (prev, cur) counts
    * equal the SQL query's transition matrix (StreamingSpec parity).
    */
  def markovBatch(events: Dataset[KEv]): Dataset[TransRow] = {
    implicit val rowEnc = Encoders.product[TransRow]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroups { (user, it) =>
        val sorted = it.toArray.sortBy(e => (tsToUs(e.ts), e.event_id))
          .toSeq.map(e => (tsToUs(e.ts), e.event_id, e.event_type))
        fold(user, emptyState, sorted)._2.iterator
      }
  }
}
