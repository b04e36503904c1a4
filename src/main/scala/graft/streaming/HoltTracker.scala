package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Streaming counterpart of `ops.Sessionize.evHolt` — Holt's
  * linear-trend smoothing run the way a capacity panel actually
  * consumes it: one row per CLOSED day per event type with the level /
  * trend / one-step forecast / in-sample MAE as of that day, updating
  * live as the watermark closes days. The batch operator re-folds each
  * type's whole day sequence per run; the tracker carries four Longs.
  *
  * Exactness contract (StreamingSpec parity): the fold is
  * `evHolt`'s BIGINT micro-unit recursion verbatim — init l₁ = y₁·10⁶,
  * b₂ = y₂·10⁶ − l₁, then l ← ⌊(y·10⁶ + l + b)/2⌋ and
  * b ← ⌊((l' − l) + b)/2⌋ via `Math.floorDiv` (≡ the SQL's offset
  * identity H(x) = (x + 2⁵⁰) div 2 − 2⁴⁹), `sae` the exact micro SAE.
  * The terminal doubles replay the SQL's ROUND(…, 6) through the
  * engine round6 (HALF_UP over `BigDecimal.valueOf`), so the LAST row
  * per type is bit-for-bit the batch `evHolt` row over the same
  * events. Days 1 and 2 are the tracker's own live surface (batch
  * excludes single-day types and folds day 2 into init): day 1 reads
  * (level = y₁, trend = 0), day 2 the init state.
  *
  * A day row emits exactly once, when the watermark passes the end of
  * the day (the CusumTracker finalization rule): days fold in strict
  * order whatever the trigger-arrival order, and in-watermark late
  * events land in their own day's count before that day is folded.
  * State: O(1) folded scalars + the in-flight day counts inside the
  * watermark horizon.
  *
  * Scale note: keys are event types — each an independent O(1) fold,
  * the same shape as EwmaTracker; a single type whose raw event volume
  * saturates one task pre-aggregates (type, day, n) upstream.
  */
object HoltTracker {

  case class HEv(ts: Timestamp, event_type: String)
  /** In-flight (day → count) parallel arrays + the folded recursion:
    * k = days folded, l/b/sae in micro-units, emitted = last closed day.
    */
  case class HState(days: Seq[Long], ns: Seq[Long],
                    k: Long, l: Long, b: Long, sae: Long, emitted: Long)
  case class HoltRow(event_type: String, day: Long, n: Long, n_days: Long,
                     level: Double, trend: Double, forecast: Double,
                     mae: Double)

  val DayUs: Long = 86400000000L
  val DayMs: Long = 86400000L
  private val M = 1000000L
  private val Empty =
    HState(Nil, Nil, 0L, 0L, 0L, 0L, Long.MinValue)

  private def r6d(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Fold ONE closed day's count into the recursion — pure, shared by
    * streaming, batch, and the spec replay.
    */
  private[streaming] def step(st: HState, day: Long, n: Long)
      : (HState, HoltRow) = {
    val yM = n * M
    val (k, l, b, sae) = st.k match {
      case 0 => (1L, yM, 0L, 0L)
      case 1 => (2L, st.l, yM - st.l, 0L)
      case k0 =>
        val pred = st.l + st.b
        val lNew = Math.floorDiv(yM + st.l + st.b, 2L)
        val bNew = Math.floorDiv((lNew - st.l) + st.b, 2L)
        (k0 + 1, lNew, bNew, st.sae + math.abs(yM - pred))
    }
    val mae =
      if (k <= 2) 0.0 else r6d(sae.toDouble / (1000000.0 * (k - 2)))
    (st.copy(k = k, l = l, b = b, sae = sae, emitted = day),
      HoltRow("", day, n, k, r6d(l.toDouble / 1e6), r6d(b.toDouble / 1e6),
        r6d((l + b).toDouble / 1e6), mae))
  }

  private def merged(state: GroupState[HState],
      events: Iterator[HEv]): HState = {
    val prev = state.getOption.getOrElse(Empty)
    val m = scala.collection.mutable.Map[Long, Long]()
    prev.days.indices.foreach(i => m(prev.days(i)) = prev.ns(i))
    events.foreach { e =>
      val d = EventSessionizer.tsToUs(e.ts) / DayUs
      m(d) = m.getOrElse(d, 0L) + 1L
    }
    val ds = m.keys.toSeq.sorted
    prev.copy(days = ds, ns = ds.map(m))
  }

  private def advance(key: String, st: HState, wmMs: Long,
      state: GroupState[HState]): Iterator[HoltRow] = {
    val finalThrough = Math.floorDiv(wmMs, DayMs) - 1
    var cur = st
    val out = Seq.newBuilder[HoltRow]
    val idx = st.days.zipWithIndex.toMap
    for (d <- st.days.filter(d => d > st.emitted && d <= finalThrough)
        .sorted) {
      val (next, row) = step(cur, d, st.ns(idx(d)))
      cur = next
      out += row.copy(event_type = key)
    }
    val keepIdx = st.days.zipWithIndex.filter(_._1 > cur.emitted).map(_._2)
    val next = cur.copy(days = keepIdx.map(st.days),
      ns = keepIdx.map(st.ns))
    // GC: a type idle 30 days past its last closed day re-baselines if
    // it ever resumes (the SequentialTracker horizon rule)
    if (keepIdx.isEmpty && (next.emitted == Long.MinValue ||
        wmMs >= (next.emitted + 30) * DayMs)) state.remove()
    else {
      state.update(next)
      next.days.minOption.foreach { d =>
        state.setTimeoutTimestamp(math.max((d + 1) * DayMs, wmMs + 1))
      }
      if (next.days.isEmpty)
        state.setTimeoutTimestamp(
          math.max((next.emitted + 30) * DayMs, wmMs + 1))
    }
    out.result().iterator
  }

  private[streaming] def stateFn(key: String, events: Iterator[HEv],
      state: GroupState[HState]): Iterator[HoltRow] = {
    val wmMs =
      try state.getCurrentWatermarkMs()
      catch { case _: UnsupportedOperationException => 0L }
    if (state.hasTimedOut) advance(key, state.get, wmMs, state)
    else {
      val st = merged(state, events)
      try advance(key, st, wmMs, state)
      catch { // batch mode has no timeout clock — holtBatch emits
        case _: UnsupportedOperationException => Iterator.empty
      }
    }
  }

  /** Streaming entry: one row per observed (type, day), emitted at
    * watermark finalization, folded in strict day order.
    */
  def holtStream(events: Dataset[HEv]): Dataset[HoltRow] = {
    implicit val rowEnc = Encoders.product[HoltRow]
    implicit val stEnc = Encoders.product[HState]
    events.groupByKey(_.event_type)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(stateFn)
  }

  /** Batch entry: every observed day final, folded in day order. The
    * last row per type equals `evHolt`'s row over the same events
    * (StreamingSpec parity).
    */
  def holtBatch(events: Dataset[HEv]): Dataset[HoltRow] = {
    implicit val rowEnc = Encoders.product[HoltRow]
    events.groupByKey(_.event_type)(Encoders.STRING)
      .flatMapGroups { (key, it) =>
        val m = scala.collection.mutable.Map[Long, Long]()
        it.foreach { e =>
          val d = EventSessionizer.tsToUs(e.ts) / DayUs
          m(d) = m.getOrElse(d, 0L) + 1L
        }
        var cur = Empty
        m.keys.toSeq.sorted.map { d =>
          val (next, row) = step(cur, d, m(d))
          cur = next
          row.copy(event_type = key)
        }.iterator
      }
  }
}
