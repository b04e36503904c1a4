package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream conversion join: every (click, purchase)
  * pair of the same user with the purchase inside `maxGapMin` minutes
  * after the click. The candidate-pair relation that last-touch
  * attribution (ops.Sessionize.evAttribution / AttributionTracker)
  * REDUCES — exposed whole because multi-touch models (linear,
  * time-decay, position) all start from exactly this relation.
  *
  * Mechanically this is the one Structured Streaming primitive the
  * tracker family doesn't exercise: a symmetric stream-stream interval
  * join. No custom state code — Spark's join state store buffers each
  * side and the TIME-RANGE condition (`purchase_ts BETWEEN click_ts AND
  * click_ts + gap`) lets the watermark evict a click once no future
  * purchase can reach it, so state is bounded by (events in the gap
  * window) per side, independent of stream length.
  *
  * Mode-agnostic like Streams: `withWatermark` is a no-op on a batch
  * frame, so the same plan answers the oracled batch query and the
  * streaming run; StreamingSpec asserts batch == streaming on disordered
  * input. Late data: a click arriving after the watermark passed its
  * eviction horizon can no longer pair — the documented append-mode
  * approximation (the batch run still finds it; the spec pins the
  * divergence).
  *
  * Output is integer micros (no timestamp columns): exact in both
  * engines. One exchange per side on user_id; the join is co-partitioned.
  */
object ConversionJoin {

  def convPairs(events: DataFrame, maxGapMin: Int = 30,
      wm: String = "2 hours"): DataFrame = {
    val e = events.withWatermark("ts", wm)
    val c = e.where("event_type = 'click'")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val p = e.where("event_type = 'purchase'")
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
        col("value"))
    c.join(p, expr(
      s"""user_id = p_user_id
         |AND purchase_ts >= click_ts
         |AND purchase_ts <= click_ts + interval $maxGapMin minutes"""
        .stripMargin))
      .select(col("user_id"), col("purchase_id"),
        expr("unix_micros(purchase_ts)").as("purchase_us"), col("value"),
        col("click_id"), expr("unix_micros(click_ts)").as("click_us"),
        expr("unix_micros(purchase_ts) - unix_micros(click_ts)")
          .as("gap_us"))
  }
}
