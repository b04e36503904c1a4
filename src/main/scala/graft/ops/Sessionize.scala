package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Event sessionization over the `events` table: 30-minute-gap sessions per
  * user, aggregated to (start, end, n_events, value sum).
  *
  * Two implementations with identical semantics:
  *  - batch (this file): lag/cumulative-sum window — DuckDB-oracle checked;
  *  - streaming (graft.streaming.EventSessionizer): the same sessions via
  *    `flatMapGroupsWithState`, verified against this batch result in
  *    StreamingSpec.
  *
  * Scale: one shuffle on user_id (window partition = the aggregation
  * partition, reused); gap comparison on integer epoch-micros, sums on
  * decimal — exact in both engines.
  */
object Sessionize {

  val GapMicros: Long = 30L * 60 * 1000000

  def evSessionize(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "events").createOrReplaceTempView("__events")
    s.sql(
      s"""WITH flagged AS (
         |  SELECT user_id, ts, event_id, value,
         |         CASE WHEN unix_micros(ts) -
         |                   LAG(unix_micros(ts)) OVER w > $GapMicros
         |              OR LAG(ts) OVER w IS NULL
         |              THEN 1 ELSE 0 END AS new_sess
         |  FROM __events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |tagged AS (
         |  SELECT user_id, ts, event_id, value,
         |         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                             ROWS UNBOUNDED PRECEDING) AS sess_idx
         |  FROM flagged)
         |SELECT user_id, sess_idx, MIN(ts) AS sess_start, MAX(ts) AS sess_end,
         |       COUNT(*) AS n_events,
         |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM tagged GROUP BY user_id, sess_idx
         |ORDER BY user_id, sess_idx""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_sessionize" -> (evSessionize _))

  val oracleSql: Map[String, String] = Map(
    "ev_sessionize" ->
      s"""WITH flagged AS (
         |  SELECT user_id, ts, event_id, value,
         |         CASE WHEN epoch_us(ts) -
         |                   LAG(epoch_us(ts)) OVER w > $GapMicros
         |              OR LAG(ts) OVER w IS NULL
         |              THEN 1 ELSE 0 END AS new_sess
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |tagged AS (
         |  SELECT user_id, ts, event_id, value,
         |         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                             ROWS UNBOUNDED PRECEDING) AS sess_idx
         |  FROM flagged)
         |SELECT user_id, sess_idx::BIGINT AS sess_idx, MIN(ts) AS sess_start,
         |       MAX(ts) AS sess_end, COUNT(*) AS n_events,
         |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM tagged GROUP BY user_id, sess_idx
         |ORDER BY user_id, sess_idx""".stripMargin.replaceAll("\n", " "))
  // (DuckDB window SUM(int) yields INT128; ::BIGINT aligns the schema with
  // Spark's BIGINT window sum.)
}
