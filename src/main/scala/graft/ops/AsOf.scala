package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the brief's canonical "operator Spark
  * lacks", built by composition (preference order (a)): tag both streams,
  * union, and carry the last order forward with an `ignoreNulls` window —
  * one shuffle on the join key, no per-row range probe. The oracle is
  * DuckDB's *native* ASOF JOIN, so the composition is checked against a
  * first-class implementation of the semantics.
  *
  * Semantics: for every event, the most recent order of the same customer
  * with o_orderdate <= ts (ties on (customer, date) resolved to the max
  * order key on both sides).
  *
  * Scale: the union is linear; the single window pass is partitioned by
  * customer — the same shuffle an equality join would need, with no
  * orders×events blow-up in between.
  */
object AsOf {

  def evAsof(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(s, dir, "orders")
      .groupBy(col("o_custkey").as("cust"), col("o_orderdate").as("t"))
      .agg(max(col("o_orderkey")).as("okey"))
      .select(col("cust"), col("t"), lit(0).as("kind"), col("okey"),
        lit(null).cast("long").as("event_id"))
    val events = Tables.load(s, dir, "events")
      .select(col("user_id").as("cust"), col("ts").as("t"), lit(1).as("kind"),
        lit(null).cast("long").as("okey"), col("event_id"))
    // kind orders an order row before an event at the same timestamp, so
    // an event exactly at o_orderdate sees that order (ASOF's >= bound)
    val w = Window.partitionBy("cust")
      .orderBy(col("t"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders.unionAll(events)
      .withColumn("carry", last(col("okey"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("event_id"), col("carry").as("okey"))
      .orderBy("event_id")
  }

  /** Range (interval) join, composed for scale: find how many events fall
    * within ±5 minutes of each probe event (the first 200 events). A naive
    * theta join is O(probes × events); instead both sides are bucketed by
    * a 5-minute epoch bin and probes explode into their 3 candidate bins —
    * the join becomes an equality join on (bin) with a final exact range
    * filter. The oracle is DuckDB's native inequality join, so the
    * bucketed rewrite is verified against first-class range semantics.
    */
  def evRangeCount(s: SparkSession, dir: String): DataFrame = {
    val binUs = 300000000L // 5 minutes in micros
    val ev = Tables.load(s, dir, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    val all = ev.withColumn("bin", expr(s"us div $binUs"))
    val probes = ev.filter(col("event_id") < 200)
      .select(col("event_id").as("probe_id"), col("us").as("pus"))
      .withColumn("bin", explode(array(
        expr(s"pus div $binUs - 1"), expr(s"pus div $binUs"),
        expr(s"pus div $binUs + 1"))))
    probes.join(all, Seq("bin"))
      .filter(col("event_id") =!= col("probe_id") &&
        abs(col("us") - col("pus")) <= binUs)
      .groupBy("probe_id")
      .agg(count(lit(1)).as("n_nearby"))
      .orderBy("probe_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_asof" -> (evAsof _),
    "ev_range_count" -> (evRangeCount _))

  val oracleSql: Map[String, String] = Map(
    "ev_asof" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS okey
        |  FROM orders GROUP BY o_custkey, o_orderdate)
        |SELECT e.event_id, o.okey
        |FROM events e ASOF LEFT JOIN o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin.replaceAll("\n", " "),
    "ev_range_count" ->
      """SELECT p.event_id AS probe_id, COUNT(*) AS n_nearby
        |FROM events p JOIN events e
        |  ON e.event_id <> p.event_id
        | AND abs(epoch_us(e.ts) - epoch_us(p.ts)) <= 300000000
        |WHERE p.event_id < 200
        |GROUP BY p.event_id ORDER BY probe_id""".stripMargin.replaceAll("\n", " "))
}
