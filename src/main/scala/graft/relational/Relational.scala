package graft.relational

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** The relational parity surface (SURVEY §2.7): each query exercises the
  * Spark primitive that a reference dataflow stage maps to, and is verified
  * against a DuckDB oracle running the equivalent ANSI SQL on the same
  * parquet files (driver harness, CORRECTNESS_r{N}.json).
  *
  * Floating-point discipline: any order-dependent aggregate (SUM/AVG over
  * doubles) is computed on `decimal(18,2)` — exact, associative — and only
  * then cast back to double, so Spark's partial-aggregation order and
  * DuckDB's single-threaded fold produce bit-identical results. Every query
  * ends in a total ORDER BY with a unique tiebreaker so row order is stable.
  */
object Relational {

  /** Exact associative sum of a 2-decimal double column, surfaced as double. */
  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  // Oracle-side equivalent of dsum
  private def sqlDsum(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE)"

  def q1_scan(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .orderBy("l_orderkey", "l_linenumber")
      .select("l_orderkey", "l_quantity")

  def q2_filter(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
              col("l_quantity") < 24)
      .orderBy("l_orderkey", "l_linenumber")
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net"))

  def q3_agg(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        round(dsum(col("l_extendedprice")) / count(lit(1)), 6).as("avg_price"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus")

  def q4_union_agg(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    li.select(col("l_suppkey").as("src"))
      .unionAll(li.select(col("l_partkey").as("src")))
      .groupBy("src").agg(count(lit(1)).as("deg"))
      .orderBy(col("deg").desc, col("src"))
      .limit(100)
  }

  def q5_join(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
    val li = Tables.load(s, dir, "lineitem")
    o.join(li, o("o_orderkey") === li("l_orderkey"))
      .groupBy("o_orderkey", "o_totalprice")
      .agg(count(col("l_linenumber")).as("n_items"))
      .orderBy("o_orderkey")
  }

  def q6_broadcast_join(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val n = Tables.load(s, dir, "nation")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy("n_name").agg(count(lit(1)).as("cnt"))
      .orderBy("n_name")
  }

  def q7_anti_join(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
    val li = Tables.load(s, dir, "lineitem")
    o.join(li, o("o_orderkey") === li("l_orderkey"), "left_anti")
      .select("o_orderkey").orderBy("o_orderkey")
  }

  def q8_topk(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.load(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w).cast("long")) // DuckDB emits BIGINT
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  def q9_global_agg(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem").agg(
      count(lit(1)).as("cnt"),
      dsum(col("l_quantity")).as("sum_qty"),
      min(col("l_shipdate")).as("min_ship"),
      max(col("l_shipdate")).as("max_ship"))

  def q10_multi_join(s: SparkSession, dir: String): DataFrame = {
    val r = Tables.load(s, dir, "region")
    val n = Tables.load(s, dir, "nation")
    val c = Tables.load(s, dir, "customer")
    val o = Tables.load(s, dir, "orders")
    r.join(n, r("r_regionkey") === n("n_regionkey"))
      .join(c, n("n_nationkey") === c("c_nationkey"))
      .join(o, c("c_custkey") === o("o_custkey"))
      .groupBy("r_name", "n_name")
      .agg(dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("r_name", "n_name")
  }

  def q11_explode(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .filter(col("o_orderkey") <= 100)
      .select(col("o_orderkey"),
        explode(array(col("o_custkey"), col("o_custkey") + 1)).as("v"))
      .orderBy("o_orderkey", "v")

  def q12_intersect(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders").select("o_custkey")
    val c = Tables.load(s, dir, "customer").select(col("c_custkey").as("o_custkey"))
    o.intersect(c).orderBy("o_custkey")
  }

  def q14_events_agg(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
      .orderBy("user_id", "event_type")

  def q15_date_trunc(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .groupBy(date_trunc("day", col("ts")).as("d"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("d")

  /** Rollup with grouping flags (SURVEY §2.6 "grouping sets/cube/rollup"):
    * names coalesced so the NULL-ordering difference between engines never
    * reaches the sort.
    */
  def q17_rollup(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "region").createOrReplaceTempView("__region")
    Tables.load(s, dir, "nation").createOrReplaceTempView("__nation")
    s.sql(
      """SELECT COALESCE(r_name, 'ALL') AS rn, COALESCE(n_name, 'ALL') AS nn,
        |       COUNT(*) AS cnt,
        |       CAST(GROUPING(r_name) + GROUPING(n_name) AS BIGINT) AS g
        |FROM __region JOIN __nation ON r_regionkey = n_regionkey
        |GROUP BY ROLLUP(r_name, n_name) ORDER BY g, rn, nn""".stripMargin)
  }

  /** CUBE over two dimensions with grouping flags (SURVEY §2.6). */
  def q21_cube(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "orders").createOrReplaceTempView("__orders")
    s.sql(
      """SELECT COALESCE(o_orderstatus, 'ALL') AS st,
        |       COALESCE(o_orderpriority, 'ALL') AS pri,
        |       COUNT(*) AS cnt,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |       CAST(GROUPING(o_orderstatus) + GROUPING(o_orderpriority) AS BIGINT) AS g
        |FROM __orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY g, st, pri""".stripMargin)
  }

  /** Distinct aggregation (SURVEY §2.6). */
  def q18_distinct_agg(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "part")
      .groupBy("p_brand")
      .agg(countDistinct(col("p_type")).as("n_types"),
        count(lit(1)).as("cnt"))
      .orderBy("p_brand")

  /** String scalar functions (SURVEY §2.6). */
  def q19_strings(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "part")
      .orderBy("p_partkey")
      .selectExpr("p_partkey",
        "upper(p_name) AS up",
        "replace(substring(p_name, 1, 8), ' ', '_') AS frag",
        "concat_ws('|', p_brand, p_type) AS tag",
        "length(p_name) AS len")

  /** Skew-safe two-stage salted aggregation: the skewed key (3 giant
    * l_returnflag groups at any scale) is widened with a 16-way
    * deterministic salt for the first shuffle, then combined. Results are
    * identical to the direct aggregation (decimal-exact sums are
    * associative) — which is exactly what the plain-SQL oracle computes.
    */
  def q22_salted_agg(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .withColumn("salt", pmod(xxhash64(col("l_orderkey")), lit(16)))
      .groupBy("l_returnflag", "salt")
      .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("partial_qty"),
        count(lit(1)).as("partial_cnt"))
      .groupBy("l_returnflag")
      .agg(sum(col("partial_qty")).cast(DoubleType).as("sum_qty"),
        sum(col("partial_cnt")).as("cnt"))
      .orderBy("l_returnflag")

  /** JSON scalar functions over the events.props column (SURVEY §2.6). */
  def q23_json(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .selectExpr("CAST(get_json_object(props, '$.k') AS BIGINT) AS k", "value")
      .groupBy("k")
      .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
      .orderBy("k")

  /** Date/time scalar functions (SURVEY §2.6): calendar parts + an
    * integer epoch-day — formulations chosen to be dialect-safe (no
    * day-of-week numbering or month-arithmetic edge cases).
    */
  def q27_datefuncs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .orderBy("o_orderkey")
      .selectExpr("o_orderkey",
        "year(o_orderdate) AS y",
        "month(o_orderdate) AS m",
        "day(o_orderdate) AS d",
        "quarter(o_orderdate) AS q",
        // o_orderdate reads as TIMESTAMP_NTZ; the cast is identity under
        // the UTC session timezone
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000 AS epoch_day")

  /** Window functions with frames (SURVEY §2.6): running decimal-exact
    * totals over an explicit ROWS frame, lag/lead, rank and dense_rank —
    * all on a unique total ordering.
    */
  def q28_window_frames(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "orders").createOrReplaceTempView("__orders")
    s.sql(
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |       AS DOUBLE) AS running_total,
        |  LAG(o_orderkey) OVER w AS prev_key,
        |  LEAD(o_orderkey) OVER w AS next_key,
        |  CAST(RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus)
        |       AS BIGINT) AS status_rank,
        |  CAST(DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus)
        |       AS BIGINT) AS status_drank
        |FROM __orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)
  }

  /** EXCEPT set operation (SURVEY §2.6 set ops, complementing q12's
    * INTERSECT): part keys never ordered.
    */
  def q29_except(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(s, dir, "part").select(col("p_partkey").as("k"))
    val li = Tables.load(s, dir, "lineitem")
      .filter(col("l_quantity") > 45) // parts never ordered in bulk remain
      .select(col("l_partkey").as("k"))
    p.except(li).orderBy("k")
  }

  /** Manual pivot (conditional aggregation — the engine-portable crosstab):
    * order totals per customer spread across status columns.
    */
  def q30_pivot(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "orders").createOrReplaceTempView("__orders")
    s.sql(
      """SELECT o_custkey,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS open_total,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS filled_total,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS partial_total
        |FROM __orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)
  }

  /** HLL approximate distinct (SURVEY §2.6), BANDED ORACLE form (r12
    * verdict item #4 — the last no_oracle row): the raw sketches differ
    * across engines (Spark's HLL++ vs DuckDB's HLL use different
    * register layouts, so the estimates themselves can never
    * hash-match), but the op's CONTRACT — the estimate lands within the
    * declared 5 % band of the exact count — is computable in both
    * engines against the same exact anchor. Each engine runs its OWN
    * approx_count_distinct and its OWN exact COUNT(DISTINCT), and the
    * compared row is (exact counts, band-test booleans): it
    * hash-matches iff both engines' sketches honor the band on this
    * fixture, which is the q16 known-answer discipline generalized to
    * an approximate op. The band test is integer-exact
    * (|approx − exact| · 20 ≤ exact — no float compare). An engine
    * whose sketch degrades past 5 % flips a boolean and fails LOUDLY.
    * The EndToEnd spec keeps the direct 5 %-accuracy assertion as the
    * second, engine-local check.
    */
  def q20_approx_distinct(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "lineitem").createOrReplaceTempView("__li20")
    s.sql(
      """SELECT exact_parts, exact_orders,
        |  abs(approx_parts - exact_parts) * 20 <= exact_parts
        |    AS parts_within_5pct,
        |  abs(approx_orders - exact_orders) * 20 <= exact_orders
        |    AS orders_within_5pct
        |FROM (
        |  SELECT approx_count_distinct(l_partkey, 0.02) AS approx_parts,
        |         approx_count_distinct(l_orderkey, 0.02) AS approx_orders,
        |         COUNT(DISTINCT l_partkey) AS exact_parts,
        |         COUNT(DISTINCT l_orderkey) AS exact_orders
        |  FROM __li20)""".stripMargin)
  }

  /** Exact interpolated percentiles (data-statistics op): quarter
    * percentiles over l_quantity per return flag. l_quantity holds
    * integral values and the quartile fractions are binary fractions, so
    * `lower + (higher-lower)·frac` is EXACT double arithmetic — Spark's
    * percentile and DuckDB's quantile_cont agree bit-for-bit (an
    * approximate-sketch percentile could only be rows-only checked, like
    * q20).
    */
  def q31_percentiles(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "lineitem").createOrReplaceTempView("__li31")
    s.sql(
      """SELECT l_returnflag,
        |  percentile(l_quantity, 0.25D) AS p25,
        |  percentile(l_quantity, 0.5D)  AS p50,
        |  percentile(l_quantity, 0.75D) AS p75,
        |  CAST(MIN(l_quantity) AS DOUBLE) AS qmin,
        |  CAST(MAX(l_quantity) AS DOUBLE) AS qmax
        |FROM __li31 GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  /** Fixed-width histogram (data-statistics op): 5000-wide price buckets,
    * capped at bucket 19. Identical doubles through identical IEEE
    * division/floor in both engines; the per-bucket money total uses the
    * decimal-exact sum discipline.
    */
  def q32_histogram(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "lineitem").createOrReplaceTempView("__li32")
    s.sql(
      """SELECT CAST(LEAST(19, FLOOR(l_extendedprice / 5000.0)) AS BIGINT) AS bucket,
        |       COUNT(*) AS cnt,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM __li32 GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Explicit GROUPING SETS (SURVEY §2.6) — the third member of the
    * rollup/cube/grouping-sets trio, with a set that NEITHER rollup nor
    * cube produces: (status, priority), (status), (priority) but no
    * grand total. One shuffle; Spark expands the sets with a single
    * Expand node feeding one hash aggregate (same plan family as q17).
    */
  def q35_grouping_sets(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "orders").createOrReplaceTempView("__orders35")
    s.sql(
      """SELECT COALESCE(o_orderstatus, 'ALL') AS st,
        |       COALESCE(o_orderpriority, 'ALL') AS pri,
        |       COUNT(*) AS cnt,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |       CAST(GROUPING(o_orderstatus) + GROUPING(o_orderpriority) AS BIGINT) AS g
        |FROM __orders35
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderstatus), (o_orderpriority))
        |ORDER BY g, st, pri""".stripMargin)
  }

  /** Bivariate statistics (corr / covariance / stddev) per group — the
    * moment-sum route: COUNT and the five decimal-EXACT moment sums
    * (Σx, Σy, Σxy, Σx², Σy²) come out of one partial+final aggregate,
    * and the statistics are closed-form double arithmetic on those six
    * exact scalars. Spark's own corr()/covar_samp() stream doubles in
    * partial-aggregation order, so their low bits vary run to run; the
    * moment route is order-free (decimal addition is associative), which
    * is what makes the DuckDB hash comparison possible at all — both
    * engines evaluate the identical closed-form expression on identical
    * exact inputs.
    *
    * Scale design: one map-side-combined aggregate over the fact table —
    * the same single-shuffle shape as q3; the closed-form math runs on
    * |groups| rows.
    */
  def q36_corr(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "lineitem").createOrReplaceTempView("__li36")
    s.sql(
      """WITH m AS (
        |  SELECT l_returnflag,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
        |             * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
        |             * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |             * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
        |  FROM __li36 GROUP BY l_returnflag)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |  ROUND((n * sxy - sx * sy)
        |    / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr_qty_price,
        |  ROUND((sxy - sx * sy / n) / (n - 1), 6) AS cov_qty_price,
        |  ROUND(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS std_qty,
        |  ROUND(sqrt((syy - sy * sy / n) / (n - 1)), 6) AS std_price
        |FROM m ORDER BY l_returnflag""".stripMargin)
  }

  /** Simple linear regression per group — slope, intercept, and R² of
    * extendedprice on quantity, all in CLOSED FORM from the same six
    * decimal-exact moment sums as q36 (one partial+final aggregate, the
    * q3 single-shuffle shape). Spark's own regr_slope/regr_r2 stream
    * doubles in partition order — unusable for a cross-engine hash; the
    * moment formulation evaluates identical expressions on identical
    * exact scalars in both engines. Intercept uses the direct closed
    * form (sy·sxx − sx·sxy)/(n·sxx − sx²) rather than chaining through
    * the rounded slope, so each output is ONE fixed-shape expression.
    */
  def q38_regr(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "lineitem").createOrReplaceTempView("__li38")
    s.sql(
      """WITH m AS (
        |  SELECT l_returnflag,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
        |             * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
        |             * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |             * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
        |  FROM __li38 GROUP BY l_returnflag)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |  ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
        |  ROUND((sy * sxx - sx * sxy) / (n * sxx - sx * sx), 6) AS intercept,
        |  ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
        |    / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
        |FROM m ORDER BY l_returnflag""".stripMargin)
  }

  /** Robust statistics per group — median + MAD (median absolute
    * deviation) + the 90th deviation percentile: the outlier-resistant
    * complement to q36's moment statistics. Inherently TWO passes over
    * the fact (MAD is a percentile of deviations FROM a percentile): the
    * 3-row median relation broadcasts back onto the scan, then one more
    * exact-percentile aggregate — the canonical exact-two-pass shape
    * (approximate one-pass sketches are the q20 family's trade).
    * Quantities are integer-valued and interpolation points are dyadic,
    * so every value is FP-exact in both engines (the q31 discipline).
    */
  def q37_mad(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "lineitem").createOrReplaceTempView("__li37")
    s.sql(
      """WITH med AS (
        |  SELECT l_returnflag, percentile(l_quantity, 0.5D) AS med
        |  FROM __li37 GROUP BY l_returnflag)
        |SELECT l.l_returnflag, COUNT(*) AS n, m.med AS med_qty,
        |       percentile(abs(l.l_quantity - m.med), 0.5D) AS mad_qty,
        |       percentile(abs(l.l_quantity - m.med), 0.9D) AS dev_p90
        |FROM __li37 l JOIN med m ON m.l_returnflag = l.l_returnflag
        |GROUP BY l.l_returnflag, m.med
        |ORDER BY l.l_returnflag""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q37_mad" -> (q37_mad _),
    "q38_regr" -> (q38_regr _),
    "q36_corr" -> (q36_corr _),
    "q32_histogram" -> (q32_histogram _),
    "q35_grouping_sets" -> (q35_grouping_sets _),
    "q17_rollup" -> (q17_rollup _),
    "q21_cube" -> (q21_cube _),
    "q18_distinct_agg" -> (q18_distinct_agg _),
    "q19_strings" -> (q19_strings _),
    "q20_approx_distinct" -> (q20_approx_distinct _),
    "q31_percentiles" -> (q31_percentiles _),
    "q22_salted_agg" -> (q22_salted_agg _),
    "q23_json" -> (q23_json _),
    "q27_datefuncs" -> (q27_datefuncs _),
    "q28_window_frames" -> (q28_window_frames _),
    "q29_except" -> (q29_except _),
    "q30_pivot" -> (q30_pivot _),
    "q1_scan" -> (q1_scan _),
    "q2_filter" -> (q2_filter _),
    "q3_agg" -> (q3_agg _),
    "q4_union_agg" -> (q4_union_agg _),
    "q5_join" -> (q5_join _),
    "q6_broadcast_join" -> (q6_broadcast_join _),
    "q7_anti_join" -> (q7_anti_join _),
    "q8_topk" -> (q8_topk _),
    "q9_global_agg" -> (q9_global_agg _),
    "q10_multi_join" -> (q10_multi_join _),
    "q11_explode" -> (q11_explode _),
    "q12_intersect" -> (q12_intersect _),
    "q14_events_agg" -> (q14_events_agg _),
    "q15_date_trunc" -> (q15_date_trunc _))

  val oracleSql: Map[String, String] = Map(
    "q20_approx_distinct" ->
      ("SELECT exact_parts, exact_orders, " +
        "abs(approx_parts - exact_parts) * 20 <= exact_parts " +
        "AS parts_within_5pct, " +
        "abs(approx_orders - exact_orders) * 20 <= exact_orders " +
        "AS orders_within_5pct " +
        "FROM (SELECT approx_count_distinct(l_partkey) AS approx_parts, " +
        "approx_count_distinct(l_orderkey) AS approx_orders, " +
        "COUNT(DISTINCT l_partkey) AS exact_parts, " +
        "COUNT(DISTINCT l_orderkey) AS exact_orders FROM lineitem)"),
    "q37_mad" ->
      ("WITH med AS (SELECT l_returnflag, " +
        "quantile_cont(l_quantity, 0.5) AS med " +
        "FROM lineitem GROUP BY l_returnflag) " +
        "SELECT l.l_returnflag, COUNT(*) AS n, m.med AS med_qty, " +
        "quantile_cont(abs(l.l_quantity - m.med), 0.5) AS mad_qty, " +
        "quantile_cont(abs(l.l_quantity - m.med), 0.9) AS dev_p90 " +
        "FROM lineitem l JOIN med m ON m.l_returnflag = l.l_returnflag " +
        "GROUP BY l.l_returnflag, m.med ORDER BY l.l_returnflag"),
    "q38_regr" ->
      ("WITH m AS (SELECT l_returnflag, " +
        "CAST(COUNT(*) AS DOUBLE) AS n, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) " +
        "* CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) " +
        "* CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) " +
        "* CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy " +
        "FROM lineitem GROUP BY l_returnflag) " +
        "SELECT l_returnflag, CAST(n AS BIGINT) AS n, " +
        "ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope, " +
        "ROUND((sy * sxx - sx * sxy) / (n * sxx - sx * sx), 6) AS intercept, " +
        "ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy) " +
        "/ ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2 " +
        "FROM m ORDER BY l_returnflag"),
    "q36_corr" ->
      ("WITH m AS (SELECT l_returnflag, " +
        "CAST(COUNT(*) AS DOUBLE) AS n, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) " +
        "* CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) " +
        "* CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) " +
        "* CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy " +
        "FROM lineitem GROUP BY l_returnflag) " +
        "SELECT l_returnflag, CAST(n AS BIGINT) AS n, " +
        "ROUND((n * sxy - sx * sy) " +
        "/ sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr_qty_price, " +
        "ROUND((sxy - sx * sy / n) / (n - 1), 6) AS cov_qty_price, " +
        "ROUND(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS std_qty, " +
        "ROUND(sqrt((syy - sy * sy / n) / (n - 1)), 6) AS std_price " +
        "FROM m ORDER BY l_returnflag"),
    "q32_histogram" ->
      ("SELECT LEAST(19, FLOOR(l_extendedprice / 5000.0))::BIGINT AS bucket, " +
        "COUNT(*) AS cnt, " +
        "(SUM(l_extendedprice::DECIMAL(18,2)))::DOUBLE AS total " +
        "FROM lineitem GROUP BY 1 ORDER BY 1"),
    "q31_percentiles" ->
      ("SELECT l_returnflag, " +
        "quantile_cont(l_quantity, 0.25) AS p25, " +
        "quantile_cont(l_quantity, 0.5) AS p50, " +
        "quantile_cont(l_quantity, 0.75) AS p75, " +
        "MIN(l_quantity)::DOUBLE AS qmin, MAX(l_quantity)::DOUBLE AS qmax " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "q17_rollup" ->
      ("SELECT COALESCE(r_name, 'ALL') AS rn, COALESCE(n_name, 'ALL') AS nn, " +
        "COUNT(*) AS cnt, (GROUPING(r_name) + GROUPING(n_name))::BIGINT AS g " +
        "FROM region JOIN nation ON r_regionkey = n_regionkey " +
        "GROUP BY ROLLUP(r_name, n_name) ORDER BY g, rn, nn"),
    "q35_grouping_sets" ->
      ("SELECT COALESCE(o_orderstatus, 'ALL') AS st, " +
        "COALESCE(o_orderpriority, 'ALL') AS pri, COUNT(*) AS cnt, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price, " +
        "(GROUPING(o_orderstatus) + GROUPING(o_orderpriority))::BIGINT AS g " +
        "FROM orders GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), " +
        "(o_orderstatus), (o_orderpriority)) ORDER BY g, st, pri"),
    "q21_cube" ->
      ("SELECT COALESCE(o_orderstatus, 'ALL') AS st, " +
        "COALESCE(o_orderpriority, 'ALL') AS pri, COUNT(*) AS cnt, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price, " +
        "(GROUPING(o_orderstatus) + GROUPING(o_orderpriority))::BIGINT AS g " +
        "FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority) " +
        "ORDER BY g, st, pri"),
    "q18_distinct_agg" ->
      ("SELECT p_brand, COUNT(DISTINCT p_type) AS n_types, COUNT(*) AS cnt " +
        "FROM part GROUP BY p_brand ORDER BY p_brand"),
    "q22_salted_agg" ->
      (s"SELECT l_returnflag, ${sqlDsum("l_quantity")} AS sum_qty, " +
        "COUNT(*) AS cnt FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "q23_json" ->
      (s"SELECT CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k, " +
        s"COUNT(*) AS cnt, ${sqlDsum("value")} AS sum_value " +
        "FROM events GROUP BY k ORDER BY k"),
    "q29_except" ->
      ("SELECT p_partkey AS k FROM part EXCEPT " +
        "SELECT l_partkey FROM lineitem WHERE l_quantity > 45 ORDER BY k"),
    "q30_pivot" ->
      ("SELECT o_custkey, " +
        "CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS open_total, " +
        "CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS filled_total, " +
        "CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS partial_total " +
        "FROM orders GROUP BY o_custkey ORDER BY o_custkey"),
    "q27_datefuncs" ->
      ("SELECT o_orderkey, year(o_orderdate)::INT AS y, month(o_orderdate)::INT AS m, " +
        "day(o_orderdate)::INT AS d, quarter(o_orderdate)::INT AS q, " +
        "epoch_us(o_orderdate) // 86400000000 AS epoch_day " +
        "FROM orders ORDER BY o_orderkey"),
    "q28_window_frames" ->
      ("SELECT o_custkey, o_orderkey, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) " +
        "OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total, " +
        "LAG(o_orderkey) OVER w AS prev_key, LEAD(o_orderkey) OVER w AS next_key, " +
        "RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS status_rank, " +
        "DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS status_drank " +
        "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) " +
        "ORDER BY o_custkey, o_orderkey"),
    "q19_strings" ->
      ("SELECT p_partkey, upper(p_name) AS up, " +
        "replace(substr(p_name, 1, 8), ' ', '_') AS frag, " +
        "concat_ws('|', p_brand, p_type) AS tag, length(p_name) AS len " +
        "FROM part ORDER BY p_partkey"),
    "q1_scan" ->
      "SELECT l_orderkey, l_quantity FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "q2_filter" ->
      ("SELECT l_orderkey, l_extendedprice*(1-l_discount) AS net FROM lineitem " +
        "WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_quantity < 24 " +
        "ORDER BY l_orderkey, l_linenumber"),
    "q3_agg" ->
      (s"SELECT l_returnflag, l_linestatus, ${sqlDsum("l_quantity")} AS sum_qty, " +
        s"ROUND(${sqlDsum("l_extendedprice")} / COUNT(*), 6) AS avg_price, " +
        "COUNT(*) AS cnt FROM lineitem GROUP BY l_returnflag, l_linestatus " +
        "ORDER BY l_returnflag, l_linestatus"),
    "q4_union_agg" ->
      ("SELECT src, COUNT(*) AS deg FROM (SELECT l_suppkey AS src FROM lineitem " +
        "UNION ALL SELECT l_partkey FROM lineitem) GROUP BY src " +
        "ORDER BY deg DESC, src LIMIT 100"),
    "q5_join" ->
      ("SELECT o_orderkey, o_totalprice, COUNT(l_linenumber) AS n_items FROM orders " +
        "JOIN lineitem ON o_orderkey = l_orderkey GROUP BY o_orderkey, o_totalprice " +
        "ORDER BY o_orderkey"),
    "q6_broadcast_join" ->
      ("SELECT n_name, COUNT(*) AS cnt FROM customer JOIN nation " +
        "ON c_nationkey = n_nationkey GROUP BY n_name ORDER BY n_name"),
    "q7_anti_join" ->
      ("SELECT o_orderkey FROM orders WHERE o_orderkey NOT IN " +
        "(SELECT l_orderkey FROM lineitem) ORDER BY o_orderkey"),
    "q8_topk" ->
      ("SELECT * FROM (SELECT o_custkey, o_orderkey, o_totalprice, ROW_NUMBER() OVER " +
        "(PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn " +
        "FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn"),
    "q9_global_agg" ->
      (s"SELECT COUNT(*) AS cnt, ${sqlDsum("l_quantity")} AS sum_qty, " +
        "MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship FROM lineitem"),
    "q10_multi_join" ->
      (s"SELECT r_name, n_name, ${sqlDsum("o_totalprice")} AS sum_price FROM region " +
        "JOIN nation ON r_regionkey = n_regionkey " +
        "JOIN customer ON n_nationkey = c_nationkey " +
        "JOIN orders ON c_custkey = o_custkey " +
        "GROUP BY r_name, n_name ORDER BY r_name, n_name"),
    "q11_explode" ->
      ("SELECT o_orderkey, UNNEST(ARRAY[o_custkey, o_custkey+1]) AS v FROM orders " +
        "WHERE o_orderkey <= 100 ORDER BY o_orderkey, v"),
    "q12_intersect" ->
      ("SELECT o_custkey FROM orders INTERSECT SELECT c_custkey FROM customer " +
        "ORDER BY o_custkey"),
    "q14_events_agg" ->
      (s"SELECT user_id, event_type, COUNT(*) AS cnt, ${sqlDsum("value")} AS sum_value " +
        "FROM events GROUP BY user_id, event_type ORDER BY user_id, event_type"),
    "q15_date_trunc" ->
      ("SELECT DATE_TRUNC('day', ts) AS d, COUNT(*) AS cnt FROM events " +
        "GROUP BY d ORDER BY d"))
}
