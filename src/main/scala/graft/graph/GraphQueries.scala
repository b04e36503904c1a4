package graft.graph

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-checkable query surface of the graph layer (SURVEY §2.7 Q13 +
  * the max-flow entry point §3.1). The BFS query is DuckDB-oracle-checked
  * via a recursive CTE; max-flow is not SQL-expressible, so its `queries`
  * entry is rows-only checked by the driver and its real correctness gate
  * is the Edmonds-Karp-oracle ScalaTest suite (MaxFlowSpec,
  * GraphQueriesSpec).
  */
object GraphQueries {

  /** Node encoding for the lineitem-derived bipartite graph: suppliers keep
    * their key; parts are offset so the id spaces don't collide.
    */
  private val PartOffset = 1000000L

  /** Q13: iterative-fixpoint BFS — shortest hop distance from supplier 1
    * over the supplier↔part co-occurrence graph.
    */
  def q13_bfs(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val fwd = li.select(col("l_suppkey").as("src"),
      (col("l_partkey") + PartOffset).as("dst")).distinct()
    val edges = fwd.unionAll(fwd.select(col("dst").as("src"), col("src").as("dst")))
    Bfs.run(s, edges, Seq(1L), maxDepth = 6).orderBy("node")
  }

  val q13OracleSql: String =
    """WITH RECURSIVE edges AS (
      |  SELECT DISTINCT l_suppkey AS u, l_partkey + 1000000 AS v FROM lineitem
      |  UNION
      |  SELECT DISTINCT l_partkey + 1000000 AS u, l_suppkey AS v FROM lineitem
      |), walk(node, dist) AS (
      |  SELECT CAST(1 AS BIGINT) AS node, 0 AS dist
      |  UNION
      |  SELECT e.v, w.dist + 1 FROM walk w JOIN edges e ON e.u = w.node
      |  WHERE w.dist < 6
      |)
      |SELECT node, MIN(dist) AS dist FROM walk GROUP BY node ORDER BY node
      |""".stripMargin.replaceAll("\n", " ").trim

  /** The max-flow "query" (SURVEY §3.1): supplier/part bipartite graph with
    * lineitem-count capacities; flow from the first 8 suppliers to the
    * first 8 parts. Exact (engine + cleanup), hence deterministic.
    */
  def q16_maxflow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.load(s, dir, "lineitem").filter(col("l_orderkey") < 2000)
    val pairs = li.groupBy(
        (col("l_suppkey") + 10).as("su"),
        (col("l_partkey") + PartOffset + 10).as("pu"))
      .agg(count(lit(1)).as("cap"))
    val edges = pairs.select(col("su").as("src"), col("pu").as("dst"), col("cap"))
      .unionAll(pairs.select(col("pu").as("src"), col("su").as("dst"), col("cap")))
    val sources = (10L to 17L)                          // suppkeys 0..7
    val sinks = (PartOffset + 10L to PartOffset + 17L)  // partkeys 0..7
    val r = MaxFlow.run(s, edges, sources, sinks)
    Seq(r.flow).toDF("maxflow")
  }

  /** Derived edge relation used by q16 — exposed so tests can feed the same
    * graph to the in-memory oracle.
    */
  def q16Edges(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem").filter(col("l_orderkey") < 2000)
    val pairs = li.groupBy(
        (col("l_suppkey") + 10).as("su"),
        (col("l_partkey") + PartOffset + 10).as("pu"))
      .agg(count(lit(1)).as("cap"))
    pairs.select(col("su").as("src"), col("pu").as("dst"), col("cap"))
      .unionAll(pairs.select(col("pu").as("src"), col("su").as("dst"), col("cap")))
  }

  /** Q24: connected components of the user co-occurrence graph (users with
    * events in the same 10-second epoch bucket are linked). Oracle =
    * transitive closure via recursive CTE + MIN — tractable because the
    * user set is small; the Spark side is the general label-propagation
    * loop.
    */
  def q24_cc(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .selectExpr("user_id", "unix_micros(ts) div 10000000 AS b")
    val edges = ev.as("a").join(ev.as("b"), "b")
      .select(col("a.user_id").as("src"), col("b.user_id").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    ConnectedComponents.run(s, edges, maxIter = 30)
      .withColumnRenamed("node", "user_id")
      .orderBy("user_id")
  }

  val q24OracleSql: String =
    """WITH RECURSIVE e0 AS (
      |  SELECT DISTINCT a.user_id AS u, b.user_id AS v
      |  FROM (SELECT user_id, epoch_us(ts) // 10000000 AS b FROM events) a
      |  JOIN (SELECT user_id, epoch_us(ts) // 10000000 AS b FROM events) b
      |    USING (b)
      |  WHERE a.user_id <> b.user_id),
      |reach(u, v) AS (
      |  SELECT u, u FROM (SELECT DISTINCT u FROM e0)
      |  UNION
      |  SELECT r.u, e.v FROM reach r JOIN e0 e ON e.u = r.v)
      |SELECT u AS user_id, MIN(v) AS comp FROM reach GROUP BY u
      |ORDER BY user_id""".stripMargin.replaceAll("\n", " ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q13_bfs" -> (q13_bfs _),
    "q16_maxflow" -> (q16_maxflow _),
    "q24_cc" -> (q24_cc _))

  val oracleSql: Map[String, String] = Map(
    "q13_bfs" -> q13OracleSql,
    "q24_cc" -> q24OracleSql)
}
