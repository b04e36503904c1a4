package graft.graph

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Oracle checks for the graph query surface on the sf0.001 test tables. */
class GraphQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q16_maxflow equals in-memory Edmonds-Karp on the same derived graph") {
    import spark.implicits._
    val edges = GraphQueries.q16Edges(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    val want = EdmondsKarp.maxFlow(edges, 10L to 17L, 1000010L to 1000017L)
    val got = GraphQueries.q16_maxflow(spark, sf).head().getLong(0)
    assert(got == want, s"engine=$got oracle=$want")
  }

  test("q24_cc equals union-find on the same co-occurrence edges") {
    import spark.implicits._
    val ev = graft.Tables.load(spark, sf, "events")
      .selectExpr("user_id", "unix_micros(ts) div 10000000 AS b")
    val edges = ev.as("a").join(ev.as("b"), "b")
      .selectExpr("a.user_id AS src", "b.user_id AS dst")
      .filter("src <> dst").distinct()
      .as[(Long, Long)].collect()
    // in-memory union-find oracle
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(k => k -> find(k)).toMap
    val got = GraphQueries.q24_cc(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("q13_bfs returns supplier 1 at distance 0 and rows > 0") {
    val rows = GraphQueries.q13_bfs(spark, sf).collect()
    assert(rows.nonEmpty)
    val d = rows.map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d(1L) == 0)
    assert(d.values.forall(_ <= 6))
  }
}
