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

  test("q13_bfs returns supplier 1 at distance 0 and rows > 0") {
    val rows = GraphQueries.q13_bfs(spark, sf).collect()
    assert(rows.nonEmpty)
    val d = rows.map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d(1L) == 0)
    assert(d.values.forall(_ <= 6))
  }
}
