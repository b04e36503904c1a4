package graft.graph

import graft.TestSpark
import graft.relational.Relational
import graft.sources.GraphSources
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end flows through the real ingest formats + sanity of the
  * non-oracle query surface.
  */
class EndToEndSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath

  test("facebook text → max-flow end-to-end equals oracle (ingest lifecycle §3.2)") {
    val edges = GraphSources.readFacebook(spark, fixture("fb_tiny.txt"))
    val triples = edges.as[(Long, Long, Long)].collect().toSeq
    val want = EdmondsKarp.maxFlow(triples, Seq(10L), Seq(15L))
    val got = MaxFlow.run(spark, edges, Seq(10L), Seq(15L))
    assert(got.flow == want && want > 0, s"want=$want got=$got")
  }

  test("facebook ingest honors withRandomCaps determinism (T4)") {
    val edges = GraphSources.readFacebook(spark, fixture("fb_tiny.txt"))
    val c1 = GraphSources.withRandomCaps(edges, maxCap = 5, seed = 9L)
      .as[(Long, Long, Long)].collect().sortBy(e => (e._1, e._2)).toSeq
    val c2 = GraphSources.withRandomCaps(edges, maxCap = 5, seed = 9L)
      .as[(Long, Long, Long)].collect().sortBy(e => (e._1, e._2)).toSeq
    assert(c1 == c2)
    assert(c1.forall(e => e._3 >= 1 && e._3 <= 5))
  }

  test("approx_count_distinct lands within 5% of exact (q20, HLL)") {
    val sf = "/root/testdata/sf0.001"
    val row = Relational.q20_approx_distinct(spark, sf).head()
    val exact = graft.Tables.load(spark, sf, "lineitem")
      .selectExpr("COUNT(DISTINCT l_partkey)", "COUNT(DISTINCT l_orderkey)").head()
    assert(math.abs(row.getLong(0) - exact.getLong(0)).toDouble / exact.getLong(0) < 0.05)
    assert(math.abs(row.getLong(1) - exact.getLong(1)).toDouble / exact.getLong(1) < 0.05)
  }
}
