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

  test("CLI graph programs (cc/mst/pagerank) drive end-to-end on the CLRS fixture") {
    // Main.run on the live session — the same dispatcher path the shell
    // entry uses, minus the session lifecycle
    graft.Main.run(spark, Array("cc", "--format", "dimacs",
      "--input", fixture("clrs.dimacs")))
    graft.Main.run(spark, Array("mst", "--format", "dimacs",
      "--input", fixture("clrs.dimacs")))
    graft.Main.run(spark, Array("pagerank", "--format", "dimacs",
      "--input", fixture("clrs.dimacs"), "--iters", "3"))
    // and the MSF of the CLRS capacity network is itself checkable
    val (edges, _, _) = (GraphSources.readDimacs(spark, fixture("clrs.dimacs")))
    val msf = Mst.run(spark, edges.select(
      edges("src").as("u"), edges("dst").as("v"), edges("cap").as("w")))
    assert(msf.count() == msf.select("u").unionAll(msf.select("v"))
      .distinct().count() - 1) // connected: V-1 edges
  }

  test("CLI graph programs (scc/kcore/triangles) drive on the CLRS fixture") {
    graft.Main.run(spark, Array("scc", "--format", "dimacs",
      "--input", fixture("clrs.dimacs")))
    graft.Main.run(spark, Array("kcore", "--format", "dimacs",
      "--input", fixture("clrs.dimacs"), "--k", "2"))
    graft.Main.run(spark, Array("triangles", "--format", "dimacs",
      "--input", fixture("clrs.dimacs")))
    // the CLRS network's undirected form is one big 2-core (every vertex
    // sits on a cycle) — pin the symmetrization contract the kcore
    // program applies
    val (edges, _, _) = GraphSources.readDimacs(spark, fixture("clrs.dimacs"))
    val fwd = edges.select("src", "dst")
    val sym = fwd.unionAll(fwd.selectExpr("dst AS src", "src AS dst"))
      .distinct()
    assert(KCore.run(spark, sym, 2).count() == 6)
  }

  test("approx_count_distinct lands within 5% of exact (q20, HLL)") {
    val sf = "/root/testdata/sf0.001"
    // the banded-oracle row: exact anchors plus the engine's own
    // integer-exact band verdicts — both must read true (the same test
    // the DuckDB oracle replays with ITS sketch)
    val row = Relational.q20_approx_distinct(spark, sf).head()
    val exact = graft.Tables.load(spark, sf, "lineitem")
      .selectExpr("COUNT(DISTINCT l_partkey)", "COUNT(DISTINCT l_orderkey)").head()
    assert(row.getLong(0) == exact.getLong(0))
    assert(row.getLong(1) == exact.getLong(1))
    assert(row.getBoolean(2) && row.getBoolean(3),
      s"HLL estimate outside the 5% band: $row")
  }
}
