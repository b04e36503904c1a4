package graft.graph

import graft.TestSpark
import graft.sources.{GraphSources, StateIO}
import org.scalatest.funsuite.AnyFunSuite

class MaxFlowSchimmySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath

  test("schimmy engine: CLRS network = 23") {
    val (edges, sources, sinks) = GraphSources.readDimacs(spark, fixture("clrs.dimacs"))
    val r = MaxFlowSchimmy.run(spark, edges, sources, sinks)
    assert(r.flow == 23L, s"got $r")
    assert(StateIO.conservationHolds(r.assignment, r.flow))
    // the schimmy engine fills the same round report as v1 (A8 parity;
    // `Main --engine schimmy` prints it via RoundCounters.echo)
    val rep = r.rounds_report
    assert(rep.nonEmpty && rep.map(_.round) == (1 to r.rounds))
    assert(rep.map(_.acceptedFlow).sum == r.engineFlow)
    assert(rep.map(_.extendS).sum > 0 && rep.map(_.extendT).sum > 0)
    assert(rep.exists(c => c.aliveS > 0 && c.aliveT > 0))
    assert(rep.head.moveS > 0 && rep.head.moveT > 0)
  }

  test("schimmy engine equals Edmonds-Karp oracle on random graphs") {
    for (seed <- 11 to 13) {
      val edges = EdmondsKarp.randomGraph(n = 10, edgeProb = 0.3, maxCap = 9, seed = seed)
      val ids = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      if (ids.size >= 4) {
        val want = EdmondsKarp.maxFlow(edges, Seq(ids.head), Seq(ids.last))
        val got = MaxFlowSchimmy.run(spark, edges.toDF("src", "dst", "cap"),
          Seq(ids.head), Seq(ids.last))
        assert(got.flow == want, s"seed=$seed want=$want got=$got")
      }
    }
  }

  test("schimmy and v1 agree (multi-source/multi-sink)") {
    val edges = EdmondsKarp.randomGraph(n = 12, edgeProb = 0.25, maxCap = 5, seed = 99)
    val ids = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val df = edges.toDF("src", "dst", "cap")
    val v1 = MaxFlow.run(spark, df, ids.take(2), ids.takeRight(2))
    val v2 = MaxFlowSchimmy.run(spark, df, ids.take(2), ids.takeRight(2))
    assert(v1.flow == v2.flow)
  }
}
