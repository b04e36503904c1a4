package graft.graph

import graft.TestSpark
import graft.sources.GraphSources
import org.scalatest.funsuite.AnyFunSuite

class GraphSourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fixture(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath

  test("id fold matches reference semantics (ff1/InputFacebook.java:14-20)") {
    assert(GraphSources.foldId(5L) == 5L)
    assert(GraphSources.foldId(100000000000000L) == 0L)
    assert(GraphSources.foldId(100000000000005L) == -5L)
  }

  test("facebook reader: folds ids, drops self-loops/malformed/dups, symmetric") {
    val edges = GraphSources.readFacebook(spark, fixture("fb_tiny.txt"))
    val got = edges.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val undirected = Set(
      (10L, 11L), (10L, 12L), (10L, 13L), (11L, 14L), (12L, 14L),
      (13L, 15L), (14L, 15L), (-5L, 15L), (10L, 16L))
    val expected = undirected.flatMap { case (a, b) => Set((a, b, 1L), (b, a, 1L)) }
    assert(got == expected)
  }

  test("dimacs reader: arcs, caps, terminals") {
    val (edges, sources, sinks) = GraphSources.readDimacs(spark, fixture("clrs.dimacs"))
    assert(sources == Seq(10L) && sinks == Seq(15L))
    val m = edges.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m((10L, 11L)) == 16L && m((14L, 15L)) == 4L && m.size == 9)
  }

  test("dimacs reader: parallel arcs are capacity-summed (ff1/InputDimacs.java:36-39)") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempFile("par", ".dimacs")
    java.nio.file.Files.writeString(path,
      "p max 2 3\nn 10 s\nn 11 t\na 10 11 3\na 10 11 4\na 11 10 5\n")
    val (edges, _, _) = GraphSources.readDimacs(spark, path.toString)
    val m = edges.as[(Long, Long, Long)].collect().map(e => (e._1, e._2) -> e._3).toMap
    assert(m((10L, 11L)) == 7L && m((11L, 10L)) == 5L)
  }
}
