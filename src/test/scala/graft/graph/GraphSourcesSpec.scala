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

  test("facebook .gz end-to-end through the CLI + ff5 ingest guards") {
    import java.util.zip.GZIPOutputStream
    import org.apache.spark.sql.functions.{coalesce, lit, sum}
    def gz(lines: Seq[String]): String = {
      val p = java.nio.file.Files.createTempFile("fb", ".txt.gz")
      val o = new GZIPOutputStream(java.nio.file.Files.newOutputStream(p))
      o.write(lines.mkString("\n").getBytes("UTF-8")); o.close()
      p.toString
    }
    def allMsgs(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage}\n${allMsgs(t.getCause)}"

    // unit-cap 4-cycle: two vertex-disjoint 10→13 paths ⇒ maxflow 2,
    // driven through `Main mf --format facebook` on a gzipped fixture and
    // read back from the --state parquet (locks the CLI path end-to-end
    // the way the DIMACS path already is)
    val good = gz(Seq(
      "10\tx\t11\t12",
      "11\tx\t10\t13",
      "12\tx\t10\t13",
      "13\tx\t11\t12"))
    val stateDir = java.nio.file.Files.createTempDirectory("mfstate").toString
    graft.Main.run(spark, Array("mf", "--format", "facebook", "--input", good,
      "--sources", "10", "--sinks", "13", "--state", stateDir))
    val st = spark.read.parquet(stateDir)
    def netAt(id: Long): Long =
      st.agg(sum(org.apache.spark.sql.functions.when(st("u") === id, st("f"))
          .otherwise(org.apache.spark.sql.functions.when(st("v") === id, -st("f"))
            .otherwise(lit(0L))))).head().getLong(0)
    assert(netAt(graft.graph.GraphModel.SuperSource) == 2L)

    // >5100-field line is rejected loudly (ff5/FordFulkerson.java:91) —
    // 5099 neighbors + id + ignored col = 5101 fields, one over the limit
    val wide = gz(Seq(("10" +: "x" +: (11L to 5109L).map(_.toString)).mkString("\t")))
    val eWide = intercept[Exception] {
      GraphSources.readFacebook(spark, wide).collect()
    }
    assert(allMsgs(eWide).contains("E = 5101"), allMsgs(eWide))
    // exactly 5100 fields (5098 neighbors) passes the guard
    val atCap = gz(Seq(("10" +: "x" +: (11L to 5108L).map(_.toString)).mkString("\t")))
    assert(GraphSources.readFacebook(spark, atCap).count() == 2L * 5098)

    // reserved NEIGHBOR ids are dropped silently even in strict mode:
    // ff5's check() throw for neighbor tokens is caught by the map loop
    // (catch(Exception) → "Invalid Edge" echo, ff5/FordFulkerson.java:84-86)
    // — only the OWNER path is fatal
    val badNbr = gz(Seq("10\tx\t2\t11"))
    val nbrEdges = GraphSources.readFacebook(spark, badNbr)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nbrEdges == Set((10L, 11L), (11L, 10L)))

    // reserved OWNER id — via the id fold (10^14 folds to 0), locking the
    // fold→guard order (ff5 check() folds before rejecting)
    val badOwner = gz(Seq("100000000000000\tx\t11"))
    val eOwn = intercept[Exception] {
      GraphSources.readFacebook(spark, badOwner).collect()
    }
    assert(allMsgs(eOwn).contains("Reserved ID : 0"), allMsgs(eOwn))

    // malformed OWNER is fatal in strict mode (ff5 parses the owner with
    // an uncaught Long.parseLong), reproducing NumberFormatException text
    val badParse = gz(Seq("abc\tx\t11"))
    val ePar = intercept[Exception] {
      GraphSources.readFacebook(spark, badParse).collect()
    }
    assert(allMsgs(ePar).contains("For input string: \"abc\""), allMsgs(ePar))

    // post-fold Int-range (ff5/FordFulkerson.java:77-78): fatal for the
    // owner ("fail : id"), silent drop for the neighbor
    val bigOwner = gz(Seq("5000000000\tx\t11")) // 5e9 > Int.MaxValue
    val eRange = intercept[Exception] {
      GraphSources.readFacebook(spark, bigOwner).collect()
    }
    assert(allMsgs(eRange).contains("fail : 5000000000"), allMsgs(eRange))
    val bigNbr = gz(Seq("10\tx\t5000000000\t11"))
    val rangeDropped = GraphSources.readFacebook(spark, bigNbr)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rangeDropped == Set((10L, 11L), (11L, 10L)))
    // lenient keeps full-Long ids (ff1 — no Int-range rejection)
    assert(GraphSources.readFacebook(spark, bigNbr, strict = false).count() == 4L)

    // --lenient / strict=false restores ff1's silent drop of reserved ids
    val dropped = GraphSources.readFacebook(spark, badNbr, strict = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dropped == Set((10L, 11L), (11L, 10L)))
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
