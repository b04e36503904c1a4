package graft.graph

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Borůvka (distributed) vs in-memory Kruskal under the IDENTICAL total
  * (w, u, v) edge order — the totalized order makes the spanning forest
  * unique, so the two algorithms must agree edge-for-edge, not just on
  * total weight.
  */
class MstSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def kruskal(edges: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    // canonicalize + collapse parallel edges to min w, then sort by the
    // total order and union-find
    val canon = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2), e._3))
      .groupBy(e => (e._1, e._2)).map { case ((u, v), es) =>
        (u, v, es.map(_._3).min)
      }.toSeq
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val out = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    for ((u, v, w) <- canon.sortBy(e => (e._3, e._1, e._2))) {
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) { parent(ru) = rv; out += ((u, v, w)) }
    }
    out.toSet
  }

  private def runSpark(edges: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    import spark.implicits._
    Mst.run(spark, edges.toDF("u", "v", "w")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("CLRS-style hand graph: the unique MSF, exactly") {
    // the classic 9-node example (weights shifted to Long)
    val e = Seq(
      (0L, 1L, 4L), (0L, 7L, 8L), (1L, 2L, 8L), (1L, 7L, 11L),
      (2L, 3L, 7L), (2L, 8L, 2L), (2L, 5L, 4L), (3L, 4L, 9L),
      (3L, 5L, 14L), (4L, 5L, 10L), (5L, 6L, 2L), (6L, 7L, 1L),
      (6L, 8L, 6L), (7L, 8L, 7L))
    val got = runSpark(e)
    assert(got == kruskal(e))
    assert(got.toSeq.map(_._3).sum == 37L) // the known CLRS MST weight
    assert(got.size == 8)                  // V - 1, connected
  }

  test("random multigraphs with heavy weight ties == Kruskal, forests sized V-C") {
    val rng = new scala.util.Random(2026)
    for (trial <- 1 to 4) {
      val n = 25 + trial * 10
      val edges = Seq.fill(n * 3)(
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong,
          (rng.nextInt(5) + 1).toLong)) // w in 1..5: ties everywhere
      val want = kruskal(edges)
      val got = runSpark(edges)
      assert(got == want, s"trial $trial diverged from Kruskal")
      // forest arithmetic: |MSF| = |V| - #components
      val nodes = edges.filter(e => e._1 != e._2)
        .flatMap(e => Seq(e._1, e._2)).distinct
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.filter(e => e._1 != e._2)
        .foreach(e => { val (a, b) = (find(e._1), find(e._2))
          if (a != b) parent(a) = b })
      val comps = nodes.map(find).distinct.size
      assert(got.size == nodes.size - comps, s"trial $trial forest size off")
    }
  }

  test("distributed merge fallback (cap 0) == driver union-find path") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val edges = Seq.fill(120)(
      (rng.nextInt(40).toLong, rng.nextInt(40).toLong,
        (rng.nextInt(5) + 1).toLong))
    val viaDriver = runSpark(edges)
    val viaCc = Mst.run(spark, edges.toDF("u", "v", "w"),
        driverMergeMaxEdges = 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaCc == viaDriver && viaDriver == kruskal(edges))
  }

  test("disconnected graph yields a spanning FOREST (one tree per component)") {
    val e = Seq((1L, 2L, 5L), (2L, 3L, 1L), (10L, 11L, 2L),
      (1L, 3L, 9L), (11L, 12L, 2L), (10L, 12L, 1L))
    val got = runSpark(e)
    assert(got == kruskal(e))
    assert(got.size == 4) // 6 nodes, 2 components
  }
}
