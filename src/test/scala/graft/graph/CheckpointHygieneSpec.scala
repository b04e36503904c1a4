package graft.graph

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Locks the Checkpoints.release discipline: an iterative operator must
  * not leave one pinned BlockManager frame per ITERATION behind — only
  * its result lineage (O(1) frames, or O(peels) for Scc's parts). The
  * round-7 driver session measured the failure mode this prevents:
  * q43_scc at 6 s in isolation degraded to 17.8 → 37.8 → 38.7 s late in
  * a 228-query session because superseded localCheckpoint blocks are
  * otherwise freed only when a driver GC (which a 128 GiB heap may never
  * run) lets the async ContextCleaner find them.
  *
  * The assertions count `sc.getPersistentRDDs` entries — localCheckpoint
  * registers its RDD there, and Checkpoints.release removes it
  * synchronously — so the budget is exact, not timing-dependent.
  */
class CheckpointHygieneSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def pinned: Int = spark.sparkContext.getPersistentRDDs.size
  private def clearAll(): Unit = {
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    spark.catalog.clearCache()
  }

  test("ConnectedComponents pins O(1) frames, not O(iterations)") {
    clearAll()
    val base = pinned
    // 30-node path both directions → ~29 min-propagation rounds
    val edges = (0L until 29L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
      .toDF("src", "dst")
    val (labels, iters) = ConnectedComponents.runCounted(spark, edges)
    assert(iters > 10, s"want a deep loop to make the test meaningful: $iters")
    val rows = labels.collect()
    assert(rows.length == 30 && rows.forall(_.getLong(1) == 0L))
    // only the final labels checkpoint may remain
    assert(pinned - base <= 1, s"pinned ${pinned - base} frames (want <=1)")
  }

  test("Scc pins O(peels) parts, not O(peels x CC iterations)") {
    clearAll()
    val base = pinned
    // directed 8-path: every node its own SCC, one settles per peel →
    // 8 peels, each running two full CC propagations internally.
    // driverFinishMaxEdges=0 forces the distributed loop — the driver
    // tier would otherwise settle this residual in one collect and the
    // test would not exercise the per-peel release discipline.
    val edges = (0L until 7L).map(i => (i, i + 1)).toDF("src", "dst")
    val rows = Scc.run(spark, edges, driverFinishMaxEdges = 0L).collect()
    assert(rows.length == 8 && rows.forall(r => r.getLong(0) == r.getLong(1)))
    // parts = one settled frame per peel (8) + slack; the peel-internal
    // CC frames (~8 peels x 2 runs x up to 8 rounds) must all be gone
    val left = pinned - base
    assert(left <= 12, s"pinned $left frames (want <=12, parts only)")
  }

  test("PageRank pins O(1) frames across iterations") {
    clearAll()
    val base = pinned
    val fwd = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (3L, 2L), (2L, 1L))
      .toDF("src", "dst")
    val pr = PageRank.run(spark, fwd, iters = 12).collect()
    assert(pr.length == 3 && pr.map(_.getLong(1)).sum > 0)
    assert(pinned - base <= 1, s"pinned ${pinned - base} frames (want <=1)")
  }

  test("personalized PageRank dedups seeds and pins O(1) frames") {
    clearAll()
    val base = pinned
    val fwd = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    // duplicated seed must not shrink the teleport mass: pr0 = SCALE/1
    val dup = PageRank.runPersonalized(spark, fwd, Seq(1L, 1L), iters = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dup(1L) == PageRank.Scale,
      s"duplicate seeds shrank init mass: ${dup(1L)}")
    clearAll() // the iters=0 call legitimately keeps its deg frame
    val base2 = pinned
    val r = PageRank.runPersonalized(spark, fwd, Seq(1L, 2L), iters = 8)
    assert(r.collect().length == 3)
    assert(pinned - base2 <= 1, s"pinned ${pinned - base2} frames (want <=1)")
  }

  test("personalized PageRank rejects a seed with no out-edges") {
    val fwd = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      PageRank.runPersonalized(spark, fwd, Seq(1L, 99L), iters = 2)
    }
    assert(e.getMessage.contains("no outgoing"))
  }

  test("Hits pins only the final pair across iterations") {
    clearAll()
    val base = pinned
    val fwd = Seq((1L, 10L), (1L, 11L), (2L, 10L), (3L, 11L), (3L, 12L))
      .toDF("src", "dst")
    val out = Hits.run(spark, fwd, iters = 6).collect()
    assert(out.nonEmpty)
    assert(pinned - base <= 2, s"pinned ${pinned - base} frames (want <=2)")
  }

  test("Layers pins only the final merged round") {
    clearAll()
    val base = pinned
    // depth-20 chain DAG → 20 relaxation rounds (cap 0 forces the
    // distributed loop — the driver tier would absorb a graph this small)
    val edges = (0L until 20L).map(i => (i, i + 1)).toDF("src", "dst")
    val out = Layers.run(spark, edges, driverFinishMaxEdges = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 20L).forall(i => out(i) == i))
    assert(pinned - base <= 1, s"pinned ${pinned - base} frames (want <=1)")
  }

  test("Coreness pins only the final round") {
    clearAll()
    val base = pinned
    // K4 plus a pendant chain: coreness 3 core, chain coreness 1
    val k4 = for { a <- 0L to 3L; b <- 0L to 3L if a != b } yield (a, b)
    val chain = Seq((3L, 4L), (4L, 3L), (4L, 5L), (5L, 4L))
    val edges = (k4 ++ chain).toDF("src", "dst")
    val out = Coreness.run(spark, edges, driverFinishMaxEdges = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(0L, 1L, 2L).forall(i => out(i) == 3L) && out(5L) == 1L)
    assert(pinned - base <= 1, s"pinned ${pinned - base} frames (want <=1)")
  }

  test("MaxFlow pins O(1) state frames, not O(rounds)") {
    clearAll()
    val base = pinned
    // long path network: the excess walk needs ~length/2 rounds to meet,
    // so an unreleased per-round state checkpoint would pin ~6+ frames
    val edges = (0L until 24L).flatMap(i =>
      Seq((i, i + 1, 3L), (i + 1, i, 3L))).toDF("src", "dst", "cap")
    val res = MaxFlow.run(spark, edges, Seq(0L), Seq(24L))
    assert(res.flow == 3L && res.rounds >= 3,
      s"flow ${res.flow} rounds ${res.rounds}")
    val left = pinned - base
    assert(left <= 4, s"pinned $left frames (want <=4, not one per round)")
  }

  test("KCore pins only the surviving edge set") {
    clearAll()
    val base = pinned
    // long pendant chain peels one vertex per round into a K4 core
    val k4 = for { a <- 0L to 3L; b <- 0L to 3L if a != b } yield (a, b)
    val chain = (3L until 13L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    val edges = (k4 ++ chain).toDF("src", "dst")
    val out = KCore.run(spark, edges, k = 2).collect()
    assert(out.length == 4) // the K4 survives k=2? chain peels off
    assert(pinned - base <= 1, s"pinned ${pinned - base} frames (want <=1)")
  }
}
