package graft.graph

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** DAG longest-path layering (Layers.run / q44_layers). */
class LayersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // every hand case runs BOTH tiers: the bounded driver Kahn (default
  // cap, fires on graphs this small) and the distributed superstep loop
  // (cap 0) — the fixpoint is unique, so they must agree exactly
  private def layersOf(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val driver = Layers.run(spark, edges.toDF("src", "dst")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Layers.run(spark, edges.toDF("src", "dst"),
        driverFinishMaxEdges = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == driver, "driver and distributed layer tiers diverge")
    driver
  }

  test("diamond + long chain: layer = longest path, not shortest") {
    // 1→2→4, 1→3→4 (diamond) and 1→5→6→7→4: the long chain wins at 4
    val got = layersOf(Seq(1L -> 2L, 2L -> 4L, 1L -> 3L, 3L -> 4L,
      1L -> 5L, 5L -> 6L, 6L -> 7L, 7L -> 4L))
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 5L -> 1L, 6L -> 2L,
      7L -> 3L, 4L -> 4L))
  }

  test("multi-source: disconnected roots both sit at layer 0") {
    val got = layersOf(Seq(1L -> 2L, 10L -> 11L, 11L -> 2L))
    assert(got == Map(1L -> 0L, 10L -> 0L, 11L -> 1L, 2L -> 2L))
  }

  test("cycle fails fast with a clear message in BOTH tiers") {
    for (cap <- Seq(5000000L, 0L)) {
      val e = intercept[IllegalStateException] {
        Layers.run(spark, Seq(1L -> 2L, 2L -> 3L, 3L -> 1L).toDF("src", "dst"),
          maxRounds = 8, driverFinishMaxEdges = cap).count()
      }
      assert(e.getMessage.contains("cycle"), s"cap=$cap")
    }
  }

  test("empty edge relation yields an empty layering") {
    assert(Layers.run(spark,
      Seq.empty[(Long, Long)].toDF("src", "dst")).count() == 0)
  }

  test("q44_layers: class invariants on the testdata DAG") {
    val rows = GraphQueries.q44_layers(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    val byClass = rows.groupBy { case (n, _) =>
      if (n < 1000000L) "supp" else if (n < 2000000L) "part" else "order" }
    // suppliers are pure sources; parts sit exactly one hop deeper
    assert(byClass("supp").forall(_._2 == 0L))
    assert(byClass("part").forall(_._2 == 1L))
    // orders with a high-quantity lineitem sit at ≥ 2 (supplier→part→
    // order); chain-only orders can sit lower, and chains push deeper
    assert(byClass("order").exists(_._2 == 2L))
    assert(byClass("order").exists(_._2 > 2L))
  }
}
