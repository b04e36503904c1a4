package graft.graph

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Locks the round-9 advisor items on the bounded driver-finish tiers:
  *
  *   1. `driverFinishMaxEdges = 0` disables the driver tier LITERALLY —
  *      even an empty edge relation (count() <= 0) takes the distributed
  *      path and still produces the right (empty) result;
  *   2. the failure contract is tier-uniform: a DAG deeper than
  *      maxRounds-1 fails fast in BOTH Layers tiers (previously the
  *      driver Kahn succeeded where the superstep loop threw), and each
  *      driver-tier message names its actual cause (cycle vs depth);
  *   3. failure paths release their pinned checkpoint frames — a
  *      repeatedly failing query must not accumulate dead BlockManager
  *      blocks across a long session (the q43_scc degradation class,
  *      extended to the throw paths).
  */
class DriverTierContractSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def pinned: Int = spark.sparkContext.getPersistentRDDs.size
  private def clearAll(): Unit = {
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    spark.catalog.clearCache()
  }

  private val empty = Seq.empty[(Long, Long)].toDF("src", "dst")

  test("cap=0 + empty edges: Layers/Coreness/Scc run distributed, empty") {
    assert(Layers.run(spark, empty, driverFinishMaxEdges = 0L).count() == 0)
    assert(Coreness.run(spark, empty, driverFinishMaxEdges = 0L).count() == 0)
    assert(Scc.run(spark, empty, driverFinishMaxEdges = 0L).count() == 0)
  }

  test("deep DAG fails in BOTH Layers tiers at the same depth bound") {
    // chain 1→2→…→9: depth 8. maxRounds=8 → the superstep loop needs
    // round 9 to observe the fixpoint and throws; the driver Kahn must
    // throw at the same bound, not silently succeed (tier divergence).
    val deep = (1L until 9L).map(i => (i, i + 1)).toDF("src", "dst")
    for (cap <- Seq(5000000L, 0L)) {
      val e = intercept[IllegalStateException] {
        Layers.run(spark, deep, maxRounds = 8,
          driverFinishMaxEdges = cap).count()
      }
      assert(e.getMessage.contains("maxRounds"), s"cap=$cap: ${e.getMessage}")
    }
    // depth maxRounds-1 succeeds in both tiers (the boundary case)
    val ok = (1L until 8L).map(i => (i, i + 1)).toDF("src", "dst")
    for (cap <- Seq(5000000L, 0L))
      assert(Layers.run(spark, ok, maxRounds = 8,
        driverFinishMaxEdges = cap).count() == 8)
  }

  test("driver-tier messages name the cause: cycle vs depth") {
    val cyc = intercept[IllegalStateException] {
      Layers.run(spark, Seq(1L -> 2L, 2L -> 1L).toDF("src", "dst")).count()
    }
    assert(cyc.getMessage.contains("cycle") &&
      !cyc.getMessage.contains("maxRounds"))
    val deep = intercept[IllegalStateException] {
      Layers.run(spark, (1L until 9L).map(i => (i, i + 1)).toDF("src", "dst"),
        maxRounds = 8).count()
    }
    assert(deep.getMessage.contains("maxRounds") &&
      !deep.getMessage.contains("cycle"))
  }

  test("failure paths release pinned frames (Layers cycle, distributed)") {
    clearAll()
    val base = pinned
    intercept[IllegalStateException] {
      Layers.run(spark, Seq(1L -> 2L, 2L -> 3L, 3L -> 1L).toDF("src", "dst"),
        maxRounds = 6, driverFinishMaxEdges = 0L).count()
    }
    assert(pinned - base == 0, s"Layers cycle throw left ${pinned - base}")
  }

  test("failure paths release pinned frames (Coreness non-convergence)") {
    clearAll()
    val base = pinned
    // symmetric 5-path needs 2 h-index rounds; maxIter=1 forces failure
    val path = (0L until 4L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
      .toDF("src", "dst")
    intercept[IllegalStateException] {
      Coreness.run(spark, path, maxIter = 1, driverFinishMaxEdges = 0L)
        .count()
    }
    assert(pinned - base == 0, s"Coreness throw left ${pinned - base}")
  }

  test("failure paths release pinned frames (Scc peel-cap hit)") {
    clearAll()
    val base = pinned
    // 0→1 settles one node per peel; maxPeels=1 forces the failure path
    intercept[IllegalStateException] {
      Scc.run(spark, Seq(0L -> 1L).toDF("src", "dst"), maxPeels = 1,
        driverFinishMaxEdges = 0L).count()
    }
    assert(pinned - base == 0, s"Scc throw left ${pinned - base}")
  }

  test("quietRddLogs filter denies exactly the lineage-truncation WARN") {
    import org.apache.logging.log4j.core.Filter
    import org.apache.logging.log4j.core.impl.Log4jLogEvent
    import org.apache.logging.log4j.message.SimpleMessage
    def event(msg: String) = Log4jLogEvent.newBuilder()
      .setMessage(new SimpleMessage(msg)).build()
    val f = graft.SparkHygiene.LocalCheckpointUnpersistFilter
    assert(f.filter(event("RDD 42 was locally checkpointed, its lineage " +
      "has been truncated and it can no longer be recomputed"))
      == Filter.Result.DENY)
    // any other RDD warning must pass through — the round-8 advisor
    // flagged the old package-wide ERROR drop for masking these
    assert(f.filter(event("Putting block rdd_7_3 failed due to exception"))
      == Filter.Result.NEUTRAL)
    assert(f.filter(event("Removing RDD 42 from persistence list"))
      == Filter.Result.NEUTRAL)
  }
}
