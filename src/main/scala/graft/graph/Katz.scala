package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Truncated Katz centrality (Katz 1953): katz(v) = Σ_{k=1..horizon}
  * α^k · (#walks of length k ending at v), α = 1/invAlpha. Where q58's
  * betweenness scores SHORTEST-path flow-through, Katz scores total
  * reachability mass with geometric damping — the influence measure
  * behind eigenvector-style rankings, truncated to a fixed horizon so
  * the result is closed-form in both engines (the infinite series needs
  * α < 1/λ_max and an iteration-to-convergence neither engine can
  * hash-compare).
  *
  * Engine-exactness: walk counts are an integer DP (w_k(v) = Σ_{u→v}
  * w_{k-1}(u), revisits allowed — walks, not paths); each level scales
  * by the INTEGER invAlpha^(horizon−k), so the whole accumulation is
  * exact in BIGINT/DECIMAL and the single terminal division by
  * invAlpha^horizon is one IEEE op + ROUND 6, identical bits both
  * engines.
  *
  * Scale: one join of the level vector against the edge relation + one
  * node aggregate per level — horizon exchanges total, each linear in
  * |E|; no window, no global sort. Walk counts grow as deg^k: BIGINT
  * holds horizon 4 up to ~30k average degree.
  */
object Katz {

  /** @param und undirected (u, v) pairs with u < v
    * @return DataFrame(node, katz) over all nodes with an edge,
    *         ordered by node
    */
  def run(s: SparkSession, und: DataFrame, horizon: Int = 4,
          invAlpha: Int = 4): DataFrame = {
    // denom must be an exactly representable double (one terminal
    // division): bound the declared parameters instead of silently
    // corrupting weights through an inexact math.pow
    require(BigInt(invAlpha).pow(horizon) < BigInt(2).pow(53),
      s"invAlpha^horizon = $invAlpha^$horizon exceeds exact double range")
    val e = GraphQueries.bidirectional(und) // consumed `horizon` times
    var w = e.select(col("a").as("node")).distinct()
      .withColumn("w", lit(1L))
      .localCheckpoint(eager = true)
    val denom = math.pow(invAlpha.toDouble, horizon.toDouble)
    var acc: DataFrame = null
    for (k <- 1 to horizon) {
      w = e.join(w, w("node") === e("a"))
        .groupBy(e("b").as("node"))
        .agg(sum("w").as("w"))
        .localCheckpoint(eager = true)
      val weight = BigInt(invAlpha).pow(horizon - k).toLong
      val contrib = w.select(col("node"),
        (col("w").cast("decimal(38,0)") * lit(weight)).as("sc"))
      acc = if (acc == null) contrib else acc.unionAll(contrib)
    }
    acc.groupBy("node")
      .agg(round(sum("sc").cast("double") / lit(denom), 6).as("katz"))
      .orderBy("node")
  }
}
