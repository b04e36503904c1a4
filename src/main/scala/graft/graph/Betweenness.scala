package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pivot-sampled, horizon-bounded betweenness centrality (Brandes 2001,
  * the dependency-accumulation formulation; pivot sampling per
  * Brandes/Pich 2007): from each of the `nPivots` smallest node ids,
  * count shortest paths σ level-synchronously out to `horizon` hops,
  * then accumulate dependencies backward — δ(v) = Σ_{w: succ}
  * σ(v)/σ(w)·(1+δ(w)) — and report bc(v) = Σ_pivots δ(v), v ≠ pivot.
  * Both bounds are DECLARED semantics (the oracle unrolls the same
  * levels), which is also the honest 100 TB shape: exact all-pairs
  * betweenness is O(V·E) supersteps and no engine runs it on a large
  * graph; the pivot/horizon estimator is the standard production
  * compromise.
  *
  * Engine-exactness: σ is an integer DP (level-synchronous sums); δ is
  * carried in INTEGER nano-units — each term is the truncating integer
  * quotient σ(v)·(1e9 + δ̃(w)) div σ(w) summed in DECIMAL(38,0) — so the
  * whole recursion is integer algebra with no float anywhere (a 9-dp
  * ROUND on doubles would hit exact midpoints here, where Spark and
  * DuckDB round differently); bc is one terminal CAST-to-double / 1e9
  * / ROUND 6. σ(v) ≤ σ(w) for a predecessor, so each term ≤ 1e9 +
  * δ̃(w). The real headroom ceiling is the LongType quotient Spark's
  * `div` returns: terms cap at ~9.2e18 nano-units (δ ~9.2e9 dependency
  * units per node) — ample at any sane horizon, but NOT 38 digits.
  *
  * Scale: per level, one join of the frontier against the edge relation
  * + one (pivot, node) aggregate — frontier-sized, never corpus-rank.
  * The backward pass mirrors it level by level. State is (pivots ×
  * reached nodes), bounded by the horizon; the edge relation is cached
  * once. O(horizon) jobs total, independent of graph size.
  */
object Betweenness {

  /** @param und undirected (u, v) pairs with u < v
    * @return DataFrame(node, bc) for every node reached by some pivot,
    *         pivots' own rows excluded, ordered by node
    */
  def run(s: SparkSession, und: DataFrame, nPivots: Int = 8,
          horizon: Int = 4): DataFrame = {
    val e = GraphQueries.bidirectional(und) // consumed 2·horizon times
    val piv = e.select(col("a").as("node")).distinct()
      .orderBy("node").limit(nPivots)
    // forward: levels(d) = (s, v, sigma) for nodes FIRST reached at d
    var lvl = piv.select(col("node").as("s"), col("node").as("v"),
      lit(1L).as("sigma")).localCheckpoint(eager = true)
    val levels = scala.collection.mutable.ListBuffer(lvl)
    var visited = lvl.select("s", "v").localCheckpoint(eager = true)
    for (_ <- 1 to horizon) {
      val fresh = lvl.join(e, lvl("v") === e("a"))
        .select(col("s"), e("b").as("v"), col("sigma"))
        .join(visited, Seq("s", "v"), "left_anti")
        .groupBy("s", "v").agg(sum("sigma").as("sigma"))
        .localCheckpoint(eager = true)
      levels += fresh
      val prevVisited = visited
      visited = visited.unionAll(fresh.select("s", "v"))
        .localCheckpoint(eager = true)
      // the merged visited set is materialized — its predecessor is dead
      // (Checkpoints.scala; the q43_scc in-session degradation)
      Checkpoints.release(prevVisited)
      lvl = fresh
    }
    // the backward pass reads only `levels`; the visited set is done
    Checkpoints.release(visited)
    // backward: deepest level has delta 0; each shallower level sums
    // the truncating nano-unit quotient sigma_v*(1e9 + delta_w) div
    // sigma_w over its successors. Level 0 is skipped — it holds only
    // pivot self-rows, which the output excludes anyway.
    val zero = lit(0).cast("decimal(38,0)")
    var above = levels(horizon)
      .select(col("s"), col("v"), col("sigma"), zero.as("delta"))
    val deltas = scala.collection.mutable.ListBuffer(above)
    for (d <- (horizon - 1) to 1 by -1) {
      val cur = levels(d)
      val terms = cur.join(e, cur("v") === e("a"))
        .select(col("s"), col("v"), col("sigma"), e("b").as("w"))
        .join(above.select(col("s"), col("v").as("w"),
          col("sigma").as("sw"), col("delta").as("dw")), Seq("s", "w"))
        .groupBy("s", "v")
        .agg(sum(expr("(CAST(sigma AS DECIMAL(38,0)) * (1000000000 + dw))" +
          " div sw").cast("decimal(38,0)")).as("delta"))
      val dl = cur.select("s", "v", "sigma")
        .join(terms.select(col("s"), col("v"), col("delta")),
          Seq("s", "v"), "left_outer")
        .select(col("s"), col("v"), col("sigma"),
          coalesce(col("delta"), zero).as("delta"))
        .localCheckpoint(eager = true)
      deltas += dl
      above = dl
    }
    // every level but the deepest has been folded into a materialized
    // delta frame; levels(horizon) stays — deltas(0) reads through it
    Checkpoints.release(levels.dropRight(1).toSeq: _*)
    deltas.map(_.select("s", "v", "delta")).reduce(_ unionAll _)
      .filter(col("v") =!= col("s"))
      .groupBy(col("v").as("node"))
      .agg(round(sum("delta").cast("double") / lit(1000000000d), 6)
        .as("bc"))
      .orderBy("node")
  }
}
