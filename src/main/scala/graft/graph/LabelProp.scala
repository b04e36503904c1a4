package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Community detection by synchronous label propagation (Raghavan et al.
  * 2007), on the same superstep substrate as Bfs/ConnectedComponents.
  *
  * Unlike ConnectedComponents (which converges to one label per connected
  * component — a REACHABILITY answer), LPA's plurality-vote update finds
  * densely-linked clusters INSIDE a component: each round every node
  * adopts the most frequent label among its neighbors, ties broken toward
  * the smallest label. The round count is FIXED (a declared parameter,
  * not a convergence test): synchronous LPA can two-cycle on bipartite
  * structure, so production runs pick a small fixed budget — and a fixed
  * budget is what keeps the op DuckDB-expressible (the oracle unrolls the
  * same rounds verbatim).
  *
  * Determinism: the update is a pure function of the previous labelling
  * (count DESC, label ASC rank), so results are reproducible across
  * engines, partitionings, and retries — no asynchronous visit-order
  * dependence.
  *
  * Per round: one equi-join of the edge list against the labels on the
  * neighbor end + one (node, label) count + one per-node top-1 window —
  * all hash-partitioned on node id; cost is O(|E|) rows per round with no
  * quadratic term. The edge relation is persisted once and reused across
  * rounds; labels are lazily checkpointed per round to sever lineage
  * (the ConnectedComponents discipline).
  */
object LabelProp {

  /** @param und undirected edge relation (u, v), one row per edge
    *            (orientation irrelevant; both directions derived here)
    * @param rounds fixed number of synchronous update rounds
    * @return DataFrame(node: Long, community: Long)
    */
  def run(spark: SparkSession, und: DataFrame, rounds: Int): DataFrame = {
    val fwd = und.select(col("u").cast("long"), col("v").cast("long"))
    val edges = fwd.select(col("u").as("a"), col("v").as("b"))
      .unionAll(fwd.select(col("v").as("a"), col("u").as("b")))
      .repartition(col("b")) // each round joins labels on the b side
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("a").as("node")).distinct()
      .withColumn("lbl", col("node"))
      .localCheckpoint(eager = false)
    val top1 = Window.partitionBy("a")
      .orderBy(col("c").desc, col("lbl").asc)
    for (_ <- 1 to rounds) {
      labels = edges.join(labels, edges("b") === labels("node"))
        .groupBy(edges("a"), col("lbl")).agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(top1))
        .where(col("rn") === 1)
        .select(col("a").as("node"), col("lbl"))
        .localCheckpoint(eager = false)
    }
    edges.unpersist()
    labels.select(col("node"), col("lbl").as("community"))
  }
}
