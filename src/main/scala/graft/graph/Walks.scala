package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic random-walk corpus generation — the DeepWalk/node2vec
  * input step of a graph-embedding training pipeline (Perozzi et al.
  * 2014, public): from every seed vertex, a fixed-length walk whose
  * step-t transition picks neighbor index `H(walk_id, t) mod deg(v)`,
  * with H an md5 digest draw (the ds_shuffle/ds_wsample digest family —
  * order-independent, engine-portable, reproducible across runs and
  * partitionings). The walk "tape" is drawn per (walk, step), not per
  * vertex, so the whole trajectory is a pure function of (seed, salt) —
  * re-runs and the DuckDB oracle replay it node for node.
  *
  * Scale design: the adjacency is indexed ONCE — `idx` (rank of dst in
  * src's neighbor list) and `deg` share one src exchange (ordered
  * ROW_NUMBER + unordered COUNT over the same partition key, the
  * ds_qfilter discipline) and the relation is lazily checkpointed so all
  * `steps` lookups reuse the materialized partitions. Each step is TWO
  * equi-joins sized by the FRONTIER, not the graph: (node = src) against
  * the node-sized degree relation computes the wanted index, then
  * (node, want_idx) = (src, idx) is an exact one-row lookup into the
  * indexed adjacency — a hub vertex with 10^6 neighbors costs one row,
  * never a fan-out-then-filter. Walks ≪ edges at any SF, so the per-step
  * shuffle carries the walk frontier only (broadcast when it fits, AQE's
  * call); steps are inherently sequential — L joins, L stages, no
  * driver-side graph data.
  */
object Walks {

  /** @param edges distinct directed edge relation (src, dst) — pass both
    *              directions for an undirected graph; duplicate pairs
    *              would bias the draw (each copy gets its own index)
    * @param seeds one walk per row: (walk_id, node) — node must have at
    *              least one out-edge or the walk ends at step 0
    * @param steps fixed walk length (output has steps+1 rows per walk
    *              when no dead end is hit)
    * @param salt  digest namespace — two corpora with different salts are
    *              independent draws over the same graph
    * @return DataFrame(walk_id: Long, step: Int, node: Long)
    */
  def run(spark: SparkSession, edges: DataFrame, seeds: DataFrame,
          steps: Int, salt: String): DataFrame = {
    val w = Window.partitionBy("src").orderBy("dst")
    val nbr = edges
      .select(col("src").cast("long"), col("dst").cast("long"))
      .withColumn("idx", row_number().over(w).cast("long") - 1)
      .withColumn("deg",
        count(lit(1)).over(Window.partitionBy("src")).cast("long"))
      // registered (r14, ADVICE): a library caller's Caches.releaseAll
      // can free this graph-sized pin; reused by every step's lookup
      .localCheckpoint(eager = false)
    graft.Caches.trackPinned(nbr)
    // node-sized degree relation: a filter on the indexed adjacency, no
    // second aggregation pass
    // fresh aliases on both derived relations: `want` (via degs) and the
    // lookup share nbr's lineage, so unaliased attributes would make the
    // step-2 join an ambiguous self-join
    val degs = nbr.filter(col("idx") === 0L)
      .select(col("src").as("dsrc"), col("deg").as("ddeg"))
    // pre-partitioned on the exact-lookup key and checkpointed ONCE
    // (r13): every step's (at, want_idx) = (lsrc, lidx) join consumes
    // this layout, so the per-step exchange of the graph-sized indexed
    // adjacency disappears — only the walk-sized frontier moves per
    // step (guide §2.4; the co-partitioning requires ALL join keys, so
    // partitioning by lsrc alone would not be reused)
    val look = nbr.select(col("src").as("lsrc"), col("idx").as("lidx"),
      col("dst").as("ldst"))
      // sorted on the full lookup key too (r14): the checkpoint preserves
      // ordering, so each step's SMJ stops re-sorting the graph-sized
      // lookup relation — only the walk-sized frontier side sorts
      .repartition(col("lsrc"), col("lidx"))
      .sortWithinPartitions("lsrc", "lidx")
      .localCheckpoint(eager = false)
    graft.Caches.trackPinned(look) // releasable by library callers (r14)

    var frontier = seeds
      .select(col("walk_id").cast("long"), col("node").cast("long"))
    var out = frontier.select(col("walk_id"), lit(0).as("step"), col("node"))
    for (t <- 1 to steps) {
      val h = expr(
        s"CAST(conv(substring(md5(concat('wk$salt:', " +
          s"CAST(walk_id AS STRING), ':$t')), 1, 15), 16, 10) AS BIGINT)")
      val want = frontier.join(degs, frontier("node") === degs("dsrc"))
        .select(col("walk_id"), col("node").as("at"),
          (h % col("ddeg")).as("want_idx"))
      val next = want.join(look,
          want("at") === look("lsrc") && want("want_idx") === look("lidx"))
        .select(col("walk_id"), col("ldst").as("node"))
        .localCheckpoint(eager = false) // cut lineage: O(1) plan per step
      out = out.unionAll(
        next.select(col("walk_id"), lit(t).as("step"), col("node")))
      frontier = next
    }
    out
  }
}
