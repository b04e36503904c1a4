package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Full coreness (k-core number) decomposition by iterated neighborhood
  * h-index (Lü / Zhou / Zhang / Stanley, PNAS 113(1), 2016 — public):
  * start every vertex at its degree and repeatedly replace each value
  * with the H-INDEX of its neighbors' values (the largest h such that at
  * least h neighbors hold value ≥ h). The sequence is monotone
  * non-increasing and converges exactly to the coreness — the full
  * decomposition [[KCore]] answers only one k of.
  *
  * Spark-first shape: per round, ONE join of the edge relation against
  * the current value table and one per-vertex window (rank neighbor
  * values descending, h = max(min(rank, value)) — the classic h-index
  * identity), then an exact changed-count for convergence. No DuckDB
  * oracle exists for an iterative fixpoint of this depth, so correctness
  * is spec-locked against an in-memory min-heap peeling oracle plus the
  * KCore cross-check (nodes with coreness ≥ k are EXACTLY KCore.run's
  * k-core) — the BFS/max-flow verification discipline.
  *
  * Scale design: round cost is one shuffle of the edge relation plus a
  * degree-bounded window per vertex; round count is the h-index
  * convergence depth (single digits on heavy-tailed graphs, bounded by
  * graph diameter × value range in theory). Lazy localCheckpoint per
  * round keeps the plan O(1) stages (the q26/q33 discipline); only the
  * per-round changed COUNT reaches the driver.
  */
object Coreness {

  /** @param edges symmetric deduplicated (src, dst) BIGINT pairs — every
    *              undirected edge present in both directions (the KCore
    *              contract).
    * @param driverFinishMaxEdges graph size (|edges|) up to which ONE
    *              bounded collect + in-memory bucket peeling computes the
    *              decomposition (the Mst/Scc driver-tier discipline —
    *              coreness is unique, so the tiers agree exactly and the
    *              equivalence is spec-locked); 0 disables the driver tier.
    *              The h-index loop's per-round cost is a window over the
    *              edge relation, so small graphs pay pure job overhead ×
    *              convergence depth there.
    * @return (node, coreness) for every vertex with at least one edge,
    *         ordered by node
    */
  def run(s: SparkSession, edges: DataFrame, maxIter: Int = 100,
          driverFinishMaxEdges: Long = 5000000L): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .localCheckpoint(eager = true)
    if (e.count() <= driverFinishMaxEdges) {
      import s.implicits._
      val result = peelCoreness(e.collect()
        .map(r => (r.getLong(0), r.getLong(1))))
      Checkpoints.release(e)
      return result.toSeq.toDF("node", "coreness").orderBy("node")
    }
    var vals = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = true)
    // the checkpoint the current `vals` frame reads through — released
    // the moment a newer materialized round supersedes it
    // (Checkpoints.scala; the q43_scc in-session degradation)
    var live = vals
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      iter += 1
      val nb = e.join(vals.select(col("node").as("dst"), col("c").as("nc")),
        Seq("dst"))
        .select(col("src").as("node"), col("nc"))
      val w = Window.partitionBy("node").orderBy(col("nc").desc)
      val h = nb.withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("hl", least(col("rn"), col("nc")))
        .groupBy("node").agg(max("hl").as("h"))
      // LAZY: the changed-count right below is the materializing action
      // — one job per round, not an eager-checkpoint job plus a count
      // (the CC/Bfs discipline the scaladoc declares)
      val next = vals.join(h, Seq("node"))
        .select(col("node"), col("c"), col("h"))
        .localCheckpoint(eager = false)
      changed = next.filter(col("h") =!= col("c")).count()
      Checkpoints.release(live)
      live = next
      vals = next.select(col("node"), col("h").as("c"))
    }
    require(changed == 0, s"Coreness.run: not converged after $maxIter rounds")
    // the result reads only the last round's checkpoint, not the edges
    Checkpoints.release(e)
    vals.select(col("node"), col("c").as("coreness")).orderBy("node")
  }

  /** In-memory bucket peeling (Batagelj–Zaveršnik 2003, the classic
    * O(V+E) algorithm): repeatedly remove a minimum-degree vertex; its
    * coreness is the running peel level. Exactly the min-heap oracle the
    * spec suite checks the distributed loop against — here promoted to
    * the bounded driver tier.
    */
  private[graph] def peelCoreness(
      edges: Array[(Long, Long)]): collection.Map[Long, Long] = {
    val adj = scala.collection.mutable.Map.empty[Long, mutable.ArrayBuffer[Long]]
    edges.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, mutable.ArrayBuffer.empty) += b
    }
    val deg = scala.collection.mutable.Map.empty[Long, Int]
    adj.foreach { case (v, ns) => deg(v) = ns.length }
    val out = scala.collection.mutable.Map.empty[Long, Long]
    val heap = scala.collection.mutable.PriorityQueue.empty[(Int, Long)](
      Ordering.by[(Int, Long), (Int, Long)](x => (-x._1, -x._2)))
    deg.foreach { case (v, d) => heap.enqueue((d, v)) }
    var level = 0L
    while (heap.nonEmpty) {
      val (d, v) = heap.dequeue()
      if (!out.contains(v) && d == deg(v)) { // skip stale heap entries
        level = math.max(level, d.toLong)
        out(v) = level
        adj(v).foreach { n =>
          if (!out.contains(n)) {
            deg(n) -= 1
            heap.enqueue((deg(n), n))
          }
        }
      }
    }
    out
  }
}
