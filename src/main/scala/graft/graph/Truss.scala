package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** k-truss refinement (Cohen 2008): repeatedly drop every edge whose
  * triangle support is below k−2 — the dense-subgraph / community-core
  * mining staple one notch stronger than k-core (edges must sit in
  * triangles, not just have degree). This implementation runs a FIXED
  * number of refinement passes (declared query semantics — the DuckDB
  * oracle unrolls the same count) and then reports each surviving edge
  * with its support measured on the final edge set; graphs whose truss
  * converges within `rounds` get the exact k-truss.
  *
  * Scale design: triangles are enumerated ONCE per pass in the ordered
  * (a < b < c) orientation — the q25 formulation whose per-bucket cap
  * upstream bounds fan-out — and each triangle credits its three edges
  * via a projection union + one count aggregate. Edge sets shrink
  * monotonically, so later passes are cheaper; `localCheckpoint` cuts
  * the per-pass lineage.
  */
object Truss {

  /** @param edges undirected simple edges as ordered pairs (u < v rows;
    *              others are normalized away)
    * @param k truss order (edges must close ≥ k−2 triangles per pass)
    * @param rounds refinement passes (fixed, part of the semantics)
    * @return DataFrame(u, v, support) — survivors with final-set support
    */
  def run(spark: SparkSession, edges: DataFrame, k: Int,
          rounds: Int): DataFrame = {
    require(k >= 3, s"k=$k must be >= 3")
    require(rounds >= 1, s"rounds=$rounds must be >= 1")
    var e = edges.select(col("u").cast("long"), col("v").cast("long"))
      .where(col("u") < col("v")).distinct()
      .localCheckpoint(eager = true)

    def support(cur: DataFrame): DataFrame = {
      val e1 = cur.select(col("u").as("a"), col("v").as("b"))
      val e2 = cur.select(col("u").as("b2"), col("v").as("c"))
      val e3 = cur.select(col("u").as("a3"), col("v").as("c3"))
      val tri = e1.join(e2, col("b2") === col("b"))
        .join(e3, col("a3") === col("a") && col("c3") === col("c"))
        .select("a", "b", "c")
      tri.select(col("a").as("u"), col("b").as("v"))
        .unionAll(tri.select(col("a").as("u"), col("c").as("v")))
        .unionAll(tri.select(col("b").as("u"), col("c").as("v")))
        .groupBy("u", "v").agg(count(lit(1)).as("support"))
    }

    for (_ <- 1 to rounds) {
      e = support(e).where(col("support") >= k - 2).select("u", "v")
        .localCheckpoint(eager = true)
    }
    e.join(support(e), Seq("u", "v"), "left")
      .select(col("u"), col("v"),
        coalesce(col("support"), lit(0L)).as("support"))
      .orderBy("u", "v")
  }
}
