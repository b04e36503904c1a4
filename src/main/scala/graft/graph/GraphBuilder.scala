package graft.graph

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Round-0 graph state construction (SURVEY §2.2 T3/T5, §2.3 A3;
  * ff3/FordFulkerson.java:19-128 Map0FF/Reduce0FF).
  *
  * Input: the directed edge relation `edges(src, dst, cap)` from
  * graft.sources.GraphSources. Output: `Dataset[VertexState]` hash-
  * partitioned by vertex id — the partitioning every superstep reuses
  * (the reference aligns partitions manually via unsplittable master
  * files, ff3/FordFulkerson.java:131-136; a persisted Dataset with a
  * stable HashPartitioning gives the same guarantee for free).
  */
object GraphBuilder {

  /** Inject supersource (id 1) / supersink (id 2) terminal edges with
    * "infinite" capacity (T5; ff1/Vertex.java:69-82,
    * ff3/FordFulkerson.java:19-40) and build per-vertex adjacency.
    */
  def buildState(spark: SparkSession, edges: DataFrame,
                 sources: Seq[Long], sinks: Seq[Long]): Dataset[VertexState] = {
    import spark.implicits._
    require(sources.nonEmpty && sinks.nonEmpty, "need at least one source and sink")

    val inf = GraphModel.InfCap
    val terminal =
      sources.distinct.flatMap(sId => Seq((1L, sId, inf), (sId, 1L, inf))) ++
      sinks.distinct.flatMap(tId => Seq((tId, 2L, inf), (2L, tId, inf)))
    val all = edges
      .select(col("src").cast("long"), col("dst").cast("long"), col("cap").cast("long"))
      .unionAll(terminal.toDF("src", "dst", "cap"))
      .groupBy("src", "dst").agg(sum("cap").as("cap")) // merge parallel arcs (A3)

    // Directional symmetrization: each side needs (capOut, capIn); missing
    // reverse arcs become cap-0 rows so push-back residuals exist.
    val rev = all.select(col("dst").as("src"), col("src").as("dst"),
      col("cap").as("capIn"))
    val sym = all.withColumnRenamed("cap", "capOut")
      .join(rev, Seq("src", "dst"), "full_outer")
      .na.fill(0L, Seq("capOut", "capIn"))

    sym.select(col("src"), col("dst"), col("capOut"), col("capIn"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (id, rows) =>
        val adj = rows.map { case (_, nbr, capOut, capIn) =>
          Adj(nbr, 0L, capOut, capIn)
        }.toArray.sortBy(_.nbr) // sorted adjacency, ff4/Vertex.java:31
        val seed = Array(PathState(Array(id), Array.empty, Array.empty))
        VertexState(id, adj,
          s = if (id == GraphModel.SuperSource) seed else Array.empty,
          t = if (id == GraphModel.SuperSink) seed else Array.empty,
          fsetS = Array.empty, fsetT = Array.empty)
      }
  }

  /** Residual edge relation of the current state: rows (src, dst) where
    * residual(src→dst) > 0. Used by the exactness-cleanup BFS.
    */
  def residualEdges(spark: SparkSession, state: Dataset[VertexState]): DataFrame = {
    import spark.implicits._
    state.flatMap(v => v.adj.filter(_.residualOut > 0).map(a => (v.id, a.nbr)))
      .toDF("src", "dst")
  }
}
