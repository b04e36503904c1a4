package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Random source/sink selection by degree (SURVEY T11;
  * ff5/FordFulkerson.java:109-116,62-73 + ff5/ApServer.java:80-110).
  *
  * The reference reservoir-samples 1000 of the >3000-degree vertices during
  * ingest and lets reducers fetch n random sources+sinks from the RMI
  * server. Spark-first: degree = one hash aggregate over the edge relation;
  * the "reservoir" is a seeded hash-ordered LIMIT (deterministic, and the
  * sort is a TakeOrderedAndProject — top-k, never a full sort at scale);
  * the driver holds the sampled pool exactly like the reference's ApServer.
  */
object TerminalSelection {

  /** High-degree candidate pool: vertices with degree > minDegree, sampled
    * to `poolSize` by seeded hash order.
    */
  def candidatePool(spark: SparkSession, edges: DataFrame, minDegree: Long = 3000L,
                    poolSize: Int = 1000, seed: Long = 42L): Array[Long] =
    edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") > minDegree)
      .orderBy(xxhash64(col("src"), lit(seed)), col("src"))
      .limit(poolSize)
      .select("src").collect().map(_.getLong(0))

  /** Pick n disjoint sources and sinks from the pool (seeded). */
  def pickSourcesAndSinks(pool: Array[Long], n: Int,
                          seed: Long = 42L): (Seq[Long], Seq[Long]) = {
    require(pool.length >= 2 * n, s"pool ${pool.length} too small for 2×$n terminals")
    val shuffled = new scala.util.Random(seed).shuffle(pool.toVector)
    (shuffled.take(n), shuffled.slice(n, 2 * n))
  }
}
