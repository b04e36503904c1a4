package graft
import org.apache.spark.sql.SparkSession
object MfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val edges = graph.GraphQueries.q16Edges(spark, "/root/testdata/sf0.1")
      .persist()
    println(s"PROBE edges=${edges.count()}")
    var t0 = System.nanoTime()
    val rNo = graph.MaxFlow.run(spark, edges, 10L to 12L, 1000010L to 1000012L,
      graph.MaxFlow.Config(exactCleanup = false))
    println(f"PROBE engine-only flow=${rNo.flow} rounds=${rNo.rounds} t=${(System.nanoTime()-t0)/1e9}%.1f s")
    t0 = System.nanoTime()
    val r = graph.MaxFlow.run(spark, edges, 10L to 12L, 1000010L to 1000012L)
    println(f"PROBE full flow=${r.flow} engine=${r.engineFlow} cleanup=${r.cleanupFlow} rounds=${r.rounds} t=${(System.nanoTime()-t0)/1e9}%.1f s")
    spark.stop()
  }
}
