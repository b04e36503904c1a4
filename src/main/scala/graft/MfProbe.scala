package graft
import org.apache.spark.sql.SparkSession
object MfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val edges = graph.GraphQueries.q16Edges(spark, "/root/testdata/sf0.1").persist()
    println(s"PROBE edges=${edges.count()}")
    var t0 = System.nanoTime()
    val v1 = graph.MaxFlow.run(spark, edges, 10L to 12L, 1000010L to 1000012L)
    println(f"PROBE v1 flow=${v1.flow} rounds=${v1.rounds} t=${(System.nanoTime()-t0)/1e9}%.1f s")
    t0 = System.nanoTime()
    val v2 = graph.MaxFlowSchimmy.run(spark, edges, 10L to 12L, 1000010L to 1000012L)
    println(f"PROBE v2-schimmy flow=${v2.flow} rounds=${v2.rounds} t=${(System.nanoTime()-t0)/1e9}%.1f s")
    spark.stop()
  }
}
