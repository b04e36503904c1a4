package graft
import org.apache.spark.sql.SparkSession
object MfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val edges = graph.GraphQueries.q16Edges(spark, "/root/testdata/sf0.1").persist()
    edges.count()
    for (n <- Seq(3, 8)) {
      val sources = (10L until 10L + n)
      val sinks = (1000010L until 1000010L + n)
      val t0 = System.nanoTime()
      val r = graph.MaxFlow.run(spark, edges, sources, sinks)
      println(f"PROBE n=$n flow=${r.flow} engine=${r.engineFlow} rounds=${r.rounds} t=${(System.nanoTime()-t0)/1e9}%.1f s")
    }
    spark.stop()
  }
}
