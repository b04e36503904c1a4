package graft
import org.apache.spark.sql.SparkSession

/** Dev scratch probe for max-flow workloads. `sbt "runMain graft.MfProbe"`
  * sweeps terminal counts; `... MfProbe q16` profiles the q16 bench query's
  * config space (rounds vs engine/cleanup flow split vs wall) at the bench
  * session shape (local[32], sf0.1).
  */
object MfProbe {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("q16")) { q16Profile(); return }
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

  private def q16Profile(): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val configs = Seq(
      "current ap=2"        -> graph.MaxFlow.Config(acceptPatience = 2),
      "ap=1"                -> graph.MaxFlow.Config(acceptPatience = 1),
      "srcOnly ap=2"        -> graph.MaxFlow.Config(acceptPatience = 2, useSinkExcess = false),
      "srcOnly ap=1"        -> graph.MaxFlow.Config(acceptPatience = 1, useSinkExcess = false),
      "maxRounds=2"         -> graph.MaxFlow.Config(maxRounds = 2),
      "maxRounds=1"         -> graph.MaxFlow.Config(maxRounds = 1))
    for (rep <- 1 to 2; (tag, conf) <- configs) {
      val t0 = System.nanoTime()
      val edges = graph.GraphQueries.q16Edges(spark, dir)
      val sources = (10L to 17L)
      val sinks = (1000010L to 1000017L)
      val r = graph.MaxFlow.run(spark, edges, sources, sinks, conf)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"Q16PROBE rep=$rep '$tag' flow=${r.flow} engine=${r.engineFlow} " +
        f"cleanup=${r.cleanupFlow} rounds=${r.rounds} t=$dt%.2f s " +
        s"perRound=${r.rounds_report.map(c => c.acceptedFlow).mkString(",")}")
    }
    spark.stop()
  }
}
