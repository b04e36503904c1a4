package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: stress both max-flow engines on a synthetic small-world graph
  * (the reference's target topology — run:42's 5.1M-vertex fb crawl scaled
  * down) and cross-check against the in-memory oracle. Not part of the
  * driver contract; run with `sbt "runMain graft.ScaleProbe [nVertices]"`.
  */
object ScaleProbe {

  /** Watts-Strogatz-ish: ring + k-nearest + random rewires, caps 1..maxC. */
  def smallWorld(n: Int, k: Int, rewireP: Double, maxC: Int,
                 seed: Long): Seq[(Long, Long, Long)] = {
    val rng = new scala.util.Random(seed)
    val edges = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    for (i <- 0 until n; j <- 1 to k) {
      val a = 10L + i
      val b = if (rng.nextDouble() < rewireP) 10L + rng.nextInt(n)
              else 10L + (i + j) % n
      if (a != b) {
        val c = 1L + rng.nextInt(maxC)
        edges += ((a, b, c))
        edges += ((b, a, c))
      }
    }
    edges.toSeq
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val edges = smallWorld(n, k = 4, rewireP = 0.1, maxC = 10, seed = 7L)
    val rng = new scala.util.Random(13L)
    val ids = (10L until 10L + n)
    val sources = Seq.fill(8)(ids(rng.nextInt(n))).distinct
    val sinks = Seq.fill(8)(ids(rng.nextInt(n))).distinct.filterNot(sources.contains)
    println(s"SCALE n=$n edges=${edges.size} sources=${sources.size} sinks=${sinks.size}")

    val t0 = System.nanoTime()
    val want = graph.EdmondsKarp.maxFlow(edges, sources, sinks)
    println(f"SCALE oracle flow=$want t=${(System.nanoTime() - t0) / 1e9}%.1f s")

    val df = edges.toDF("src", "dst", "cap").persist()
    df.count()

    var t1 = System.nanoTime()
    val v1 = graph.MaxFlow.run(spark, df, sources, sinks)
    println(f"SCALE v1 flow=${v1.flow} engine=${v1.engineFlow} cleanup=${v1.cleanupFlow} " +
      f"rounds=${v1.rounds} t=${(System.nanoTime() - t1) / 1e9}%.1f s ok=${v1.flow == want}")

    t1 = System.nanoTime()
    val v2 = graph.MaxFlowSchimmy.run(spark, df, sources, sinks)
    println(f"SCALE v2 flow=${v2.flow} engine=${v2.engineFlow} cleanup=${v2.cleanupFlow} " +
      f"rounds=${v2.rounds} t=${(System.nanoTime() - t1) / 1e9}%.1f s ok=${v2.flow == want}")
    spark.stop()
    if (v1.flow != want || v2.flow != want) sys.exit(1)
  }
}
