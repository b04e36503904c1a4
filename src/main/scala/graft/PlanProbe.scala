package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: print the formatted physical plan and wall time of named
  * SparkEntry queries. Usage: runMain graft.PlanProbe <sfDir> <q1,q2,...>
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val (dir, names) = (args(0), args(1).split(",").toSeq)
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      println(s"===== $n =====")
      val df = SparkEntry.queries(n)(s, dir)
      df.explain("formatted")
      val t0 = System.nanoTime
      val c = df.count()
      println(f"rows=$c time=${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    s.stop()
  }
}
