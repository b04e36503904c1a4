package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit diagnostic: print the executed physical plan of any
  * `SparkEntry.queries` entries at sf0.001 — the fast way to check a
  * shape claim (exchange count, broadcast vs SMJ, window-on-exchange,
  * pushed filters) without wiring a spec. Not part of the driver
  * contract; used per round for the PERF.md plan audits (e.g. r12:
  * confirming the DensityGuard window sits directly on the block-key
  * exchange the pair join consumes).
  *
  *   sbt "runMain graft.ExplainAudit dd_simhash_pairs mm_ahash"
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // default sf0.001 (plan shape, fast); override with
    // SPARK_GRAFT_AUDIT_SF=/root/testdata/sf0.1 to audit the executed
    // plan against bench-scale inputs (the r12 dd_resolve question —
    // window-on-exchange claims can differ once AQE sees real sizes)
    val dir = sys.env.getOrElse("SPARK_GRAFT_AUDIT_SF",
      "/root/testdata/sf0.001")
    for (q <- args) {
      println(s"===== $q =====")
      val df = SparkEntry.queries(q)(spark, dir)
      println(df.queryExecution.executedPlan.toString.take(400000))
      SparkHygiene.clearSessionCaches(spark)
    }
    spark.stop()
  }
}
