package graft

import org.apache.spark.sql.SparkSession

/** Shared session-hygiene helpers for the driver mains and the test
  * harness — one definition each for the two blocks that would otherwise
  * drift between Bench, Verify, and TestSpark.
  */
object SparkHygiene {

  /** Checkpoints.release legitimately unpersists locally-checkpointed
    * RDDs (guaranteed dead — see graph/Checkpoints.scala); Spark WARNs on
    * every such unpersist, which would flood a protocol run thousands of
    * times. Suppress that logger family once per JVM.
    */
  def quietRddLogs(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)

  /** Drop caches/checkpoints a query left behind so later queries in a
    * long session aren't taxed by accumulated block-manager pressure.
    */
  def clearSessionCaches(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
  }
}
