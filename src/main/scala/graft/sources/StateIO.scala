package graft.sources

import graft.graph.{GraphModel, VertexState}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Durable round-state and result sinks (SURVEY §2.1 S4/S7/S8/S9/S10).
  *
  * The reference persists per-round vertex state as per-reducer
  * SequenceFiles (ff3/ReduceFF.java:92-95) and accepted flows/paths as
  * side files (ff2/ApServer.java:58-81, ff1/Vertex.java:149-188). Our
  * durable format is Parquet partitioned by a stable hash of the vertex id
  * — `spark.read.parquet` restores the Dataset[VertexState] for
  * resume/debug, and a snappy codec plays the role of the reference's
  * block compression (ff5/ReduceFF.java:129-137, `mf.zip.master`).
  */
object StateIO {

  /** S7: persist round state. `parts` mirrors `mf.reducers`. */
  def writeState(state: Dataset[VertexState], dir: String, parts: Int = 32): Unit =
    state.repartition(parts, col("id")).write.mode("overwrite").parquet(dir)

  /** S4: restore round state written by writeState. */
  def readState(spark: SparkSession, dir: String): Dataset[VertexState] = {
    import spark.implicits._
    spark.read.parquet(dir).as[VertexState]
  }

  /** Round-tagged checkpoints — the reference's `round-<i>/` layout
    * (ff3/FordFulkerson.java:155-162). Each checkpoint is a NEW dir
    * `base/round-<i>`, so a kill mid-write can only leave an incomplete
    * in-progress dir, never destroy the previous good one (a flat
    * overwrite would). Spark's `_SUCCESS` marker is the completeness
    * certificate; resume picks the newest complete round and inherits its
    * round index. Paths go through the Hadoop FileSystem API so the same
    * code runs on local disk, HDFS, or an object store.
    */
  def roundDir(base: String, round: Int): String = f"$base/round-$round%06d"

  def writeRound(state: Dataset[VertexState], base: String, round: Int,
                 parts: Int = 32): Unit =
    writeState(state, roundDir(base, round), parts)

  /** Newest round index under `base` whose dir carries `_SUCCESS`. */
  def latestRound(spark: SparkSession, base: String): Option[Int] = {
    val p = new org.apache.hadoop.fs.Path(base)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .flatMap { d =>
        val n = d.getName
        if (n.startsWith("round-") &&
            fs.exists(new org.apache.hadoop.fs.Path(d, "_SUCCESS")))
          Some(n.stripPrefix("round-").toInt)
        else None
      } match {
        case Nil => None
        case rs  => Some(rs.max)
      }
  }

  /** Resume source: state + start-round from the newest COMPLETE round
    * dir; a CLEAR error when only in-progress round dirs exist (a crash
    * during the first-ever checkpoint write) — a raw parquet read of the
    * base dir would surface as a baffling schema-inference failure; flat
    * dirs written directly by [[writeState]] still resume at round 0.
    */
  def readLatestForResume(spark: SparkSession,
                          base: String): (Dataset[VertexState], Int) =
    latestRound(spark, base) match {
      case Some(r) => (readState(spark, roundDir(base, r)), r)
      case None =>
        val p = new org.apache.hadoop.fs.Path(base)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val onlyIncomplete = fs.exists(p) && fs.listStatus(p).exists(st =>
          st.isDirectory && st.getPath.getName.startsWith("round-"))
        if (onlyIncomplete)
          sys.error(s"no COMPLETE round checkpoint under $base — only " +
            "in-progress round-* dirs without _SUCCESS (crash during the " +
            "first checkpoint write); nothing usable to resume from")
        (readState(spark, base), 0)
    }

  /** Bound checkpoint storage: drop all but the newest `keep` complete
    * rounds (plus any incomplete dirs, which are overwritten in place if
    * the same round index recurs).
    */
  def pruneRounds(spark: SparkSession, base: String, keep: Int = 2): Unit = {
    val p = new org.apache.hadoop.fs.Path(base)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val complete = fs.listStatus(p).toSeq
        .filter(_.isDirectory).map(_.getPath)
        .filter(d => d.getName.startsWith("round-") &&
          fs.exists(new org.apache.hadoop.fs.Path(d, "_SUCCESS")))
        .sortBy(_.getName)
      complete.dropRight(keep).foreach(fs.delete(_, true))
    }
  }

  /** S8: accepted flow assignment as a small relation (u, v, f). */
  def flowsToDf(spark: SparkSession, assignment: Map[(Long, Long), Long]): DataFrame = {
    import spark.implicits._
    assignment.toSeq.map { case ((u, v), f) => (u, v, f) }.toDF("u", "v", "f")
  }

  /** S9: human-readable accepted paths, `v0:v1:…:vk=flow` lines —
    * byte-compatible with ff1's flowpaths format (ff1/Vertex.java:171-188).
    */
  def writeFlowPaths(spark: SparkSession, paths: Seq[(Seq[Long], Long)],
                     dir: String): Unit = {
    import spark.implicits._
    paths.map { case (p, f) => s"${p.mkString(":")}=$f" }
      .toDF("value").coalesce(1).write.mode("overwrite").text(dir)
  }

  /** S10: debug inspector — per-vertex summary of a state dir. */
  def dumpState(spark: SparkSession, dir: String, n: Int = 20): DataFrame =
    readState(spark, dir)
      .select(col("id"), size(col("adj")).as("degree"),
        size(col("s")).as("nS"), size(col("t")).as("nT"))
      .orderBy("id").limit(n)

  /** Sanity audit mirroring the reference's conservation check
    * (ff1/Vertex.java:156-163): net assignment outflow of the supersource
    * must equal the accepted total, and every interior vertex nets zero.
    */
  def conservationHolds(assignment: Map[(Long, Long), Long], flow: Long): Boolean = {
    val net = scala.collection.mutable.HashMap.empty[Long, Long].withDefaultValue(0L)
    assignment.foreach { case ((u, v), f) => net(u) += f; net(v) -= f }
    net(GraphModel.SuperSource) == flow && net(GraphModel.SuperSink) == -flow &&
      net.forall { case (k, d) =>
        k == GraphModel.SuperSource || k == GraphModel.SuperSink || d == 0L
      }
  }
}
