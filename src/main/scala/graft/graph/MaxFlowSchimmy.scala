package graft.graph

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable
import scala.util.Random

/** Max-flow v2: the **schimmy** superstep (SURVEY §2.4 J1, §2.1 S5;
  * ff3/ReduceFF.java:82-137, ff3/MapFF.java:46-59).
  *
  * The reference's key physical optimization: the immutable graph topology
  * is never shuffled — mappers emit only delta messages, and each reducer
  * merge-joins its own master partition file. Spark-native equivalent:
  *
  *  - master state lives in a DataFrame persisted with
  *    `HashPartitioning(id, N)`;
  *  - per round, only the (small) delta messages are shuffled, grouped by
  *    target vertex, and joined to the master — the master side of the
  *    sort-merge join needs **no exchange** because its cached partitioning
  *    already satisfies the join requirement (this is exactly the
  *    partition-aligned unsplittable-input trick, for free);
  *  - the merge itself (flow refresh T6, saturation pruning T7, fset memo
  *    T9, path union + dedup + K-bounded priority retention A1/A5) is pure
  *    Catalyst expressions, so the join's output partitioning (and
  *    ordering) survives into the next round's persisted state — no
  *    object-serialization boundary ever hides it;
  *  - accepted flow deltas ride into the expressions as a broadcast-style
  *    map literal (the reference's aug-flows side file, S6/J2);
  *  - meet-in-the-middle candidates (J3) are computed on a typed side
  *    branch from the cached join inputs and folded on the driver (C1/C2),
  *    identical to v1.
  *
  * Same algorithm and exactness-cleanup guarantee as [[MaxFlow]]; only the
  * shuffle topology differs. At 100 TB state (heavy adjacency + path
  * lists) this moves only O(messages) per round instead of O(state).
  *
  * Tradeoff, measured: on local[N] (shuffle ≈ free) v1's typed JVM merge
  * is ~1.4× faster because the expression merge is interpreter-bound; on a
  * real cluster the per-round shuffle of full adjacency+paths that v1 pays
  * dominates, which is exactly why the reference built schimmy. Pick v1
  * for single-node, v2 for cluster-scale state.
  */
object MaxFlowSchimmy {

  /** One extension message: a path shipped to `dst` (SURVEY T8). */
  case class DeltaMsg(dst: Long, isS: Boolean, path: PathState)

  // public: Catalyst's generated SafeProjection must instantiate it
  case class JoinedRow(
      id: Long, adj: Array[Adj], s: Array[PathState], t: Array[PathState],
      fsetS: Array[Long], fsetT: Array[Long],
      ds: Array[PathState], dt: Array[PathState])

  /** SQL map literal carrying the round's accepted flow deltas. */
  private def deltaMapLit(d: MaxFlow.FlowDelta): String =
    if (d.isEmpty) "cast(map() AS map<string,bigint>)"
    else d.map { case ((u, v), f) => s"'$u:$v', ${f}L" }
      .mkString("map(", ", ", ")")

  /** Directed effective-flow refresh of `f` on arc a→b, as SQL. */
  private def refreshSql(dm: String, f: String, a: String, b: String): String =
    s"$f + coalesce(element_at($dm, concat($a, ':', $b)), 0L)" +
      s" - coalesce(element_at($dm, concat($b, ':', $a)), 0L)"

  /** T6: adjacency with flows refreshed against the delta map. */
  private def adjExpr(dm: String): String =
    s"""transform(adj, a -> named_struct(
       |  'nbr', a.nbr,
       |  'flow', ${refreshSql(dm, "a.flow", "id", "a.nbr")},
       |  'capOut', a.capOut, 'capIn', a.capIn))""".stripMargin

  /** T7: refresh per-hop path flows, drop saturated paths. `arr` must be an
    * expression yielding array<PathState>.
    */
  private def refreshedPathsExpr(dm: String, arr: String): String =
    s"""filter(
       |  transform($arr, p -> named_struct(
       |    'nodes', p.nodes,
       |    'flows', transform(p.flows, (f, i) ->
       |      ${refreshSql(dm, "f", "element_at(p.nodes, i + 1)", "element_at(p.nodes, i + 2)")}),
       |    'caps', p.caps)),
       |  p -> size(p.flows) = 0
       |       OR array_min(zip_with(p.caps, p.flows, (c, f) -> c - f)) > 0)""".stripMargin

  /** A1 + A5: union already-refreshed master paths with incoming deltas,
    * dedup, keep K best (potential desc, length asc, nodes lexicographic).
    * Expects its inputs refreshed by the staged select (see runLoop).
    */
  private def mergeExpr(masterArr: String, deltaCol: String, k: Int): String = {
    def pot(x: String): String =
      s"CASE WHEN size($x.flows) = 0 THEN ${Long.MaxValue}L " +
        s"ELSE array_min(zip_with($x.caps, $x.flows, (c, f) -> c - f)) END"
    s"""slice(array_sort(
       |  array_distinct(concat($masterArr, coalesce($deltaCol, array()))),
       |  (l, r) -> CASE
       |    WHEN ${pot("l")} > ${pot("r")} THEN -1
       |    WHEN ${pot("l")} < ${pot("r")} THEN 1
       |    WHEN size(l.nodes) < size(r.nodes) THEN -1
       |    WHEN size(l.nodes) > size(r.nodes) THEN 1
       |    WHEN array_join(l.nodes, ',') < array_join(r.nodes, ',') THEN -1
       |    WHEN array_join(l.nodes, ',') > array_join(r.nodes, ',') THEN 1
       |    ELSE 0 END), 1, $k)""".stripMargin
  }

  /** T9: fset grows by exactly the targets the typed extension pass chose
    * this round — the target set is a deterministic function of the state,
    * so the expression mirrors `extendOnly`'s eligibility test.
    */
  private def fsetExpr(fsetCol: String, sArr: String, forS: Boolean,
                       maxLen: Int): String = {
    val resid = if (forS) "a.capOut - a.flow" else "a.capIn + a.flow"
    val skipSelf = if (forS) s"id != ${GraphModel.SuperSink}L"
                   else s"id != ${GraphModel.SuperSource}L"
    val skipNbr = if (forS) s"a.nbr != ${GraphModel.SuperSource}L"
                  else s"a.nbr != ${GraphModel.SuperSink}L"
    s"""array_sort(array_union($fsetCol,
       |  CASE WHEN $skipSelf THEN
       |    transform(filter(adj, a ->
       |      $resid > 0 AND NOT array_contains($fsetCol, a.nbr) AND $skipNbr
       |      AND exists($sArr, p ->
       |        size(p.nodes) - 1 < $maxLen
       |        AND NOT array_contains(p.nodes, a.nbr))),
       |      a -> a.nbr)
       |  ELSE array() END))""".stripMargin
  }

  /** Extension pass (T8/T9), typed: deltas only — masters are never
    * re-emitted (the schimmy contract).
    */
  private def extendOnly(v: VertexState, d: MaxFlow.FlowDelta, round: Int,
                         conf: MaxFlow.Config,
                         ctrs: MaxFlow.Ctrs): Iterator[DeltaMsg] = {
    val adj2 = if (d.isEmpty) v.adj else v.adj.map { a =>
      a.copy(flow = MaxFlow.effFlow(a.flow, v.id, a.nbr, d))
    }
    def refresh(p: PathState): PathState =
      if (d.isEmpty || p.length == 0) p
      else PathState(p.nodes,
        Array.tabulate(p.flows.length)(i =>
          MaxFlow.effFlow(p.flows(i), p.nodes(i), p.nodes(i + 1), d)), p.caps)
    val s2 = v.s.map(refresh).filter(_.potential > 0)
    val t2 = v.t.map(refresh).filter(_.potential > 0)
    ctrs.satS.add(v.s.length - s2.length)
    ctrs.satT.add(v.t.length - t2.length)
    if (v.s.nonEmpty && s2.isEmpty) ctrs.loseExcess.add(1)
    if (v.t.nonEmpty && t2.isEmpty) ctrs.loseExcess.add(1)
    val rng = new Random(v.id * 0x9E3779B97F4A7C15L + round)
    val out = mutable.ArrayBuffer.empty[DeltaMsg]
    if (s2.nonEmpty && v.id != GraphModel.SuperSink) {
      for (a <- adj2
           if a.residualOut > 0 && !v.fsetS.contains(a.nbr) &&
             a.nbr != GraphModel.SuperSource) {
        val eligible = s2.filter(p =>
          p.length < conf.maxPathLength && !p.contains(a.nbr))
        if (eligible.nonEmpty) {
          val p = eligible(rng.nextInt(eligible.length))
          out += DeltaMsg(a.nbr, isS = true,
            PathState(p.nodes :+ a.nbr, p.flows :+ a.flow, p.caps :+ a.capOut))
          ctrs.extendS.add(1)
        }
      }
    }
    if (t2.nonEmpty && v.id != GraphModel.SuperSource) {
      for (a <- adj2
           if a.residualIn > 0 && !v.fsetT.contains(a.nbr) &&
             a.nbr != GraphModel.SuperSink) {
        val eligible = t2.filter(p =>
          p.length < conf.maxPathLength && !p.contains(a.nbr))
        if (eligible.nonEmpty) {
          val p = eligible(rng.nextInt(eligible.length))
          out += DeltaMsg(a.nbr, isS = false,
            PathState(a.nbr +: p.nodes, (-a.flow) +: p.flows, a.capIn +: p.caps))
          ctrs.extendT.add(1)
        }
      }
    }
    out.iterator
  }

  /** Candidate generation (J3), typed side branch over the joined rows —
    * pairs involve at least one newly-arrived path, as in v1.
    */
  private def meetCandidates(r: JoinedRow, d: MaxFlow.FlowDelta, round: Int,
                             conf: MaxFlow.Config,
                             ctrs: MaxFlow.Ctrs): Iterator[Candidate] = {
    def refresh(p: PathState): PathState =
      if (d.isEmpty || p.length == 0) p
      else PathState(p.nodes,
        Array.tabulate(p.flows.length)(i =>
          MaxFlow.effFlow(p.flows(i), p.nodes(i), p.nodes(i + 1), d)), p.caps)
    val s2 = r.s.map(refresh).filter(_.potential > 0)
    val t2 = r.t.map(refresh).filter(_.potential > 0)
    val newS = MaxFlow.dedupPaths(r.ds, s2)
    val newT = MaxFlow.dedupPaths(r.dt, t2)
    // counter gauges for the round report (this branch walks every master
    // row once per round, so it doubles as the counting pass; the SQL
    // merge itself can't carry accumulators)
    if (s2.nonEmpty || newS.nonEmpty) ctrs.aliveS.add(1)
    if (t2.nonEmpty || newT.nonEmpty) ctrs.aliveT.add(1)
    if (s2.isEmpty && newS.nonEmpty) ctrs.moveS.add(1)
    if (t2.isEmpty && newT.nonEmpty) ctrs.moveT.add(1)
    ctrs.dropS.add(math.max(0, s2.length + newS.length - conf.excessListMax))
    ctrs.dropT.add(math.max(0, t2.length + newT.length - conf.excessListMax))
    if (newS.isEmpty && newT.isEmpty) Iterator.empty
    else {
      val rng = new Random(r.id * 0xBF58476D1CE4E5B9L + round)
      val pairs = mutable.ArrayBuffer.empty[(PathState, PathState)]
      for (sp <- newS; tp <- t2 ++ newT) pairs += ((sp, tp))
      for (sp <- s2; tp <- newT) pairs += ((sp, tp))
      val chosen =
        if (pairs.length <= conf.candidatesPerVertex) pairs
        else rng.shuffle(pairs).take(conf.candidatesPerVertex)
      chosen.iterator.flatMap { case (sp, tp) => MaxFlow.concat(sp, tp) }
    }
  }

  def run(spark: SparkSession, edges: DataFrame, sources: Seq[Long],
          sinks: Seq[Long],
          conf: MaxFlow.Config = MaxFlow.Config()): MaxFlow.Result = {
    require(sources.toSet.intersect(sinks.toSet).isEmpty,
      "sources and sinks must be disjoint")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prevCoalesce = spark.conf.get(coalesceKey, "true")
    val nEdges = edges.count()
    val loopParts = math.max(2L, math.min(prevParts.toLong, nEdges / 20000 + 1))
    spark.conf.set("spark.sql.shuffle.partitions", loopParts.toString)
    // SURVEY §4: AQE partition coalescing would shrink the delta exchange
    // below the master state's partition count, silently forcing the
    // master side of the schimmy join to re-shuffle — pin it off here
    spark.conf.set(coalesceKey, "false")
    try runLoop(spark, edges, sources, sinks, conf, loopParts.toInt)
    finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set(coalesceKey, prevCoalesce)
    }
  }

  private def runLoop(spark: SparkSession, edges: DataFrame, sources: Seq[Long],
                      sinks: Seq[Long], conf: MaxFlow.Config,
                      nParts: Int): MaxFlow.Result = {
    import spark.implicits._
    val sc = spark.sparkContext

    // master state: partitioned by id ONCE; never reshuffled again.
    // localCheckpoint preserves the physical HashPartitioning into the
    // LogicalRDD AND truncates lineage, so plan size stays O(1) in rounds.
    var state: DataFrame = GraphBuilder
      .buildState(spark, edges, sources, sinks)
      .toDF()
      .repartition(nParts, col("id"))
      .localCheckpoint(eager = true)

    var engineFlow = 0L
    var round = 0
    var pending: MaxFlow.FlowDelta = Map.empty
    val assignment = mutable.HashMap.empty[(Long, Long), Long]
    val allPaths = mutable.ArrayBuffer.empty[(Seq[Long], Long)]
    val reports = mutable.ArrayBuffer.empty[MaxFlow.RoundCounters]
    var zeroStreak = 0
    var done = false

    while (!done && round < conf.maxRounds) {
      round += 1
      val bc = sc.broadcast(pending)
      val dm = deltaMapLit(pending)
      val ctrs = MaxFlow.Ctrs(sc, s"schimmy-r$round")
      val r = round

      // 1. extension pass → delta messages (the ONLY shuffled data)
      val deltas = state.as[VertexState]
        .flatMap(extendOnly(_, bc.value, r, conf, ctrs))
      val grouped = deltas
        .groupBy(col("dst"))
        .agg(
          collect_list(when(col("isS"), col("path"))).as("ds"),
          collect_list(when(!col("isS"), col("path"))).as("dt"))
        .localCheckpoint(eager = true) // small; accumulators valid after
      // 2. schimmy join: master side satisfies the join partitioning from
      //    cache — only `grouped` was exchanged
      val joined = state.join(grouped, state("id") === grouped("dst"), "left_outer")

      // 3. staged refresh (T6/T7): evaluate the delta-map refresh ONCE per
      //    row, checkpoint (preserves partitioning), and let the light
      //    merge/fset expressions read the refreshed columns — without the
      //    stage, project collapsing would duplicate the heavy refresh
      //    into every consumer (measured ~2.5x slower)
      val stage = joined.select(
        col("id"),
        expr(adjExpr(dm)).as("adj"),
        expr(refreshedPathsExpr(dm, "s")).as("s"),
        expr(refreshedPathsExpr(dm, "t")).as("t"),
        col("fsetS"), col("fsetT"),
        coalesce(col("ds"), array()).as("ds"),
        coalesce(col("dt"), array()).as("dt"))
        .localCheckpoint(eager = true)

      // 4. candidates on a typed side branch (reads the cached stage;
      //    refresh already applied, so the empty delta is passed)
      val candidates = stage
        .as[JoinedRow]
        .flatMap(meetCandidates(_, Map.empty, r, conf, ctrs))
        .collect()

      // 5. light merge — partitioning survives to the next round
      val newState = stage.select(
        col("id"),
        col("adj"),
        expr(mergeExpr("s", "ds", conf.excessListMax)).as("s"),
        expr(mergeExpr("t", "dt", conf.excessListMax)).as("t"),
        expr(fsetExpr("fsetS", "s", forS = true, conf.maxPathLength)).as("fsetS"),
        expr(fsetExpr("fsetT", "t", forS = false, conf.maxPathLength)).as("fsetT"))
        .localCheckpoint(eager = true)

      val (got, delta, roundPaths) = MaxFlow.accept(candidates, conf.seed * 31 + round)
      allPaths ++= roundPaths
      delta.foreach { case (k, v) =>
        assignment.update(k, assignment.getOrElse(k, 0L) + v)
      }
      engineFlow += got
      reports += MaxFlow.RoundCounters(round, got, engineFlow,
        roundPaths.size, candidates.length, ctrs.loseExcess.value,
        ctrs.moveS.value, ctrs.moveT.value,
        ctrs.extendS.value, ctrs.extendT.value,
        ctrs.satS.value, ctrs.satT.value,
        ctrs.dropS.value, ctrs.dropT.value,
        ctrs.aliveS.value, ctrs.aliveT.value)
      pending = delta
      state = newState
      bc.destroy()
      zeroStreak = if (got == 0) zeroStreak + 1 else 0
      done = (got == 0 && ctrs.moves == 0) ||
        (round > 1 && got == 0 && ctrs.loseExcess.value == 0 &&
          (ctrs.moveS.value == 0 || ctrs.moveT.value == 0)) ||
        (engineFlow > 0 && zeroStreak >= conf.acceptPatience)
    }

    // flush pending deltas, then exactness cleanup — identical to v1
    var typedState: Dataset[VertexState] = state.as[VertexState]
    if (pending.nonEmpty) {
      val bc = sc.broadcast(pending)
      typedState = typedState.map(MaxFlow.applyDeltaOnly(_, bc.value))
        .localCheckpoint(eager = true)
      pending = Map.empty
    }
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
        cleanupFlow = extra
      }
    }
    MaxFlow.Result(engineFlow + cleanupFlow, engineFlow, cleanupFlow, round,
      assignment.toMap, allPaths.toSeq, reports.toSeq)
  }
}
