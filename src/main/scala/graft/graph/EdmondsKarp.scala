package graft.graph

import scala.collection.mutable

/** In-memory Edmonds-Karp max-flow oracle for correctness tests
  * (SURVEY §5: "max-flow = brute-force oracle"). Mirrors the engine's
  * model exactly: directed capacities, antisymmetric flow, supersource 1 /
  * supersink 2 attached with InfCap.
  */
object EdmondsKarp {

  /** @param edges directed (u, v, cap) — duplicates summed */
  def maxFlow(edges: Seq[(Long, Long, Long)], sources: Seq[Long],
              sinks: Seq[Long]): Long = {
    val cap = mutable.HashMap.empty[(Long, Long), Long]
    def addCap(u: Long, v: Long, c: Long): Unit =
      cap.update((u, v), cap.getOrElse((u, v), 0L) + c)
    edges.foreach { case (u, v, c) => addCap(u, v, c) }
    sources.distinct.foreach(s => addCap(1L, s, GraphModel.InfCap))
    sinks.distinct.foreach(t => addCap(t, 2L, GraphModel.InfCap))

    val adj = mutable.HashMap.empty[Long, mutable.ArrayBuffer[Long]]
    cap.keys.foreach { case (u, v) =>
      adj.getOrElseUpdate(u, mutable.ArrayBuffer.empty) += v
      adj.getOrElseUpdate(v, mutable.ArrayBuffer.empty) += u // residual back-edge
    }
    adj.values.foreach { b => val d = b.distinct; b.clear(); b ++= d }

    val flow = mutable.HashMap.empty[(Long, Long), Long].withDefaultValue(0L)
    def residual(u: Long, v: Long): Long = cap.getOrElse((u, v), 0L) - flow((u, v))

    var total = 0L
    var go = true
    while (go) {
      // BFS for shortest augmenting path
      val parent = mutable.HashMap.empty[Long, Long]
      val q = mutable.Queue(1L)
      parent(1L) = 1L
      while (q.nonEmpty && !parent.contains(2L)) {
        val u = q.dequeue()
        for (v <- adj.getOrElse(u, Nil) if !parent.contains(v) && residual(u, v) > 0) {
          parent(v) = u
          q.enqueue(v)
        }
      }
      if (!parent.contains(2L)) go = false
      else {
        var bn = Long.MaxValue
        var v = 2L
        while (v != 1L) { val u = parent(v); bn = math.min(bn, residual(u, v)); v = u }
        v = 2L
        while (v != 1L) {
          val u = parent(v)
          flow((u, v)) += bn
          flow((v, u)) -= bn
          v = u
        }
        total += bn
      }
    }
    total
  }

  /** Deterministic random test graph on ids [3, 3+n): directed (u,v,cap). */
  def randomGraph(n: Int, edgeProb: Double, maxCap: Int,
                  seed: Long): Seq[(Long, Long, Long)] = {
    val rng = new scala.util.Random(seed)
    val ids = (3L until (3L + n)).toSeq
    for {
      u <- ids; v <- ids
      if u != v && rng.nextDouble() < edgeProb
    } yield (u, v, 1L + rng.nextInt(maxCap))
  }
}
