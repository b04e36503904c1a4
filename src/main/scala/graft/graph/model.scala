package graft.graph

/** Core graph model (SURVEY §1.4, FIXTURES §3).
  *
  * The reference keeps an undirected capacitated graph as vertex-adjacency
  * records (`SequenceFile<IntWritable, Vertex>`, ff1/Vertex.java:13-17,
  * ff4/Vertex.java:7-12). We model the same state as a `Dataset[VertexState]`
  * with Tungsten-encoded case classes; ids are Long end-to-end, which makes
  * the reference's 64-bit→int fold (ff1/InputFacebook.java:14-20) a parser
  * detail instead of an overflow hazard.
  *
  * Flow convention: the reference stores one edge record (U,V,F,C) whose F
  * acts as a division point — residual U→V = C−F, V→U = C+F
  * (ff2/Edge.java:29-33); directed DIMACS arcs are encoded by initializing
  * F to c_vu (ff1/InputDimacs.java:51-62). We use the equivalent but
  * clearer form: signed net flow per direction plus explicit per-direction
  * capacities, so residual(u→v) = capOut − flow and
  * residual(v→u) = capIn + flow.
  */

/** One adjacency entry of vertex `u`: the edge u↔nbr seen from u.
  * `flow`   — net flow u→nbr (negative when flowing nbr→u);
  *            invariant: adj(u)(v).flow == -adj(v)(u).flow, and
  *            -capIn <= flow <= capOut (ff2/Edge.java:34).
  * `capOut` — capacity in the u→nbr direction;
  * `capIn`  — capacity in the nbr→u direction (nbr's capOut for this edge;
  *            carried on both sides so path extensions in either direction
  *            can snapshot their hop without a lookup).
  */
case class Adj(nbr: Long, flow: Long, capOut: Long, capIn: Long) {
  def residualOut: Long = capOut - flow
  def residualIn: Long = capIn + flow
}

/** An excess path (ff1/Excess.java): a simple path of vertices with a
  * per-hop snapshot of (flow, cap) in the direction of travel. For S-type,
  * nodes run supersource→…→holder; for T-type, holder→…→supersink.
  * flows/caps have length nodes.length-1; hop i is nodes(i)→nodes(i+1).
  * The snapshots are refreshed against the globally-accepted flow deltas
  * every round (SURVEY T6/T7), so `potential` stays current.
  */
case class PathState(nodes: Array[Long], flows: Array[Long], caps: Array[Long]) {
  def contains(id: Long): Boolean = nodes.contains(id)
  def length: Int = nodes.length - 1
  /** Max additional flow this path can carry = min hop residual
    * (ff1/Excess.java:33-46). Hop-less seed paths have no constraint. */
  def potential: Long =
    if (length == 0) Long.MaxValue
    else {
      var m = Long.MaxValue
      var i = 0
      while (i < flows.length) {
        val r = caps(i) - flows(i)
        if (r < m) m = r
        i += 1
      }
      m
    }
}

/** Per-round vertex state: id, adjacency, S/T excess path lists, and the
  * ff5 extension memo (ff5/Excess.java:9) — neighbor ids any S (resp. T)
  * path was already extended toward.
  */
case class VertexState(
    id: Long,
    adj: Array[Adj],
    s: Array[PathState],
    t: Array[PathState],
    fsetS: Array[Long],
    fsetT: Array[Long])

/** A source→sink candidate assembled at a meet-in-the-middle vertex
  * (SURVEY J3), carrying its hop snapshots for the driver-side acceptor
  * (C1/C2): the acceptor needs only these plus its own intra-round delta
  * map, exactly like the reference's ApServer.
  */
case class Candidate(nodes: Array[Long], flows: Array[Long], caps: Array[Long])

object GraphModel {
  /** Reserved ids, as in the reference (ff1/Vertex.java:12). */
  val SuperSource: Long = 1L
  val SuperSink: Long = 2L
  /** "Infinite" capacity used on terminal edges (ff1/Vertex.java:59-67). */
  val InfCap: Long = 10000000L
}
