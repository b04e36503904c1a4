package graft.graph

import org.apache.spark.sql.DataFrame

/** Primitive-array graph representation for the bounded driver-finish
  * tiers (Coreness / Layers / Scc — the Mst.driverMergeMaxEdges
  * discipline). At the 5M-edge default cap, boxed
  * `mutable.Map[Long, ArrayBuffer[Long]]` adjacency costs several
  * hundred MB of driver heap and GC churn; a compressed-sparse-row
  * layout over sorted long/int arrays holds the same graph in
  * ~`16·V + 12·E` bytes (~80 MB at the cap) with zero boxing in the
  * algorithm hot loops.
  *
  * Node ids are arbitrary Longs; `Csr` remaps them to dense ints via one
  * sort + binary search (O(E log V) build, O(log V) lookup — driver-side
  * only, bounded by the tier cap).
  */
private[graph] final class Csr(val nodes: Array[Long],
    val off: Array[Int], val tgt: Array[Int]) {
  @inline def n: Int = nodes.length
  /** Dense id of node `v` (binary search; nodes is sorted distinct). */
  @inline def id(v: Long): Int = java.util.Arrays.binarySearch(nodes, v)
}

private[graph] object DriverGraph {

  /** One collect of a (src, dst) BIGINT relation into two primitive
    * arrays. The `Array[Row]` from `collect()` is transient — converted
    * and dropped before any algorithm state is built, so peak overhead
    * is the one Row batch, not Rows + boxed adjacency held together.
    */
  def collectEdges(df: DataFrame): (Array[Long], Array[Long]) = {
    val rows = df.collect()
    val n = rows.length
    val s = new Array[Long](n)
    val d = new Array[Long](n)
    var i = 0
    while (i < n) {
      val r = rows(i); s(i) = r.getLong(0); d(i) = r.getLong(1); i += 1
    }
    (s, d)
  }

  /** CSR over the union of edge endpoints and `extraNodes` (isolated
    * vertices a caller must still emit — Scc's residual node set).
    */
  def csr(src: Array[Long], dst: Array[Long],
      extraNodes: Array[Long] = Array.emptyLongArray): Csr = {
    val m = src.length
    val all = new Array[Long](2 * m + extraNodes.length)
    System.arraycopy(src, 0, all, 0, m)
    System.arraycopy(dst, 0, all, m, m)
    System.arraycopy(extraNodes, 0, all, 2 * m, extraNodes.length)
    java.util.Arrays.sort(all)
    var n = 0
    var i = 0
    while (i < all.length) { // in-place dedup of the sorted ids
      if (n == 0 || all(i) != all(n - 1)) { all(n) = all(i); n += 1 }
      i += 1
    }
    val nodes = java.util.Arrays.copyOf(all, n)
    val off = new Array[Int](n + 1)
    i = 0
    while (i < m) {
      off(java.util.Arrays.binarySearch(nodes, src(i)) + 1) += 1
      i += 1
    }
    i = 0
    while (i < n) { off(i + 1) += off(i); i += 1 }
    val cursor = java.util.Arrays.copyOf(off, n + 1)
    val tgt = new Array[Int](m)
    i = 0
    while (i < m) {
      val si = java.util.Arrays.binarySearch(nodes, src(i))
      tgt(cursor(si)) = java.util.Arrays.binarySearch(nodes, dst(i))
      cursor(si) += 1
      i += 1
    }
    new Csr(nodes, off, tgt)
  }
}
