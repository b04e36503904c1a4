package graft.sources

import graft.graph.GraphModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph ingestion (SURVEY §2.1 S1–S3, §2.2 T1–T4).
  *
  * Both readers land on the same normalized *directed* edge relation
  * `edges(src, dst, cap)` — cap is the capacity in the src→dst direction,
  * at most one row per directed pair. Undirected inputs (Facebook) emit
  * both directions with equal caps; DIMACS keeps its directed arcs
  * (missing reverses become cap-0 rows during state build, preserving
  * push-back residuals — the reference encodes the same thing via its flow
  * division point, ff1/InputDimacs.java:51-62). All heavy lifting is
  * declarative (split/explode/groupBy) so Catalyst pushes projection into
  * the text scan and the symmetrization groupBy is the only shuffle.
  */
object GraphSources {

  /** Reference id normalization (T1): fold 64-bit ids ≥10^14 into the low
    * range as negative ids; ids 0/1/2 are reserved for supersource/sink
    * (ff1/InputFacebook.java:14-20, ff3/FordFulkerson.java:42-48). Kept for
    * fixture fidelity; our ids stay Long throughout.
    */
  val FoldThreshold: Long = 100000000000000L // 10^14

  def foldId(id: Long): Long = if (id >= FoldThreshold) FoldThreshold - id else id

  private def foldCol(c: org.apache.spark.sql.Column) =
    when(c >= FoldThreshold, lit(FoldThreshold) - c).otherwise(c)

  /** Facebook adjacency-list text (S1, FIXTURES §1):
    * `id \t <ignored> \t nbr1 \t nbr2 …`, optionally gzipped. Drops
    * self-loops and malformed tokens; undirected edges are canonicalized
    * (least, greatest) and deduplicated; unit capacity
    * (`mf.max.random.capacity=1` default — ff1/FordFulkerson.java:28).
    *
    * `strict` (default, ff5 parity — ff5/FordFulkerson.java:75-97): an
    * adjacency line with >5100 fields or a reserved id 0/1/2 (post-fold,
    * owner or neighbor) is data corruption and FAILS the job via
    * `raise_error` inside the scan, exactly where the reference throws;
    * malformed tokens are still skipped leniently (ff5 echoes and
    * continues). `strict = false` silently drops reserved ids instead
    * (ff1's behavior).
    */
  def readFacebook(spark: SparkSession, path: String, cap: Long = 1L,
                   strict: Boolean = true): DataFrame = {
    // guards ride the value path (a separate assert column would be
    // pruned away by Catalyst); raise_error's NullType coerces to the
    // otherwise-branch type
    def guardLine(f: org.apache.spark.sql.Column) =
      if (!strict) f
      else when(size(f) > 5100,
        raise_error(concat(lit("E = "), size(f).cast("string")))).otherwise(f)
    def guardId(c: org.apache.spark.sql.Column) =
      if (!strict) c
      else when(c.isin(0L, 1L, 2L),
        raise_error(concat(lit("Reserved ID : "), c.cast("string")))).otherwise(c)
    val lines = spark.read.text(path)
    val toks = lines.select(guardLine(split(col("value"), "\t")).as("f"))
      .filter(size(col("f")) >= 3)
    val pairs = toks.select(
        // try_cast: malformed ids become null and are skipped, matching
        // the reference's lenient neighbor parse (ANSI cast would throw)
        guardId(foldCol(expr("try_cast(element_at(f, 1) AS long)"))).as("src"),
        explode(expr("slice(f, 3, size(f) - 2)")).as("nbrTok"))
      .withColumn("dst", guardId(foldCol(expr("try_cast(nbrTok AS long)"))))
      // malformed tokens cast to null and are skipped; self-loops dropped
      // (T1/T2); in lenient mode reserved 0/1/2 are dropped here too
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst") &&
        !col("src").isin(0L, 1L, 2L) && !col("dst").isin(0L, 1L, 2L))
    val undirected = pairs.select(
        least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .distinct()
    undirected
      .unionAll(undirected.select(col("dst").as("src"), col("src").as("dst")))
      .withColumn("cap", lit(cap))
  }

  /** DIMACS max-flow format (S2/S3, FIXTURES §2): `p max N M`, `n id s|t`,
    * `a from to cap`. Parallel arcs capacity-summed
    * (ff1/InputDimacs.java:36-39); the undirected model stores
    * cap = c_ab + c_ba per pair (ff1/InputDimacs.java:51-62).
    * Returns (edges, sources, sinks).
    */
  def readDimacs(spark: SparkSession, path: String): (DataFrame, Seq[Long], Seq[Long]) = {
    val lines = spark.read.text(path)
    val toks = lines.select(split(trim(col("value")), "\\s+").as("f"))
    val arcs = toks.filter(element_at(col("f"), 1) === "a")
      .select(
        element_at(col("f"), 2).cast("long").as("u"),
        element_at(col("f"), 3).cast("long").as("v"),
        element_at(col("f"), 4).cast("long").as("c"))
      .filter(col("u") =!= col("v"))
    val edges = arcs
      .select(col("u").as("src"), col("v").as("dst"), col("c"))
      .groupBy("src", "dst").agg(sum(col("c")).as("cap"))
    // n-lines are few; collect designators on the driver
    val terms = toks.filter(element_at(col("f"), 1) === "n")
      .select(element_at(col("f"), 2).cast("long").as("id"),
        element_at(col("f"), 3).as("kind"))
      .collect()
    val sources = terms.filter(_.getString(1) == "s").map(_.getLong(0)).toSeq
    val sinks = terms.filter(_.getString(1) == "t").map(_.getLong(0)).toSeq
    (edges, sources, sinks)
  }

  /** Deterministic per-edge capacity assignment (T4), keeping ff1's
    * seeded-per-edge-id discipline (ff1/Vertex.java:59-67) rather than
    * ff2+'s Math.random(): cap = 1 + (xxhash64(src,dst,seed) mod maxC).
    */
  def withRandomCaps(edges: DataFrame, maxCap: Long, seed: Long = 42L): DataFrame =
    edges.withColumn("cap",
      when(lit(maxCap) <= 1L, lit(1L))
        .otherwise(pmod(xxhash64(col("src"), col("dst"), lit(seed)), lit(maxCap)) + 1L))
}
