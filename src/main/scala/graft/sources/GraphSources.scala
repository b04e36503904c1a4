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
    * `strict` (default, ff5 parity — ff5/FordFulkerson.java:75-97): only
    * the OWNER path is fatal in ff5 — the owner token goes through an
    * uncaught `Long.parseLong` + `check()`, so a malformed owner, a
    * post-fold id outside Int range ("fail : id"), or a reserved id 0/1/2
    * ("Reserved ID : id") FAILS the job; graft raises the same messages
    * via `raise_error` inside the scan. NEIGHBOR tokens are never fatal:
    * `check()`'s throws for them are swallowed by the map loop's
    * catch(Exception) ("Invalid Edge", echo-and-continue,
    * ff5/FordFulkerson.java:84-86), so graft silently drops malformed /
    * reserved / out-of-Int-range neighbors — the closest Spark analogue of
    * echo-and-skip. A >5100-field line is fatal ("E = N") on any path.
    * `strict = false` (ff1's behavior) drops reserved ids silently on both
    * columns and keeps full-Long ids (no Int-range rejection).
    * Documented divergence: lines with <3 fields carry no edges and are
    * skipped wholesale (ff5 would still run its fatal owner check on
    * them, but an isolated vertex contributes nothing to an edge
    * relation).
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
    // ff5 check() discipline for the owner only: fold, then range, then
    // reserved — each fatal with the reference's message (the malformed
    // case reproduces Long.parseLong's NumberFormatException text)
    def guardOwner(raw: org.apache.spark.sql.Column,
                   folded: org.apache.spark.sql.Column) =
      if (!strict) folded
      else when(raw.isNull,
          raise_error(concat(lit("For input string: \""),
            element_at(col("f"), 1), lit("\""))))
        .when(folded < Int.MinValue.toLong || folded > Int.MaxValue.toLong,
          raise_error(concat(lit("fail : "), folded.cast("string"))))
        .when(folded.isin(0L, 1L, 2L),
          raise_error(concat(lit("Reserved ID : "), folded.cast("string"))))
        .otherwise(folded)
    val lines = spark.read.text(path)
    val toks = lines.select(guardLine(split(col("value"), "\t")).as("f"))
      .filter(size(col("f")) >= 3)
    // try_cast: malformed ids become null (ANSI cast would throw); for the
    // owner the strict guard converts that null into ff5's fatal parse
    val rawSrc = expr("try_cast(element_at(f, 1) AS long)")
    val pairs = toks.select(
        guardOwner(rawSrc, foldCol(rawSrc)).as("src"),
        explode(expr("slice(f, 3, size(f) - 2)")).as("nbrTok"))
      .withColumn("dst", foldCol(expr("try_cast(nbrTok AS long)")))
      // neighbor drops (never fatal, both modes): malformed → null,
      // self-loops (T1/T2), reserved 0/1/2; strict additionally drops
      // post-fold out-of-Int-range neighbors (ff5's caught check() throw)
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst") &&
        !col("src").isin(0L, 1L, 2L) && !col("dst").isin(0L, 1L, 2L) &&
        (if (strict) col("dst") >= Int.MinValue.toLong &&
                     col("dst") <= Int.MaxValue.toLong
         else lit(true)))
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
