package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
  * Scale design: the pre-agg is one partial+final count over the
  * block keys (map-side combinable); the sample path joins the counts
  * relation back (block-cardinality-sized — Spark broadcasts it when
  * small) and filters with one hash per row. No action is triggered
  * on the sample path; "fail" pays one bounded collect (top 5).
  */
object DensityGuard {

  /** Shared default cap: far above any healthy block at every measured
    * scale (the largest organic blocks in the 100×-probe corpora are
    * single digits for the blocking keys and low hundreds for the
    * band keys), low enough that a degenerate corpus is caught before
    * its pair relation materializes.
    */
  val DefaultMaxBlockRows: Int = 4096

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
    val counts = blocks.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("block_n"))
    onOverflow match {
      case "fail" =>
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
        // (A/B'd vs the join form at sf0.1, r12)
        blocks.withColumn("block_n", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(keys.map(col): _*)))
          .where(col("block_n") <= maxBlockRows ||
            draw * col("block_n") < lit(maxBlockRows.toLong * 1000000L))
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
