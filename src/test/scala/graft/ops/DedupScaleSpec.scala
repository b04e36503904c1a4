package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Scale-shape locks for the near-dup blocking schemes (VERDICT r1 #1):
  * the banded Hamming-LSH must be exact w.r.t. the all-pairs filter it
  * replaces, and no self-join block may degenerate toward the corpus size
  * (the quadratic hazard the banding exists to prevent).
  */
class DedupScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("dd_lines: corpus-frequency rule, within-doc exemption, byte-exact reassembly") {
    import spark.implicits._
    val docs = Seq(
      // 'shared footer' appears in 3 DISTINCT docs -> dropped everywhere
      (1L, "alpha beta\nshared footer\ngamma delta"),
      (2L, "epsilon zeta\nshared footer"),
      (3L, "shared footer\neta theta"),
      // doc 4 repeats ITS OWN line twice - df counts distinct docs, so
      // the within-doc repeat survives (that's ta_derep's signal)
      (4L, "own chorus\nown chorus\niota kappa"),
      // doc 5: empty lines are dropped unconditionally
      (5L, "solo line\n\nfinal line")
    ).toDF("doc_id", "text")
    val got = Dedup.ddLinesOn(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(4)))
      .toMap
    assert(got(1L) == ((3L, 1L, "alpha beta\ngamma delta")))
    assert(got(2L) == ((2L, 1L, "epsilon zeta")))
    assert(got(3L) == ((2L, 1L, "eta theta")))
    assert(got(4L) == ((3L, 0L, "own chorus\nown chorus\niota kappa")))
    assert(got(5L) == ((2L, 0L, "solo line\nfinal line")))
    // minDf is the dial: at 4, the 3-doc footer survives
    val loose = Dedup.ddLinesOn(docs, minDf = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(loose.values.forall(_ == 0L))
    // the oracle-form plants are found: no surviving document carries
    // either planted boilerplate line, and every carrier counted it
    // (organic short-TAIL lines also collide across docs on this
    // small-vocabulary corpus — genuine corpus-duplicated lines that
    // ride along, so >= not ==)
    val planted = Dedup.ddLines(spark, sf).collect()
    val news = "subscribe to our newsletter for weekly updates."
    val cook = "this site uses cookies to improve your experience."
    assert(planted.nonEmpty)
    assert(planted.forall(r =>
      !r.getString(4).contains(news) && !r.getString(4).contains(cook)))
    assert(planted.forall { r =>
      val id = r.getLong(0)
      r.getLong(2) >=
        (if (id % 6 == 0) 1L else 0L) + (if (id % 15 == 0) 1L else 0L)
    })
  }

  test("banded SimHash LSH is exact: equals brute-force all-pairs Hamming<=3") {
    Dedup.simhash64(spark, sf).createOrReplaceTempView("__sig_chk")
    val brute = spark.sql(
      """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(bit_count(a.simhash ^ b.simhash) AS BIGINT) AS hamming
        |FROM __sig_chk a JOIN __sig_chk b ON a.doc_id < b.doc_id
        |WHERE bit_count(a.simhash ^ b.simhash) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin).collect().toSeq
    val banded = Dedup.ddSimhashPairs(spark, sf).collect().toSeq
    // pigeonhole: <=3 differing bits leave >=1 of the 4 16-bit bands
    // identical, so the banded candidate set covers every true pair
    assert(banded == brute)
    assert(banded.nonEmpty) // non-vacuous: the 95% twins are in radius
  }

  test("SimHash band buckets stay bounded (no quadratic block)") {
    Dedup.simhash64(spark, sf).createOrReplaceTempView("__sig_chk")
    val n = spark.table("__sig_chk").count()
    val maxBucket = spark.sql(
      """SELECT MAX(c) FROM (
        |  SELECT COUNT(*) AS c
        |  FROM (SELECT doc_id, shiftright(simhash, 16 * bno) & 65535 AS bk, bno
        |        FROM __sig_chk LATERAL VIEW explode(sequence(0, 3)) AS bno)
        |  GROUP BY bno, bk)""".stripMargin).head().getLong(0)
    // near-dup twins legitimately share buckets (pairs), but no bucket may
    // aggregate an asymptotic fraction of the corpus: 16-bit bands spread
    // non-dup docs over 65536 keys per band
    assert(maxBucket <= math.max(4L, n / 10), s"bucket of $maxBucket vs n=$n")
  }

  test("embedding near-dup blocks (label x 8-plane bucket) stay bounded") {
    Dedup.embedSig(spark, sf).createOrReplaceTempView("__esig_chk")
    val n = spark.table("__esig_chk").count()
    val perLabelMax = spark.sql(
      "SELECT MAX(c) FROM (SELECT COUNT(*) AS c FROM __esig_chk GROUP BY label)")
      .head().getLong(0)
    val maxBlock = spark.sql(
      """SELECT MAX(c) FROM (
        |  SELECT COUNT(*) AS c FROM __esig_chk GROUP BY label, bucket)""".stripMargin)
      .head().getLong(0)
    // the second-level bucket must strictly refine the label block: the
    // biggest (label, bucket) cell is well under the biggest label cell
    assert(maxBlock < perLabelMax, s"bucket blocking refines nothing: $maxBlock")
    assert(maxBlock <= math.max(4L, n / 10), s"block of $maxBlock vs n=$n")
  }

  test("ddEmbedCos is non-vacuous: the planted twin pairs survive the bucket filter") {
    // block-bound + probe-equivalence specs alone cannot see recall loss
    // (both engines apply the same Hamming<=1 filter) — assert the query
    // actually recovers the (vec_id, vec_id+TwinIdOffset) twins it plants
    val pairs = Dedup.ddEmbedCos(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val n = Dedup.embedSig(spark, sf).count() / 2 // embedSig doubles the corpus
    val twinHits = pairs.count { case (a, b) => b == a + Pipeline.TwinIdOffset }
    // the x1.5-first-component twin stays at cosine >= 0.9 for nearly all
    // vectors; Hamming<=1 multiprobe must keep the overwhelming majority
    assert(twinHits >= (0.8 * n).toLong,
      s"only $twinHits/$n twin pairs survived the bucket filter")
  }

  /** A pathologically tight cluster (the shape that filled the disk in the
    * 100k-vector probe): n near-identical 64-dim vectors — one (label,
    * bucket) block, every pair at cosine ≥ 0.9 — plus a handful of spread
    * decoys. Unguarded pair volume is C(n,2).
    */
  private def tightCorpus(n: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val rng = new scala.util.Random(7L)
    val base = Array.fill(64)(rng.nextGaussian())
    val dense = (0 until n).map { i =>
      val r = new scala.util.Random(i.toLong * 0x9E3779B97F4A7C15L)
      (i.toLong, 0, base.map(_ + r.nextGaussian() * 0.01))
    }
    val decoys = (0 until 20).map { i =>
      val r = new scala.util.Random(1000L + i)
      ((100000 + i).toLong, 1, Array.fill(64)(r.nextGaussian()))
    }
    (dense ++ decoys).toDF("vec_id", "label", "v")
  }

  test("density guard: a planted dense cluster completes capped instead of going quadratic") {
    val n = 3000
    val sig = Dedup.embedSigOf(spark, tightCorpus(n))
    val got = Dedup.ddEmbedCosOn(spark, sig, maxBlockRows = 64,
      onOverflow = "sample").collect()
    // unguarded, this block alone yields C(3000,2) ≈ 4.5M pairs; the cap
    // bounds the expected surviving block at 64 rows -> pairs stay small
    assert(got.length > 0, "sampling must keep a representative pair set")
    assert(got.length < 50000,
      s"guard failed to bound the pair set: ${got.length} pairs")
    // sampling only DROPS vectors — every surviving pair is a true >=0.9
    // pair of the dense block (decoys are spread and never match)
    got.foreach { r =>
      assert(r.getDouble(2) >= 0.9)
      assert(r.getLong(0) < n && r.getLong(1) < n)
    }
  }

  test("density guard: fail mode aborts before materializing pairs, with a diagnostic") {
    val sig = Dedup.embedSigOf(spark, tightCorpus(2000))
    val e = intercept[IllegalStateException] {
      Dedup.ddEmbedCosOn(spark, sig, maxBlockRows = 64, onOverflow = "fail")
    }
    assert(e.getMessage.contains("density guard"))
    assert(e.getMessage.contains("maxBlockRows=64"))
    assert(e.getMessage.contains("pair volume"))
  }

  test("density guard is a no-op on healthy corpora (bit-exact vs unguarded)") {
    // the real twin-planted sig at sf0.001: every block is far under the
    // cap, so the guarded result must equal the cap-free result exactly
    val guarded = Dedup.ddEmbedCos(spark, sf).collect().toSeq
    val unguarded = Dedup.ddEmbedCosOn(spark, Dedup.embedSig(spark, sf),
      maxBlockRows = Int.MaxValue).collect().toSeq
    assert(guarded == unguarded && guarded.nonEmpty)
  }

  test("dd_containment: prefix twins contain exactly (the asymmetry Jaccard misses)") {
    // the 80%-prefix twin's shingle set is a true subset of the
    // original's, so twin-in-original containment must be EXACTLY 1.0 on
    // every pair, while original-in-twin tracks the prefix ratio (< 1)
    val rows = Dedup.ddContainment(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDouble(6) == 1.0), "c_ba (twin in orig) != 1.0")
    assert(rows.forall(r => r.getDouble(5) < 1.0 && r.getDouble(5) > 0.5),
      "c_ab should track the 80% prefix ratio")
    // consistency with the symmetric score: jaccard = inter/(na+nb-inter)
    rows.foreach { r =>
      val (inter, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(inter == nb && inter <= na, "subset property violated")
    }
  }

  test("ddContainment(docs, pairs): caller pairs, both directions, zero-shingle edge") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"),      // shingles {a b, b c, c d, d e}
      (2L, "b c d"),          // {b c, c d} — contained in 1
      (3L, "x y"),            // {x y} — disjoint from 1
      (4L, "solo"))           // 1 token — zero shingles
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("doc_a", "doc_b")
    val got = Dedup.ddContainment(docs, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    val r12 = got((1L, 2L))
    assert(r12.getLong(2) == 2 && r12.getDouble(5) == 0.5 &&
      r12.getDouble(6) == 1.0) // 2 embedded in 1: full containment
    val r13 = got((1L, 3L))
    assert(r13.getLong(2) == 0 && r13.getDouble(5) == 0.0 &&
      r13.getDouble(6) == 0.0) // disjoint
    val r14 = got((1L, 4L))
    assert(r14.getLong(4) == 0 && r14.isNullAt(6),
      "zero-shingle side must surface NULL containment, not an error")
  }

  test("multiprobe covers exactly the Hamming<=1 bucket pairs") {
    Dedup.embedSig(spark, sf).createOrReplaceTempView("__esig_chk")
    val direct = spark.sql(
      """SELECT a.vec_id, b.vec_id
        |FROM __esig_chk a JOIN __esig_chk b
        |  ON a.label = b.label AND a.vec_id < b.vec_id
        | AND bit_count(CAST(a.bucket AS BIGINT) ^ CAST(b.bucket AS BIGINT)) <= 1
        |ORDER BY 1, 2""".stripMargin).collect().toSeq
    val probed = spark.sql(
      """WITH probes AS (
        |  SELECT vec_id, label,
        |         explode(concat(array(bucket),
        |           transform(sequence(0, 7), j -> bucket ^ shiftleft(1, j)))) AS pb
        |  FROM __esig_chk)
        |SELECT DISTINCT a.vec_id, b.vec_id
        |FROM probes a JOIN __esig_chk b
        |  ON a.label = b.label AND a.pb = b.bucket AND a.vec_id < b.vec_id
        |ORDER BY 1, 2""".stripMargin).collect().toSeq
    assert(probed == direct)
  }
}
