package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** Round-11 verdict item #1: the blocked/banded pair generators that
  * landed in r11 (dd_editdist blocks, mm_ahash bands) had the right
  * join shape but NO fan-in bound — one templated/aliased key turns
  * the pass quadratic on a single shuffle partition. The shared
  * [[DensityGuard]] must (a) bound exactly that regime, (b) fail fast
  * with a usable diagnostic on request, and (c) be bit-exact on
  * healthy corpora so every DuckDB oracle stays green.
  */
class DensityGuardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  // ---------------------------------------------------------------
  // dd_editdist: templated-head corpus (the op's declared blow-up —
  // log lines / form letters sharing the first 8 chars and length
  // bucket, so every record lands in ONE block)
  // ---------------------------------------------------------------

  private def templatedDocs(n: Int) = {
    import spark.implicits._
    // identical 8-char prefix "Subject:"; same length bucket (all 64
    // chars long); unique tails so the corpus is not literally one doc
    (0 until n).map { i =>
      (i.toLong, f"Subject: ticket $i%06d " + ("x" * 40))
    }.toDF("doc_id", "text")
  }

  test("dd_editdist: a templated-head corpus is capped instead of quadratic") {
    val n = 3000
    val got = Dedup.ddEditDistOn(templatedDocs(n), maxDist = 2,
      maxBlockRows = 64).collect()
    // unguarded, ONE block yields C(3000,2) ≈ 4.5M DP evaluations; the
    // cap bounds the expected surviving block at 64 rows. Every
    // surviving pair is a true pair of the block (sampling only drops
    // rows, never fabricates).
    assert(got.length < 64 * 64,
      s"guard failed to bound the block: ${got.length} pairs")
    // adjacent 6-digit tickets differ by >2 edits only sometimes; just
    // assert validity of what survived
    got.foreach(r => assert(r.getLong(2) <= 2))
  }

  test("dd_editdist: fail mode aborts with the blocking diagnostic") {
    val e = intercept[IllegalStateException] {
      Dedup.ddEditDistOn(templatedDocs(2000), maxBlockRows = 64,
        onOverflow = "fail").collect()
    }
    assert(e.getMessage.contains("dd_editdist density guard"))
    assert(e.getMessage.contains("maxBlockRows=64"))
    assert(e.getMessage.contains("pair volume"))
    assert(e.getMessage.contains("longer prefix"))
  }

  test("dd_editdist: guard is bit-exact on the healthy oracle corpus") {
    val guarded = Dedup.ddEditDist(spark, sf).collect().toSeq
    // ddEditDist left the twin-planted corpus at __ed_docs; re-run the
    // engine cap-free on exactly that input
    val unguarded = Dedup.ddEditDistOn(
      spark.table("__ed_docs"), maxBlockRows = Int.MaxValue)
      .collect().toSeq
    assert(guarded == unguarded && guarded.nonEmpty)
  }

  // ---------------------------------------------------------------
  // mm_ahash: aliasing image corpus (the addendum52 blow-up mode —
  // uniform images share the whole hash, so all 4 bands of the class
  // collapse into single buckets)
  // ---------------------------------------------------------------

  private def uniformPngs(n: Int) = {
    import spark.implicits._
    spark.createDataset((0 until n).map { i =>
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) { img.setRGB(x, y, 0x808080); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      Multimodal.MediaRecord(i.toLong, "image", bos.toByteArray)
    })
  }

  test("mm_ahash: an aliasing (uniform) corpus is capped instead of quadratic") {
    val n = 2000
    val got = Multimodal.mmAhashPairs(uniformPngs(n), radius = 3,
      maxBlockRows = 32).collect()
    // all n images share ONE hash: unguarded volume is C(2000,2) ≈ 2M
    // pairs; with the per-(band, image) draw each of the 4 band buckets
    // is independently bounded at ~32 rows
    assert(got.length < 4 * 32 * 32,
      s"guard failed to bound the aliasing bands: ${got.length} pairs")
    got.foreach(r => assert(r.getLong(2) == 0L)) // identical hashes
  }

  test("mm_ahash: fail mode aborts with the band diagnostic") {
    val e = intercept[IllegalStateException] {
      Multimodal.mmAhashPairs(uniformPngs(1000), radius = 3,
        maxBlockRows = 32, onOverflow = "fail").collect()
    }
    assert(e.getMessage.contains("mm_ahash density guard"))
    assert(e.getMessage.contains("(bno,bk)"))
  }

  // ---------------------------------------------------------------
  // helper-level contracts
  // ---------------------------------------------------------------

  test("guard sample draw is deterministic and independent of row order") {
    import spark.implicits._
    val rows = (0 until 5000).map(i => (i.toLong, 1)).toDF("id", "k")
    def run(df: org.apache.spark.sql.DataFrame) =
      DensityGuard.guard(df, Seq("k"),
        DensityGuard.drawOn("specguard:", col("id")), maxBlockRows = 100)
        .select("id").as[Long].collect().sorted.toSeq
    val a = run(rows)
    val b = run(rows.orderBy(rand(42)))
    assert(a == b, "sample must be a pure function of (salt, id, counts)")
    // expected block size ~100; a 5x overshoot would mean the rate test
    // is wrong
    assert(a.length > 20 && a.length < 500, s"sampled ${a.length} of 5000")
  }

  // ---------------------------------------------------------------
  // minhash band join (r12 verdict item #2: the pair-generator family
  // the r12 sweep missed) — identical shingle SETS alias every doc
  // into one (band, bandhash) bucket per band
  // ---------------------------------------------------------------

  private def templatedShingleDocs(n: Int) = {
    import spark.implicits._
    // identical text ⇒ identical shingle sets ⇒ identical signatures:
    // all n docs land in the SAME bucket of each of the 4 bands
    (0 until n).map(i =>
      (i.toLong, "alpha beta gamma delta epsilon zeta eta theta iota"))
      .toDF("doc_id", "text")
  }

  test("dd_minhash: a templated-shingle corpus is capped instead of quadratic") {
    val n = 3000
    val got = Dedup.ddMinhashLshOn(templatedShingleDocs(n),
      maxBlockRows = 32).collect()
    // unguarded: C(3000,2) ≈ 4.5M verification joins; guarded: each of
    // the 4 band buckets is independently bounded at ~32 rows
    assert(got.length < 4 * 32 * 32,
      s"guard failed to bound the band buckets: ${got.length} pairs")
    // identical docs: every surviving pair is a true duplicate (j = 1)
    got.foreach(r => assert(r.getLong(2) == r.getLong(3)))
  }

  test("dd_minhash: fail mode aborts with the band diagnostic") {
    val e = intercept[IllegalStateException] {
      Dedup.ddMinhashLshOn(templatedShingleDocs(1000),
        maxBlockRows = 32, onOverflow = "fail").collect()
    }
    assert(e.getMessage.contains("dd_minhash_band density guard"))
    assert(e.getMessage.contains("(band,bh)"))
  }

  test("dd_minhash: guard is bit-exact on the healthy oracle corpus") {
    val docs = graft.Tables.load(spark, sf, "documents")
    val guarded = Dedup.ddMinhashLshOn(docs).collect().toSeq
    val unguarded = Dedup.ddMinhashLshOn(docs, maxBlockRows = Int.MaxValue)
      .collect().toSeq
    assert(guarded == unguarded)
  }

  // ---------------------------------------------------------------
  // ss_lsh_ann bucket join (r12 verdict item #2, second half) — a
  // tight embedding cluster aliases the corpus into one bucket (the
  // dd_embed_cos disk-fill incident WAS an embedding-LSH bucket)
  // ---------------------------------------------------------------

  private def aliasingEmb(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, Array.fill(64)(0.5f)))
      .toDF("vec_id", "embedding")
  }

  test("ss_lsh_ann: an aliasing bucket is sampled, and the sampling is observable") {
    DensityGuard.clearStats()
    val got = Similarity.ssLshAnnOn(spark, aliasingEmb(3000), nPlanes = 8,
      queryPred = "vec_id < 5", topK = 5, maxBlockRows = 32).collect()
    // queries living in the blown bucket are sampled like any member
    // (the dd_embed_cos semantics) — at a ~1% keep rate the 5 query
    // vectors usually vanish, so assert only the bound, not presence
    assert(got.length <= 5 * 5)
    val st = awaitStats("ss_lsh_ann", _.droppedRows > 0)
    // all 3000 rows sit in the one blown bucket
    assert(st.overcapRows == 3000L && st.maxBlockN == 3000L)
    graft.Caches.releaseAll(spark)
  }

  test("ss_lsh_ann: fail mode aborts with the bucket diagnostic") {
    val e = intercept[IllegalStateException] {
      Similarity.ssLshAnnOn(spark, aliasingEmb(1000), nPlanes = 8,
        queryPred = "vec_id < 5", topK = 5, maxBlockRows = 32,
        onOverflow = "fail").collect()
    }
    assert(e.getMessage.contains("ss_lsh_ann density guard"))
    assert(e.getMessage.contains("more planes"))
    graft.Caches.releaseAll(spark)
  }

  test("ss_lsh_ann: guard is bit-exact on the healthy oracle corpus") {
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val guarded = Similarity.ssLshAnnOn(spark, emb, 8, "vec_id < 20", 5)
      .collect().toSeq
    graft.Caches.releaseAll(spark)
    val unguarded = Similarity.ssLshAnnOn(spark, emb, 8, "vec_id < 20", 5,
      maxBlockRows = Int.MaxValue).collect().toSeq
    graft.Caches.releaseAll(spark)
    assert(guarded == unguarded && guarded.nonEmpty)
  }

  // ---------------------------------------------------------------
  // observability (r12 advice item: sampling must never be silent)
  // ---------------------------------------------------------------

  /** Listener delivery is async; poll lastStats briefly. */
  private def awaitStats(tag: String,
      ok: DensityGuard.GuardStats => Boolean): DensityGuard.GuardStats = {
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    var st = DensityGuard.lastStats(tag)
    while (!st.exists(ok) && System.nanoTime() < deadline) {
      Thread.sleep(50)
      st = DensityGuard.lastStats(tag)
    }
    assert(st.exists(ok), s"no matching guard stats for $tag: $st")
    st.get
  }

  test("guard sampling publishes stats; healthy runs report zero drops") {
    import spark.implicits._
    DensityGuard.clearStats()
    val blown = (0 until 5000).map(i => (i.toLong, 1)).toDF("id", "k")
    DensityGuard.guard(blown, Seq("k"),
      DensityGuard.drawOn("specobs:", col("id")), maxBlockRows = 100,
      tag = "spec_obs").collect()
    val st = awaitStats("spec_obs", _.droppedRows > 0)
    assert(st.overcapRows == 5000L && st.maxBlockN == 5000L)
    assert(st.droppedRows > 4000L && st.droppedRows < 5000L)

    val healthy = (0 until 50).map(i => (i.toLong, i % 10)).toDF("id", "k")
    DensityGuard.guard(healthy, Seq("k"),
      DensityGuard.drawOn("specobs:", col("id")), maxBlockRows = 100,
      tag = "spec_obs_ok").collect()
    val ok = awaitStats("spec_obs_ok", _ => true)
    assert(ok.droppedRows == 0L && ok.overcapRows == 0L && ok.maxBlockN == 5L)
  }

  test("guard rejects unknown onOverflow modes") {
    import spark.implicits._
    val rows = Seq((1L, 1)).toDF("id", "k")
    val e = intercept[IllegalArgumentException] {
      DensityGuard.guard(rows, Seq("k"),
        DensityGuard.drawOn("specguard:", col("id")),
        onOverflow = "explode")
    }
    assert(e.getMessage.contains("onOverflow=explode"))
  }
}
