package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("batched decode pass: schema, determinism, stub arithmetic") {
    val media = Multimodal.mediaFromDocs(spark, sf)
    val decoded = Multimodal.decodeAll(media, Multimodal.StubDecoder).collect()
    assert(decoded.length == media.count())
    // deterministic: same input → same output across runs
    val again = Multimodal.decodeAll(media, Multimodal.StubDecoder).collect()
    assert(decoded.sortBy(_.media_id).toSeq == again.sortBy(_.media_id).toSeq)
    // stub arithmetic holds record-by-record
    val raw = media.collect().map(r => r.media_id -> r).toMap
    decoded.foreach { d =>
      val n = raw(d.media_id).payload.length.toLong
      assert(d.n_bytes == n)
      assert(d.width == 64 + n % 576)
      assert(d.height == 64 + (n * 7) % 456)
      assert(d.n_frames == (if (d.kind == "video") 1 + n % 16 else 1))
      assert(d.feature_hash.length == 32)
    }
    // only video records get multi-frame sampling
    assert(decoded.filter(_.kind != "video").forall(_.n_frames == 1))
  }

  test("pluggable decoder: a custom kernel slots into the same pass") {
    val media = Multimodal.mediaFromDocs(spark, sf).limit(10)
    val constDecoder = new Multimodal.MediaDecoder {
      def decode(r: Multimodal.MediaRecord) =
        Multimodal.DecodedMedia(r.media_id, r.kind, r.payload.length.toLong, 1, 1, 1, "p")
    }
    val out = Multimodal.decodeAll(media, constDecoder).collect()
    assert(out.forall(d => d.width == 1 && d.feature_hash == "p"))
  }

  test("phash near-dup: every planted twin is found, banded == brute force") {
    val sf = "/root/testdata/sf0.001"
    val pairs = Multimodal.mmPhashPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = graft.Tables.load(spark, sf, "documents").count()
    // a single-byte mutation moves at most the 2 sampled bits that touch
    // it, so every (id, id+TwinOffset) twin must appear within Hamming <= 2
    val twinPairs = pairs.filter { case (a, b, _) => b == a + Multimodal.TwinOffset }
    assert(twinPairs.length == nDocs, s"${twinPairs.length} of $nDocs twins found")
    assert(twinPairs.forall(_._3 <= 2))
    // the banded index is exact w.r.t. brute-force Hamming <= 3 (pigeonhole)
    val sig = spark.table("__phash").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (a, ha) <- sig; (b, hb) <- sig if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d.toLong)).sortBy(p => (p._1, p._2))
    assert(pairs.toSeq == brute.toSeq)
  }

  test("mmShard: members tile each shard contiguously, shards respect the budget rule") {
    import spark.implicits._
    val media = (0L until 200L)
      .map(i => (i, "x" * (50 + (i % 37)).toInt))
      .toDF("media_id", "payload_str")
      .selectExpr("media_id", "encode(payload_str, 'UTF-8') AS payload")
    val budget = 512L
    val got = Multimodal.mmShard(media, groups = 4, budgetBytes = budget)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 200)
    // within every shard, member byte ranges [offset, offset+n) tile
    // [0, shard_bytes) with no gaps and no overlaps
    got.groupBy(_._2).foreach { case (shard, ms) =>
      val ranges = ms.map(m => (m._3, m._3 + m._4)).sortBy(_._1)
      assert(ranges.head._1 == 0L, s"shard $shard does not start at 0")
      ranges.sliding(2).foreach {
        case Array((_, e1), (s2, _)) =>
          assert(e1 == s2, s"gap/overlap in shard $shard at byte $e1")
        case _ =>
      }
      // budget rule: every member except possibly the last STARTS below
      // the budget (members may straddle; a shard never starts past it)
      assert(ranges.dropRight(1).forall(_._1 < budget),
        s"shard $shard has a member starting past the budget")
    }
    // the permutation mixed ids: consecutive media_ids do not all land
    // in the same shard (md5 order, not ingest order)
    val byId = got.sortBy(_._1).map(_._2)
    assert(byId.sliding(2).count { case Array(a, b) => a != b; case _ => false } > 50)
    // deterministic across runs
    val again = Multimodal.mmShard(media, groups = 4, budgetBytes = budget)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == again.toSeq)
  }

  test("mmWindows: stride/coverage arithmetic on hand sizes") {
    import spark.implicits._
    val dec = Seq((1L, 1000L), (2L, 399L), (3L, 400L))
      .toDF("media_id", "n_bytes")
    val got = Multimodal.mmWindows(dec, win = 400, hop = 160).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // media 1: i = 0..3 (last start 480, end 880 <= 1000); media 2: none
    // (under one window); media 3: exactly one full window
    assert(got.toSeq == Seq(
      (1L, 0L, 0L, 400L), (1L, 1L, 160L, 560L),
      (1L, 2L, 320L, 720L), (1L, 3L, 480L, 880L),
      (3L, 0L, 0L, 400L)))
    // oracle form: every window fits inside its record
    val withN = Multimodal.mmWindows(spark, "/root/testdata/sf0.001")
    assert(withN.count() > 0)
  }

  test("mmAlign: boundary offsets land in the right half-open segment") {
    import spark.implicits._
    val frames = Seq((1L, 0L, 0L), (1L, 1L, 10L), (1L, 2L, 19L),
      (2L, 0L, 5L)).toDF("media_id", "frame_idx", "frame_offset")
    // media 1: spans [0,10) [10,20); media 2: [0,10) — offset 10 must hit
    // seg 1, not seg 0 (half-open rule)
    val segs = Seq((1L, 0L, 0L, 10L), (1L, 1L, 10L, 20L), (2L, 0L, 0L, 10L))
      .toDF("media_id", "seg_idx", "seg_start", "seg_end")
    val got = Multimodal.mmAlign(frames, segs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 0L, 0L), (1L, 1L, 1L), (1L, 2L, 1L),
      (2L, 0L, 0L)))
    // oracle form: every sampled frame aligns to exactly one quarter-span
    val frameCount = Multimodal.mmFrames(spark, "/root/testdata/sf0.001").count()
    val aligned = Multimodal.mmAlign(spark, "/root/testdata/sf0.001")
    assert(aligned.count() == frameCount)
    assert(aligned.select("media_id", "frame_idx").distinct().count() == frameCount)
  }

  test("mmResolve: pHash pairs collapse to transitive media clusters") {
    val sf = "/root/testdata/sf0.001"
    val pairs = Multimodal.mmPhashPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val canon = Multimodal.mmResolve(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pairs.nonEmpty && canon.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(canon.contains(a) && canon.contains(b))
      assert(canon(a) == canon(b), s"pair ($a,$b) split across clusters")
      assert(canon(a) <= a)
    }
    canon.values.foreach(c => assert(canon(c) == c))
    // the planted twin relation (id + TwinOffset) makes every original
    // its own keeper unless a natural collision merges further
    assert(canon.keys.count(_ >= Multimodal.TwinOffset) > 0)
  }
}
