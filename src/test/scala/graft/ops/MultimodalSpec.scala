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

  // ---- real JDK codec tier: payloads generated through the same JDK
  // encoders the decoder binds (no external library either way) ----

  private def pngBytes(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (x * 31 + y * 17 + seed) * 2654435761L.toInt)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def wavBytes(nFrames: Int, sampleRate: Float, channels: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, channels, true, false)
    val pcm = new Array[Byte](nFrames * fmt.getFrameSize)
    for (i <- pcm.indices) pcm(i) = ((i * 73) % 251).toByte
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("JdkCodecDecoder: real PNG/BMP/WAV payloads decode through the Spark pass") {
    import spark.implicits._
    val png = pngBytes(37, 21, seed = 5)
    val wav = wavBytes(nFrames = 480, sampleRate = 16000f, channels = 2)
    val media = Seq(
      Multimodal.MediaRecord(1L, "image", png),
      Multimodal.MediaRecord(2L, "audio", wav)).toDS()
    val got = Multimodal.decodeAll(media, Multimodal.JdkCodecDecoder)
      .collect().map(d => d.media_id -> d).toMap
    assert(got(1L).width == 37 && got(1L).height == 21 && got(1L).n_frames == 1)
    assert(got(2L).width == 16000 && got(2L).height == 2 &&
      got(2L).n_frames == 480)
    // the image feature hash is over the decoded RASTER, not the
    // container bytes: the same pixels re-encoded as BMP hash identically
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val bmpOut = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bmpOut)
    val bmp = bmpOut.toByteArray
    assert(!java.util.Arrays.equals(bmp, png), "containers must differ")
    val viaBmp = Multimodal.decodeAll(
      Seq(Multimodal.MediaRecord(3L, "image", bmp)).toDS(),
      Multimodal.JdkCodecDecoder).collect().head
    assert(viaBmp.feature_hash == got(1L).feature_hash,
      "raster hash must be encoding-invariant")
    // unreadable payload fails fast with the media id
    val bad = Seq(Multimodal.MediaRecord(9L, "image",
      Array[Byte](1, 2, 3, 4))).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeAll(bad, Multimodal.JdkCodecDecoder).collect()
    }
    assert(e.getMessage.contains("media 9") ||
      Option(e.getCause).exists(_.getMessage.contains("media 9")))
  }

  test("resizeImage: real bilinear resample lands on the integer dim rule") {
    val png = pngBytes(200, 120, seed = 9)
    val out = Multimodal.resizeImage(png, maxDim = 64)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out))
    assert(img.getWidth == 64 && img.getHeight == 120 * 64 / 200)
    // already-small payloads pass through untouched (byte-identical)
    val small = pngBytes(30, 20, seed = 1)
    assert(Multimodal.resizeImage(small, maxDim = 64) eq small)
  }

  test("dhash64Image: near-identical images stay within a small Hamming radius") {
    def grayImg(f: (Int, Int) => Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(80, 60,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 60; x <- 0 until 80) {
        val g = math.max(0, math.min(255, f(x, y)))
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      img
    }
    // strictly increasing horizontal gradient → every dHash bit set
    val base = grayImg((x, _) => x * 3)
    val h0 = Multimodal.dhash64Image(base)
    assert(java.lang.Long.bitCount(h0) == 64)
    // +2 uniform brightness: ordering unchanged → identical hash
    val bright = grayImg((x, _) => x * 3 + 2)
    assert(Multimodal.dhash64Image(bright) == h0)
    // a blanked 8x8 corner patch can move only the corner cells' bits
    val patched = grayImg((x, y) => if (x < 8 && y < 8) 0 else x * 3)
    assert(java.lang.Long.bitCount(h0 ^ Multimodal.dhash64Image(patched)) <= 4)
    // the reversed gradient flips every comparison → maximal distance
    val reversed = grayImg((x, _) => 237 - x * 3)
    assert(java.lang.Long.bitCount(h0 ^ Multimodal.dhash64Image(reversed)) == 64)
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

  test("mmAudioFeat: hand waveform reads its exact integer cores") {
    import spark.implicits._
    // 6 samples [3, -4, 0, 0, 5, -5] then frameLen=3 windows:
    // [3,-4,0] peak 4, [0,5,-5] peak 5 — neither silent at thresh 1;
    // crossings: 3→-4 (1), -4→0/0→0/0→5 (no strict flips), 5→-5 (1)
    def wav(samples: Seq[Int]): Array[Byte] = {
      val pcm = new Array[Byte](2 * samples.length)
      samples.zipWithIndex.foreach { case (v, i) =>
        pcm(2 * i) = (v & 0xff).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val media = Seq(
      Multimodal.MediaRecord(1L, "audio", wav(Seq(3, -4, 0, 0, 5, -5))),
      Multimodal.MediaRecord(2L, "audio", wav(Seq(0, 0, 0, 0)))).toDS()
    val got = Multimodal.mmAudioFeat(media, frameLen = 3, silenceThresh = 1)
      .collect().map(f => f.media_id -> f).toMap
    val f1 = got(1L)
    assert(f1.n_samples == 6 && f1.sum_sq == (9 + 16 + 25 + 25) &&
      f1.zero_crossings == 2 && f1.silent_frames == 0 && f1.n_frames_w == 2)
    assert(f1.rms == math.rint(math.sqrt(75.0 / 6) * 1e6) / 1e6)
    assert(f1.zcr == 0.4) // 2 / 5
    val f2 = got(2L) // all-zero clip: two silent windows (3 + tail 1)
    assert(f2.sum_sq == 0 && f2.zero_crossings == 0 &&
      f2.silent_frames == 2 && f2.n_frames_w == 2 && f2.silence_frac == 1.0)
  }

  test("mmAudioSeg: hand waveform segments exactly on silence runs") {
    import spark.implicits._
    def wav(samples: Seq[Int]): Array[Byte] = {
      val pcm = new Array[Byte](2 * samples.length)
      samples.zipWithIndex.foreach { case (v, i) =>
        pcm(2 * i) = (v & 0xff).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // frameLen=2 windows: [5,5][0,0][3,0][0,0][7,7] → active 1,0,1,0,1
    val a = Seq(5, 5, 0, 0, 3, 0, 0, 0, 7, 7)
    // [5,5][5,5][0,0] → one run of 2, then silence
    val b = Seq(5, 5, 5, 5, 0, 0)
    // all-silent clip → zero segments
    val c = Seq(0, 0, 0, 0)
    val media = Seq(
      Multimodal.MediaRecord(1L, "audio", wav(a)),
      Multimodal.MediaRecord(2L, "audio", wav(b)),
      Multimodal.MediaRecord(3L, "audio", wav(c))).toDS()
    val got = Multimodal.mmAudioSeg(media, frameLen = 2, silenceThresh = 1)
      .collect().map(s => s.media_id -> s).toMap
    val g1 = got(1L)
    assert(g1.n_frames == 5 && g1.active_frames == 3 &&
      g1.n_segments == 3 && g1.longest_run == 1)
    val g2 = got(2L)
    assert(g2.n_frames == 3 && g2.active_frames == 2 &&
      g2.n_segments == 1 && g2.longest_run == 2)
    val g3 = got(3L)
    assert(g3.n_frames == 2 && g3.active_frames == 0 &&
      g3.n_segments == 0 && g3.longest_run == 0)
  }

  test("mmAudioSeg/mmAudioFeat: big-endian payloads fail fast (no silent " +
      "byte-swap)") {
    import spark.implicits._
    // AIFF is big-endian 16-bit PCM — exactly the container the contract
    // must reject rather than read byte-swapped
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, true)
    val pcm = new Array[Byte](8)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 4L),
      javax.sound.sampled.AudioFileFormat.Type.AIFF, bos)
    val media = Seq(Multimodal.MediaRecord(9L, "audio", bos.toByteArray)).toDS()
    val e1 = intercept[org.apache.spark.SparkException] {
      Multimodal.mmAudioSeg(media).collect()
    }
    assert(e1.getMessage.contains("media 9") ||
      Option(e1.getCause).exists(_.getMessage.contains("media 9")))
    val e2 = intercept[org.apache.spark.SparkException] {
      Multimodal.mmAudioFeat(media).collect()
    }
    assert(e2.getMessage.contains("media 9") ||
      Option(e2.getCause).exists(_.getMessage.contains("media 9")))
  }

  test("mmImgHist: hand image counts every pixel into its bin") {
    import spark.implicits._
    // 2×2 image with grays 0, 15, 16, 255 → bins 0 (×2), 1, 15
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    def gray(g: Int) = (g << 16) | (g << 8) | g
    img.setRGB(0, 0, gray(0)); img.setRGB(1, 0, gray(15))
    img.setRGB(0, 1, gray(16)); img.setRGB(1, 1, gray(255))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val media = Seq(Multimodal.MediaRecord(4L, "image", bos.toByteArray)).toDS()
    val got = Multimodal.mmImgHist(media).collect()
      .map(b => (b.bin, b.n_px)).sortBy(_._1)
    assert(got.toSeq == Seq((0, 2L), (1, 1L), (15, 1L)))
    // a non-image payload fails fast with the id
    val bad = Seq(Multimodal.MediaRecord(8L, "image",
      Array[Byte](1, 2, 3))).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.mmImgHist(bad).collect()
    }
    assert(e.getMessage.contains("media 8") ||
      Option(e.getCause).exists(_.getMessage.contains("media 8")))
  }

  test("mmAudioFeat: non-mono clips fail fast with the media id") {
    import spark.implicits._
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val pcm = new Array[Byte](16)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 4L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val media = Seq(Multimodal.MediaRecord(7L, "audio", bos.toByteArray)).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.mmAudioFeat(media).collect()
    }
    assert(e.getMessage.contains("media 7") ||
      Option(e.getCause).exists(_.getMessage.contains("media 7")))
  }

  test("mmHistDiff: identical frames read 0; a half-range shift flags a cut") {
    import spark.implicits._
    def frame(id: Long, gray: Int): Multimodal.MediaRecord = {
      val img = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 4; x <- 0 until 4)
        img.setRGB(x, y, (gray << 16) | (gray << 8) | gray)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      Multimodal.MediaRecord(id, "image", bos.toByteArray)
    }
    val media = Seq(frame(0L, 10), frame(1L, 10), frame(2L, 138)).toDS()
    val got = Multimodal.mmHistDiff(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    // frame 1: identical histogram -> l1 = 0, no cut; frame 2: every
    // pixel moved 8 bins -> l1 = 2 * 16 px, cut
    assert(got.toSeq == Seq((1L, 0L, 16L, false), (2L, 32L, 16L, true)))
  }

  test("mmThumb: block means exact on a quadrant image; uneven dims lose no pixel") {
    import spark.implicits._
    // 16x16, grid 2: four 8x8 quadrants at gray 10/20/30/40
    def png(w: Int, h: Int, gray: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val g = gray(x, y)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val quad = png(16, 16, (x, y) =>
      (if (y < 8) { if (x < 8) 10 else 20 } else { if (x < 8) 30 else 40 }))
    val media = Seq(Multimodal.MediaRecord(1L, "image", quad),
      Multimodal.MediaRecord(2L, "image", png(17, 9, (x, y) => x + y)))
      .toDS()
    val got = Multimodal.mmThumb(media, grid = 2).collect()
      .map(c => (c.media_id, c.cx, c.cy, c.n_px, c.px_sum))
    assert(got.filter(_._1 == 1L).toSet == Set(
      (1L, 0, 0, 64L, 640L), (1L, 1, 0, 64L, 1280L),
      (1L, 0, 1, 64L, 1920L), (1L, 1, 1, 64L, 2560L)))
    // uneven 17x9 split: every pixel lands in exactly one cell
    val odd = got.filter(_._1 == 2L)
    assert(odd.map(_._4).sum == 17L * 9L)
    assert(odd.map(_._5).sum ==
      (for (y <- 0 until 9; x <- 0 until 17) yield x + y).sum.toLong)
  }

  test("mmAhash: content pairs survive a local edit, brightness shift is invariant, inverse never links") {
    import spark.implicits._
    def png(w: Int, h: Int, gray: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val g = math.max(0, math.min(255, gray(x, y)))
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def quad(x: Int, y: Int): Int =
      if (y < 8) { if (x < 8) 10 else 20 } else { if (x < 8) 30 else 40 }
    val media = Seq(
      Multimodal.MediaRecord(1L, "image", png(16, 16, quad)),
      // one pixel nudged +8: no cell mean crosses the image mean
      Multimodal.MediaRecord(2L, "image",
        png(16, 16, (x, y) => quad(x, y) + (if (x == 9 && y == 1) 8 else 0))),
      // every pixel +50: aHash is brightness-shift invariant
      Multimodal.MediaRecord(3L, "image", png(16, 16, (x, y) => quad(x, y) + 50)),
      // inverted quadrants: every bit flips — must never link
      Multimodal.MediaRecord(4L, "image", png(16, 16, (x, y) => 50 - quad(x, y))))
      .toDS()
    val got = Multimodal.mmAhashPairs(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 0L), (1L, 3L, 0L), (2L, 3L, 0L)),
      s"expected the edit+shift family only: $got")
    // oracle form on real testdata: every planted bright-corner twin
    // that links does so at a small Hamming distance
    val orc = Multimodal.mmAhashPairs(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val twins = orc.filter(t => t._2 == t._1 + Multimodal.TwinOffset)
    assert(twins.nonEmpty && twins.forall(_._3 <= 3L))
  }

  test("mmDupBlob: byte-identical payloads fold to one keeper") {
    import spark.implicits._
    val media = Seq(
      (1L, "aa".getBytes("UTF-8")),
      (2L, "bb".getBytes("UTF-8")),
      (3L, "aa".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val got = Multimodal.mmDupBlob(media).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.size == 2)
    // digest is SHA-256 (md5 is chosen-prefix-breakable; the report's
    // byte-identity contract needs a digest that can't fold two
    // distinct payloads)
    def sha(sv: String): String = java.security.MessageDigest
      .getInstance("SHA-256")
      .digest(sv.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(sha("aa")) == ((2L, 1L, 2L, 2L)))
    assert(got(sha("bb")) == ((1L, 2L, 2L, 0L)))
  }

  test("Y4m: planted clip parses to exact header facts and frame count; malformed payloads fail fast") {
    val id = 13L
    val b = Multimodal.y4mPlanted(id)
    val hd = Multimodal.Y4m.parseHeader(b)
    assert(hd.width == 16 + 2 * (id % 9).toInt)
    assert(hd.height == 12 + 2 * (id * 3 % 7).toInt)
    assert(hd.colorspace == "420jpeg")
    var frames = 0
    Multimodal.Y4m.foreachFrame(b)((_, _) => frames += 1)
    assert(frames == 8 + (id % 9).toInt)
    // C420 plane geometry: frame bytes = y + 2 quarter chroma planes
    assert(hd.frameBytes == hd.width * hd.height +
      2 * (hd.width / 2) * (hd.height / 2))
    // mono and 444 colorspaces parse with their own geometry
    val mono = "YUV4MPEG2 W4 H2 F25:1 Cmono\nFRAME\n".getBytes("US-ASCII") ++
      Array.fill[Byte](8)(7)
    val hdM = Multimodal.Y4m.foreachFrame(mono)((_, _) => ())
    assert(hdM.chromaSize == 0 && hdM.frameBytes == 8)
    val c444 = "YUV4MPEG2 W2 H2 C444\nFRAME\n".getBytes("US-ASCII") ++
      Array.fill[Byte](12)(7)
    assert(Multimodal.Y4m.parseHeader(c444).frameBytes == 12)
    // truncated frame fails fast with the offset, never a silent short read
    val trunc = b.take(b.length - 3)
    val e = intercept[IllegalArgumentException] {
      Multimodal.Y4m.foreachFrame(trunc)((_, _) => ())
    }
    assert(e.getMessage.contains("truncated"))
    // a non-Y4M payload is rejected at the magic
    intercept[IllegalArgumentException] {
      Multimodal.Y4m.parseHeader("RIFF1234".getBytes("US-ASCII"))
    }
  }

  test("JdkCodecDecoder: Y4M video decodes for real; compressed video stays the declared stub") {
    import spark.implicits._
    val id = 4L
    val media = Seq(
      Multimodal.MediaRecord(id, "video", Multimodal.y4mPlanted(id))).toDS()
    val got = Multimodal.decodeAll(media, Multimodal.JdkCodecDecoder)
      .collect().head
    assert(got.width == 16 + 2 * (id % 9).toInt)
    assert(got.height == 12 + 2 * (id * 3 % 7).toInt)
    assert(got.n_frames == 8 + (id % 9).toInt)
    // the hash is over decoded plane bytes: a re-containered stream with
    // different header cosmetics (extra X param) hashes identically
    val raw = Multimodal.y4mPlanted(id)
    val nl = raw.indexOf('\n'.toByte)
    val hdr = new String(raw, 0, nl, "US-ASCII") + " XYSCSS=420JPEG"
    val rehead = hdr.getBytes("US-ASCII") ++ raw.drop(nl)
    val got2 = Multimodal.decodeAll(
      Seq(Multimodal.MediaRecord(99L, "video", rehead)).toDS(),
      Multimodal.JdkCodecDecoder).collect().head
    assert(got2.feature_hash == got.feature_hash,
      "plane hash must be container-cosmetics-invariant")
    // compressed video: fail fast naming the media and the contract
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeAll(Seq(Multimodal.MediaRecord(7L, "video",
        Array[Byte](0, 0, 0, 32, 'f', 't', 'y', 'p'))).toDS(),
        Multimodal.JdkCodecDecoder).collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("media 7") && msg.contains("Y4M"))
  }

  test("y4mSceneCuts: exactly the planted cut, exact moved mass; a cutless clip flags nothing") {
    for (id <- 0L until 40L) {
      val cuts = Multimodal.y4mSceneCuts(id, Multimodal.y4mPlanted(id))
      val nFrames = 8 + (id % 9)
      val w = 16 + 2 * (id % 9)
      val h = 12 + 2 * (id * 3 % 7)
      assert(cuts.length == 1, s"id=$id found ${cuts.length} cuts")
      assert(cuts.head == Multimodal.SceneCut(id, nFrames,
        2 + (id % (nFrames - 3)), 2 * w * h), s"id=$id: ${cuts.head}")
    }
    // constant clip (no luma jump): zero cuts
    val flat = ("YUV4MPEG2 W4 H2 F25:1 Cmono\n" +
      "FRAME\n" + "\u0050" * 8 + "FRAME\n" + "\u0050" * 8)
      .getBytes("ISO-8859-1")
    assert(Multimodal.y4mSceneCuts(5L, flat).isEmpty)
  }
}
