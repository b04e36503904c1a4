package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Recall locks for the ANN scale paths on PLANTED structure (the driver
  * corpus is isotropic noise, where no sublinear index can have recall —
  * these specs build data with real cluster/near-duplicate structure and
  * assert the index finds it).
  */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def unit(rng: Random, dim: Int): Array[Double] = {
    val v = Array.fill(dim)(rng.nextGaussian())
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  private def toEmb(rows: Seq[(Long, Array[Double])]) =
    rows.map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")

  test("range search: exactly the >= tau slice of the in-memory cosine matrix") {
    val rng = new Random(42)
    // round-trip through Float first: the operator reads float32 columns,
    // so the in-memory oracle must score the same truncated values
    val rows = (0L until 60L).map(i =>
      (i, unit(rng, 16).map(x => x.toFloat.toDouble)))
    val tau = 0.3
    val want = (for {
      (q, qv) <- rows if q < 5
      (c, cv) <- rows if c != q
      cos = BigDecimal(qv.zip(cv).map(t => t._1 * t._2).sum /
        (math.sqrt(qv.map(x => x * x).sum) * math.sqrt(cv.map(x => x * x).sum)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if cos >= tau
    } yield (q, c)).toSet
    val got = Similarity.ssRangeSearch(spark, toEmb(rows), "vec_id < 5", tau)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && want.nonEmpty)
    // the threshold slices the same scores the top-k family ranks
    assert(got.forall { case (q, _) => q < 5 })
  }

  test("IVF with k-means-trained centroids: recall >= 0.8 vs brute force at nprobe=2") {
    val rng = new Random(7)
    val dim = 64
    // 16 tight clusters x 30 members; member = center + 0.15-noise
    val rows = for {
      c <- 0 until 16
      center = unit(rng, dim)
      m <- 0 until 30
    } yield {
      val noise = unit(rng, dim)
      val v = center.zip(noise).map { case (a, b) => a + 0.15 * b }
      (c * 1000L + m, v)
    }
    val emb = toEmb(rows)
    val pred = "n.vec_id % 1000 = 0" // one query per cluster
    val ivf = Similarity.ssIvfAnnOn(spark, emb, pred, topK = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    val brute = Similarity.bruteTopkOn(spark, emb, "vec_id % 1000 = 0", topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    val recalls = brute.map { case (q, exact) =>
      val got = ivf.getOrElse(q, Array.empty).map(_._2).toSet
      exact.map(_._2).count(got) / exact.length.toDouble
    }
    val recall = recalls.sum / recalls.size
    assert(recalls.size == 16, s"expected 16 queries, got ${recalls.size}")
    assert(recall >= 0.8, s"IVF recall $recall < 0.8 (per-query: $recalls)")
  }

  test("IVF auto-sizing (nlist = sqrt(N)) keeps recall at an 8x larger corpus") {
    val rng = new Random(19)
    val dim = 64
    // 64 tight clusters x 60 members = 3840 vectors — the second corpus
    // size of the recall lock: a fixed 16-centroid quantizer underfits
    // here (4 clusters per centroid), sqrt(N) = 62 centroids track it
    val rows = for {
      c <- 0 until 64
      center = unit(rng, dim)
      m <- 0 until 60
    } yield {
      val noise = unit(rng, dim)
      (c * 1000L + m, center.zip(noise).map { case (a, b) => a + 0.15 * b })
    }
    val emb = toEmb(rows)
    val ivf = Similarity.ssIvfAnnAuto(spark, emb, "n.vec_id % 1000 = 0", topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    val brute = Similarity.bruteTopkOn(spark, emb, "vec_id % 1000 = 0", topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    val recalls = brute.map { case (q, exact) =>
      val got = ivf.getOrElse(q, Array.empty).map(_._2).toSet
      exact.map(_._2).count(got) / exact.length.toDouble
    }
    val recall = recalls.sum / recalls.size
    assert(recalls.size == 64, s"expected 64 queries, got ${recalls.size}")
    assert(recall >= 0.8, s"auto-sized IVF recall $recall < 0.8")
  }

  test("nprobe is a monotone recall dial (candidate supersets)") {
    val rng = new Random(23)
    val dim = 64
    val rows = for {
      c <- 0 until 16
      center = unit(rng, dim)
      m <- 0 until 30
    } yield {
      val noise = unit(rng, dim)
      (c * 1000L + m, center.zip(noise).map { case (a, b) => a + 0.2 * b })
    }
    val emb = toEmb(rows)
    val brute = Similarity.bruteTopkOn(spark, emb, "vec_id % 1000 = 0", topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    def recallAt(nprobe: Int): Double = {
      val ivf = Similarity.ssIvfAnnOn(spark, emb, "n.vec_id % 1000 = 0",
          topK = 5, nlist = 16, nprobe = nprobe)
        .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      val rs = brute.map { case (q, exact) =>
        val got = ivf.getOrElse(q, Array.empty).map(_._2).toSet
        exact.map(_._2).count(got) / exact.length.toDouble
      }
      rs.sum / rs.size
    }
    val r1 = recallAt(1)
    val r4 = recallAt(4)
    // probing more clusters only ADDS candidates, and ranking is by true
    // cosine — recall cannot go down, and must be high by nprobe=4
    assert(r4 >= r1, s"nprobe dial not monotone: $r1 -> $r4")
    assert(r4 >= 0.9, s"nprobe=4 recall $r4 < 0.9")
  }

  test("16-plane multiprobe LSH ANN finds planted near-duplicate twins (scale config)") {
    val rng = new Random(11)
    val dim = 64
    val base = (0 until 200).map(i => (i.toLong, unit(rng, dim)))
    // twin = base + 0.06-noise → cos ≈ 0.998
    val twins = base.map { case (id, v) =>
      val noise = unit(rng, dim)
      (id + 100000L, v.zip(noise).map { case (a, b) => a + 0.06 * b })
    }
    val emb = toEmb(base ++ twins)
    val top = Similarity.ssLshAnnOn(spark, emb, nPlanes = 16,
        queryPred = "vec_id < 100000", topK = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    val hit = base.count { case (id, _) =>
      top.getOrElse(id, Array.empty).exists(_._2 == id + 100000L)
    }
    val recall = hit / base.length.toDouble
    assert(recall >= 0.8, s"16-plane multiprobe twin recall $recall < 0.8")
  }

  test("8-plane multiprobe LSH ANN (oracled config) also recovers twins") {
    val rng = new Random(13)
    val dim = 64
    val base = (0 until 100).map(i => (i.toLong, unit(rng, dim)))
    val twins = base.map { case (id, v) =>
      val noise = unit(rng, dim)
      (id + 100000L, v.zip(noise).map { case (a, b) => a + 0.06 * b })
    }
    val emb = toEmb(base ++ twins)
    val top = Similarity.ssLshAnnOn(spark, emb, nPlanes = 8,
        queryPred = "vec_id < 100000", topK = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    val hit = base.count { case (id, _) =>
      top.getOrElse(id, Array.empty).exists(_._2 == id + 100000L)
    }
    assert(hit / base.length.toDouble >= 0.9,
      s"8-plane twin recall ${hit / base.length.toDouble} < 0.9")
  }

  test("SQ8 top-k: recall >= 0.95 vs brute force, quantized score within 0.02") {
    val rng = new Random(29)
    val dim = 64
    // the IVF mid-similarity regime: 16 clusters x 30, noisy members —
    // exactly where coarse candidates go wrong if quantization loses rank
    val rows = for {
      c <- 0 until 16
      center = unit(rng, dim)
      m <- 0 until 30
    } yield {
      val noise = unit(rng, dim)
      val v = center.zip(noise).map { case (a, b) => a + 0.15 * b }
      (c * 1000L + m, v)
    }
    val emb = toEmb(rows)
    val sq = Similarity.ssSqTopkOn(spark, emb, "vec_id % 1000 = 0", topK = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val brute = Similarity.bruteTopkOn(spark, emb, "vec_id % 1000 = 0", topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    // int8 keeps ~2.4 significant digits of each coordinate: the exact
    // rescore must recover nearly all of brute's top-5
    val recalls = brute.map { case (q, exact) =>
      val got = sq.filter(_._1 == q).map(_._2).toSet
      exact.map(_._2).count(got) / exact.length.toDouble
    }
    val recall = recalls.sum / recalls.size
    assert(recall >= 0.95, s"SQ8 recall $recall < 0.95 (per-query: $recalls)")
    // the emitted quantized score tracks the exact score closely
    sq.foreach { case (q, n, cos, cosq) =>
      assert(math.abs(cos - cosq) < 0.02,
        s"($q,$n): |cos $cos - cosq $cosq| >= 0.02")
    }
    // exact cosine is the final rank key: rows arrive sorted per query
    sq.groupBy(_._1).values.foreach { g =>
      val cs = g.map(_._3).toSeq
      assert(cs == cs.sorted.reverse, s"rescore order broken: $cs")
    }
  }

  test("PQ top-k: clustered-regime recall vs brute force, deterministic") {
    val rng = new Random(31)
    val dim = 64
    // the same mid-similarity regime as the SQ8/IVF locks: 16 clusters of
    // 30 noisy members — PQ's 16-codeword-per-subspace budget matches the
    // cluster count, the shape it should capture
    val rows = for {
      c <- 0 until 16
      center = unit(rng, dim)
      m <- 0 until 30
    } yield {
      val noise = unit(rng, dim)
      val v = center.zip(noise).map { case (a, b) => a + 0.15 * b }
      (c * 1000L + m, v)
    }
    val emb = toEmb(rows)
    def recallAt(mult: Int): Double = {
      val pq = Similarity.ssPqTopkOn(spark, emb, "vec_id % 1000 = 0",
        topK = 5, mult = mult).collect()
        .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      val brute = Similarity.bruteTopkOn(spark, emb, "vec_id % 1000 = 0",
        topK = 5).collect()
        .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      val rs = brute.map { case (q, exact) =>
        val got = pq.getOrElse(q, Array.empty).map(_._2).toSet
        exact.map(_._2).count(got) / exact.length.toDouble
      }
      rs.sum / rs.size
    }
    // 8-byte codes collapse CLUSTER-MATES to near-identical ADC scores —
    // within-cluster rank lives in the exact rescore, so the cut depth
    // `mult` is PQ's recall dial (the nprobe analog): deep cut must beat
    // the shallow one, and at 12x the rescore recovers most of brute top-5
    val shallow = recallAt(3)
    val deep = recallAt(12)
    assert(deep >= shallow, s"cut depth not a recall dial: $shallow -> $deep")
    assert(deep >= 0.7, s"PQ recall $deep < 0.7 at mult=12")
    val pq = Similarity.ssPqTopkOn(spark, emb, "vec_id % 1000 = 0", topK = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // exact cosine is the final rank key: rows arrive sorted per query
    pq.groupBy(_._1).values.foreach { g =>
      val cs = g.map(_._3).toSeq
      assert(cs == cs.sorted.reverse, s"rescore order broken: $cs")
    }
    // seeded codebooks: a second run is row-identical
    val again = Similarity.ssPqTopkOn(spark, emb, "vec_id % 1000 = 0", topK = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(pq.toSeq == again.toSeq, "PQ result not deterministic")
  }

  test("IVF-PQ: composed recall tracks plain PQ at matched cut depth") {
    val rng = new Random(37)
    val dim = 64
    val rows = for {
      c <- 0 until 16
      center = unit(rng, dim)
      m <- 0 until 30
    } yield {
      val noise = unit(rng, dim)
      val v = center.zip(noise).map { case (a, b) => a + 0.15 * b }
      (c * 1000L + m, v)
    }
    val emb = toEmb(rows)
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect()
        .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      val brute = Similarity.bruteTopkOn(spark, emb, "vec_id % 1000 = 0",
        topK = 5).collect()
        .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      val rs = brute.map { case (q, exact) =>
        val g = got.getOrElse(q, Array.empty).map(_._2).toSet
        exact.map(_._2).count(g) / exact.length.toDouble
      }
      rs.sum / rs.size
    }
    val pq = recallOf(Similarity.ssPqTopkOn(spark, emb,
      "vec_id % 1000 = 0", topK = 5, mult = 12))
    val ivfpq = recallOf(Similarity.ssIvfPqTopkOn(spark, emb,
      "vec_id % 1000 = 0", topK = 5, mult = 12))
    // nprobe=2 of 16 covers each query's own cluster, where brute's top-5
    // live in this regime — the coarse filter must cost little recall
    // while cutting the ADC scan ~8x
    assert(ivfpq >= pq - 0.15,
      s"IVF-PQ recall $ivfpq collapsed vs PQ $pq at the same cut")
    assert(ivfpq >= 0.6, s"IVF-PQ recall $ivfpq < 0.6")
  }

  test("L2 top-k: magnitude matters — cosine and L2 disagree exactly where designed") {
    // q at unit norm; a = same direction, 3x the norm (cos 1, far in
    // L2); b = slightly rotated, unit norm (cos < 1, near in L2)
    val q = Array(1.0, 0.0, 0.0, 0.0) ++ Array.fill(60)(0.0)
    val a = q.map(_ * 3.0)
    val b = Array(0.96, 0.28, 0.0, 0.0) ++ Array.fill(60)(0.0)
    val emb = toEmb(Seq((0L, q), (1L, a), (2L, b)))
    val l2 = Similarity.ssL2TopkOn(spark, emb, "vec_id = 0", 2).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
    // L2: b (d2 ~ 0.08) before a (d2 = 4)
    assert(l2.map(_._1).toSeq == Seq(2L, 1L), l2.toSeq)
    assert(l2.head._2 < 0.1 && l2.last._2 > 3.9)
    val cos = Similarity.bruteTopkOn(spark, emb, "vec_id = 0", 2)
      .collect().map(_.getLong(1))
    // cosine: a (cos 1.0) before b
    assert(cos.toSeq == Seq(1L, 2L))
  }

  test("OPQ-P: variance-balanced permutation rescues PQ on a signal-concentrated block") {
    val rng = new Random(13)
    val dim = 64
    // ALL the variance lives in dims 0..7 (uniform cube); dims 8..63 are
    // near-zero noise. Plain PQ hands the whole signal block to subspace
    // 0's 16 codewords (one coarse cell per neighborhood — within-cell
    // rank dies); the variance-balanced permutation deals one signal dim
    // to EACH subspace, so the product grid refines to 16^8 cells
    val rows = (0 until 480).map { i =>
      val v = Array.tabulate(dim)(j =>
        if (j < 8) rng.nextDouble()
        else 0.02 * rng.nextDouble())
      (i.toLong, v)
    }
    val emb = toEmb(rows)
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect()
        .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      val brute = Similarity.bruteTopkOn(spark, emb, "vec_id % 100 = 0",
        topK = 5).collect()
        .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      val rs = brute.map { case (q, exact) =>
        val g = got.getOrElse(q, Array.empty).map(_._2).toSet
        exact.map(_._2).count(g) / exact.length.toDouble
      }
      rs.sum / rs.size
    }
    val pq = recallOf(Similarity.ssPqTopkOn(spark, emb,
      "vec_id % 100 = 0", topK = 5, mult = 12))
    val opq = recallOf(Similarity.ssOpqTopkOn(spark, emb,
      "vec_id % 100 = 0", topK = 5, mult = 12))
    assert(opq >= pq,
      s"permutation lost recall: opq $opq < pq $pq")
    assert(opq >= 0.6, s"OPQ recall $opq < 0.6 on the anisotropic cube")
  }

  test("RQ: residual-quantized recall holds on a clustered corpus; rescore is exact") {
    val rng = new Random(7)
    val dim = 64
    val rows = for {
      c <- 0 until 16
      center = unit(rng, dim)
      m <- 0 until 30
    } yield {
      val noise = unit(rng, dim)
      val v = center.zip(noise).map { case (a, b) => a + 0.15 * b }
      (c * 1000L + m, v)
    }
    val emb = toEmb(rows)
    val brute = Similarity.bruteTopkOn(spark, emb, "vec_id % 1000 = 0",
      topK = 5).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    val bruteTop = brute.map(_._1).groupBy(_._1)
    val rq = Similarity.ssRqTopkOn(spark, emb, "vec_id % 1000 = 0",
      topK = 5, mult = 12).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    val rqTop = rq.map(_._1).groupBy(_._1)
    val rs = bruteTop.map { case (q, exact) =>
      val g = rqTop.getOrElse(q, Array.empty).map(_._2).toSet
      exact.map(_._2).count(g) / exact.length.toDouble
    }
    val recall = rs.sum / rs.size
    // the coarse centroid captures the cluster and the residual code the
    // within-cluster offset — in this 16-cluster regime RQ's 2-lookup
    // ADC must keep most of brute's top-5 at the 12x cut
    assert(recall >= 0.6, s"RQ recall $recall < 0.6")
    // survivors rescore with the EXACT brute cosine: any (q, n) pair in
    // both result sets carries the identical rounded score
    val bmap = brute.toMap
    rq.foreach { case (k, cos) =>
      bmap.get(k).foreach(b => assert(b == cos, s"rescore drift at $k"))
    }
  }

  test("BQ: sign codes rank a scaled twin at Hamming 0; clustered recall holds; rescore exact") {
    val rng = new Random(23)
    val dim = 64
    val rows = for {
      c <- 0 until 16
      center = unit(rng, dim)
      m <- 0 until 30
    } yield {
      val noise = unit(rng, dim)
      val v = center.zip(noise).map { case (a, b) => a + 0.15 * b }
      (c * 1000L + m, v)
    }
    // plant: vec 999999 is query 0's vector scaled 3x — the sign code
    // is SCALE-INVARIANT, so its Hamming distance to the query is 0
    // and the exact rescore reads cos = 1
    val q0 = rows.find(_._1 == 0L).get._2
    val emb = toEmb(rows :+ (999999L, q0.map(_ * 3.0)))
    val bq = Similarity.ssBqTopkOn(spark, emb, "vec_id % 1000 = 0",
      topK = 5, mult = 12).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val q0rows = bq.filter(_._1 == 0L)
    assert(q0rows.head._2 == 999999L && q0rows.head._3 == 1.0 &&
      q0rows.head._4 == 0L,
      s"scaled twin not at Hamming 0 / cos 1: ${q0rows.toSeq}")
    // rescore is the exact brute cosine on every overlapping pair
    val brute = Similarity.bruteTopkOn(spark, emb, "vec_id % 1000 = 0",
      topK = 5).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    val bmap = brute.toMap
    bq.foreach { case (q, n, cos, _) =>
      bmap.get((q, n)).foreach(b => assert(b == cos,
        s"rescore drift at ($q, $n)"))
    }
    // 1 bit/dim keeps enough of the cluster geometry for the rescore
    // cut to recover a solid share of brute's top-5
    val bqTop = bq.map(t => (t._1, t._2)).groupBy(_._1)
    val rs = brute.map(_._1).groupBy(_._1).map { case (q, exact) =>
      val g = bqTop.getOrElse(q, Array.empty).map(_._2).toSet
      exact.map(_._2).count(g) / exact.length.toDouble
    }
    val recall = rs.sum / rs.size
    assert(recall >= 0.5, s"BQ recall $recall < 0.5 on clustered corpus")
    // seeded end-to-end: a second run is row-identical
    val again = Similarity.ssBqTopkOn(spark, emb, "vec_id % 1000 = 0",
      topK = 5, mult = 12).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(bq.toSeq == again.toSeq)
  }

  test("RP: JL projection keeps clustered recall at 4x fewer dims; projection is linear; rescore exact") {
    val rng = new Random(29)
    val dim = 64
    val rows = for {
      c <- 0 until 16
      center = unit(rng, dim)
      m <- 0 until 30
    } yield {
      val noise = unit(rng, dim)
      val v = center.zip(noise).map { case (a, b) => a + 0.15 * b }
      (c * 1000L + m, v)
    }
    // plant: vec 999999 = 2x query 0's vector — a ±1 projection is
    // LINEAR, so its projected cosine to the query is exactly 1 and it
    // must rank first with exact cos 1
    val q0 = rows.find(_._1 == 0L).get._2
    val emb = toEmb(rows :+ (999999L, q0.map(_ * 2.0)))
    val rp = Similarity.ssRpTopkOn(spark, emb, "vec_id % 1000 = 0",
      topK = 5, mult = 12).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val q0rows = rp.filter(_._1 == 0L)
    assert(q0rows.head._2 == 999999L && q0rows.head._3 == 1.0,
      s"scaled twin not first with cos 1: ${q0rows.toSeq}")
    val brute = Similarity.bruteTopkOn(spark, emb, "vec_id % 1000 = 0",
      topK = 5).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    val bmap = brute.toMap
    rp.foreach { case (q, n, cos, _) =>
      bmap.get((q, n)).foreach(b => assert(b == cos,
        s"rescore drift at ($q, $n)"))
    }
    val rpTop = rp.map(t => (t._1, t._2)).groupBy(_._1)
    val rs = brute.map(_._1).groupBy(_._1).map { case (q, exact) =>
      val g = rpTop.getOrElse(q, Array.empty).map(_._2).toSet
      exact.map(_._2).count(g) / exact.length.toDouble
    }
    val recall = rs.sum / rs.size
    assert(recall >= 0.5, s"RP recall $recall < 0.5 on clustered corpus")
    val again = Similarity.ssRpTopkOn(spark, emb, "vec_id % 1000 = 0",
      topK = 5, mult = 12).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rp.toSeq == again.toSeq)
  }

  test("IVF-RQ: probed ADC keeps full-scan recall at matched cut; nprobe is a monotone dial") {
    val rng = new Random(7)
    val dim = 64
    val rows = for {
      c <- 0 until 16
      center = unit(rng, dim)
      m <- 0 until 30
    } yield {
      val noise = unit(rng, dim)
      val v = center.zip(noise).map { case (a, b) => a + 0.15 * b }
      (c * 1000L + m, v)
    }
    val emb = toEmb(rows)
    val brute = Similarity.bruteTopkOn(spark, emb, "vec_id % 1000 = 0",
      topK = 5).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    val bruteTop = brute.map(_._1).groupBy(_._1)
    def recallAt(nprobe: Int): Double = {
      val got = Similarity.ssRqTopkOn(spark, emb, "vec_id % 1000 = 0",
        topK = 5, mult = 12, nprobe = nprobe).collect()
        .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      val rs = bruteTop.map { case (q, exact) =>
        val g = got.getOrElse(q, Array.empty).map(_._2).toSet
        exact.map(_._2).count(g) / exact.length.toDouble
      }
      rs.sum / rs.size
    }
    val full = recallAt(0)
    val probed = recallAt(2)
    // nprobe=2 of 16 covers each query's own cluster (RQ codes are
    // keyed by cid, so the cut is an equality join) — the coarse filter
    // must cost little recall while cutting the per-query ADC scan ~8x
    assert(probed >= full - 0.15,
      s"probed RQ recall $probed collapsed vs full-ADC $full")
    assert(probed >= 0.6, s"IVF-RQ recall $probed < 0.6")
    // widening the probe cannot lose the neighbors a narrower one found
    // in this clustered regime: the dial is monotone
    val narrow = recallAt(1)
    val wide = recallAt(4)
    assert(wide >= narrow, s"nprobe dial not monotone: $narrow -> $wide")
    // probed survivors still rescore with the EXACT brute cosine
    val bmap = brute.toMap
    Similarity.ssRqTopkOn(spark, emb, "vec_id % 1000 = 0",
      topK = 5, mult = 12, nprobe = 2).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .foreach { case (k, cos) =>
        bmap.get(k).foreach(b => assert(b == cos, s"rescore drift at $k"))
      }
  }

  test("IVF-BQ: probed Hamming scan keeps full-scan recall at matched cut; nprobe is a monotone dial") {
    // the r11 verdict's ladder-symmetry item: BQ gets the same qprobes
    // escape hatch RQ got — same clustered recipe, same contracts
    val rng = new Random(7)
    val dim = 64
    val rows = for {
      c <- 0 until 16
      center = unit(rng, dim)
      m <- 0 until 30
    } yield {
      val noise = unit(rng, dim)
      val v = center.zip(noise).map { case (a, b) => a + 0.15 * b }
      (c * 1000L + m, v)
    }
    val emb = toEmb(rows)
    val brute = Similarity.bruteTopkOn(spark, emb, "vec_id % 1000 = 0",
      topK = 5).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    val bruteTop = brute.map(_._1).groupBy(_._1)
    def recallAt(nprobe: Int): Double = {
      val got = Similarity.ssBqTopkOn(spark, emb, "vec_id % 1000 = 0",
        topK = 5, mult = 12, nprobe = nprobe).collect()
        .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      val rs = bruteTop.map { case (q, exact) =>
        val g = got.getOrElse(q, Array.empty).map(_._2).toSet
        exact.map(_._2).count(g) / exact.length.toDouble
      }
      rs.sum / rs.size
    }
    val full = recallAt(0)
    val probed = recallAt(2)
    // nprobe=2 of 16 covers each query's own cluster (probed BQ codes
    // are keyed by cid) — the coarse filter must cost little recall
    // while cutting the per-query 16-byte scan ~8x
    assert(probed >= full - 0.15,
      s"probed BQ recall $probed collapsed vs full-scan $full")
    assert(probed >= 0.5, s"IVF-BQ recall $probed < 0.5")
    val narrow = recallAt(1)
    val wide = recallAt(4)
    assert(wide >= narrow, s"nprobe dial not monotone: $narrow -> $wide")
    // probed survivors still rescore with the EXACT brute cosine
    val bmap = brute.toMap
    Similarity.ssBqTopkOn(spark, emb, "vec_id % 1000 = 0",
      topK = 5, mult = 12, nprobe = 2).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .foreach { case (k, cos) =>
        bmap.get(k).foreach(b => assert(b == cos, s"rescore drift at $k"))
      }
  }

  test("MaxSim: 4x4 sub-cosine grid matches the brute fold; beats pooled cosine on partial match") {
    val rng = new Random(11)
    // candidate 1 shares ONE 16-dim block with the query exactly and is
    // noise elsewhere; candidate 2 is a faint full-vector echo. MaxSim
    // must rank the partial-but-exact match ABOVE the diluted echo even
    // when single-vector cosine prefers the echo.
    val q = unit(rng, 64)
    val c1 = unit(rng, 64); Array.copy(q, 16, c1, 16, 16)
    val c2 = q.zip(unit(rng, 64)).map { case (a, b) => 0.25 * a + b * 0.97 }
    val strays = (3L until 20L).map(i => (i, unit(rng, 64)))
    val rows = Seq((0L, q), (1L, c1), (2L, c2)) ++ strays
    val got = Similarity.ssMaxSim(toEmb(rows), "vec_id = 0", topK = 19)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
    // brute fold on the float-truncated vectors, same rounding discipline
    val vs = rows.map { case (id, v) => id -> v.map(_.toFloat.toDouble) }.toMap
    def maxsim(a: Long, b: Long): Double = {
      val (x, y) = (vs(a), vs(b))
      def slice(v: Array[Double], i: Int) = v.slice(16 * i, 16 * i + 16)
      def nrm(v: Array[Double]) = math.sqrt(v.map(p => p * p).sum)
      val terms = (0 to 3).map { i =>
        (0 to 3).map { j =>
          val (xi, yj) = (slice(x, i), slice(y, j))
          BigDecimal(xi.zip(yj).map(t => t._1 * t._2).sum / (nrm(xi) * nrm(yj)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }.max
      }
      BigDecimal(terms(0) + terms(1) + terms(2) + terms(3))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    got.foreach { case (cand, score, _) =>
      assert(score == maxsim(0L, cand), s"cand $cand")
    }
    // the exact-block match c1 carries a full 1.0 term, so it must rank
    // in the top 2 even though 3/4 of its vector is noise
    assert(got.take(2).map(_._1).contains(1L))
    assert(got.forall(_._2 <= 4.000001))
  }

  test("mutual kNN graph: edges == the brute mutual-top-k relation, ranks honest") {
    val rng = new Random(7)
    // two tight clusters of 6 + 4 isotropic strays: mutual edges should
    // concentrate inside the clusters, and every edge must be reciprocal
    val c1 = unit(rng, 16); val c2 = unit(rng, 16)
    def near(c: Array[Double]): Array[Double] = {
      val v = c.zip(unit(rng, 16)).map { case (a, b) => a + 0.1 * b }
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val rows = (0L until 6L).map(i => (i, near(c1))) ++
      (6L until 12L).map(i => (i, near(c2))) ++
      (12L until 16L).map(i => (i, unit(rng, 16)))
    val emb = toEmb(rows)
    val k = 3
    val got = Similarity.ssKnnGraph(emb, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    // brute oracle on the SAME float-truncated vectors
    val vs = rows.map { case (id, v) => id -> v.map(_.toFloat.toDouble) }.toMap
    def cos(a: Long, b: Long): Double = {
      val (x, y) = (vs(a), vs(b))
      val d = x.zip(y).map { case (p, q) => p * q }.sum
      BigDecimal(d / (math.sqrt(x.map(p => p * p).sum)
        * math.sqrt(y.map(p => p * p).sum)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val ids = rows.map(_._1)
    val topk = ids.map { a =>
      a -> ids.filter(_ != a).sortBy(b => (-cos(a, b), b)).take(k).zipWithIndex
        .map { case (b, i) => b -> (i + 1L) }.toMap
    }.toMap
    val want = (for {
      a <- ids; (b, ra) <- topk(a); if a < b; rb <- topk(b).get(a)
    } yield (a, b, ra, rb)).sortBy(e => (e._1, e._2))
    assert(got.toSeq.sortBy(e => (e._1, e._2)) == want)
    // mutuality pruned at least the strays' one-way edges: every surviving
    // edge is reciprocal by construction, and cluster cores are connected
    assert(want.forall { case (_, _, ra, rb) => ra <= k && rb <= k })
    assert(want.count { case (a, b, _, _) => a < 6 && b < 6 } >= 4)
  }

  test("ssNorms: hand norms fold exactly; corpus table bounded and sane") {
    import spark.implicits._
    val emb = Seq((0L, Array(3f, 4f), 0), (1L, Array(0f, 1f), 0),
      (2L, Array(0f, 2f), 1)).toDF("vec_id", "embedding", "label")
    val got = Similarity.ssNorms(emb).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got.toSeq == Seq((0, 2L, 1.0, 5.0, 3.0), (1, 1L, 2.0, 2.0, 2.0)))
    val orc = Similarity.ssNorms(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(orc.nonEmpty)
    orc.foreach { case (n, mn, mx, mean) =>
      assert(n > 0 && mn > 0 && mn <= mean && mean <= mx)
    }
  }

  test("ssCentroids: 16 live centroids whose members tile the corpus") {
    val sf = "/root/testdata/sf0.001"
    val n = graft.Tables.load(spark, sf, "embeddings").count()
    val got = Similarity.ssCentroids(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == (0 to 15))
    assert(got.map(_._2).sum == n)   // every vector assigned exactly once
    assert(got.forall(_._3 > 0.0))   // no dead centroids on this corpus
  }

  test("ssDrift: orthogonal halves read 0, aligned halves read 1") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1f, 0f), 0), (2L, Array(1f, 0f), 0),  // even half of 0
      (1L, Array(0f, 1f), 0),                          // odd half ⊥ even
      (4L, Array(1f, 1f), 1), (5L, Array(2f, 2f), 1))  // same direction
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.ssDrift(emb).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((0, 2L, 1L, 0.0), (1, 1L, 1L, 1.0)))
    // oracle form: bounded in [-1, 1], halves partition each label
    val orc = Similarity.ssDrift(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(orc.nonEmpty)
    orc.foreach { case (na, nb, c) =>
      assert(na > 0 && nb > 0 && c >= -1.0 && c <= 1.0)
    }
  }

  test("ssHardNeg: same-label candidates excluded, nearest wrong-label first") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1f, 0f), 0),    // anchor, label 0
      (1L, Array(1f, 0.05f), 0), // same label: nearest overall, EXCLUDED
      (2L, Array(0.9f, 0.1f), 1),
      (3L, Array(0f, 1f), 1),
      (4L, Array(-1f, 0f), 2))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.ssHardNeg(spark, emb, "vec_id < 1", 3).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getInt(3), r.getLong(5)))
    // hard negatives of anchor 0: 2 (cos≈0.994), 3 (0), 4 (−1) — never 1
    assert(got.toSeq == Seq((0L, 2L, 1, 1L), (0L, 3L, 1, 2L),
      (0L, 4L, 2, 3L)))
    // oracle form: every row's labels differ, ranks dense per anchor
    val orc = Similarity.ssHardNeg(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(3), r.getLong(5)))
    assert(orc.nonEmpty)
    assert(orc.forall { case (_, al, nl, _) => al != nl })
    orc.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1L to rows.length))
    }
  }

  test("ssHybrid: fused ranks replay RRF over independently computed legs") {
    val sf = "/root/testdata/sf0.001"
    // semantic leg: the brute top-10 (same ranking rule as the query)
    graft.Tables.load(spark, sf, "embeddings")
      .createOrReplaceTempView("__emb_hyt")
    val sem = Similarity.bruteTopkOn(spark, spark.table("__emb_hyt"),
      "vec_id < 5", 10).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3))).toMap
    // lexical leg recomputed in Scala: bigram-shingle jaccard, top-10 by
    // (jaccard desc, id)
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(' ').sliding(2)
        .filter(_.length == 2).map(_.mkString(" ")).toSet))
    val lex = docs.filter(_._1 < 5).flatMap { case (q, qs) =>
      docs.filter(_._1 != q)
        .map { case (c, cs) =>
          val i = (qs & cs).size
          (c, i.toDouble / (qs.size + cs.size - i), i) }
        .filter(_._3 > 0)
        .sortBy { case (c, j, _) => (-j, c) }
        .take(10).zipWithIndex
        .map { case ((c, _, _), r) => ((q, c), (r + 1).toLong) }
    }.toMap
    val got = Similarity.ssHybrid(spark, sf).collect().map { r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getDouble(4), r.getLong(5))
    }
    assert(got.nonEmpty)
    got.foreach { case (q, c, lr, sr, rrf, _) =>
      assert(lr == lex.get((q, c)) && sr == sem.get((q, c)))
      val want = lr.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        sr.map(r => 1.0 / (60 + r)).getOrElse(0.0)
      val w6 = BigDecimal(want).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
      assert(rrf == w6, s"rrf mismatch for ($q,$c)")
    }
    // per query: ranks dense 1..n, fused scores non-increasing
    got.groupBy(_._1).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_._6)
      assert(byRank.map(_._6).toSeq == (1L to byRank.length))
      val scores = byRank.map(_._5).toSeq
      assert(scores == scores.sorted.reverse)
    }
  }

  test("ssRecall: replays the approx∩exact overlap, algebra exact") {
    val sf = "/root/testdata/sf0.001"
    graft.Tables.load(spark, sf, "embeddings")
      .createOrReplaceTempView("__emb_rct")
    val emb = spark.table("__emb_rct")
    val approx = Similarity.ssLshAnnOn(spark, emb, 8, "vec_id < 20", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.bruteTopkOn(spark, emb, "vec_id < 20", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.ssRecall(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty && got.length == exact.map(_._1).size)
    got.foreach { case (q, nExact, nHit, recall) =>
      val e = exact.filter(_._1 == q)
      assert(nExact == e.size && nExact <= 5)
      assert(nHit == e.count(approx))
      val want = BigDecimal(nHit.toDouble / nExact)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(recall == want)
    }
  }

  test("ssMatryoshkaOn: prefix-divergent query reads 0, aligned reads 1") {
    import spark.implicits._
    // query 100 = e1: full top-1 is c2 (cos .994) but the 2-dim prefix
    // ranks c1 first (prefix cos 1.0 vs c2's .994) -> overlap@1 = 0.
    // query 101 = e2: c3 == e2 exactly, wins both rankings -> overlap 1.
    val emb = Seq(
      (1L, Array(1f, 0f, 10f, 0f)), (2L, Array(0.9f, 0.1f, 0f, 0f)),
      (3L, Array(0f, 1f, 0f, 0f)),
      (100L, Array(1f, 0f, 0f, 0f)), (101L, Array(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.ssMatryoshkaOn(spark, emb, dims = 2,
      queryPred = "vec_id >= 100", topK = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((100L, 1L, 0L, 0.0), (101L, 1L, 1L, 1.0)))
    // oracle form: overlap bounded, full leg always returns k rows
    val orc = Similarity.ssMatryoshka(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(orc.length == 20)
    orc.foreach { case (nf, nh, ov) =>
      assert(nf == 5 && nh <= nf && ov >= 0.0 && ov <= 1.0) }
  }

  test("ssSilhouette: separated clusters read ~1, a planted mislabel goes negative") {
    import spark.implicits._
    // two orthogonal tight clusters: every vector sits on its own
    // centroid's axis → own_cos = 1, other_cos = 0, silhouette = 1
    val clean = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(2f, 0f), 0),
      (2L, Array(0f, 1f), 1), (3L, Array(0f, 3f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.ssSilhouette(clean).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq == Seq((0, 2L, 1.0, 0L), (1, 2L, 1.0, 0L)))
    // plant a label-0 vector ON the label-1 axis: it drags label 0's mean
    // down and is counted as that label's single negative
    val bad = clean.unionAll(
      Seq((4L, Array(0f, 5f), 0)).toDF("vec_id", "embedding", "label"))
    val g2 = Similarity.ssSilhouette(bad).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toMap
    assert(g2(0)._1 == 3L && g2(0)._3 == 1L && g2(0)._2 < g2(1)._2)
    assert(g2(1)._3 == 0L)
    // oracle form: silhouettes bounded, counts tile the corpus
    val orc = Similarity.ssSilhouette(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(orc.map(_._1).sum == 500L)
    orc.foreach { case (n, m, nn) =>
      assert(m >= -1.0 && m <= 1.0 && nn >= 0 && nn <= n) }
  }

  test("ssQuantErr: axis vectors reconstruct exactly; known 2-d code replays") {
    import spark.implicits._
    // (127, 0) quantizes to itself's direction → cos 1; (1, 0.5) → codes
    // (127, round(63.5)=64), cos computed by hand below; an all-zero
    // vector must be EXCLUDED, not divide by zero
    val emb = Seq(
      (0L, Array(5f, 0f), 0),
      (1L, Array(1f, 0.5f), 1),
      (2L, Array(0f, 0f), 2))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.ssQuantErr(emb).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val cos1 = {
      val (vx, vy, qx, qy) = (1.0, 0.5, 127.0, 64.0)
      val c = (vx * qx + vy * qy) /
        (math.sqrt(vx * vx + vy * vy) * math.sqrt(qx * qx + qy * qy))
      BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got.toSeq == Seq((0, 1L, 1.0, 1.0), (1, 1L, cos1, cos1)))
    // oracle form: SQ8 on 64-dim gaussian keeps cos ≥ 0.999 everywhere —
    // the "int8 candidates are safe here" verdict this op exists to issue
    val orc = Similarity.ssQuantErr(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(orc.map(_._1).sum == 500L)
    orc.foreach { case (_, m, mn) => assert(m >= 0.999 && mn >= 0.99) }
  }

  test("ssInertia: cells match the shared quantizer's census; cohesion beats separation on the mixture") {
    val sf = "/root/testdata/sf0.001"
    val got = Similarity.ssInertia(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3),
        r.getDouble(4)))
    assert(got.nonEmpty)
    // identical quantizer chain as ss_centroids: the non-empty cells
    // must agree cid-for-cid on membership counts, and cover the corpus
    val census = Similarity.ssCentroids(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1))).filter(_._2 > 0).toMap
    assert(got.map(t => t._1 -> t._2).toMap == census)
    assert(got.map(_._2).sum == 500L)
    got.foreach { case (cid, _, within, nnCid, between) =>
      assert(nnCid != cid && within <= 1.0 && between <= 1.0)
    }
    // the gaussian mixture separates: average member-to-own-centroid
    // cohesion must dominate average nearest-centroid similarity
    val meanWithin = got.map(_._3).sum / got.length
    val meanBetween = got.map(_._5).sum / got.length
    assert(meanWithin > meanBetween)
  }

  test("ssPower: exact eigenpair on a diagonal covariance; dominant axis wins; zero-variance corpus reads 0") {
    import spark.implicits._
    // cov = diag(1,0,0) exactly: v0=(1,1,1) → w=(1,0,0), ||w||=1 —
    // every round reproduces the eigenpair bit-exactly
    val e0 = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(-1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val g0 = Similarity.ssPower(e0).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    assert(g0.toSeq == Seq((0, 1.0, 1.0), (1, 0.0, 1.0), (2, 0.0, 1.0)))
    // cov = diag(1,4,0): three rounds must lock onto dim 1 with
    // eigenvalue approaching 4 and a unit-norm loading vector
    val e1 = Seq(
      (0L, Array(1.0f, 2.0f, 0.0f)), (1L, Array(1.0f, -2.0f, 0.0f)),
      (2L, Array(-1.0f, 2.0f, 0.0f)), (3L, Array(-1.0f, -2.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val g1 = Similarity.ssPower(e1).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    val byDim = g1.map(t => t._1 -> t._2).toMap
    assert(math.abs(byDim(1)) > 0.97 && byDim(2) == 0.0)
    assert(g1.head._3 > 3.5 && g1.head._3 <= 4.05)
    assert(math.abs(g1.map(t => t._2 * t._2).sum - 1.0) < 1e-6)
    // all-identical vectors: covariance 0 — the norm guard reads the
    // whole eigenpair as exactly 0 instead of dividing by zero
    val flat = Seq(
      (0L, Array(0.5f, 0.5f, 0.5f)),
      (1L, Array(0.5f, 0.5f, 0.5f))).toDF("vec_id", "embedding")
    Similarity.ssPower(flat).collect().foreach { r =>
      assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0)
    }
    // oracle form: 64 dims, unit-norm loading, positive eigenvalue
    val orc = Similarity.ssPower(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    assert(orc.map(_._1).toSeq == (0 until 64))
    assert(math.abs(orc.map(t => t._2 * t._2).sum - 1.0) < 1e-5)
    assert(orc.head._3 > 0.0)
  }

  test("ssPowerFold: the per-partition outer-product fold is bit-identical to the SQL Gram") {
    import spark.implicits._
    // multi-partition input forces real partial merging; values with
    // non-terminating 9-dp products exercise the rounding lattice
    val emb = (0L until 300L).map { id =>
      (id, Array.tabulate(5)(d =>
        (math.sin(id * 0.37 + d) * 0.91).toFloat))
    }.toDF("vec_id", "embedding").repartition(7)
    val a = Similarity.ssPower(emb).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    val b = Similarity.ssPowerFold(emb).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    assert(a.toSeq == b.toSeq && a.nonEmpty)
    // and on the real table
    val raw = graft.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings")
    val c = Similarity.ssPower(raw).collect().map(_.toSeq)
    val d = Similarity.ssPowerFold(raw).collect().map(_.toSeq)
    assert(c.toSeq == d.toSeq)
  }

  test("ssDimvar: dead, constant and live dimensions read their exact marginals") {
    import spark.implicits._
    // dim0 live (1,3): mean 2, var 1, active; dim1 dead zeros;
    // dim2 constant 0.5: var 0 but fully active — the three regimes
    // the audit exists to separate
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.5f)),
      (1L, Array(3.0f, 0.0f, 0.5f))).toDF("vec_id", "embedding")
    val got = Similarity.ssDimvar(emb).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      (0, 2L, 2.0, 1.0, 1.0),
      (1, 2L, 0.0, 0.0, 0.0),
      (2, 2L, 0.5, 0.0, 1.0)))
    // oracle form: one row per dimension, all dims present, counts full
    val orc = Similarity.ssDimvar(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(3), r.getDouble(4)))
    assert(orc.map(_._1).toSeq == (0 until 64))
    orc.foreach { case (_, n, v, af) =>
      assert(n == 500L && v > 0.0 && af > 0.0 && af <= 1.0)
    }
  }

  test("ssMips: raw-dot ranking diverges from cosine where magnitude wins") {
    import spark.implicits._
    // neighbor 10 points EXACTLY along the query but is short; neighbor
    // 11 is 40° off but 10× longer — MIPS must prefer 11, cosine 10
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (10L, Array(0.5f, 0.0f)),
      (11L, Array(7.66f, 6.43f))).toDF("vec_id", "embedding")
    val mips = Similarity.ssMips(spark, emb, "vec_id = 0", k = 2).collect()
      .map(r => (r.getLong(1), r.getLong(3)))
    assert(mips.toSeq == Seq((11L, 1L), (10L, 2L)))
    // oracle form: 5 queries × 10 ranked rows, scores non-increasing
    val orc = Similarity.ssMips(spark, "/root/testdata/sf0.001").collect()
    assert(orc.length == 50)
    orc.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val ips = rows.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(ips.zip(ips.tail).forall { case (a, b) => a >= b })
    }
  }

  test("ssMipsAugmentOn: cosine on augmented vectors IS the MIPS ranking") {
    import spark.implicits._
    // deterministic unnormalized vectors with distinct dots vs each query
    val rng = new scala.util.Random(7)
    val emb = (0L until 40L).map { i =>
      (i, Array.fill(8)((rng.nextDouble() * 4 - 2).toFloat))
    }.toDF("vec_id", "embedding")
    val aug = Similarity.ssMipsAugmentOn(spark, emb)
    // augmented last coordinate completes every norm to the corpus max
    val norms = aug.selectExpr("vec_id",
      "round(sqrt(graft_dot(v_aug, v_aug)), 4) AS n").collect()
      .map(_.getDouble(1)).distinct
    assert(norms.length == 1, s"augmented norms not constant: ${norms.toSeq}")
    // cosine top-k over (query zero-padded, corpus augmented) must equal
    // the raw-dot top-k — the reduction the 100 TB ANN path rides
    val augEmb = aug.selectExpr("vec_id",
      "transform(v_aug, x -> CAST(x AS FLOAT)) AS embedding")
    graft.functions.GraftFunctions.register(spark)
    emb.createOrReplaceTempView("__mips_q")
    augEmb.createOrReplaceTempView("__mips_c")
    val viaCos = spark.sql(
      """WITH q AS (SELECT vec_id,
        |             concat(transform(embedding, x -> CAST(x AS DOUBLE)),
        |                    array(CAST(0 AS DOUBLE))) AS v
        |           FROM __mips_q WHERE vec_id < 3),
        |c AS (SELECT vec_id,
        |        transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |      FROM __mips_c)
        |SELECT query_id, neighbor_id, rn FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |           ORDER BY graft_dot(q.v, c.v)
        |                    / sqrt(graft_dot(c.v, c.v)) DESC,
        |                  c.vec_id) AS rn
        |  FROM q JOIN c ON c.vec_id <> q.vec_id)
        |WHERE rn <= 5""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    val viaMips = Similarity.ssMips(spark, emb, "vec_id < 3", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(viaCos == viaMips)
  }

  test("ssMmr: diversity beats redundancy exactly where the formula says") {
    import spark.implicits._
    // query along e1; A1/A2 nearly identical at +37 degrees (rel ~0.80),
    // B mirrored at -38 degrees (rel ~0.79, sim to A1 only ~0.26).
    // Plain top-2 = [A1, A2]; MMR at lambda=0.7 picks B second: A2
    // scores 0.7*0.80 - 0.3*~1.0 = 0.26 while B scores
    // 0.7*0.79 - 0.3*0.26 = 0.47 — redundancy loses
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.8f, 0.6f)),    // A1
      (2L, Array(0.8f, 0.601f)),  // A2 (near-duplicate of A1)
      (3L, Array(0.79f, -0.613f)) // B (diverse)
    ).toDF("vec_id", "embedding")
    val got = Similarity.ssMmr(spark, emb, queryId = 0L, k = 3,
      lambda = 0.7).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 1L), (2L, 3L), (3L, 2L)), got.toSeq)
    // oracle form: 8 contiguous ranks, no repeats, scores nonincreasing
    // only within the greedy contract (NOT globally monotone — assert
    // shape, not order)
    val orc = Similarity.ssMmr(spark, "/root/testdata/sf0.001").collect()
    assert(orc.length == 8 && orc.map(_.getLong(0)).toSeq == (1L to 8L))
    assert(orc.map(_.getLong(1)).distinct.length == 8)
  }

  test("ssMipsAugment -> IVF composition: the sublinear MIPS path recalls") {
    import spark.implicits._
    // clustered unnormalized vectors so IVF cells are meaningful: 4
    // lobes at distinct directions AND magnitudes, 50 vectors each
    val rng = new scala.util.Random(11)
    val lobes = Seq(
      Array(3.0, 0.0, 0.0, 0.0), Array(0.0, 1.5, 0.0, 0.0),
      Array(0.0, 0.0, 2.2, 0.0), Array(0.0, 0.0, 0.0, 0.8))
    val emb = (0L until 200L).map { i =>
      val c = lobes((i % 4).toInt)
      (i, c.map(x => (x + rng.nextGaussian() * 0.1).toFloat))
    }.toDF("vec_id", "embedding")
    // corpus side augmented, query side zero-padded — shipped through
    // the STANDARD IVF entry (nlist=8, nprobe=4) as embedding columns
    val aug = Similarity.ssMipsAugmentOn(spark, emb)
      .selectExpr("vec_id", "transform(v_aug, x -> CAST(x AS FLOAT)) AS embedding")
    val qaug = emb.selectExpr("vec_id",
      """transform(concat(transform(embedding, x -> CAST(x AS DOUBLE)),
        |  array(CAST(0 AS DOUBLE))), x -> CAST(x AS FLOAT)) AS embedding"""
        .stripMargin)
    val both = aug.filter("vec_id >= 4")
      .unionAll(qaug.filter("vec_id < 4")) // 4 query rows, zero-padded
    val ivf = Similarity.ssIvfAnnOn(spark, both, "n.vec_id < 4", topK = 10,
      nlist = 8, nprobe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    val brute = Similarity.ssMips(spark, emb, "vec_id < 4", k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    // recall@10 of the augmented-IVF route vs exact MIPS, averaged
    val recalls = brute.keys.toSeq.map { q =>
      val want = brute(q).map(_._2).toSet
      val got = ivf.getOrElse(q, Array.empty).map(_._2).toSet
      want.intersect(got).size.toDouble / want.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"augmented-IVF MIPS recall@10 $mean (want >= 0.8)")
  }

  test("ssKmeansPp: picks are distinct and each d2 is the true min " +
      "squared distance to the prior picks") {
    val sf = "/root/testdata/sf0.001"
    val got = Similarity.ssKmeansPp(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == (1L to 8L) &&
      got.map(_._2).distinct.length == 8)
    // in-memory replay of the rounded-9 distance lattice
    val vecs = graft.Tables.load(spark, sf, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) v")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def r9(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    def dot(a: Array[Double], b: Array[Double]) = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def d2(a: Array[Double], b: Array[Double]) =
      r9(r9(dot(a, a)) - 2 * dot(a, b) + r9(dot(b, b)))
    for (t <- 2 to 8) {
      val x = vecs(got(t - 1)._2)
      val expect = got.take(t - 1).map(p => d2(x, vecs(p._2))).min
      assert(math.abs(got(t - 1)._3 - expect) < 1e-9,
        s"rank $t d2 ${got(t - 1)._3} != replay $expect")
      assert(got(t - 1)._3 > 0)
    }
  }

  test("train-once codebook: every pretrained consumer is row-identical to its inline twin") {
    val rng = new Random(77)
    val dim = 64
    val rows = for {
      c <- 0 until 8
      center = unit(rng, dim)
      m <- 0 until 25
    } yield {
      val noise = unit(rng, dim)
      val v = center.zip(noise).map { case (a, b) => a + 0.2 * b }
      (c * 1000L + m, v)
    }
    val emb = toEmb(rows)
    // the codebook: deterministic chain, nlist rows, and the parquet
    // round trip (the production storage hop) is bit-exact
    val trained = Similarity.ssIvfTrain(spark, emb, 16)
    val cent = Similarity.parquetRoundTrip(spark, trained,
      "graft_spec_pre_cent")
    assert(cent.count() == 16)
    assert(trained.orderBy("cid").collect().map(_.toString).toSeq ==
      cent.orderBy("cid").collect().map(_.toString).toSeq)
    val pre = Some(cent)
    def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq
    val pred = "n.vec_id % 1000 = 0"
    assert(rowsOf(Similarity.ssIvfAnnOn(spark, emb, pred, 5)) ==
      rowsOf(Similarity.ssIvfAnnOn(spark, emb, pred, 5, pretrained = pre)),
      "ss_ivf_ann pretrained != inline")
    // PQ sub-codebook hoist (ssPqTrain): flat PQ and the full IVF-PQ
    // composition with BOTH quantizers pretrained
    val cbPq = Some(Similarity.parquetRoundTrip(spark,
      Similarity.ssPqTrain(spark, emb), "graft_spec_pre_cb"))
    assert(rowsOf(Similarity.ssPqTopkOn(spark, emb, "vec_id % 1000 = 0", 5)) ==
      rowsOf(Similarity.ssPqTopkOn(spark, emb, "vec_id % 1000 = 0", 5,
        pretrainedPq = cbPq)),
      "ss_pq pretrainedPq != inline")
    assert(rowsOf(Similarity.ssIvfPqTopkOn(spark, emb, "vec_id % 1000 = 0", 5)) ==
      rowsOf(Similarity.ssIvfPqTopkOn(spark, emb, "vec_id % 1000 = 0", 5,
        pretrained = pre, pretrainedPq = cbPq)),
      "ss_ivfpq both-pretrained != inline")
    assert(rowsOf(Similarity.ssRqTopkOn(spark, emb, "vec_id % 1000 = 0", 5,
        nprobe = 2)) ==
      rowsOf(Similarity.ssRqTopkOn(spark, emb, "vec_id % 1000 = 0", 5,
        nprobe = 2, pretrained = pre)),
      "ss_ivfrq pretrained != inline")
    // RQ residual-codebook hoist: the PAIR (centroids, residual cbs)
    // trained standalone against the same coarse codebook
    val rcb = Some(Similarity.parquetRoundTrip(spark,
      Similarity.ssRqTrain(spark, emb, 16, pretrained = pre),
      "graft_spec_pre_rcb"))
    assert(rowsOf(Similarity.ssRqTopkOn(spark, emb, "vec_id % 1000 = 0", 5,
        nprobe = 2)) ==
      rowsOf(Similarity.ssRqTopkOn(spark, emb, "vec_id % 1000 = 0", 5,
        nprobe = 2, pretrained = pre, pretrainedRq = rcb)),
      "ss_ivfrq pair-pretrained != inline")
    assert(rowsOf(Similarity.ssBqTopkOn(spark, emb, "vec_id % 1000 = 0", 5,
        nprobe = 2)) ==
      rowsOf(Similarity.ssBqTopkOn(spark, emb, "vec_id % 1000 = 0", 5,
        nprobe = 2, pretrained = pre)),
      "ss_ivfbq pretrained != inline")
    assert(rowsOf(graft.ops.Pipeline.dsD4(spark, emb, nlist = 16)) ==
      rowsOf(graft.ops.Pipeline.dsD4(spark, emb, pretrained = pre)),
      "ds_d4 pretrained != inline")
    val embD = emb.selectExpr("vec_id",
      "transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding")
    assert(rowsOf(Dedup.ddSemDedupOn(spark, embD, 16, 0.9)) ==
      rowsOf(Dedup.ddSemDedupOn(spark, embD, 16, 0.9, pretrained = pre)),
      "dd_semdedup pretrained != inline")
  }
}
