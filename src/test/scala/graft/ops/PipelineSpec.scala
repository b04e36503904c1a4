package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("dd_resolve: canonical ids are transitive cluster minima") {
    val pairs = Dedup.ddSimhashPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val canon = Pipeline.ddResolve(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pairs.nonEmpty && canon.nonEmpty)
    // every paired doc resolves, to an id <= itself, and pair-mates agree
    pairs.foreach { case (a, b) =>
      assert(canon.contains(a) && canon.contains(b))
      assert(canon(a) == canon(b), s"pair ($a,$b) split across clusters")
      assert(canon(a) <= a)
    }
    // a canonical id is its own canonical id (keep-first is idempotent)
    canon.values.foreach(c => assert(canon(c) == c))
    // transitivity beyond direct pairs: chains a~b, b~c collapse
    val viaChain = pairs.groupBy(_._1).view.mapValues(_.map(_._2))
    for ((a, bs) <- viaChain; b <- bs; c <- viaChain.getOrElse(b, Array.empty[Long]))
      assert(canon(a) == canon(c), s"chain $a~$b~$c not collapsed")
  }

  test("ta_chunk: window arithmetic matches the token counts") {
    val nTokens = TextAnalysis.taTokens(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = Pipeline.taChunk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3)))
    val byDoc = chunks.groupBy(_._1)
    assert(byDoc.keySet == nTokens.keySet)
    for ((doc, cs) <- byDoc) {
      val len = nTokens(doc)
      val expected = 1 + (if (len > 32) (len - 32 + 23) / 24 else 0)
      assert(cs.length == expected, s"doc $doc: ${cs.length} chunks for $len tokens")
      // all but possibly the last chunk are full windows; none exceed 32
      assert(cs.forall(_._3 <= 32))
      assert(cs.sortBy(_._2).dropRight(1).forall(_._3 == 32))
      // chunk text round-trips its token count
      cs.foreach(c => assert(c._4.split(" ").length == c._3))
    }
  }

  test("ta_redact: no PII survives redaction; synthesized PII is detected") {
    val rows = Pipeline.taRedact(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nEmails, nPhones, red) =>
      assert(!red.matches(".*[a-z0-9]+@[a-z]+\\.[a-z]+.*"), s"email survived in $id")
      assert(!red.contains("+1-555-"), s"phone survived in $id")
      if (id % 3 == 0) {
        assert(nEmails >= 1 && nPhones >= 1, s"synthesized PII missed in $id")
        assert(red.contains("<EMAIL>") && red.contains("<PHONE>"))
      }
    }
  }

  test("dd_decontam: matches an in-memory 13-gram overlap oracle") {
    // recompute the whole construction in memory (500 docs at sf0.001):
    // corpus = docs + 80%-prefix twins, eval = tokens 6..26 of docs with
    // doc_id % 11 = 0, contamination = shared distinct 13-token gram
    val docs = graft.Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    def grams(toks: Array[String]): Set[String] =
      if (toks.length < 13) Set.empty
      else (0 to toks.length - 13).map(i => toks.slice(i, i + 13).mkString(" ")).toSet
    val corpus = docs.map { case (id, t) => id -> grams(t) } ++
      docs.map { case (id, t) =>
        (id + Pipeline.TwinIdOffset) -> grams(t.take(t.length * 4 / 5)) }
    val eval = docs.collect { case (id, t) if id % 11 == 0 =>
      id -> grams(t.slice(5, 26)) }
    val expected = corpus.flatMap { case (id, gs) =>
      val hits = eval.count { case (_, egs) => gs.exists(egs) }
      if (hits > 0) Some(id -> hits.toLong) else None
    }.sortBy(_._1)
    val got = Pipeline.ddDecontam(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty)
    assert(got.toSeq == expected.toSeq)
    // recall by construction: every eval doc long enough to emit a gram
    // is contaminated by its own corpus copy
    val flagged = got.map(_._1).toSet
    eval.filter(_._2.nonEmpty).foreach { case (id, _) =>
      assert(flagged(id), s"eval doc $id not flagged") }
  }

  test("ddDecontam(train, eval): parameterized entry against an external eval fixture") {
    import spark.implicits._
    // a real pipeline feeds an ACTUAL benchmark set — here a committed
    // fixture file, not a carve-out of the corpus
    val train = Seq(
      1L -> ("the quick brown fox jumps over the lazy dog while seven " +
        "wizards brew strong coffee at dawn"),
      2L -> ("red orange yellow green blue indigo violet cyan magenta " +
        "teal maroon olive navy silver gold"),
      3L -> ("alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu brown fox jumps over the lazy dog while seven " +
        "wizards brew strong coffee")
    ).toDF("doc_id", "text")
    val eval = spark.read
      .text(getClass.getResource("/fixtures/decontam_eval.txt").getPath)
      .selectExpr("CAST(split(value, '\t')[0] AS BIGINT) AS eval_id",
        "split(value, '\t')[1] AS text")
    assert(eval.count() == 2)
    // doc 1 embeds eval 900's 13-token snippet (one hit); doc 2 is clean;
    // doc 3 embeds both snippets (two hits)
    val got = Pipeline.ddDecontam(train, eval, n = 13).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq(1L -> 1L, 3L -> 2L))
    // gram width is honored: 14-grams cannot exist in 13-token snippets
    assert(Pipeline.ddDecontam(train, eval, n = 14).count() == 0L)
  }

  private def fixtureCorpus(): Seq[(Long, String)] = {
    val src = scala.io.Source.fromFile(
      getClass.getResource("/fixtures/pipeline_corpus.txt").getPath)
    try src.getLines().toList.map { l =>
      val Array(id, text) = l.split("\\|", 2); (id.toLong, text)
    } finally src.close()
  }

  test("taDerep(docs): parameterized entry matches an in-memory oracle on a fixture corpus") {
    import spark.implicits._
    val docs = fixtureCorpus()
    val got = TextAnalysis.taDerep(docs.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val expected = docs.flatMap { case (id, text) =>
      val gs = text.split(" ").sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSeq
      if (gs.isEmpty) None
      else Some((id, gs.size.toLong, gs.distinct.size.toLong,
        BigDecimal(1.0 - gs.distinct.size.toDouble / gs.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    assert(got == expected.sortBy(_._1))
    // the repetitive fixture doc scores visibly high; prose scores 0
    assert(got.find(_._1 == 2L).exists(_._4 > 0.5))
    assert(got.find(_._1 == 1L).exists(_._4 == 0.0))
    // the 2-token doc carries no grams and is absent
    assert(!got.exists(_._1 == 3L))
  }

  test("taRedact(docs, rules): caller-supplied rule set on a fixture corpus") {
    import spark.implicits._
    val docs = fixtureCorpus()
    val got = Pipeline.taRedact(docs.toDF("doc_id", "text"), Seq(
        Pipeline.RedactRule("ssn", "[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
        Pipeline.RedactRule("tickets", "[A-Z]{2}-[0-9]{4}", "<TICKET>")))
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3))))
      .toMap
    assert(got.keySet == docs.map(_._1).toSet) // every doc, redacted or not
    assert(got(4L) == ((2, 1,
      "report SSN <SSN> and ticket <TICKET> filed SSN <SSN>")))
    assert(got(5L) == ((0, 0, "clean line with no sensitive tokens at all")))
    // rule-set is caller-defined: the oracle query's PII rules don't leak in
    assert(!got.values.exists(v => v._3.contains("<EMAIL>")))
  }

  test("dsMix(docs, rates): caller-supplied taxonomy and rates") {
    import spark.implicits._
    val srcs = Vector("wiki", "crawl", "forum")
    val rows = (0L until 300L).map(i => (i, srcs((i % 3).toInt))) :+
      ((1000L, "unlisted")) // absent from the rate map -> dropped
    val rates = Map("wiki" -> 1.0, "crawl" -> 0.25, "forum" -> 0.0)
    val got = Pipeline.dsMix(rows.toDF("doc_id", "source"), rates).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    // independent oracle: same md5 draw recomputed with MessageDigest
    def draw(id: Long): Int = {
      val hex = md5hex(s"mix:$id")
      "0123456789abcdef".indexOf(hex(0)) * 16 +
        "0123456789abcdef".indexOf(hex(1))
    }
    val expected = rows.flatMap { case (i, src) =>
      val thr = math.floor(rates.getOrElse(src, 0.0) * 256).toInt
      if (draw(i) < thr) Some((i, src)) else None
    }
    assert(got == expected.sortBy(_._1))
    assert(got.count(_._2 == "wiki") == 100)  // rate 1.0 keeps every doc
    assert(!got.exists(_._2 == "forum"))      // rate 0.0 drops every doc
    assert(!got.exists(_._2 == "unlisted"))   // unmapped source dropped
    val crawl = got.count(_._2 == "crawl")
    assert(crawl > 0 && crawl < 50, s"crawl kept $crawl of 100 at rate 0.25")
  }

  test("ta_df: matches an in-memory document-frequency oracle") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    val n = docs.length
    val df = docs.flatMap { case (_, t) => t.distinct }.groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val tf = docs.flatMap(_._2).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val expected = df.collect { case (tok, d) if d * 10 >= n => (tok, d, tf(tok)) }
      .toSeq.sortBy(_._1)
    val got = TextAnalysis.taDf(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty) // stopword-tier tokens must qualify at any SF
    assert(got == expected)
  }

  test("ta_tfidf: matches an in-memory top-3 keyword oracle") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    val df = docs.flatMap { case (_, t) => t.distinct }.groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val expected = docs.flatMap { case (id, toks) =>
      toks.groupBy(identity).view.mapValues(_.length.toLong).toSeq
        .map { case (tok, tf) => (tok, tf, df(tok), tf.toDouble / df(tok)) }
        .sortBy { case (tok, _, _, score) => (-score, tok) }
        .take(3).zipWithIndex
        .map { case ((tok, tf, d, _), i) => (id, tok, tf, d, (i + 1).toLong) }
    }.sortBy(t => (t._1, t._5))
    val got = TextAnalysis.taTfidf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getInt(4).toLong)).toSeq
    assert(got.nonEmpty)
    assert(got == expected.toSeq)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("ds_pack: matches an in-memory contiguous-fill packing oracle") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "size(split(text, ' ')) AS n").collect()
      .map(r => r.getLong(0) -> r.getInt(1))
    val expected = docs
      .map { case (id, n) =>
        (id, "0123456789abcdef".indexOf(md5hex(s"pack:$id").head).toLong, n) }
      .groupBy(_._2).toSeq.flatMap { case (bucket, rows) =>
        var cum = 0L
        rows.sortBy(_._1).map { case (id, _, n) =>
          val packId = cum / 256; cum += n; (id, bucket, n.toLong, packId) }
      }.sortBy(_._1)
    val got = Pipeline.dsPack(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2).toLong, r.getLong(3))).toSeq
    assert(got.map(t => (t._1, t._2.toLong, t._3, t._4)) == expected)
    // non-vacuity: the budget actually rolls over into multiple packs
    assert(got.map(_._4).max >= 1, "packing never exceeded one budget")
  }

  test("ds_split: deterministic, total, and near the 75/12.5/12.5 design") {
    val a = Pipeline.dsSplit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(3)))
    val b = Pipeline.dsSplit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(3)))
    assert(a.toSeq == b.toSeq) // reproducible
    val n = a.length.toDouble
    val frac = a.groupBy(_._2).view.mapValues(_.length / n).toMap
    assert(a.map(_._1).distinct.length == a.length) // each doc exactly once
    assert(math.abs(frac("train") - 0.75) < 0.08, frac.toString)
    assert(math.abs(frac.getOrElse("val", 0.0) - 0.125) < 0.06, frac.toString)
    assert(math.abs(frac.getOrElse("test", 0.0) - 0.125) < 0.06, frac.toString)
  }

  test("ds_sample: exact per-stratum k, deterministic, hash-min selection") {
    val rows = Pipeline.dsSample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3)))
    assert(rows.nonEmpty)
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "lang", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val strata = docs.groupBy(t => (t._2, t._3)).view.mapValues(_.map(_._1))
    for (((lang, src), got) <- rows.groupBy(t => (t._2, t._3))) {
      val pool = strata((lang, src))
      // exact size: min(k, stratum size); ranks contiguous from 1
      assert(got.length == math.min(5, pool.length), s"stratum ($lang,$src)")
      assert(got.map(_._4).sorted.toSeq == (1 to got.length))
      // selection = the k hash-smallest members of the stratum
      val expect = pool.sortBy(id => (md5hex(s"sample:$id"), id)).take(5).toSet
      assert(got.map(_._1).toSet == expect, s"stratum ($lang,$src) picks")
    }
    val again = Pipeline.dsSample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3)))
    assert(rows.toSeq == again.toSeq)
  }

  test("ta_derep: planted repetition scores above the natural baseline") {
    val rows = TextAnalysis.taDerep(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val nDocs = graft.Tables.load(spark, sf, "documents").count()
    assert(rows.length.toLong == nDocs) // every doc scored
    assert(rows.forall { case (_, n, d, ratio) =>
      d <= n && ratio >= 0.0 && ratio <= 1.0 })
    val (rep, clean) = rows.partition(_._1 % 5 == 0)
    def meanRatio(xs: Array[(Long, Long, Long, Double)]) =
      xs.map(_._4).sum / xs.length
    // the synthesized 2x-appended 8-token prefix must lift the duplicate-
    // 3-gram fraction well above the small-vocabulary natural baseline
    assert(meanRatio(rep) > meanRatio(clean) + 0.05,
      s"rep=${meanRatio(rep)} clean=${meanRatio(clean)}")
  }

  test("ds_interleave: matches an in-memory proportional-fill replay") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.map { case (id, src) =>
      val hx = md5hex(s"il:$id")
      (id, src, "0123456789abcdef".indexOf(hx(0)), hx)
    }.groupBy(_._3).toSeq.flatMap { case (shard, rows) =>
      val ranked = rows.groupBy(_._2).toSeq.flatMap { case (src, rs) =>
        val w = src.stripPrefix("src").toInt + 1
        rs.sortBy(r => (r._4, r._1)).zipWithIndex
          .map { case (r, i) => (r._1, src, (i + 1).toDouble / w) }
      }
      ranked.sortBy { case (id, src, key) => (key, src, id) }.zipWithIndex
        .map { case ((id, src, _), p) => (id, src, shard, (p + 1).toLong) }
    }.sortBy(t => (t._3, t._4))
    val got = Pipeline.dsInterleave(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3).toLong))
      .toSeq
    assert(got == expected && got.nonEmpty)
  }

  test("dsInterleave(docs, weights): heavier sources fill faster in every prefix") {
    import spark.implicits._
    val rows = (0L until 120L).map(i => (i, "alpha")) ++
      (1000L until 1120L).map(i => (i, "beta")) ++
      (2000L until 2020L).map(i => (i, "gamma")) // unmapped -> dropped
    val got = Pipeline.dsInterleave(rows.toDF("doc_id", "source"),
        Map("alpha" -> 3, "beta" -> 1)).collect()
      .map(r => (r.getString(1), r.getInt(2), r.getInt(3)))
    assert(!got.exists(_._1 == "gamma"))
    assert(got.count(_._1 == "alpha") == 120 && got.count(_._1 == "beta") == 120)
    // weight-3 alpha places its k-th doc at key k/3 vs beta's k: at every
    // shard prefix alpha count >= beta count until alpha exhausts
    got.groupBy(_._2).foreach { case (shard, rs) =>
      val inOrder = rs.sortBy(_._3).map(_._1)
      val nAlpha = inOrder.count(_ == "alpha")
      var (a, b) = (0, 0)
      inOrder.foreach { src =>
        if (src == "alpha") a += 1 else b += 1
        assert(a >= b || a == nAlpha,
          s"shard $shard prefix a=$a b=$b of ${inOrder.mkString(",")}")
      }
    }
  }

  test("ev_retention: matches an in-memory cohort replay") {
    val active = graft.Tables.load(spark, sf, "events")
      .selectExpr("user_id", "unix_micros(ts) div 86400000000 AS day")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val cohort = active.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val sizes = cohort.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // (u, day) is distinct, so each user hits a (cohort, offset) cell at
    // most once -> the group size IS the distinct-user count
    val expected = active.map { case (u, d) => (cohort(u), d - cohort(u)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((cd, off), n) =>
        (cd, off, n, sizes(cd),
          BigDecimal(n.toDouble / sizes(cd))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.sortBy(t => (t._1, t._2))
    val got = Sessionize.evRetention(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == expected && got.nonEmpty)
    // day-0 cells retain the whole cohort by construction
    got.filter(_._2 == 0L).foreach(c => assert(c._3 == c._4 && c._5 == 1.0))
  }

  test("evRetention(events): parameterized entry on a hand-built activity log") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // u1 and u2 join day D, u3 joins D+1; u1 returns on D+1 (twice, same
    // day -> dedups), u3 returns on D+3
    val evs = Seq(
      (1L, ts("2024-06-01 10:00:00")), (1L, ts("2024-06-02 09:00:00")),
      (1L, ts("2024-06-02 11:00:00")),
      (2L, ts("2024-06-01 12:00:00")),
      (3L, ts("2024-06-02 08:00:00")), (3L, ts("2024-06-04 08:00:00"))
    ).toDF("user_id", "ts")
    val got = Sessionize.evRetention(evs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    val d1 = got.head._1 // epoch-day of 2024-06-01
    assert(got == Seq(
      (d1, 0L, 2L, 2L, 1.0),      // both D-cohort users active day 0
      (d1, 1L, 1L, 2L, 0.5),      // only u1 returns next day
      (d1 + 1, 0L, 1L, 1L, 1.0),  // u3's own cohort day
      (d1 + 1, 2L, 1L, 1L, 1.0))) // u3 back two days later
  }

  test("ev_attribution: matches an in-memory last-touch replay") {
    val evs = graft.Tables.load(spark, sf, "events")
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS us", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expected = evs.groupBy(_._1).toSeq.flatMap { case (user, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      var lastClick: Option[(Long, Long)] = None
      var lastView: Option[(Long, Long)] = None
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, String, Option[Long])]
      for ((_, id, us, tpe) <- sorted) {
        if (tpe == "purchase") out += ((user, id,
          if (lastClick.isDefined) "click"
          else if (lastView.isDefined) "view" else "organic",
          lastClick.orElse(lastView).map(_._1)))
        if (tpe == "click") lastClick = Some((id, us))
        if (tpe == "view") lastView = Some((id, us))
      }
      out
    }.sortBy(t => (t._1, t._2))
    val got = Sessionize.evAttribution(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(4),
        Option(r.get(5)).map(_.asInstanceOf[Long]))).toSeq
    assert(got == expected && got.nonEmpty)
    // non-vacuous across the branch space: all three touch types occur
    assert(Set("click", "view", "organic").subsetOf(got.map(_._3).toSet))
  }

  test("evFunnel(events, steps): caller-defined step chain, any depth") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // a 2-step signup->purchase funnel the fixed 3-step query can't express
    val evs = Seq(
      (1L, ts("2024-06-01 10:00:00"), "signup"),
      (1L, ts("2024-06-01 11:00:00"), "purchase"),
      (2L, ts("2024-06-01 09:00:00"), "purchase"), // before signup: no count
      (2L, ts("2024-06-01 10:00:00"), "signup"),
      (3L, ts("2024-06-01 12:00:00"), "purchase")  // never signed up: absent
    ).toDF("user_id", "ts", "event_type")
    val got = Sessionize.evFunnel(evs, Seq("signup", "purchase")).collect()
      .map(r => (r.getLong(0), r.getInt(3))).toMap
    assert(got == Map(1L -> 2, 2L -> 1))
    // 4-step chain on the corpus: depth can only shrink vs the 3-step
    // prefix (monotone funnel property)
    val d3 = Sessionize.evFunnel(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(4)).toMap
    val d4 = Sessionize.evFunnel(
      graft.Tables.load(spark, sf, "events"),
      Seq("view", "click", "purchase", "click")).collect()
      .map(r => r.getLong(0) -> r.getInt(5)).toMap
    assert(d4.keySet == d3.keySet)
    d3.foreach { case (u, d) =>
      assert(d4(u) >= d, s"user $u: 4-step depth ${d4(u)} below prefix $d")
      assert(d4(u) <= d + 1)
    }
    // non-vacuous: someone clicked again after purchasing
    assert(d4.values.exists(_ == 4))
  }

  test("ev_paths: matches an in-memory session-trigram replay") {
    val evs = graft.Tables.load(spark, sf, "events")
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trigrams = evs.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      // split into 30-min-gap sessions, emit consecutive type trigrams
      val sessions = sorted.foldLeft(List.empty[List[(Long, String)]]) {
        case (acc, (_, us, _, tpe)) => acc match {
          case (cur @ ((lastUs, _) :: _)) :: rest
            if us - lastUs <= Sessionize.GapMicros =>
            ((us, tpe) :: cur) :: rest
          case _ => List((us, tpe)) :: acc
        }
      }.map(_.reverse.map(_._2))
      sessions.flatMap(types => types.sliding(3).filter(_.size == 3)
        .map(_.mkString(">")))
    }
    val expected = trigrams.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.map { case (p, n) => (p, n) }
      .sortBy { case (p, n) => (-n, p) }.take(10)
    val got = Sessionize.evPaths(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected && got.nonEmpty)
  }

  test("evPaths(events, gapMicros, k): caller-set gap splits the path") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // four events 10 min apart: one session at a 30-min gap (two
    // trigrams), but a 5-min gap isolates every event (no trigram)
    val evs = Seq(
      (1L, ts("2024-06-01 10:00:00"), 1L, "view"),
      (1L, ts("2024-06-01 10:10:00"), 2L, "click"),
      (1L, ts("2024-06-01 10:20:00"), 3L, "view"),
      (1L, ts("2024-06-01 10:30:00"), 4L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val wide = Sessionize.evPaths(evs, 30L * 60 * 1000000, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(wide == Set(("view>click>view", 1L), ("click>view>purchase", 1L)))
    assert(Sessionize.evPaths(evs, 5L * 60 * 1000000, k = 10).count() == 0)
    // k truncates
    assert(Sessionize.evPaths(evs, 30L * 60 * 1000000, k = 1).count() == 1)
  }

  test("dsQualityFilter: exact per-source ceil(frac*n) keep, score-ranked") {
    import spark.implicits._
    val scored = Seq(
      // src "a": 3 docs, keep ceil(1.5)=2 — the two highest scores
      (1L, "a", 0.9), (2L, "a", 0.1), (3L, "a", 0.5),
      // src "b": 1 doc, keep ceil(0.5)=1 — a tiny source never empties
      (4L, "b", 0.0),
      // src "c": tie on score — doc_id breaks it deterministically
      (5L, "c", 0.7), (6L, "c", 0.7), (7L, "c", 0.2))
      .toDF("doc_id", "source", "score")
    val kept = Pipeline.dsQualityFilter(scored, "score", 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L, 5L, 6L))
    // keepFrac=1.0 keeps everything; the schema passes through untouched
    val all = Pipeline.dsQualityFilter(scored, "score", 1.0)
    assert(all.count() == 7 && all.columns.toSeq ==
      Seq("doc_id", "source", "score"))
    // oracle-form sanity: exactly ceil(n/2) of every source survives
    val frac = Pipeline.dsQualityFilter(spark, sf)
      .groupBy("source").count().collect()
    val full = graft.Tables.load(spark, sf, "documents")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(frac.nonEmpty && frac.forall(r =>
      r.getLong(1) == (full(r.getString(0)) + 1) / 2))
  }

  test("ddResolve(pairs): caller pairs resolve to min-id canon clusters") {
    import spark.implicits._
    // {1,2,3} chained, {10,11} direct, 20 unpaired (absent from output)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val got = Pipeline.ddResolve(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    assert(Pipeline.ddResolve(
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")).count() == 0)
  }

  test("taGopher: signals and the keep flag on hand-built documents") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps"),        // healthy: keep
      (2L, "aa aa aa aa aa aa aa aa aa aa"),    // TTR 0.1 <= 0.2: drop
      (3L, "x y z w"),                          // mean word len 1 < 3: drop
      (4L, "#### #### #### normal words"))      // symbol-heavy: drop
      .toDF("doc_id", "text")
    val got = TextAnalysis.taGopher(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getBoolean(5))
    assert(got(1L).getDouble(3) == 1.0) // 5 distinct / 5 tokens
    assert(!got(2L).getBoolean(5) && got(2L).getDouble(3) == 0.1)
    assert(!got(3L).getBoolean(5) && got(3L).getDouble(2) == 1.0)
    assert(!got(4L).getBoolean(5) &&
      got(4L).getDouble(4) > 0.1) // 12 symbols / 27 chars
  }

  test("ev_funnel: strict-order depths match an in-memory replay") {
    val funnel = Sessionize.evFunnel(spark, sf).collect()
      .map(r => r.getLong(0) -> (Option(r.getTimestamp(1)),
        Option(r.getTimestamp(2)), Option(r.getTimestamp(3)), r.getInt(4)))
      .toMap
    val events = graft.Tables.load(spark, sf, "events")
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
    val byUser = events.groupBy(_._1)
    val expected = byUser.flatMap { case (u, evs) =>
      // strict >: Timestamp.compareTo is micros-exact (millis + nanos)
      def firstAfter(tpe: String, after: Option[java.sql.Timestamp]) = {
        val c = evs.filter(e => e._2 == tpe &&
          after.forall(a => e._3.compareTo(a) > 0))
        if (c.isEmpty) None
        else Some(c.map(_._3).minBy(t => (t.getTime, t.getNanos)))
      }
      firstAfter("view", None).map { tv =>
        val tc = firstAfter("click", Some(tv))
        val tp = tc.flatMap(t => firstAfter("purchase", Some(t)))
        u -> (Some(tv), tc, tp,
          if (tp.isDefined) 3 else if (tc.isDefined) 2 else 1)
      }
    }
    assert(funnel.keySet == expected.keySet)
    expected.foreach { case (u, want) =>
      assert(funnel(u) == want, s"user $u: ${funnel(u)} vs $want") }
    // non-vacuous: completions exist AND the strict ordering did real work
    // somewhere — some user's funnel click is LATER than their global first
    // click (an early click before the first view was excluded)
    assert(funnel.values.exists(_._4 == 3))
    val excluded = byUser.exists { case (u, evs) =>
      funnel.get(u).flatMap(_._2).exists { tc =>
        evs.exists(e => e._2 == "click" && e._3.compareTo(tc) < 0)
      }
    }
    assert(excluded, "strict ordering never excluded an early click")
  }

  test("ds_mix: per-source keep rates track the configured weights") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val kept = Pipeline.dsMix(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(kept.nonEmpty && kept.toSet.subsetOf(docs.toSet))
    // in-memory oracle: exact same hash threshold per doc
    val expect = docs.filter { case (id, src) =>
      val h = md5hex(s"mix:$id")
      val d = "0123456789abcdef".indexOf(h(0)) * 16 +
        "0123456789abcdef".indexOf(h(1))
      d < (src.stripPrefix("src").toInt + 1) * 256 / 10
    }.toSet
    assert(kept.toSet == expect)
    // rates are visibly ordered: src9 keeps (nearly) everything it has,
    // src0's keep fraction is far below it
    val byDocs = docs.groupBy(_._2).view.mapValues(_.length.toDouble)
    val byKept = kept.groupBy(_._2).view.mapValues(_.length.toDouble)
    val r0 = byKept.getOrElse("src0", 0.0) / byDocs("src0")
    val r9 = byKept.getOrElse("src9", 0.0) / byDocs("src9")
    assert(r9 > r0 + 0.3, s"src0=$r0 src9=$r9")
  }

  test("parameterized knobs: taChunk/dsPack/dsSample honor caller values") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 25).map(i => s"t$i").mkString(" ")), // 25 tokens
      (2L, "a b c")).toDF("doc_id", "text")
    // window 10 / stride 5: 25 tokens -> chunks at offsets 0,5,10,15
    // (ceil((25-10)/5)=3 +1); the 3-token doc yields one short chunk
    val chunks = Pipeline.taChunk(docs, window = 10, stride = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(chunks.count(_._1 == 1L) == 4)
    assert(chunks.filter(_._1 == 1L).map(_._3).toSeq == Seq(10, 10, 10, 10))
    assert(chunks.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 3)))
    // pack budget 8: doc lengths 25 and 3 -> cumulative fills shift packs
    val packs = Pipeline.dsPack(docs, budget = 8).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(packs.length == 2)
    // stratified k=1 returns exactly one row per stratum
    val strat = Seq((1L, "en", "s0"), (2L, "en", "s0"), (3L, "de", "s1"))
      .toDF("doc_id", "lang", "source")
    val k1 = Pipeline.dsSample(strat, k = 1).collect()
    assert(k1.length == 2 && k1.forall(_.getInt(3) == 1))
  }

  test("ddExactOn / ddMinhashLshOn: production entries on an unplanted corpus") {
    import spark.implicits._
    // 0 and 2 are byte-identical; 3 is a near-dup (one token changed) of
    // 0 with heavy shingle overlap; 4 is unrelated
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val near = (("w1x" +: (2 to 30).map(i => s"w$i"))).mkString(" ")
    val other = (1 to 30).map(i => s"z$i").mkString(" ")
    val docs = Seq((0L, base), (2L, base), (3L, near), (4L, other))
      .toDF("doc_id", "text")
    val kept = Dedup.ddExactOn(docs).collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 3L, 4L)) // keep-first drops the exact twin 2
    val pairs = Dedup.ddMinhashLshOn(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 2L)) && pairs.contains((0L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("evSessionize(events, gapMicros): caller-set gap changes the session split") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // two events 10 minutes apart: one session at a 30-min gap, two at 5
    val evs = Seq((7L, ts("2024-06-01 10:00:00"), 1L, 1.0),
      (7L, ts("2024-06-01 10:10:00"), 2L, 1.0))
      .toDF("user_id", "ts", "event_id", "value")
    assert(Sessionize.evSessionize(evs, 30L * 60 * 1000000).count() == 1)
    assert(Sessionize.evSessionize(evs, 5L * 60 * 1000000).count() == 2)
  }

  test("ev_active_users: matches an in-memory trailing-window replay") {
    val active = graft.Tables.load(spark, sf, "events")
      .selectExpr("user_id", "unix_micros(ts) div 86400000000 AS day")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val days = active.map(_._2).distinct.sorted
    val expected = days.map { d =>
      val dau = active.count(_._2 == d).toLong
      val wau = active.filter(a => a._2 >= d - 6 && a._2 <= d)
        .map(_._1).distinct.length.toLong
      (d, dau, wau, BigDecimal(dau.toDouble / wau)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq
    val got = Sessionize.evActiveUsers(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == expected && got.nonEmpty)
    // non-vacuous: the window did real work (wau > dau somewhere)
    assert(got.exists(r => r._3 > r._2))
  }

  test("evActiveUsers(events): parameterized entry pins the window semantics") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // u1 active day 0 only; u2 active days 0 and 8 (outside u1's window);
    // day 7 is unobserved -> no output row for it
    val evs = Seq(
      (1L, ts("2024-06-01 10:00:00")), (1L, ts("2024-06-01 11:00:00")),
      (2L, ts("2024-06-01 12:00:00")), (2L, ts("2024-06-09 12:00:00"))
    ).toDF("user_id", "ts")
    val got = Sessionize.evActiveUsers(evs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val d0 = got.head._1
    // day 0: both users; day 8: only u2 (u1's day-0 activity is 8 days
    // old, beyond the trailing 7) — and no phantom rows for days 1..7
    assert(got.toSeq == Seq((d0, 2L, 2L, 1.0), (d0 + 8, 1L, 1L, 1.0)))
  }

  test("ta_perplexity: matches an in-memory unigram cross-entropy replay") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val toks = docs.map { case (id, t) => (id, t.split(" ", -1).toSeq) }
    val cnt = toks.flatMap(_._2).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val total = toks.map(_._2.size.toLong).sum
    def term(c: Long): java.math.BigDecimal =
      // replicate Spark ROUND(double, 9): HALF_UP on the shortest decimal
      // repr (BigDecimal.valueOf); math.log is the same JVM libm call
      java.math.BigDecimal.valueOf(-math.log(c.toDouble / total))
        .setScale(9, java.math.RoundingMode.HALF_UP)
    val expected = toks.map { case (id, ts) =>
      val sum = ts.map(t => term(cnt(t)))
        .foldLeft(java.math.BigDecimal.ZERO)(_ add _)
      val xent = BigDecimal(sum.doubleValue / ts.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val ppl = BigDecimal(math.exp(xent))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, ts.size.toLong, xent, ppl)
    }.sortBy(_._1).toSeq
    val got = TextAnalysis.taPerplexity(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    assert(got == expected && got.nonEmpty)
  }

  test("taPerplexity(docs): parameterized entry on a hand corpus") {
    import spark.implicits._
    // corpus LM: c(x)=3, c(y)=2, c(z)=1, T=6
    val docs = Seq((1L, "x x y"), (2L, "x y z")).toDF("doc_id", "text")
    val got = TextAnalysis.taPerplexity(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    def m(ps: Double*) = BigDecimal(ps.map(p =>
      java.math.BigDecimal.valueOf(-math.log(p))
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue).sum
      / ps.size).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq(
      (1L, 3L, m(0.5, 0.5, 2.0 / 6)), (2L, 3L, m(0.5, 2.0 / 6, 1.0 / 6))))
    // doc 2 carries the rarer tokens -> strictly higher cross-entropy
    assert(got(1)._3 > got(0)._3)
  }

  test("evActiveUsers(events, windowDays): caller-set window changes the rollup") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // u1 on day 0, u2 on day 2: a 2-day window at day 2 misses u1, a
    // 7-day window catches them both
    val evs = Seq((1L, ts("2024-06-01 10:00:00")),
      (2L, ts("2024-06-03 10:00:00"))).toDF("user_id", "ts")
    val w2 = Sessionize.evActiveUsers(evs, windowDays = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val w7 = Sessionize.evActiveUsers(evs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val d0 = w2.keys.min
    assert(w2 == Map(d0 -> 1L, (d0 + 2) -> 1L))
    assert(w7 == Map(d0 -> 1L, (d0 + 2) -> 2L))
  }

  test("evSpike(events, windowDays, threshold): caller-set knobs change the flag") {
    import spark.implicits._
    def ts(d: Int, i: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-06-01 00:00:00").getTime
        + d * 86400000L + i * 1000L)
    // day 0: 10, day 1: 30 — a 3x day
    val evs = ((1 to 10).map(i => (ts(0, i), "a")) ++
      (1 to 30).map(i => (ts(1, i), "a"))).toDF("ts", "event_type")
    def flag(th: Int) = Sessionize.evSpike(evs, windowDays = 7,
      threshold = th).collect().map(r => r.getLong(1) -> r.getBoolean(6)).toMap
    val d1 = flag(2).keys.head
    assert(flag(2) == Map(d1 -> true))   // 3x >= 2x
    assert(flag(4) == Map(d1 -> false))  // 3x < 4x
  }

  test("taPerplexityAgainst(docs, lm): foreign LM with Laplace-smoothed OOV") {
    import spark.implicits._
    // LM corpus: c(x)=3, c(y)=1, T=4, V=2 -> denom T+V+1 = 7
    val lm = Seq((100L, "x x x y")).toDF("doc_id", "text")
    // doc 1 is in-vocabulary; doc 2 carries an OOV token z (c=0 -> p=1/7)
    val docs = Seq((1L, "x y"), (2L, "x z")).toDF("doc_id", "text")
    val got = TextAnalysis.taPerplexityAgainst(docs, lm).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    def term(p: Double) = java.math.BigDecimal.valueOf(-math.log(p))
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue
    def mean(ps: Double*) = BigDecimal(ps.map(term).sum / ps.size)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == mean(4.0 / 7, 2.0 / 7))
    assert(got(2L) == mean(4.0 / 7, 1.0 / 7))
    // the OOV doc is strictly more surprising
    assert(got(2L) > got(1L))
  }

  test("ds_lenbucket: bands homogeneous, batches bounded, order-independent") {
    // Spark 'div' yields BIGINT: band and batch_id are Long
    val rows = Pipeline.dsLenBucket(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getInt(5)))
    val nDocs = graft.Tables.load(spark, sf, "documents").count()
    assert(rows.length.toLong == nDocs)
    // band is the declared n_tokens div 16; batches hold <= 32 docs with
    // contiguous positions 0..k-1
    rows.foreach(t => assert(t._3 == t._2 / 16))
    for ((_, batch) <- rows.groupBy(t => (t._3, t._4, t._5))) {
      assert(batch.length <= 32)
      assert(batch.map(_._6).sorted.toSeq == (0 until batch.length))
      // homogeneity: a batch never spans bands (keys include band), so
      // intra-batch length spread is bounded by the band width
      assert(batch.map(_._2).max - batch.map(_._2).min < 16)
    }
    // order independence: the assignment is a pure function of the corpus,
    // not its physical layout
    val reshuffled = Pipeline.dsLenBucket(
      graft.Tables.load(spark, sf, "documents").repartition(7),
      bandWidth = 16, batchSize = 32).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getInt(5)))
    assert(reshuffled.toSet == rows.toSet)
  }

  test("ta_normalize: the synthesized noise roundtrips to the original corpus") {
    val rows = Pipeline.taNormalize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getBoolean(3),
        r.getBoolean(4)))
    val nDocs = graft.Tables.load(spark, sf, "documents").count()
    assert(rows.length.toLong == nDocs)
    // every noised doc recovers its original text exactly
    rows.foreach(t => assert(t._5, s"doc ${t._1} did not roundtrip"))
    // the noise classes really changed the text; untouched docs didn't
    rows.foreach { t =>
      val noised = t._1 % 2 == 0 || t._1 % 3 == 0 || t._1 % 5 == 0
      assert(t._4 == noised, s"doc ${t._1}: changed=${t._4}, noised=$noised")
    }
  }

  test("taNormalize(docs): parameterized entry on hand-messy strings") {
    import spark.implicits._
    val docs = Seq((1L, "  The  QUICK ** brown ~fox  "),
      (2L, "already clean")).toDF("doc_id", "text")
    val got = Pipeline.taNormalize(docs).collect()
      .map(r => (r.getLong(0), r.getString(4), r.getBoolean(3)))
    assert(got.toSeq == Seq((1L, "the quick brown fox", true),
      (2L, "already clean", false)))
  }

  test("dd_substring: matches an in-memory repeated-span replay") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val aug = docs.map { case (id, t) =>
      (id, if (id % 7 == 0)
        s"$t ${Dedup.BoilerPhrase} ${Dedup.BoilerPhrase}" else t)
    }
    val grams = aug.map { case (id, t) =>
      val toks = t.split(" ", -1)
      (id, (0 to toks.length - 20).map(i =>
        toks.slice(i, i + 20).mkString(" ")))
    }.filter(_._2.nonEmpty)
    val df = grams.flatMap { case (id, gs) => gs.distinct.map((_, id)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val expected = grams.map { case (id, gs) =>
      val dup = gs.count(g => df(g) >= 2)
      (id, gs.size.toLong, dup.toLong,
        BigDecimal(dup.toDouble / gs.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(_._1).toSeq
    val got = Dedup.ddSubstring(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == expected && got.nonEmpty)
    // the planted boilerplate yields the 21 rotation positions (plus any
    // natural repeats): every planted doc flags >= 21 spans
    got.filter(_._1 % 7 == 0).foreach(t =>
      assert(t._3 >= 21, s"doc ${t._1}: only ${t._3} dup spans"))
    // the detector also finds the corpus's own whole-document duplicates
    // (dup_fraction 1.0 on unplanted docs) — dual-signal, non-vacuous
    assert(got.exists(t => t._1 % 7 != 0 && t._4 == 1.0))
    assert(got.exists(t => t._1 % 7 != 0 && t._4 == 0.0))
  }

  test("ev_spike: matches an in-memory trailing-baseline replay") {
    val daily = graft.Tables.load(spark, sf, "events")
      .selectExpr("event_type", "unix_micros(ts) div 86400000000 AS day")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = daily.keys.toSeq.flatMap { case (tpe, d) =>
      val preceding = (d - 7 to d - 1).flatMap(pd => daily.get((tpe, pd)))
      if (preceding.isEmpty) None
      else {
        val (baseN, baseDays) = (preceding.sum, preceding.length.toLong)
        val n = daily((tpe, d))
        Some((tpe, d, n, baseN, baseDays,
          BigDecimal((n * baseDays).toDouble / baseN)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          n * baseDays >= 2 * baseN))
      }
    }.sortBy(t => (t._1, t._2))
    val got = Sessionize.evSpike(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getBoolean(6))).toSeq
    assert(got == expected && got.nonEmpty)
  }

  test("evSpike(events): parameterized entry flags a planted 4x burst") {
    import spark.implicits._
    def ts(d: Int, i: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-06-01 00:00:00").getTime
        + d * 86400000L + i * 1000L)
    val evs = (1 to 10).map(i => (ts(0, i), "a")) ++
      (1 to 10).map(i => (ts(1, i), "a")) ++
      (1 to 40).map(i => (ts(2, i), "a"))
    val got = Sessionize.evSpike(evs.toDF("ts", "event_type")).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(5), r.getBoolean(6)))
    val d0 = got.map(_._1).min - 1 // day 1 is the first scored day
    // day 0 has no baseline (absent); day 1 rides day 0 (ratio 1); day 2's
    // 40 events against mean(10, 10) = 4x -> spike
    assert(got.toSeq == Seq((d0 + 1, 10L, 1.0, false),
      (d0 + 2, 40L, 4.0, true)))
  }

  test("ds_shuffle: a reproducible permutation in (shard, pos) order") {
    val rows = Pipeline.dsShuffle(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val nDocs = graft.Tables.load(spark, sf, "documents").count()
    // every doc exactly once
    assert(rows.length.toLong == nDocs)
    assert(rows.map(_._1).distinct.length.toLong == nDocs)
    // shards are hex digits; positions contiguous 1..|shard| within each
    assert(rows.forall(t => t._2 >= 0 && t._2 <= 15))
    for ((_, inShard) <- rows.groupBy(_._2))
      assert(inShard.map(_._3).sorted.toSeq == (1 to inShard.length))
    // the permutation is the md5 order, not the doc_id order (non-vacuous:
    // some shard holds consecutive positions with descending doc ids)
    assert(rows.groupBy(_._2).values.exists(s =>
      s.sortBy(_._3).sliding(2).exists {
        case Array(a, b) => b._1 < a._1
        case _ => false
      }))
  }

  test("ddParagraphOn: shared spans vanish, unique spans survive in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"), // "a b" shared with doc 2 -> dropped
      (2L, "a b x y"),
      (3L, "p q"), // untouched
      (4L, "z z"), // exact duplicate pair: both fully emptied
      (5L, "z z"),
      (6L, "m n o") // odd length: partial last span "o" kept
    ).toDF("doc_id", "text")
    val got = Dedup.ddParagraphOn(docs, segTokens = 2, minDf = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 3L, 1L, "c d e f"),
      (2L, 2L, 1L, "x y"),
      (3L, 1L, 0L, "p q"),
      (4L, 1L, 1L, ""),
      (5L, 1L, 1L, ""),
      (6L, 2L, 0L, "m n o")))
  }

  test("ddParagraphOn: minDf dial — raising the bar keeps df=2 spans") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d"), (2L, "a b"), (3L, "a b a b"))
      .toDF("doc_id", "text")
    // "a b" appears in 3 docs (df=3); "c d" in 1 — at minDf=4 nothing drops
    val keep = Dedup.ddParagraphOn(docs, segTokens = 2, minDf = 4).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(keep == Map(1L -> "a b c d", 2L -> "a b", 3L -> "a b a b"))
    // at minDf=3 the shared span drops everywhere (both copies in doc 3)
    val drop = Dedup.ddParagraphOn(docs, segTokens = 2, minDf = 3).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(drop == Map(1L -> "c d", 2L -> "", 3L -> ""))
  }

  test("taEntropy: hand corpus hits the closed-form entropies") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a a"), // degenerate: H = 0, top_ratio 1
      (2L, "a b c d"), // uniform over 4 types: H = 2
      (3L, "a a b b"), // uniform over 2 types: H = 1
      (4L, "a a a b") // H = 2 - 0.75*log2(3) = 0.811278
    ).toDF("doc_id", "text")
    val got = TextAnalysis.taEntropy(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      (1L, 4L, 1L, 0.0, 1.0),
      (2L, 4L, 4L, 2.0, 0.25),
      (3L, 4L, 2L, 1.0, 0.5),
      (4L, 4L, 2L, 0.811278, 0.75)))
  }

  test("ta_entropy: matches an in-memory replay on the sf corpus") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.map { case (id, t) =>
      val toks = t.split(" ", -1)
      val cnt = toks.groupBy(identity).view.mapValues(_.length.toDouble)
      val n = toks.length.toDouble
      val h = cnt.values.map(c => -(c / n) * (math.log(c / n) / math.log(2))).sum
      (id, toks.length.toLong, cnt.size.toLong, h, cnt.values.max / n)
    }.sortBy(_._1)
    val got = TextAnalysis.taEntropy(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case ((gi, gn, gt, gh, gr), (ei, en, et, eh, er)) =>
      assert(gi == ei && gn == en && gt == et)
      assert(math.abs(gh - eh) < 1e-5, s"doc $gi entropy $gh vs replay $eh")
      assert(math.abs(gr - er) < 1e-6)
    }
  }

  test("dsTokBudget(scored, budget): two-pass cum equals the global-order prefix sum") {
    import spark.implicits._
    // scores span three bands; d5/d2/d3 share band 12 (tie order inside
    // a band must follow (sc desc, doc_id)); d2 lands EXACTLY on the
    // budget boundary (<= keeps it)
    val scored = Seq(
      (1L, 40, 0.9), (2L, 50, 0.8), (3L, 20, 0.8),
      (4L, 30, 0.5), (5L, 10, 0.81)).toDF("doc_id", "n_tok", "sc")
    val got = Pipeline.dsTokBudget(scored, budget = 100L).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4))).toSeq
    // global greedy order: d1(40) d5(50) d2(100) d3(120) d4(150)
    assert(got == Seq((1L, 40L, true), (2L, 100L, true), (3L, 120L, false),
      (4L, 150L, false), (5L, 50L, true)))
  }

  test("ds_tokbudget: sf corpus matches an in-memory global prefix-sum replay") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val scored = docs.map { case (id, t) =>
      val toks = t.split(" ", -1)
      val sc = BigDecimal(toks.distinct.length.toDouble / toks.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, toks.length, sc)
    }
    var cum = 0L
    val expected = scored.sortBy { case (id, _, sc) => (-sc, id) }
      .map { case (id, n, sc) => cum += n; (id, n.toLong, sc, cum, cum <= 100000L) }
      .sortBy(_._1)
    val got = Pipeline.dsTokBudget(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getDouble(2), r.getLong(3),
        r.getBoolean(4))).toSeq
    assert(got == expected.toSeq)
  }

  test("taBigramPpl(docs): Laplace bigram model on a closed-form hand corpus") {
    import spark.implicits._
    // model over both docs: c(a,b)=3 c(b,a)=2, c(a)=3 c(b)=2, V=|{a,b}|=2
    // -> p(b|a)=(3+1)/(3+2)=0.8, p(a|b)=(2+1)/(2+2)=0.75
    val docs = Seq((1L, "a b a b a"), (2L, "a b")).toDF("doc_id", "text")
    val got = TextAnalysis.taBigramPpl(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.map(t => (t._1, t._2)).toSeq == Seq((1L, 4L), (2L, 1L)))
    val x1 = (2 * -math.log(0.8) + 2 * -math.log(0.75)) / 4
    val x2 = -math.log(0.8)
    assert(math.abs(got(0)._3 - x1) < 1e-6 && math.abs(got(1)._3 - x2) < 1e-6)
    assert(math.abs(got(0)._4 - math.exp(x1)) < 1e-5)
    // the repetitive doc compresses better than chance (ppl2 < V)
    assert(got(0)._4 < 2.0)
  }

  test("ta_bigram_ppl: matches an in-memory replay on the sf corpus") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
      .filter(_._2.length >= 2)
    val bigrams = docs.flatMap { case (id, t) =>
      t.sliding(2).map(p => (id, p(0), p(1))) }
    val cb = bigrams.groupBy(b => (b._2, b._3)).view.mapValues(_.length).toMap
    val cp = cb.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val v = cb.keySet.map(_._2).size
    val expected = bigrams.groupBy(_._1).map { case (id, bs) =>
      val terms = bs.map { case (_, p, c) =>
        BigDecimal(-math.log((cb((p, c)) + 1.0) / (cp(p) + v)))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP) }
      id -> (bs.length.toLong, (terms.sum / bs.length).toDouble)
    }
    val got = TextAnalysis.taBigramPpl(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == expected.size)
    got.foreach { case (id, n, xent) =>
      val (en, ex) = expected(id)
      assert(n == en, s"doc $id bigram count $n vs $en")
      assert(math.abs(xent - ex) < 1e-5, s"doc $id xent $xent vs $ex")
    }
  }

  test("dd_minhash_est: estimates calibrate against an exact-Jaccard replay") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // the twin-planted corpus the oracle form runs on
    val corpus = docs ++ docs.map { case (id, t) =>
      val toks = t.split(" ", -1)
      (id + Dedup.TwinIdOffset, toks.take(toks.length * 4 / 5).mkString(" "))
    }
    def shingles(t: String): Set[String] = {
      val toks = t.split(" ", -1)
      if (toks.length < 3) Set.empty
      else (0 to toks.length - 3).map(i =>
        s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}").toSet
    }
    val sets = corpus.map { case (id, t) => id -> shingles(t) }.toMap
    val got = Dedup.ddMinhashEst(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got.nonEmpty)
    got.foreach { case (a, b, est, exact, err) =>
      // est has signature granularity; exact matches the set replay
      assert((est * 8).round / 8.0 == est && est >= 0 && est <= 1)
      val (sa, sb) = (sets(a), sets(b))
      val replay = BigDecimal(
        sa.intersect(sb).size.toDouble / sa.union(sb).size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(exact == replay, s"pair ($a,$b) exact $exact vs replay $replay")
      assert(math.abs(err - math.abs(est - exact)) < 2e-6)
    }
    // the verified near-dup pairs are a subset of the calibration pairs
    val verified = Dedup.ddMinhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val estPairs = got.map(t => (t._1, t._2)).toSet
    assert(verified.subsetOf(estPairs),
      s"${verified.diff(estPairs).size} verified pairs missing")
  }

  test("dsBalance(docs, classCol): every class keeps exactly min-class-size rows") {
    import spark.implicits._
    val docs = Seq((1L, "en"), (2L, "en"), (3L, "en"), (4L, "de"),
      (5L, "de"), (6L, "fr"), (7L, "fr"), (8L, "fr"), (9L, "fr"))
      .toDF("doc_id", "lang")
    val got = Pipeline.dsBalance(docs, "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // min class (de) has 2 -> every class keeps exactly 2, k column = 2
    assert(got.length == 6)
    assert(got.forall(_._4 == 2L))
    assert(got.groupBy(_._2).view.mapValues(_.length).toMap ==
      Map("en" -> 2, "de" -> 2, "fr" -> 2))
    // ranks are 1..k per class and the draw is deterministic
    got.groupBy(_._2).values.foreach(g =>
      assert(g.map(_._3).sorted.toSeq == Seq(1L, 2L)))
    val again = Pipeline.dsBalance(docs, "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == again.toSeq)
  }

  test("taC4Filter(docs): every C4 rule fires on a hand corpus") {
    import spark.implicits._
    val nl = "\n"
    val docs = Seq(
      // 5 lines: 2 survive (short line, unterminated line, javascript
      // line all drop) -> below the 3-line doc floor
      (1L, Seq("this line has five words.", "too short.",
        "no terminal punctuation here at all",
        "the javascript runtime is mentioned right here.",
        "another good line with plenty of words!").mkString(nl)),
      // 3 clean surviving lines -> kept document
      (2L, Seq("the first perfectly valid line stays.",
        "the second perfectly valid line stays?",
        "the third perfectly valid line stays.").mkString(nl)),
      // enough good lines, but lorem ipsum marks the page as boilerplate
      (3L, Seq("good line number one right here.",
        "good line number two right here.",
        "Lorem Ipsum dolor sit amet filler.").mkString(nl)),
      // curly brace -> code boilerplate page
      (4L, Seq("good line number one right here.",
        "good line number two right here.",
        "if (x) { return; } style content here.").mkString(nl)))
      .toDF("doc_id", "text")
    val got = TextAnalysis.taC4Filter(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (1L, 5, 2, false), (2L, 3, 3, true), (3L, 3, 3, false),
      (4L, 3, 3, false)))
  }

  test("taReadability(docs): hand-computed Flesch on a known corpus") {
    import spark.implicits._
    val docs = Seq(
      // 6 words, 2 sentences, syllable groups: the(1) cat(1) sat(1)
      // it(1) was(1) flat(1) = 6
      (1L, "the cat sat. it was flat!"),
      // no terminal punctuation: n_sents clamps to 1
      (2L, "row row row a boat"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.taReadability(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getDouble(4)))
    def flesch(w: Int, st: Int, sy: Int): Double =
      BigDecimal(206.835 - 1.015 * (w.toDouble / st)
        - 84.6 * (sy.toDouble / w))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0) == ((1L, 6, 2, 6, flesch(6, 2, 6))))
    // "row row row a boat": 5 words, vowel groups o/o/o/a/oa = 5 syll
    assert(got(1) == ((2L, 5, 1, 5, flesch(5, 1, 5))))
  }

  test("taPiiCount(docs): counts and clean flag on a hand corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "reach me at bob1@mail.com or alice@web.org today"),
      (2L, "server 192.168.0.1 and ssn 123-45-6789 leaked"),
      (3L, "perfectly clean text with no identifiers at all"))
      .toDF("doc_id", "text")
    val got = Pipeline.taPiiCount(docs, Seq(
      "emails" -> "[a-z0-9]+@[a-z]+\\.[a-z]+",
      "ssns" -> "[0-9]{3}-[0-9]{2}-[0-9]{4}",
      "ips" -> "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getBoolean(5)))
    assert(got.toSeq == Seq(
      (1L, 2, 0, 0, 2, false),
      (2L, 0, 1, 1, 2, false),
      (3L, 0, 0, 0, 0, true)))
  }

  test("ds_kfold: total partition, determinism, rough balance") {
    val a = Pipeline.dsKfold(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(3))
    val b = Pipeline.dsKfold(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(3))
    assert(a.toSeq == b.toSeq, "fold assignment must be deterministic")
    assert(a.forall { case (_, f) => f >= 0 && f < 5 })
    val sizes = a.groupBy(_._2).view.mapValues(_.length)
    assert(sizes.keySet == Set(0, 1, 2, 3, 4), "every fold non-empty")
    // expected total/5 per fold; md5 uniformity keeps each within 2x
    val exp = a.length / 5
    assert(sizes.values.forall(n => n >= exp / 2 && n <= exp * 2),
      sizes.toMap.toString)
  }

  test("ddKeepBest: planted twins lose to their originals") {
    val rows = Dedup.ddKeepBest(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // every survivor of a multi-member cluster is an original (the
    // truncated twin carries a strictly smaller score), and no cluster
    // appears twice
    assert(rows.map(_._1).distinct.length == rows.length)
    rows.filter(_._4 >= 2).foreach { case (c, id, _, _) =>
      assert(id < Dedup.TwinIdOffset, s"twin survived in cluster $c")
    }
    // twins exist at this SF, so some cluster must be multi-member
    assert(rows.exists(_._4 >= 2))
  }

  test("ev_markov: transition rows sum to each prev's outflow; probs to 1") {
    val rows = Sessionize.evMarkov(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (prev, g) =>
      val pSum = g.map(_._4).sum
      assert(math.abs(pSum - 1.0) < 1e-4, s"$prev rows sum to $pSum")
    }
    // cross-check one cell against an in-memory lag over the same events
    val ev = graft.Tables.load(spark, sf, "events")
      .selectExpr("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val mem = ev.groupBy(_._1).values.flatMap { g =>
      val sorted = g.sortBy(e => (e._2.getTime, e._3))
      sorted.sliding(2).collect { case Array(a, b) => (a._4, b._4) }
    }.toSeq.groupBy(identity).view.mapValues(_.size)
    rows.foreach { case (p, c, n, _) =>
      assert(mem.getOrElse((p, c), 0) == n, s"count mismatch for $p>$c")
    }
  }

  test("ds_curriculum: phases partition by score band; positions dense per shard") {
    val rows = Pipeline.dsCurriculum(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2), r.getInt(3),
        r.getInt(4)))
    assert(rows.nonEmpty && rows.length == 500)
    rows.foreach { case (_, sc, phase, shard, _) =>
      assert(phase >= 0 && phase <= 3 && shard >= 0 && shard <= 15)
      // the band law on the bounded score
      assert(phase == math.min(3, math.max(0, math.floor(sc * 4).toInt)))
    }
    // positions are dense 1..n within every (phase, shard)
    rows.groupBy(t => (t._3, t._4)).values.foreach { g =>
      assert(g.map(_._5).sorted.toSeq == (1 to g.length).toSeq)
    }
    // determinism
    val again = Pipeline.dsCurriculum(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(4)))
    assert(again.toSeq == rows.map(t => (t._1, t._5)).toSeq)
  }

  test("ev_rfm: scores are quintile-monotone and metrics replay exactly") {
    val rows = Sessionize.evRfm(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getInt(4), r.getInt(5), r.getInt(6), r.getString(7)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, _, _, rs, fs, ms, rfm) =>
      assert(rs >= 1 && rs <= 5 && fs >= 1 && fs <= 5 && ms >= 1 && ms <= 5)
      assert(rfm == s"$rs$fs$ms")
    }
    // monotonicity: sorting users by a metric must sort its score the
    // same way (recency inverted)
    val byRec = rows.sortBy(_._2)
    assert(byRec.map(_._5).sliding(2).forall(p => p(0) >= p(1)),
      "r_score not anti-monotone in recency_days")
    val byFreq = rows.sortBy(_._3)
    assert(byFreq.map(_._6).sliding(2).forall(p => p(0) <= p(1)),
      "f_score not monotone in freq")
    // exact metric replay for one user
    val ev = graft.Tables.load(spark, sf, "events")
      .selectExpr("user_id", "ts", "CAST(value AS DECIMAL(18,2)) AS v")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        r.getDecimal(2)))
    val freqs = ev.groupBy(_._1).view.mapValues(_.length)
    rows.foreach { case (u, _, f, _, _, _, _, _) =>
      assert(freqs(u) == f, s"user $u freq $f vs ${freqs(u)}")
    }
  }

  test("ddSemDedup: planted semantic twins drop, natural vectors keep") {
    val rows = Dedup.ddSemDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    assert(rows.nonEmpty)
    val (twins, naturals) = rows.partition(_._1 >= Dedup.TwinIdOffset)
    // nothing natural is ever dropped (measured max natural cosine 0.51
    // vs tau = 0.9)
    assert(naturals.forall(_._3), "a natural vector was dropped")
    // a twin survives only by landing in a different cluster than its
    // original — rare at nlist=16; most planted twins must drop
    val dropped = twins.count(!_._3)
    assert(dropped >= 0.8 * twins.length,
      s"only $dropped/${twins.length} planted twins dropped")
    // every dropped twin's original is kept (keep-first)
    val keptIds = rows.filter(_._3).map(_._1).toSet
    twins.filter(!_._3).foreach { case (id, _, _) =>
      assert(keptIds.contains(id - Dedup.TwinIdOffset),
        s"twin $id dropped but original missing")
    }
  }

  test("ddKeepBest(members): argmax with doc_id tiebreak on hand input") {
    import spark.implicits._
    val members = Seq(
      ("c1", 10L, 5), ("c1", 11L, 9), ("c1", 12L, 9),
      ("c2", 20L, 1))
      .toDF("cluster_id", "doc_id", "score")
    val got = Dedup.ddKeepBest(members).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(got.toSeq == Seq(("c1", 11L, 9, 3L), ("c2", 20L, 1, 1L)))
  }

  test("dsWeightedSample(scored, w, k): race favors weight, k exact, reproducible") {
    import spark.implicits._
    // one overwhelming weight: its race key rounds to ~0 -> always drawn
    val docs = (1L to 50L).map(i => (i, if (i == 7L) 1e12 else 1.0))
      .toDF("doc_id", "w")
    val top1 = Pipeline.dsWeightedSample(docs, "w", 1).collect()
    assert(top1.map(_.getLong(0)).toSeq == Seq(7L))
    // k >= eligible population: everything with w > 0 comes back
    val all = Pipeline.dsWeightedSample(docs, "w", 100)
    assert(all.count() == 50)
    // w <= 0 never races
    val some = Pipeline.dsWeightedSample(
      Seq((1L, 0.0), (2L, -3.0), (3L, 2.0)).toDF("doc_id", "w"), "w", 10)
      .collect().map(_.getLong(0))
    assert(some.toSeq == Seq(3L))
    // byte-deterministic across runs (the md5 race, not an RNG)
    val a = Pipeline.dsWeightedSample(docs, "w", 10).collect().map(_.getLong(0))
    val b = Pipeline.dsWeightedSample(docs, "w", 10).collect().map(_.getLong(0))
    assert(a.toSeq == b.toSeq)
  }

  test("evGaps(events): log2 buckets and integer mean on hand input") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-06-01 10:00:00")
    def at(us: Long) = new java.sql.Timestamp(base.getTime + us / 1000)
    // 3 views with gaps 2s and 6s -> buckets len(bin(2e6))-1 = 20 and
    // len(bin(6e6))-1 = 22; mean = 8e6/2 integer-exact
    val evs = Seq(
      (1L, 1L, at(0L), "view"), (1L, 2L, at(2000000L), "view"),
      (1L, 3L, at(8000000L), "view"),
      (2L, 4L, at(0L), "click")) // single event: no gap, type absent
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = Sessionize.evGaps(evs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(("view", 20L, 1L, 2L, 4000000L),
      ("view", 22L, 1L, 2L, 4000000L)))
  }

  test("taNgramTop(docs, n, k): counts and df on hand input, deterministic cut") {
    import spark.implicits._
    val docs = Seq((1L, "a b c a b c"), (2L, "a b c"), (3L, "x y"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.taNgramTop(docs, 3, 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // doc1 trigrams: "a b c"(2) "b c a" "c a b"; doc2: "a b c";
    // doc3 too short -> "a b c" n=3 df=2 leads; tie at n=1 cut by gram
    assert(got.toSeq == Seq(("a b c", 3L, 2L), ("b c a", 1L, 1L)))
  }

  test("dsEpochs(srcTokens, budget, cap): water-filling matches the hand fixpoint") {
    import spark.implicits._
    // E=2, T=150: C (ratio 10) caps at 2 epochs = 20 tokens; the 130
    // surplus splits evenly over A and B (w 1:1) -> 65 each = 0.65 epochs
    val src = Seq(("A", 100L, 1), ("B", 100L, 1), ("C", 10L, 2))
      .toDF("source", "tokens", "w")
    val got = Pipeline.dsEpochs(src, 150L, 2).collect()
      .map(r => (r.getString(0), r.getBoolean(3), r.getDouble(4),
        r.getDouble(5)))
    assert(got.toSeq == Seq(("A", false, 0.65, 65.0),
      ("B", false, 0.65, 65.0), ("C", true, 2.0, 20.0)))
    // budget beyond the cap ceiling: every source caps, allocation is
    // exactly E passes over its tokens (the budget is honestly unfilled)
    val all = Pipeline.dsEpochs(src, 1000L, 2).collect()
      .map(r => (r.getString(0), r.getBoolean(3), r.getDouble(4)))
    assert(all.forall(t => t._2 && t._3 == 2.0))
    // boundary budget: C's proportional share 40·2/4 = 20 EQUALS its cap
    // 2·10 — the ≤ test marks it capped, the remainder splits over A/B
    val tiny = Pipeline.dsEpochs(src, 40L, 2).collect()
      .map(r => (r.getString(0), r.getBoolean(3), r.getDouble(5)))
    assert(tiny.toSeq == Seq(("A", false, 10.0), ("B", false, 10.0),
      ("C", true, 20.0)))
  }

  test("evGini(events): closed-form rank sum matches the hand Lorenz numbers") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // 9 users with 1 event + 1 user with 11: sorted x = [1×9, 11],
    // Σ rank·x = 45 + 110 = 155 -> gini = 2·155/(10·20) − 11/10 = 0.45;
    // top decile = 1 user holding 11/20 = 0.55 of events
    val evs = ((1L to 9L).map(u => (u, ts("2024-06-01 10:00:00"))) ++
      (1 to 11).map(i => (10L, ts(f"2024-06-01 11:$i%02d:00"))))
      .toDF("user_id", "ts")
    val got = Sessionize.evGini(evs).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
      r.getLong(4), r.getDouble(5)) == ((10L, 20L, 0.45, 1L, 11L, 0.55)))
    // uniform activity -> gini 0 exactly (ties collapse to one run)
    val flat = (1L to 8L).map(u => (u, ts("2024-06-01 10:00:00")))
      .toDF("user_id", "ts")
    assert(Sessionize.evGini(flat).head().getDouble(2) == 0.0)
  }

  test("evStreaks(events): gaps-and-islands runs on hand input") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // u1: days {1,2,3, 7,8} -> streaks of 3 and 2; two events on day 2
    // collapse to one active day. u2: one day -> one streak of 1.
    val evs = Seq(
      (1L, ts("2024-06-01 10:00:00")), (1L, ts("2024-06-02 09:00:00")),
      (1L, ts("2024-06-02 23:00:00")), (1L, ts("2024-06-03 01:00:00")),
      (1L, ts("2024-06-07 12:00:00")), (1L, ts("2024-06-08 12:00:00")),
      (2L, ts("2024-06-05 00:30:00"))
    ).toDF("user_id", "ts")
    val got = Sessionize.evStreaks(evs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 5L, 2L, 3L), (2L, 1L, 1L, 1L)))
  }

  test("evFeatures(events, rollN): lag/gap/rolling mean on hand input") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val evs = Seq(
      (1L, 10L, ts("2024-06-01 10:00:00"), "view", 1.0),
      (1L, 11L, ts("2024-06-01 10:00:30"), "click", 2.0),
      (1L, 12L, ts("2024-06-01 10:02:30"), "purchase", 6.0)
    ).toDF("user_id", "event_id", "ts", "event_type", "value")
    val got = Sessionize.evFeatures(evs, rollN = 2).collect().map { r =>
      (r.getLong(1), Option(r.get(5)).map(_.asInstanceOf[Double]),
        Option(r.get(6)).map(_.asInstanceOf[Long]), r.getLong(7),
        r.getDouble(8))
    }
    // rollN=2: trailing mean over {self, prev}; gaps are exact micros
    assert(got.toSeq == Seq(
      (10L, None, None, 1L, 1.0),
      (11L, Some(1.0), Some(30000000L), 2L, 1.5),
      (12L, Some(2.0), Some(120000000L), 3L, 4.0)))
  }

  test("ddCrossDedup(corpus, ref): flags exact text present in the reference") {
    import spark.implicits._
    val corpus = Seq((1L, "alpha beta"), (2L, "gamma delta"), (3L, "unique"))
      .toDF("doc_id", "text")
    val ref = Seq((100L, "gamma delta"), (101L, "alpha beta"),
      (102L, "other")).toDF("doc_id", "text")
    val got = Dedup.ddCrossDedup(corpus, ref).collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    assert(got.toSeq == Seq((1L, true), (2L, true), (3L, false)))
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("dsSpanMask(docs, rate, spanLen): block draws match the brute md5 fold") {
    import spark.implicits._
    def draw(doc: Long, p: Long): Int =
      Integer.parseInt(md5Hex(s"mask:$doc:$p").take(2), 16)
    val text = (0 until 11).map(i => s"t$i").mkString(" ") // 11 tokens
    val docs = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val got = Pipeline.dsSpanMask(docs, rate = 0.15, spanLen = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = for {
      doc <- Seq(1L, 2L); p <- Seq(0L, 3L, 6L, 9L) if draw(doc, p) < 38
    } yield (doc, 11L, p, math.min(3L, 11L - p))
    assert(got.toSeq == want)
    // block alignment and bounds hold on the real corpus; the realized
    // corruption rate lands near the configured 38/256
    val corpus = Pipeline.dsSpanMask(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(corpus.nonEmpty)
    corpus.foreach { case (_, n, st, len) =>
      assert(st % 3 == 0 && st < n && len >= 1 && len <= 3 && st + len <= n)
    }
    val nTok = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("SUM(size(split(text, ' ')))").head().getLong(0)
    val ratio = corpus.map(_._4).sum.toDouble / nTok
    assert(ratio > 0.10 && ratio < 0.20, s"corruption ratio drifted: $ratio")
  }

  test("taHashEmbed(docs): sparse hashed counts match the brute token fold") {
    import spark.implicits._
    val docs = Seq((1L, "a b a c"), (2L, "a")).toDF("doc_id", "text")
    val got = TextAnalysis.taHashEmbed(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def feat(tok: String): Long = Integer.parseInt(md5Hex(tok).take(2), 16)
    val want = Seq(1L -> Seq("a", "b", "a", "c"), 2L -> Seq("a")).flatMap {
      case (doc, toks) => toks.groupBy(feat).toSeq.map {
        case (f, ts) => (doc, f, ts.size.toLong)
      }
    }.sorted
    assert(got.toSeq == want)
    got.foreach { case (_, f, n) => assert(f >= 0 && f < 256 && n >= 1) }
    // vectors are conserving: Σn per doc == the doc's token count
    assert(got.filter(_._1 == 1L).map(_._3).sum == 4L)
  }

  test("evAbTest(events, conv): hash split and z-score match the brute fold") {
    import spark.implicits._
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-06-01 10:$m%02d:00")
    // users 1..40; every third converts (fires one purchase); variant is
    // the same md5 digit rule the engine applies, replicated here
    def variant(u: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ab:$u".getBytes("UTF-8"))
      if (((d(0) >> 4) & 0xf) < 8) "A" else "B"
    }
    val evs = (1L to 40L).flatMap { u =>
      Seq((u * 10, ts((u % 50).toInt), u, "view", 1.0)) ++
        (if (u % 3 == 0) Seq((u * 10 + 1, ts((u % 50).toInt), u, "purchase", 5.0))
         else Nil)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Sessionize.evAbTest(evs, "purchase").collect().head
    val (na, ca, nb, cb) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val users = (1L to 40L).map(u => (variant(u), u % 3 == 0))
    assert(na == users.count(_._1 == "A"))
    assert(ca == users.count(u => u._1 == "A" && u._2))
    assert(nb == users.count(_._1 == "B"))
    assert(cb == users.count(u => u._1 == "B" && u._2))
    assert(na + nb == 40 && ca + cb == users.count(_._2))
    val (ra, rb) = (ca.toDouble / na, cb.toDouble / nb)
    val p = (ca + cb).toDouble / (na + nb)
    val z = (ra - rb) / math.sqrt(p * (1 - p) * (1.0 / na + 1.0 / nb))
    assert(math.abs(r.getDouble(6) - z) < 1e-6)
    assert(r.getBoolean(7) == (math.abs(r.getDouble(6)) >= 1.96))
    // degenerate pool (every user converts): no variance — z is NULL and
    // the flag is false, never a 0/0
    val degen = Sessionize.evAbTest(evs, "view").collect().head
    assert(degen.isNullAt(6) && !degen.getBoolean(7))
  }

  test("dsPipeline: composed flags agree column-for-column with each standalone op") {
    val docs = graft.Tables.load(spark, sf, "documents")
    val rates = docs.select("source").distinct().collect()
      .map(_.getString(0))
      .map(n => n -> (n.stripPrefix("src").toInt + 1) / 10.0).toMap
    val got = Pipeline.dsPipeline(docs, rates).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4), r.getString(5), r.getBoolean(6)))).toMap
    assert(got.nonEmpty)
    val canon = Dedup.ddExactOn(docs.select("doc_id", "text")).collect()
      .map(_.getLong(0)).toSet
    val keep = TextAnalysis.taGopher(docs.select("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    val mixed = Pipeline.dsMix(docs, rates).collect()
      .map(_.getLong(0)).toSet
    val split = Pipeline.dsSplit(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    got.foreach { case (id, (c, q, m, sp, t)) =>
      assert(c == canon.contains(id), s"canonical flag differs on $id")
      assert(q == keep(id), s"quality flag differs on $id")
      assert(m == mixed.contains(id), s"mix flag differs on $id")
      assert(sp == split(id), s"split differs on $id")
      assert(t == (c && q && m && sp == "train"), s"conjunction broken on $id")
    }
    // the composition is selective but non-degenerate on this corpus
    assert(got.values.exists(_._5) && got.values.exists(!_._5))
  }

  test("ddBloomDedup(corpus, ref): exact under heavy bloom false-positive load") {
    import spark.implicits._
    val ref = (0 until 40).map(k => (1000L + k, s"ref text $k"))
      .toDF("doc_id", "text")
    val corpus = (1L to 200L)
      .map(i => (i, if (i % 5 == 0) s"ref text ${i % 40}" else s"corpus $i"))
      .toDF("doc_id", "text")
    // fpp 0.4 -> a deliberately tiny filter (heavy false-positive load):
    // the verification join must keep the answer exact regardless
    val got = Dedup.ddBloomDedup(corpus, ref, fpp = 0.4).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1))
    assert(got.length == 200 && got.map(_._1).toSeq == (1L to 200L))
    got.foreach { case (id, dup) => assert(dup == (id % 5 == 0), s"doc $id") }
    // mechanism-independence: bit-for-bit the ddCrossDedup answer
    val viaJoin = Dedup.ddCrossDedup(corpus, ref).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1))
    assert(got.toSeq == viaJoin.toSeq)
    // empty reference: everything clean, no bloom built
    val none = Dedup.ddBloomDedup(corpus, ref.where("doc_id < 0")).collect()
    assert(none.length == 200 && none.forall(!_.getBoolean(1)))
  }

  test("evCooccur(events, gap): session presence pairs, lift and jaccard") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: session A = {view, click, view} -> presence {click, view};
    //         session B (past the 30-min gap) = {view};
    // user 2: one session {click, purchase} -> 3 sessions total
    val evs = Seq(
      (1L, 10L, ts("2024-06-01 10:00:00"), "view"),
      (1L, 11L, ts("2024-06-01 10:01:00"), "click"),
      (1L, 12L, ts("2024-06-01 10:02:00"), "view"),
      (1L, 13L, ts("2024-06-01 12:00:00"), "view"),
      (2L, 20L, ts("2024-06-01 09:00:00"), "click"),
      (2L, 21L, ts("2024-06-01 09:05:00"), "purchase")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = Sessionize.evCooccur(evs, Sessionize.GapMicros).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7)))
    assert(got.toSeq == Seq(
      ("click", "purchase", 1L, 2L, 1L, 3L, 1.5, 0.5),
      ("click", "view", 1L, 2L, 2L, 3L, 0.75, 0.333333)))
    // set semantics: the doubled 'view' in session A counts once
    assert(got.forall(g => g._3 <= math.min(g._4, g._5)))
  }

  test("dsTemperature(stats, alpha): sqrt weights and boosts on hand numbers") {
    import spark.implicits._
    // tokens 100/400/2500 -> sqrt weights 10/20/50, Σw=80, Σtok=3000
    val src = Seq(("A", 10L, 100L), ("B", 20L, 400L), ("C", 30L, 2500L))
      .toDF("source", "n_docs", "tokens")
    val got = Pipeline.dsTemperature(src, alpha = 0.5).collect()
      .map(r => (r.getString(0), r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getDouble(6)))
    assert(got.toSeq == Seq(
      ("A", 10.0, 0.033333, 0.125, 3.75),
      ("B", 20.0, 0.133333, 0.25, 1.875),
      ("C", 50.0, 0.833333, 0.625, 0.75)))
    // α < 1 flattens: the smallest source is boosted above 1, the
    // largest suppressed below 1, and Σp closes to 1 within rounding
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-5)
    // α = 1 is the identity mixture: p == share, boost == 1 everywhere
    val id = Pipeline.dsTemperature(src, alpha = 1.0).collect()
      .map(r => (r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    id.foreach { case (share, p, boost) =>
      assert(math.abs(p - share) < 1e-6 && math.abs(boost - 1.0) < 1e-6)
    }
    // the oracle form: one row per source, probabilities close to 1
    val orc = Pipeline.dsTemperature(spark, sf).collect()
    assert(orc.length == spark.read
      .parquet(s"$sf/documents.parquet").select("source").distinct().count())
    assert(math.abs(orc.map(_.getDouble(5)).sum - 1.0) < 1e-4)
  }

  test("evBots(events): metronomic user flags, bursty user passes, short regular user spared") {
    import spark.implicits._
    def t(us: Long) = new java.sql.Timestamp(us / 1000) // ms precision rows
    // user 1: 12 events on an exact 60s grid -> 11 gaps, cv = 0, BOT
    val bot = (0 until 12).map(i => (100L + i, t(i * 60000000L), 1L))
    // user 2: 12 events with alternating 10s/300s gaps -> cv >> 0.3
    var acc = 0L
    val bursty = (0 until 12).map { i =>
      if (i > 0) acc += (if (i % 2 == 1) 10000000L else 300000000L)
      (200L + i, t(acc), 2L)
    }
    // user 3: 4 events on the grid -> only 3 gaps (< minGaps), cv = 0, SPARED
    val short = (0 until 4).map(i => (300L + i, t(i * 60000000L), 3L))
    val events = (bot ++ bursty ++ short)
      .toDF("event_id", "ts", "user_id")
    val got = Sessionize.evBots(events, cvMax = 0.3, minGaps = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4))).toSeq
    assert(got.map(x => (x._1, x._2)) == Seq((1L, 11L), (2L, 11L), (3L, 3L)))
    val byUser = got.map(x => x._1 -> x).toMap
    assert(byUser(1L)._4 == 0.0 && byUser(1L)._5) // metronomic -> bot
    // bursty: brute-fold the cv from the planted gaps and compare
    val gaps = (1 until 12).map(i => if (i % 2 == 1) 10000000.0 else 300000000.0)
    val n = gaps.size; val mean = gaps.sum / n
    val sd = math.sqrt(gaps.map(g => (g - mean) * (g - mean)).sum / (n - 1))
    assert(math.abs(byUser(2L)._4 - sd / mean) < 1e-4)
    assert(byUser(2L)._4 > 0.3 && !byUser(2L)._5)
    assert(byUser(3L)._4 == 0.0 && !byUser(3L)._5) // regular but too few gaps
    assert(byUser(3L)._3 == 60000000L) // integer mean gap
    // oracle form: planted user_id % 29 == 3 users all flag, and they are
    // the ONLY flags (natural traffic is exponential-ish, cv ~ 1)
    val orc = Sessionize.evBots(spark, sf).collect()
    val flagged = orc.filter(_.getBoolean(4)).map(_.getLong(0)).toSet
    assert(flagged.nonEmpty && flagged.forall(_ % 29 == 3))
    val planted = orc.map(_.getLong(0)).filter(_ % 29 == 3).toSet
    assert(flagged == planted.filter(u =>
      orc.find(_.getLong(0) == u).get.getLong(1) >= 10))
  }

  test("evEwma(events): dyadic closed form equals the sequential recurrence EXACTLY") {
    import spark.implicits._
    def t(d: Int, h: Int) = java.sql.Timestamp.valueOf(f"2024-06-$d%02d $h%02d:00:00")
    // type A daily counts 4, 2, 8 -> ewma 4, 3, 5.5; type B: 1, 5 -> 1, 3
    val evs = (Seq.fill(4)(1) ++ Seq.fill(2)(2) ++ Seq.fill(8)(3)).zipWithIndex
      .map { case (d, i) => (i.toLong, t(d, i % 8), 1L, "A", 0.0) } ++
      (Seq.fill(1)(1) ++ Seq.fill(5)(2)).zipWithIndex
        .map { case (d, i) => (100L + i, t(d, i % 8), 2L, "B", 0.0) }
    val events = evs.toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Sessionize.evEwma(events).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3))).toSeq
    // EXACT equality — alpha = 1/2 makes every value a dyadic rational
    assert(got == Seq(("A", 4L, 4.0), ("A", 2L, 3.0), ("A", 8L, 5.5),
      ("B", 1L, 1.0), ("B", 5L, 3.0)))
    // replay the recurrence over the oracle-form output: closed form ==
    // sequential fold bit-for-bit on real data too
    val orc = Sessionize.evEwma(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    orc.groupBy(_._1).foreach { case (_, rows) =>
      var e = rows.head._2.toDouble
      rows.zipWithIndex.foreach { case ((_, n, ewma), i) =>
        if (i > 0) e = 0.5 * n + 0.5 * e
        assert(ewma == e, s"closed form diverged at row $i")
      }
    }
    assert(orc.nonEmpty)
  }

  test("ddCrossFuzzy(corpus, ref): near-dups above the Jaccard bar flag, edits below pass") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val ref = Seq((100L, base),
      (102L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, base + " tail1 tail2 tail3"), // J = 8/11 >= 1/2 -> match
      (3L, "alpha beta gamma nope1 nope2 nope3 nope4 nope5 nope6 nope7"),
      (5L, "unrelated words entirely different from every reference doc x"))
      .toDF("doc_id", "text")
    val got = Dedup.ddCrossFuzzy(corpus, ref).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc 1: one verified match (ref 100); doc 3 shares only ONE shingle
    // of base (J = 1/17 < 1/2); doc 5 shares none
    assert(got == Seq((1L, 1L, 100L), (3L, 0L, -1L), (5L, 0L, -1L)))
    // oracle form: every planted %10=5 doc flags (the corpus ALSO holds
    // natural near-dup twins across the odd/even split — the same ones
    // dd_minhash_lsh finds — so planted is a subset of flagged, not all
    // of it), best_ref is always an even (reference-side) id
    val orc = Dedup.ddCrossFuzzy(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val flagged = orc.filter(_._2 > 0)
    assert(flagged.nonEmpty)
    val planted = orc.filter(r => r._1 % 10 == 5 && r._1 >= 5)
    assert(planted.forall(_._2 >= 1), "a planted near-dup went undetected")
    assert(flagged.forall { case (_, _, ref0) => ref0 % 2 == 0 })
  }

  test("taVocabCoverage(docs, k): OOV counts against the learned top-k vocab") {
    import spark.implicits._
    // tf: a=4 b=3 c=2 d=1 -> vocab(2) = {a, b}
    val docs = Seq((1L, "a a b c"), (2L, "a b b d c"), (3L, "a"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.taVocabCoverage(docs, vocabSize = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 4L, 1L, 0.25), (2L, 5L, 2L, 0.4),
      (3L, 1L, 0L, 0.0)))
    // oracle form: rate algebra holds row-by-row, OOV mass exists
    val orc = TextAnalysis.taVocabCoverage(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(orc.nonEmpty && orc.exists(_._2 > 0))
    orc.foreach { case (n, oov, rate) =>
      assert(oov <= n)
      val want = BigDecimal(oov.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(rate == want)
    }
  }

  test("evLtv(events): cohort curve matches the hand fold, cumulative monotone") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // one cohort (week of Mon 2024-06-03): users 1, 2 both first seen
    // that week; week 0 revenue 10.50 + 4.25, week 1 revenue 2.25 (only
    // user 1 active)
    val evs = Seq(
      (1L, t("2024-06-03 10:00:00"), 1L, "purchase", 10.50),
      (2L, t("2024-06-05 11:00:00"), 2L, "purchase", 4.25),
      (3L, t("2024-06-12 09:00:00"), 1L, "purchase", 2.25))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Sessionize.evLtv(evs).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
        r.getLong(5), r.getDouble(6)))
    assert(got.toSeq == Seq(
      (0L, 2L, 14.75, 14.75, 2L, 7.375),
      (1L, 1L, 2.25, 17.0, 2L, 8.5)))
    // oracle form: per cohort the cumulative revenue is monotone and the
    // ltv algebra replays exactly
    val orc = Sessionize.evLtv(spark, sf).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(4), r.getLong(5),
        r.getDouble(6)))
    assert(orc.nonEmpty)
    orc.groupBy(_._1).foreach { case (_, rows) =>
      val byAge = rows.sortBy(_._2).map(_._3).toSeq
      assert(byAge == byAge.sorted)
    }
    orc.foreach { case (_, _, cum, users, ltv) =>
      val want = BigDecimal(cum / users)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(ltv == want)
    }
  }

  test("evSurvival(subjects): risk sets, censoring, and the hazard fold") {
    import spark.implicits._
    // 5 subjects: two events at t=1, one censored at t=1, one event at
    // t=2, one censored at t=3 (never emits a row — d_t = 0)
    val subj = Seq((1L, false), (1L, false), (1L, true), (2L, false),
      (3L, true)).toDF("t", "censored")
    val got = Sessionize.evSurvival(subj).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got.toSeq == Seq((1L, 5L, 2L, 0.4, 0.4), (2L, 2L, 1L, 0.5, 0.9)))
    // oracle form (session durations, uncensored): risk sets start at the
    // session count, decrease monotonically, and the hazard replays d/n
    val sessions = Sessionize.evSessionize(spark, sf).count()
    val orc = Sessionize.evSurvival(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(orc.nonEmpty && orc.head._2 == sessions)
    assert(orc.map(_._2).toSeq == orc.map(_._2).sorted.reverse.toSeq)
    orc.foreach { case (_, n, d, hz) =>
      assert(d > 0 && d <= n)
      val want = BigDecimal(d.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(hz == want)
    }
  }

  test("taColloc(docs): lift algebra on a hand corpus; planted pair surfaces") {
    import spark.implicits._
    // T=12 tokens, B=10 pairs; (p,q)=3, (q,p)=2, (a,a)=5
    val docs = Seq((1L, "p q p q p q"), (2L, "a a a a a a"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.taColloc(docs, minPair = 2, minLift = 2.0).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == Seq(("a", "a", 5L, 6L, 6L, 2.0),
      ("p", "q", 3L, 3L, 3L, 4.8), ("q", "p", 2L, 3L, 3L, 3.2)))
    // oracle form: the planted collocation dominates; every natural pair
    // stays under the cut
    val orc = TextAnalysis.taColloc(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(5)))
    assert(orc.exists { case (w1, w2, l) =>
      w1 == "aurora" && w2 == "borealis" && l > 50.0 })
    assert(orc.forall { case (w1, w2, _) =>
      Set(w1, w2).exists(Set("aurora", "borealis")) })
  }

  test("evLag(events): conditional-min firsts, ordering guard, log2 buckets") {
    import spark.implicits._
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // user 1: first view t=100, first purchase t=110 -> lag 10 s, bucket
    //   floor(log2 11) = 3; the later view (t=105) must not move the min
    // user 2: view 200, purchase 201 -> lag 1 s, bucket floor(log2 2) = 1
    // user 3: purchase BEFORE first view -> excluded by the ordering guard
    // user 4: view only -> excluded (never converts)
    val evs = Seq(
      (1L, t(100), 1L, "view", 0.0), (2L, t(110), 1L, "purchase", 0.0),
      (3L, t(105), 1L, "view", 0.0),
      (4L, t(200), 2L, "view", 0.0), (5L, t(201), 2L, "purchase", 0.0),
      (6L, t(300), 3L, "purchase", 0.0), (7L, t(305), 3L, "view", 0.0),
      (8L, t(400), 4L, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Sessionize.evLag(evs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq == Seq((1L, 1L, 1L, 1L, 1.0), (3L, 1L, 10L, 10L, 10.0)))
    // oracle form: buckets ordered, counts positive, mean within [min,max]
    val orc = Sessionize.evLag(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(orc.nonEmpty)
    orc.foreach { case (_, n, lo, hi, mean) =>
      assert(n > 0 && lo <= hi && mean >= lo && mean <= hi) }
  }

  test("evStickiness(events): DAU/WAU algebra on two hand weeks") {
    import spark.implicits._
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val mon = 4L * 86400 // 1970-01-05, a Monday
    val tue = mon + 86400
    val mon2 = mon + 7 * 86400
    // week 1: u1 active Mon+Tue, u2 Mon only -> DAU 2,1; WAU 2 -> 0.75
    // week 2: u1 Mon only -> 1.0; duplicate same-day events collapse
    val evs = Seq(
      (1L, t(mon), 1L, "view", 0.0), (2L, t(mon + 60), 1L, "click", 0.0),
      (3L, t(tue), 1L, "view", 0.0), (4L, t(mon + 5), 2L, "view", 0.0),
      (5L, t(mon2), 1L, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Sessionize.evStickiness(evs)
      .selectExpr("CAST(week AS STRING) AS week", "n_days", "sum_dau", "wau",
        "stickiness")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq == Seq(("1970-01-05", 2L, 3L, 2L, 0.75),
      ("1970-01-12", 1L, 1L, 1L, 1.0)))
    // oracle form: stickiness bounded by (1/7, 1]
    val orc = Sessionize.evStickiness(spark, sf).collect()
      .map(r => r.getDouble(4))
    assert(orc.nonEmpty && orc.forall(x => x > 1.0 / 7 - 1e-9 && x <= 1.0))
  }

  test("dsClassWeight: inverse-frequency algebra, mass conserved") {
    import spark.implicits._
    // N=4, K=2: class a (3 docs) -> 4/(2*3) = 0.666667; b (1) -> 2.0
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"))
      .toDF("doc_id", "lang")
    val got = Pipeline.dsClassWeight(docs, "lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(("a", 3L, 0.666667), ("b", 1L, 2.0)))
    // weighted mass sums back to N (up to 6-dp rounding per class)
    val orc = Pipeline.dsClassWeight(spark, sf).collect()
      .map(r => (r.getLong(1), r.getDouble(2)))
    val n = orc.map(_._1).sum
    val mass = orc.map { case (c, w) => c * w }.sum
    assert(math.abs(mass - n) < 1e-3 * n)
  }

  test("taCodeFrac: keyword and symbol-density routes, planted rate") {
    import spark.implicits._
    // doc 1: two keywords; doc 3: symbol density 6/10 > 5%; doc 2: prose
    val docs = Seq(("s", "def foo return x"), ("s", "plain words here"),
      ("s", "x = (y);{}")).toDF("source", "text")
    val got = TextAnalysis.taCodeFrac(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(("s", 3L, 2L, 0.666667)))
    // oracle form: the corpus has ZERO natural keywords/symbols
    // (measured), so n_code must equal the planted doc_id % 9 == 0 count
    val planted = graft.Tables.load(spark, sf, "documents")
      .filter("doc_id % 9 = 0").count()
    val orc = TextAnalysis.taCodeFrac(spark, sf).collect()
    assert(orc.map(_.getLong(2)).sum == planted)
  }

  test("ssCosHist: hand vectors land in the exact lag-pair buckets") {
    import spark.implicits._
    // ids 0,1,7: lag-1 pair (0,1) cos 0 -> bucket 0; lag-7 pair (0,7)
    // cos -1 -> bucket -20; no lag-29 partner exists
    val emb = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f)),
      (7L, Array(-1f, 0f))).toDF("vec_id", "embedding")
    val got = Similarity.ssCosHist(emb).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == Seq((-20, 1L, -1.0, -1.0), (0, 1L, 0.0, 0.0)))
    // oracle form: pair count is exactly the available lag partners
    val orc = Similarity.ssCosHist(spark, sf).collect()
    val nPairs = orc.map(_.getLong(1)).sum
    val nVec = graft.Tables.load(spark, sf, "embeddings").count()
    assert(nPairs == (nVec - 1) + (nVec - 7) + (nVec - 29))
  }

  test("dsSplitDrift: zero on identical splits, exact KS vs Scala replay") {
    import spark.implicits._
    // uniform corpus: both splits see only length 3 -> D = 0 at len 3
    val same = (1L to 40L).map(i => (i, "a b c")).toDF("doc_id", "text")
    val z = Pipeline.dsSplitDrift(same).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(z.length == 1 && z(0)._3 == 0.0 && z(0)._4 == 3)
    assert(z(0)._1 + z(0)._2 == 40L)
    // full independent replay of the hash split + exact KS on the corpus
    val docs = graft.Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "size(split(text, ' ')) AS len").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def grp(id: Long): Int = {
      val h = md.digest(s"drift:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val d1 = "0123456789abcdef".indexOf(h(0))
      val d2 = "0123456789abcdef".indexOf(h(1))
      (d1 * 16 + d2) % 2
    }
    val a = docs.filter(d => grp(d._1) == 0).map(_._2)
    val b = docs.filter(d => grp(d._1) == 1).map(_._2)
    val lens = (a ++ b).distinct.sorted
    val cand = lens.map { l =>
      val num = math.abs(a.count(_ <= l).toLong * b.length -
        b.count(_ <= l).toLong * a.length)
      (num, l)
    }
    val mx = cand.map(_._1).max
    val atLen = cand.filter(_._1 == mx).map(_._2).min
    val wantD = BigDecimal(mx.toDouble / (a.length.toDouble * b.length))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Pipeline.dsSplitDrift(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.toSeq == Seq((a.length.toLong, b.length.toLong, wantD, atLen)))
  }

  test("evLifespan: span extremes per user, single-touch lands bucket 0") {
    import spark.implicits._
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val evs = Seq(
      (1L, t(100), 1L, "view", 0.0), (2L, t(110), 1L, "click", 0.0),
      (3L, t(500), 2L, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Sessionize.evLifespan(evs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq == Seq((0L, 1L, 0L, 0L, 0.0), (3L, 1L, 10L, 10L, 10.0)))
    val orc = Sessionize.evLifespan(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(orc.nonEmpty)
    orc.foreach { case (n, lo, hi, m) =>
      assert(n > 0 && lo <= hi && m >= lo && m <= hi) }
  }

  test("dsPackEff: padding vs ideal bin arithmetic on a hand corpus") {
    import spark.implicits._
    // tokens 3 and 5 at L=4: pad bins 1+2=3 (util 8/12), ideal 2 (util 1)
    val docs = Seq((1L, "a b c"), (2L, "a b c d e")).toDF("doc_id", "text")
    val got = Pipeline.dsPackEff(docs, Seq(4)).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5), r.getDouble(6)))
    assert(got.toSeq == Seq((4, 2L, 8L, 3L, 0.666667, 2L, 1.0)))
    // oracle form: ideal never needs more bins than padding; utils <= 1
    val orc = Pipeline.dsPackEff(spark, sf).collect()
      .map(r => (r.getLong(3), r.getDouble(4), r.getLong(5), r.getDouble(6)))
    assert(orc.nonEmpty)
    orc.foreach { case (pb, pu, ib, iu) =>
      assert(ib <= pb && pu <= iu && iu <= 1.0 && pu > 0.0) }
  }

  test("taNonAscii: byte-vs-char arithmetic, planted accents surface") {
    import spark.implicits._
    val docs = Seq(("s", "abc"), ("s", "café")).toDF("source", "text")
    val got = TextAnalysis.taNonAscii(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq == Seq(("s", 2L, 1L, 1L, 0.125)))
    // oracle form: ASCII corpus (measured) + plant every 11th doc
    val planted = graft.Tables.load(spark, sf, "documents")
      .filter("doc_id % 11 = 0").count()
    val orc = TextAnalysis.taNonAscii(spark, sf).collect()
    assert(orc.map(_.getLong(2)).sum == planted)
  }

  test("ssOutliers: the cross-label plant is the farthest from centroid") {
    import spark.implicits._
    // label 0: three (1,0) + one (0,1) -> centroid sum (3,1); the odd
    // vector's cos 1/sqrt(10) = .316 is the bottom rank
    val emb = Seq((1L, Array(1f, 0f), 0), (2L, Array(1f, 0f), 0),
      (3L, Array(1f, 0f), 0), (4L, Array(0f, 1f), 0))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.ssOutliers(emb, topK = 1).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq == Seq((0, 4L, 0.316228, 1L)))
    // oracle form: ranks dense per label, cosines within [-1, 1]
    val orc = Similarity.ssOutliers(spark, sf).collect()
      .map(r => (r.getInt(0), r.getDouble(2), r.getLong(3)))
    assert(orc.nonEmpty)
    orc.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length))
      rs.foreach { case (_, c, _) => assert(c >= -1.0 && c <= 1.0) }
    }
  }

  test("ddPrefixOn(docs): shared 32-token heads group, tails don't split") {
    import spark.implicits._
    val prefix = (1 to 32).map("p" + _).mkString(" ")
    // docs 1+2: same 32-token head, one extended tail -> one family
    // docs 4+5: short exact twins (whole text IS the prefix) -> one family
    // doc 3: unique head -> no group
    val docs = Seq(
      (1L, prefix), (2L, prefix + " tail"), (3L, "something else entirely"),
      (4L, "short text"), (5L, "short text"))
      .toDF("doc_id", "text")
    val got = Dedup.ddPrefixOn(docs).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4)))
    assert(got.toSet == Set((2L, 1L, 32, 33), (2L, 4L, 2, 2)))
    // oracle form: families are non-trivial and keeper is the group min
    val orc = Dedup.ddPrefix(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4)))
    orc.foreach { case (n, _, lo, hi) => assert(n > 1 && lo <= hi) }
  }

  test("ddEditDistOn: typo twins link, blocked-away and far edits don't") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kk"
    val docs = Seq(
      (1L, base),
      // one substitution at position 11 — same length bucket, same
      // 8-char block key, head distance exactly 1
      (2L, base.substring(0, 10) + "X" + base.substring(11)),
      // identical except the FIRST char — dist 1 but the block key
      // differs: the declared blocking miss, must NOT link
      (3L, "Zlpha" + base.substring(5)),
      // same block key and bucket but 5 edits inside the window
      (4L, base.substring(0, 12) + "ABCDE" + base.substring(17)),
      // unrelated
      (5L, "completely different text about nothing in particular ok"))
      .toDF("doc_id", "text")
    val got = Dedup.ddEditDistOn(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 1L)),
      s"expected exactly the typo-twin pair: ${got.toSeq}")
    // wider bar admits the 5-edit variant, still not the blocked-away
    // one; (2,4) stays out at distance 6
    val wide = Dedup.ddEditDistOn(docs, maxDist = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wide == Set((1L, 2L), (1L, 4L)))
    // oracle form: every planted twin (doc_id % 7 = 0) links to its
    // original at distance <= 1
    val orc = Dedup.ddEditDist(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val twinPairs = orc.filter(t =>
      t._2 == t._1 + Dedup.TwinIdOffset)
    val nPlanted = spark.read.parquet(s"$sf/documents.parquet")
      .where("doc_id % 7 = 0").count()
    assert(twinPairs.length == nPlanted &&
      twinPairs.forall(_._3 <= 1L),
      s"planted twins: ${twinPairs.length} of $nPlanted")
  }

  test("evTrigrams(events): ordered per-user trigrams, tie-broken rank") {
    import spark.implicits._
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // user 1: a b c d -> (a,b,c), (b,c,d); user 2: a b c -> (a,b,c)
    val evs = Seq(
      (1L, t(10), 1L, "a", 0.0), (2L, t(11), 1L, "b", 0.0),
      (3L, t(12), 1L, "c", 0.0), (4L, t(13), 1L, "d", 0.0),
      (5L, t(20), 2L, "a", 0.0), (6L, t(21), 2L, "b", 0.0),
      (7L, t(22), 2L, "c", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Sessionize.evTrigrams(evs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(("a", "b", "c", 2L, 1L), ("b", "c", "d", 1L, 2L)))
    // oracle form: ranks are 1..k, counts non-increasing
    val orc = Sessionize.evTrigrams(spark, sf).collect()
      .map(r => (r.getLong(3), r.getLong(4)))
    assert(orc.map(_._2).toSeq == (1L to orc.length).toSeq)
    assert(orc.map(_._1).toSeq == orc.map(_._1).sortBy(-_).toSeq)
  }

  test("evDecay: dyadic day-decay algebra on hand users") {
    import spark.implicits._
    def t(day: Long) = new java.sql.Timestamp(day * 86400000L)
    // T = 10; u1 active days 10, 9 -> 1 + 1/2; u2 active day 8 -> 1/4;
    // duplicate same-day events collapse before scoring
    val evs = Seq(
      (1L, t(10), 1L, "view", 0.0), (2L, t(9), 1L, "click", 0.0),
      (3L, t(9), 1L, "view", 0.0), (4L, t(8), 2L, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Sessionize.evDecay(evs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 2L, 1.5), (2L, 1L, 0.25)))
    // oracle form: scores bounded by the geometric series limit 2
    // (inclusive on 6-dp ROUNDED values: 2 - 2^-29 rounds to 2.0)
    val orc = Sessionize.evDecay(spark, sf).collect()
      .map(r => (r.getLong(1), r.getDouble(2)))
    assert(orc.nonEmpty)
    orc.foreach { case (n, sc) => assert(sc > 0.0 && sc <= 2.0 && n >= 1) }
  }

  test("evDecay: activity 63+ days old contributes 0, not a wrapped shift") {
    import spark.implicits._
    def t(day: Long) = new java.sql.Timestamp(day * 86400000L)
    // T = 100. u1's day-0 activity is 100 days old: the true term 2^-100
    // is below 1 ulp, but Spark's (and DuckDB's) shift count wraps mod 64,
    // so an unclamped shiftleft(1, 100) = 2^36 scored it ~0.0000000146 —
    // and 2^64 wrapped to 2^0, scoring a 64-day-old visit a full 1.0.
    // u2 pins the wrap point exactly: day 36 is 64 days old.
    val evs = Seq(
      (1L, t(100), 1L, "view", 0.0), (2L, t(0), 1L, "view", 0.0),
      (3L, t(36), 2L, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Sessionize.evDecay(evs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 2L, 1.0), (2L, 1L, 0.0)))
  }

  test("taVocabJaccard: set algebra on hand sources") {
    import spark.implicits._
    val docs = Seq(("s1", "a b"), ("s2", "b c"), ("s3", "a b"))
      .toDF("source", "text")
    val got = TextAnalysis.taVocabJaccard(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq == Seq(("s1", "s2", 1L, 3L, 0.333333),
      ("s1", "s3", 2L, 2L, 1.0), ("s2", "s3", 1L, 3L, 0.333333)))
    // oracle form: C(sources, 2) rows, jaccard within (0, 1]
    val orc = TextAnalysis.taVocabJaccard(spark, sf).collect()
      .map(r => r.getDouble(4))
    val k = graft.Tables.load(spark, sf, "documents")
      .select("source").distinct().count()
    assert(orc.length == k * (k - 1) / 2)
    orc.foreach(j => assert(j > 0.0 && j <= 1.0))
  }

  test("dsIngestBias: perfect trends read +/-1, random corpus reads ~0") {
    import spark.implicits._
    def corpus(lens: Seq[Int]) = lens.zipWithIndex
      .map { case (l, i) => (i.toLong + 1, (1 to l).map(_ => "w").mkString(" ")) }
      .toDF("doc_id", "text")
    val up = Pipeline.dsIngestBias(corpus(Seq(1, 2, 3, 4))).collect()
    assert(up.map(r => (r.getLong(0), r.getDouble(1))).toSeq == Seq((4L, 1.0)))
    val down = Pipeline.dsIngestBias(corpus(Seq(4, 3, 2, 1))).collect()
    assert(down(0).getDouble(1) == -1.0)
    val orc = Pipeline.dsIngestBias(spark, sf).collect()
    assert(orc.length == 1 && math.abs(orc(0).getDouble(1)) < 0.2)
  }

  test("evSrm: hash split replays, planted imbalance trips the flag") {
    import spark.implicits._
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val md = java.security.MessageDigest.getInstance("MD5")
    def grp(id: Long): Int = {
      val h = md.digest(s"srm:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      ("0123456789abcdef".indexOf(h(0)) * 16 +
        "0123456789abcdef".indexOf(h(1))) % 2
    }
    // planted SRM: 30 grp-0 users, 2 grp-1 users -> chi2 = 28^2/32 = 24.5
    val zeros = (1L to 1000L).filter(grp(_) == 0).take(30)
    val ones = (1L to 1000L).filter(grp(_) == 1).take(2)
    val evs = (zeros ++ ones).zipWithIndex.map { case (u, i) =>
      (i.toLong, t(i.toLong), u, "view", 0.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Sessionize.evSrm(evs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(got.toSeq == Seq((30L, 2L, 24.5, true)))
    // oracle form: the testdata's hash split is healthy (no SRM), and
    // the cells replay the Scala-side assignment exactly
    val users = graft.Tables.load(spark, sf, "events")
      .select("user_id").distinct().collect().map(_.getLong(0))
    val wantA = users.count(grp(_) == 0).toLong
    val orc = Sessionize.evSrm(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
    assert(orc.toSeq == Seq((wantA, users.length - wantA, false)))
  }

  test("ddHammingHist: cumulative histogram is consistent with the pairs cut") {
    val hist = Dedup.ddHammingHist(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hist.nonEmpty)
    // cum replays the running sum; pairs at <= 3 equal dd_simhash_pairs
    var run = 0L
    hist.foreach { case (_, n, cum) => run += n; assert(cum == run) }
    val cut3 = hist.filter(_._1 <= 3).map(_._2).sum
    val pairs = Dedup.ddSimhashPairs(spark, sf).count()
    assert(cut3 == pairs && pairs > 0)
  }

  test("evAutocorr: alternating series reads -1, constant series NULL") {
    import spark.implicits._
    def t(min: Long, off: Int) =
      new java.sql.Timestamp(min * 60000L + off * 1000L)
    // 'a': minute counts 3,1,3,1,3 -> lag-1 r = -1 exactly;
    // 'b': constant 2,2,2 -> zero variance -> NULL (guard)
    val aCounts = Seq(0 -> 3, 1 -> 1, 2 -> 3, 3 -> 1, 4 -> 3)
    val aEvs = aCounts.flatMap { case (m, k) =>
      (0 until k).map(i => (m.toLong, i, "a")) }
    val bEvs = (0 to 2).flatMap(m => (0 until 2).map(i => (m.toLong, i, "b")))
    val evs = (aEvs ++ bEvs).zipWithIndex.map { case ((m, off, ty), i) =>
      (i.toLong, t(m, off), 1L, ty, 0.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Sessionize.evAutocorr(evs).collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(got.toSeq == Seq(("a", 4L, Some(-1.0)), ("b", 2L, None)))
    // oracle form: the Poisson generator is memoryless -> |r| stays tiny
    val orc = Sessionize.evAutocorr(spark, sf).collect()
      .map(r => r.getDouble(2))
    assert(orc.nonEmpty && orc.forall(r => math.abs(r) < 0.05))
  }

  test("ssLabelSep: same/cross pair means on hand vectors") {
    import spark.implicits._
    // pair (0,1): same label, cos 0; pair (0,7): cross label, cos -1
    val emb = Seq((0L, Array(1f, 0f), 0), (1L, Array(0f, 1f), 0),
      (7L, Array(-1f, 0f), 1)).toDF("vec_id", "embedding", "label")
    val got = Similarity.ssLabelSep(emb).collect()
      .map(r => (r.getBoolean(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((false, 1L, -1.0), (true, 1L, 0.0)))
    // oracle form: both rows present, pair total == the coshist total
    val orc = Similarity.ssLabelSep(spark, sf).collect()
      .map(r => (r.getBoolean(0), r.getLong(1)))
    assert(orc.map(_._1).toSet == Set(true, false))
    val nVec = graft.Tables.load(spark, sf, "embeddings").count()
    assert(orc.map(_._2).sum == (nVec - 1) + (nVec - 7) + (nVec - 29))
  }

  test("evDispersion(events): metronome reads 0, bursty type reads > 1") {
    import spark.implicits._
    def t(min: Long, off: Int) =
      new java.sql.Timestamp(min * 60000L + off * 1000L)
    // 'a': one event per minute 0..3 (var 0 -> fano 0);
    // 'b': 3 events in minute 0, 1 in minute 3 -> fano 1.5
    val evs = (Seq((0L, "a"), (1L, "a"), (2L, "a"), (3L, "a"),
      (0L, "b"), (0L, "b"), (0L, "b"), (3L, "b")).zipWithIndex)
      .map { case ((m, ty), i) => (i.toLong, t(m, i % 10), 1L, ty, 0.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Sessionize.evDispersion(evs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(("a", 4L, 4L, 0.0), ("b", 4L, 4L, 1.5)))
    val orc = Sessionize.evDispersion(spark, sf).collect()
      .map(r => r.getDouble(3))
    assert(orc.nonEmpty && orc.forall(_ >= 0.0))
  }

  test("dsGroupSplit: a group never straddles splits; labels are the split set") {
    import spark.implicits._
    val docs = (1L to 60L).map(i => (i, s"src${i % 7}", s"text $i"))
      .toDF("doc_id", "source", "text")
    val got = Pipeline.dsGroupSplit(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.length == 60)
    assert(got.map(_._3).toSet.subsetOf(Set("train", "val", "test")))
    // group integrity: every source maps to exactly one split
    val bySource = got.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    bySource.foreach { case (src, splits) =>
      assert(splits.size == 1, s"$src straddles: $splits")
    }
    // deterministic: a second run assigns identically
    val again = Pipeline.dsGroupSplit(docs).collect()
      .map(r => (r.getLong(0), r.getString(2))).toMap
    got.foreach { case (id, _, sp) => assert(again(id) == sp) }
  }

  test("taFertility: BPE merge replay gives the hand-counted ratios per lang") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "ta table"), // ta->1 token; table->tab+le = 2 tokens
      (2L, "de", "le le")) // le->1 token, twice
      .toDF("doc_id", "lang", "text")
    val merges = Seq((1, "t", "a"), (2, "ta", "b"), (3, "l", "e"))
      .toDF("merge_round", "lhs", "rhs")
    val got = TextAnalysis.taFertility(docs, merges).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got("en") == ((2L, 7L, 3L, 1.5, 2.333333)))
    assert(got("de") == ((2L, 4L, 2L, 1.0, 2.0)))
  }

  test("evHoltWinters: SQL fold == an independent Scala replay; weekly plant reads") {
    import spark.implicits._
    // planted: type 'w' cycles with period 7 (amplitude 6) over 21 days
    // on a +1/day trend; type 'f' is flat
    def t0 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    val evs = (for {
      d <- 0 until 21
      base = 10 + d + (if (d % 7 < 3) 3 else -3)
      i <- 0 until base
    } yield (d.toLong * 100 + i, new java.sql.Timestamp(
      t0 + d * 86400000L + (i % 12) * 3600000L), i.toLong, "w", 1.0)) ++
      (for { d <- 0 until 21; i <- 0 until 5 }
        yield ((d + 50).toLong * 100 + i, new java.sql.Timestamp(
          t0 + d * 86400000L + (i % 12) * 3600000L), i.toLong, "f", 1.0))
    val df = evs.toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Sessionize.evHoltWinters(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    // independent replay with Math.floorDiv over the daily counts
    def replay(ys: Seq[Long]) = {
      val M = 1000000L
      val l0 = ys.take(7).sum * M / 7
      var (l, b, sae, t) = (l0, 0L, 0L, 7L)
      val s = ys.take(7).map(_ * M - l0).toArray
      ys.drop(7).foreach { y =>
        val slot = (t % 7).toInt
        val pred = l + b + s(slot)
        sae += math.abs(y * M - pred)
        val lN = Math.floorDiv(y * M - s(slot) + l + b, 2L)
        val bN = Math.floorDiv((lN - l) + b, 2L)
        s(slot) = Math.floorDiv(y * M - lN + s(slot), 2L)
        l = lN; b = bN; t += 1
      }
      def r6(x: Double) = java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      (t, r6(l.toDouble / 1e6), r6(b.toDouble / 1e6),
        r6((l + b + s((t % 7).toInt)).toDouble / 1e6),
        if (t <= 7) 0.0 else r6(sae.toDouble / (1e6 * (t - 7))),
        r6((s.max - s.min).toDouble / 1e6))
    }
    val wCounts = (0 until 21)
      .map(d => (10 + d + (if (d % 7 < 3) 3 else -3)).toLong)
    assert(got("w") == replay(wCounts), s"w: ${got("w")}")
    assert(got("f") == replay(Seq.fill(21)(5L)))
    // the plant reads: seasonal amplitude near the planted 6, flat type
    // reads 0 amplitude and 0 error
    assert(got("w")._6 > 3.0 && got("f")._6 == 0.0 && got("f")._5 == 0.0)
  }

  test("evTheil: equal mass reads zero; a whale concentrates within its type") {
    import spark.implicits._
    def evs(rows: Seq[(String, Long, Double)]) = rows.zipWithIndex
      .map { case ((ty, u, v), i) =>
        (i.toLong, new java.sql.Timestamp(i * 1000L), u, ty, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    // flat: 4 users x 2 types, every (type, user) total 2.0 — no
    // inequality anywhere; every component must read exactly 0
    val flat = evs(for { t <- Seq("a", "b"); u <- 1L to 4L }
      yield (t, u, 2.0))
    val f = Sessionize.evTheil(flat).collect()
      .map(r => (r.getString(0), r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getDouble(6)))
    assert(f.toSeq == Seq(("a", 0.0, 0.0, 0.0, 0.0),
      ("b", 0.0, 0.0, 0.0, 0.0)))
    // whale: type b user 9 carries 14.0 vs 2.0 peers — inequality is
    // WITHIN b (t_within(b) > 0, t_within(a) = 0) and the mix shift
    // also moves mass between types (theil_between > 0)
    val whale = evs((for { t <- Seq("a", "b"); u <- 1L to 4L }
      yield (t, u, 2.0)) :+ ("b", 9L, 14.0))
    val w = Sessionize.evTheil(whale).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3),
        r.getDouble(5), r.getDouble(6))).toMap
    assert(w("a")._2 == 0.0 && w("b")._2 > 0.0)
    assert(w("a")._3 > 0.0 && w("a")._3 == w("b")._3) // shared between
    assert(w("b")._4 > w("b")._3) // total = between + within mass
    // decomposition identity: total == between + share-weighted within
    val rows = Sessionize.evTheil(whale).collect()
    val between = rows.head.getDouble(5)
    val total = rows.head.getDouble(6)
    val withinMass = rows.map(r =>
      (r.getDouble(2) / rows.map(_.getDouble(2)).sum) * r.getDouble(3)).sum
    assert(math.abs(total - (between + withinMass)) < 1e-5,
      s"decomposition drift: $total vs ${between + withinMass}")
  }

  test("taRarity(docs): ubiquitous tokens read 0, rare tokens lift the mean") {
    import spark.implicits._
    // 'c' in all 4 docs (idf 0); 'r' only in doc 1 (idf log2 4 = 2)
    val docs = Seq((1L, "c r"), (2L, "c"), (3L, "c"), (4L, "c"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.taRarity(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 2L, 1.0), (2L, 1L, 0.0), (3L, 1L, 0.0),
      (4L, 1L, 0.0)))
    val orc = TextAnalysis.taRarity(spark, sf).collect()
      .map(r => r.getDouble(2))
    assert(orc.nonEmpty && orc.forall(_ >= 0.0))
  }

  test("dsLeakage(docs): a held-out twin of a train text is flagged") {
    import spark.implicits._
    // find one train id and one heldout id under the split digest rule
    def side(id: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      if ("0123456789abcdef".indexOf(h.charAt(0)) < 12) "train" else "heldout"
    }
    val trainId = (1L to 100L).find(side(_) == "train").get
    val heldIds = (1L to 100L).filter(side(_) == "heldout").take(2)
    val docs = Seq(
      (trainId, "shared text body"),
      (heldIds(0), "shared text body"),   // leaked
      (heldIds(1), "unique held out"))    // clean
      .toDF("doc_id", "text")
    val got = Pipeline.dsLeakage(docs).collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(got == Map(heldIds(0) -> true, heldIds(1) -> false))
    // oracle form: natural duplicates leak; flags are a subset of heldout
    val orc = Pipeline.dsLeakage(spark, sf).collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    assert(orc.nonEmpty)
  }

  test("taCondEntropy(docs): deterministic chain = 0, hand split exact") {
    import spark.implicits._
    val docs = Seq(("a b a b a b", "s1"), ("x x y y", "s2"))
      .toDF("text", "source")
    val got = TextAnalysis.taCondEntropy(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // s1: transitions fully determined by the current token -> 0 bits;
    // s2: pairs xx,xy,yy each once, firsts x:2 y:1 -> 2/3 bits
    assert(got.toSeq == Seq(("s1", 5L, 0.0), ("s2", 3L, 0.666667)))
    val orc = TextAnalysis.taCondEntropy(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(2)))
    assert(orc.nonEmpty && orc.forall(_._2 >= 0.0))
  }

  test("evHod(events): pinned UTC hours, shares close per type") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val evs = Seq(t("2024-06-01 09:10:00"), t("2024-06-01 09:50:00"),
      t("2024-06-01 23:00:00")).zipWithIndex
      .map { case (ts, i) => (i.toLong, ts, 1L, "view", 0.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Sessionize.evHod(evs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(("view", 9L, 2L, 0.666667), ("view", 23L, 1L,
      0.333333)))
    val orc = Sessionize.evHod(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
    assert(orc.nonEmpty && orc.forall(t => t._2 >= 0 && t._2 <= 23))
    orc.groupBy(_._1).foreach { case (_, rows) =>
      assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
    }
  }

  test("evGrowth(events): new/retained/resurrected/churned decomposition") {
    import spark.implicits._
    val week = 604800000L // ms
    def t(wk: Long, off: Int) = new java.sql.Timestamp(wk * week + off * 1000L)
    // u1: weeks 0,1,3 (retained in 1, resurrected in 3); u2: week 1 only
    val evs = Seq((1L, 0L), (1L, 1L), (1L, 3L), (2L, 1L)).zipWithIndex
      .map { case ((u, wk), i) => (i.toLong, t(wk, i), u, "view", 0.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Sessionize.evGrowth(evs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (0L, 1L, 1L, 0L, 0L, 0L),
      (1L, 2L, 1L, 1L, 0L, 0L),   // u1 retained, u2 new; none churned
      (3L, 1L, 0L, 0L, 1L, 0L)))  // u1 resurrected; week 2 has no row
    // oracle form: decomposition closes every week
    val orc = Sessionize.evGrowth(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(orc.nonEmpty)
    orc.foreach { case (act, nw, ret, res) => assert(nw + ret + res == act) }
  }

  test("taChecksum(docs): order-free sum replays the digest fold") {
    import spark.implicits._
    def lead6(text: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.take(6), 16)
    }
    val docs = Seq(("a b c", "s1"), ("d e", "s1"), ("f", "s2"))
      .toDF("text", "source")
    val got = TextAnalysis.taChecksum(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("s1", 2L, 5L, lead6("a b c") + lead6("d e")),
      ("s2", 1L, 1L, lead6("f"))))
    // shuffled input: identical checksums (order-free by construction)
    val again = TextAnalysis.taChecksum(
      docs.orderBy(org.apache.spark.sql.functions.rand(7))).collect()
      .map(r => (r.getString(0), r.getLong(3)))
    assert(again.toMap == got.map(t => (t._1, t._4)).toMap)
  }

  test("dsDropout(docs): reproducible, rate-bounded, zero-rate identity") {
    import spark.implicits._
    val docs = (1L to 50L)
      .map(i => (i, (1 to 40).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val a = Pipeline.dsDropout(docs, 0.1).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    val b = Pipeline.dsDropout(docs, 0.1).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(a.toSeq == b.toSeq)                      // byte-reproducible
    val (orig, kept) = (a.map(_._2).sum, a.map(_._3).sum)
    val dropRate = 1.0 - kept.toDouble / orig
    assert(dropRate > 0.05 && dropRate < 0.15, s"rate off: $dropRate")
    // kept tokens are a subsequence of the original (order preserved)
    a.foreach { case (_, _, _, t) =>
      val ks = t.split(' ').filter(_.nonEmpty).map(_.drop(1).toInt)
      assert(ks.toSeq == ks.sorted.toSeq)
    }
    // zero rate: identity
    val z = Pipeline.dsDropout(docs, 0.0).collect()
    assert(z.forall(r => r.getInt(1) == r.getInt(2)))
  }

  test("taNovelty(docs): earlier-doc grams count as seen, first doc all-new") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d"), (2L, "a b c x"), (3L, "a b c d e"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.taNovelty(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 2L, 0L, 0.0), (2L, 2L, 1L, 0.5),
      (3L, 3L, 2L, 0.666667)))
    // oracle form: fractions replay, the FIRST document is always all-new
    val orc = TextAnalysis.taNovelty(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(orc.nonEmpty && orc.head._3 == 0L)
    orc.foreach { case (_, n, seen, f) =>
      assert(seen <= n)
      val want = BigDecimal(seen.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(f == want)
    }
  }

  test("evEntropy(events): hand distributions — uniform=log2(k), single=0") {
    import spark.implicits._
    def t(i: Int) = java.sql.Timestamp.valueOf(f"2024-06-01 10:00:$i%02d")
    // user 1: 2+2 over two types -> H = 1 bit; user 2: one type -> 0;
    // user 3: 3/1 split -> H = 2 - 0.75*log2(3) = 0.811278
    val evs = Seq((1L, "a"), (1L, "a"), (1L, "b"), (1L, "b"), (2L, "a"),
      (3L, "a"), (3L, "a"), (3L, "a"), (3L, "b")).zipWithIndex
      .map { case ((u, ty), i) => (i.toLong, t(i), u, ty, 0.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Sessionize.evEntropy(evs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 4L, 2L, 1.0), (2L, 1L, 1L, 0.0),
      (3L, 4L, 2L, 0.811278)))
    // oracle form: 0 <= H <= log2(n_types), every user present
    val orc = Sessionize.evEntropy(spark, sf).collect()
      .map(r => (r.getLong(2), r.getDouble(3)))
    assert(orc.nonEmpty)
    orc.foreach { case (k, h) =>
      assert(h >= 0.0 && h <= math.log(k.toDouble) / math.log(2) + 1e-9)
    }
  }

  test("evOverlap(events): hand audiences, jaccard algebra corpus-wide") {
    import spark.implicits._
    def t(i: Int) = java.sql.Timestamp.valueOf(f"2024-06-01 10:00:$i%02d")
    // view: {1,2,3}, click: {2,3}, purchase: {3}
    val evs = Seq((1L, "view"), (2L, "view"), (3L, "view"), (2L, "click"),
      (3L, "click"), (3L, "purchase")).zipWithIndex
      .map { case ((u, ty), i) => (i.toLong, t(i), u, ty, 0.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Sessionize.evOverlap(evs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      ("click", "purchase", 1L, 2L, 1L, 0.5),
      ("click", "view", 2L, 2L, 3L, 0.666667),
      ("purchase", "view", 1L, 1L, 3L, 0.333333)))
    // oracle form: jaccard replays |∩|/|∪| for every pair
    val orc = Sessionize.evOverlap(spark, sf).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(orc.nonEmpty)
    orc.foreach { case (b, na, nb, j) =>
      assert(b <= math.min(na, nb))
      val want = BigDecimal(b.toDouble / (na + nb - b))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(j == want)
    }
  }

  test("taHeaps(docs): dense-id deciles, growth curve monotone and closing") {
    import spark.implicits._
    // 10 docs, ids 0..9: 'c' everywhere plus one unique token per doc
    val docs = (0L to 9L).map(i => (i, s"c u$i")).toDF("doc_id", "text")
    val got = TextAnalysis.taHeaps(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == (0L to 9L).map(d =>
      (d, d + 1, 2 * (d + 1), d + 2)))
    // oracle form: all three curves monotone; the last row closes to the
    // corpus totals
    val orc = TextAnalysis.taHeaps(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(orc.nonEmpty && orc.length <= 10)
    Seq[Array[(Long, Long, Long, Long)] => Seq[Long]](
      _.map(_._2).toSeq, _.map(_._3).toSeq, _.map(_._4).toSeq).foreach { f =>
      val xs = f(orc)
      assert(xs == xs.sorted)
    }
    val docsTot = graft.Tables.load(spark, sf, "documents").count()
    assert(orc.last._2 == docsTot)
  }

  test("taBurstiness(docs): uniform word ~ concentrated word separate exactly") {
    import spark.implicits._
    // 4 docs; 'u' once per doc (uniform: fano = (4*4-16)/(4*4) = 0);
    // 'b' 4 times in ONE doc (bursty: fano = (4*16-16)/(4*4) = 3)
    val docs = Seq((1L, "u b b b b"), (2L, "u"), (3L, "u"), (4L, "u"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.taBurstiness(docs, topK = 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(("b", 4L, 1L, 3.0), ("u", 4L, 4L, 0.0)))
    // oracle form: 20 rows, fano replays the integer algebra, all >= 0
    val n = graft.Tables.load(spark, sf, "documents").count()
    val orc = TextAnalysis.taBurstiness(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(orc.length == 20)
    orc.foreach { case (tf, df, fano) =>
      assert(df <= n && fano >= 0.0)
      assert(tf >= df)
    }
  }

  test("evChurn(events): window edges half-open, planted churner labeled") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // wend = 06-15 12:00. W2 = (06-08 12:00, 06-15 12:00];
    // W1 = (06-01 12:00, 06-08 12:00].
    val evs = Seq(
      (1L, t("2024-06-15 12:00:00"), 1L),  // wend anchor, user 1 in W2
      (2L, t("2024-06-05 09:00:00"), 1L),  // user 1 in W1 -> retained
      (3L, t("2024-06-08 12:00:00"), 2L),  // boundary: belongs to W1
      (4L, t("2024-06-02 00:00:00"), 3L),  // user 3 only W1 -> churned
      (5L, t("2024-06-10 00:00:00"), 4L),  // user 4 only W2 -> absent
      (6L, t("2024-06-01 11:00:00"), 5L))  // before W1 -> absent
      .map { case (e, ts, u) => (e, ts, u, "view", 0.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Sessionize.evChurn(evs, 7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq == Seq((1L, 1L, 1L, false), (2L, 1L, 0L, true),
      (3L, 1L, 0L, true)))
    // oracle form: every W1-active user labeled; n_w2 = 0 iff churned
    val orc = Sessionize.evChurn(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(orc.nonEmpty)
    orc.foreach { case (n1, n2, ch) =>
      assert(n1 > 0 && ch == (n2 == 0))
    }
  }

  test("taJsd(docs): identical source == 0, disjoint vocab hand value") {
    import spark.implicits._
    // both sources equal the corpus distribution -> jsd exactly 0
    val same = Seq((1L, "x y", "A"), (2L, "x y", "B"))
      .toDF("doc_id", "text", "source")
    val z = TextAnalysis.taJsd(same).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(z.toSeq == Seq(("A", 2L, 0.0), ("B", 2L, 0.0)))
    // disjoint vocabularies: P=(a:1) vs corpus mix (a:.5, b:.5) — the
    // closed-form JSD is 0.311278 bits (hand fold in the comment)
    val dis = Seq((1L, "a a", "A"), (2L, "b b", "B"))
      .toDF("doc_id", "text", "source")
    val d = TextAnalysis.taJsd(dis).collect()
      .map(r => (r.getString(0), r.getDouble(2)))
    assert(d.toSeq == Seq(("A", 0.311278), ("B", 0.311278)))
    // oracle form: bounded in [0,1] bits, every source present
    val orc = TextAnalysis.taJsd(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(2)))
    assert(orc.nonEmpty)
    orc.foreach { case (_, j) => assert(j >= 0.0 && j <= 1.0) }
  }

  test("evDailyTop(events): rank/tiebreak on a hand day, group invariants") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // one (view, day) cell: u2 has 3 events, u1 and u3 have 2 each (u1
    // wins the tie by id), u4 has 1 and must be cut at k=3
    val evs = Seq(
      (1L, t("2024-06-03 10:00:00"), 2L), (2L, t("2024-06-03 10:01:00"), 2L),
      (3L, t("2024-06-03 10:02:00"), 2L), (4L, t("2024-06-03 11:00:00"), 1L),
      (5L, t("2024-06-03 11:01:00"), 1L), (6L, t("2024-06-03 12:00:00"), 3L),
      (7L, t("2024-06-03 12:01:00"), 3L), (8L, t("2024-06-03 13:00:00"), 4L))
      .map { case (e, ts, u) => (e, ts, u, "view", 0.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Sessionize.evDailyTop(evs, 3).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((2L, 3L, 1L), (1L, 2L, 2L), (3L, 2L, 3L)))
    // oracle form: <= 3 rows per cell, counts non-increasing down the rank
    val orc = Sessionize.evDailyTop(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(orc.nonEmpty)
    orc.groupBy(t => (t._1, t._2)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_._4)
      assert(byRank.length <= 3 && byRank.map(_._4).toSeq == (1L to byRank.length))
      val ns = byRank.map(_._3).toSeq
      assert(ns == ns.sorted.reverse)
    }
    // the rank cut rides a map-side WindowGroupLimit (the ds_sample shape)
    val plan = Sessionize.evDailyTop(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"group-limit pushdown lost")
  }

  test("dsSoftDedup(corpus, members): 1/|cluster| weights, singletons at 1.0") {
    import spark.implicits._
    val corpus = (1L to 6L).toDF("doc_id")
    // two clusters: {1,2} and {4,5,6}; doc 3 unclustered
    val members = Seq((1L, 1L), (2L, 1L), (4L, 4L), (5L, 4L), (6L, 4L))
      .toDF("doc_id", "canon_id")
    val got = Pipeline.dsSoftDedup(corpus, members).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 2L, 0.5), (2L, 2L, 0.5), (3L, 1L, 1.0),
      (4L, 3L, 0.333333), (5L, 3L, 0.333333), (6L, 3L, 0.333333)))
    // oracle form: every clustered doc's weight replays 1/cluster_size,
    // the twin-planted clusters exist, and effective mass < raw count
    val orc = Pipeline.dsSoftDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(orc.exists(_._2 >= 2L))
    orc.foreach { case (_, n, w) =>
      val want = BigDecimal(1.0 / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(w == want)
    }
    assert(orc.map(_._3).sum < orc.length)
  }

  test("taWinnow(docs): matches the reference winnowing fold, coverage holds") {
    import spark.implicits._
    // reference implementation straight from the paper: k-gram md5 hashes,
    // w-windows, rightmost window-minimum selected, distinct
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(x.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def winnowRef(text: String, k: Int, w: Int): Seq[(Long, String)] = {
      val toks = text.split(' ')
      val grams = toks.sliding(k).filter(_.length == k)
        .map(_.mkString(" ")).map(md5hex).toArray
      (0 to grams.length - w).flatMap { i =>
        val m = grams.slice(i, i + w).min
        val j = (i until i + w).filter(p => grams(p) == m).max
        Some(((j + 1).toLong, grams(j)))
      }.distinct.sorted
    }
    // repeated tokens force hash ties inside windows (rightmost rule)
    val texts = Seq(
      (1L, "a b a b a b a b a b"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "x y z"),  // exactly one gram, no full window
      (4L, "p q"))    // under k tokens: no grams at all
    val got = TextAnalysis.taWinnow(texts.toDF("doc_id", "text"), 3, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val want = texts.flatMap { case (id, t) =>
      winnowRef(t, 3, 4).map { case (p, h) => (id, p, h) } }
    assert(got.toSeq == want)
    // corpus: the paper's guarantee — within every w consecutive gram
    // positions of a long-enough doc there is at least one fingerprint
    val orc = TextAnalysis.taWinnow(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    assert(orc.nonEmpty)
    orc.foreach { case (_, rows) =>
      val ps = rows.map(_._2).sorted
      ps.sliding(2).foreach {
        case Array(a, b) => assert(b - a <= 4)
        case _ =>
      }
      assert(ps.head <= 4)
    }
  }

  test("evDow(events): ISO weekday counts and shares on pinned dates") {
    import spark.implicits._
    // 2024-06-03 was a Monday; 2024-06-09 a Sunday
    def t(d: Int) = java.sql.Timestamp.valueOf(f"2024-06-$d%02d 10:00:00")
    val evs = Seq((1L, t(3), 1L, "A", 0.0), (2L, t(3), 2L, "A", 0.0),
      (3L, t(9), 3L, "A", 0.0), (4L, t(4), 1L, "B", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Sessionize.evDow(evs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(("A", 1L, 2L, 0.666667), ("A", 7L, 1L, 0.333333),
      ("B", 2L, 1L, 1.0)))
    // oracle form: shares close to 1 per type, dow always in 1..7
    val orc = Sessionize.evDow(spark, sf).collect()
    assert(orc.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= 7))
    orc.groupBy(_.getString(0)).foreach { case (_, rows) =>
      assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-4)
    }
  }

  test("taZipf(docs): rank/tf table matches the brute count, rel is rank*tf/tf1") {
    import spark.implicits._
    val docs = Seq((1L, "a a a b b c"), (2L, "a a b d")).toDF("doc_id", "text")
    val got = TextAnalysis.taZipf(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // tf: a=5 b=3 c=1 d=1 -> ranks 1..4 with c before d on the tie
    assert(got.toSeq == Seq(
      (1L, "a", 5L, 5L, 1.0),
      (2L, "b", 3L, 6L, 1.2),
      (3L, "c", 1L, 3L, 0.6),
      (4L, "d", 1L, 4L, 0.8)))
    // oracle form: exactly 20 rows, ranks dense 1..20, tf non-increasing
    val orc = TextAnalysis.taZipf(spark, sf).collect()
    assert(orc.length == 20)
    assert(orc.map(_.getLong(0)).toSeq == (1L to 20L))
    val tfs = orc.map(_.getLong(2)).toSeq
    assert(tfs == tfs.sorted.reverse)
    assert(orc.head.getDouble(4) == 1.0) // rank-1 row normalizes to itself
  }

  test("evBasket(events, minSupport): hand-built baskets replay the rule algebra") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def ev(u: Long, t: String, typ: String, k: Long) =
      (u, ts(t), typ, s"""{"k": $k}""")
    // baskets (user, day): u1/d1 {10,20}, u2/d1 {10,20}, u3/d1 {10,30},
    // u1/d2 {10} — four baskets. A same-day repeat purchase dedups; a
    // same-day VIEW of item 99 must not create a basket item.
    val evs = Seq(
      ev(1, "2024-06-01 10:00:00", "purchase", 10),
      ev(1, "2024-06-01 11:00:00", "purchase", 20),
      ev(2, "2024-06-01 09:00:00", "purchase", 10),
      ev(2, "2024-06-01 09:30:00", "purchase", 10), // dup, same basket
      ev(2, "2024-06-01 10:15:00", "purchase", 20),
      ev(2, "2024-06-01 10:20:00", "view", 99),     // wrong type
      ev(3, "2024-06-01 14:00:00", "purchase", 10),
      ev(3, "2024-06-01 15:00:00", "purchase", 30),
      ev(1, "2024-06-02 10:00:00", "purchase", 10)
    ).toDF("user_id", "ts", "event_type", "props")
    val got = Sessionize.evBasket(evs, minSupport = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    // only {10,20} co-occurs twice; item 10 is in 4 baskets, 20 in 2:
    // support 2/4, conf 10→20 = 2/4 vs 20→10 = 2/2, lift 2·4/(4·2) = 1
    assert(got.toSeq == Seq(
      (10L, 20L, 2L, 4L, 2L, 0.5, 0.5, 1.0),
      (20L, 10L, 2L, 2L, 4L, 0.5, 1.0, 1.0)))
    // floor 3 silences the corpus entirely
    assert(Sessionize.evBasket(evs, minSupport = 3).count() == 0L)
    // oracle form: directional symmetry — every (a,b) has its (b,a) with
    // the same n_ab and lift
    val orc = Sessionize.evBasket(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(7)))
    assert(orc.nonEmpty)
    val byPair = orc.map { case (a, b, n, l) => (a, b) -> (n, l) }.toMap
    orc.foreach { case (a, b, n, l) =>
      assert(byPair((b, a)) == ((n, l)), s"asymmetric rule $a->$b") }
  }

  test("evSeasonality: pure-DOW series reads 1, anti-aligned 0, constant NULL") {
    import spark.implicits._
    def at(day: Int, i: Int) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(day.toLong * 86400 + i))
    // 'weekly': daily count is a pure function of day%7 over 14 days →
    // SS_within = 0, strength = 1. 'alt': counts alternate with period 2,
    // so day d and d+7 (opposite parity) average out per DOW cell →
    // group means all equal the grand mean, strength = 0. 'flat': the
    // same count every day → SS_total = 0, strength undefined (NULL).
    val evs = (for {
      day <- 0 until 14
      (typ, cnt) <- Seq(
        ("weekly", 1 + (day % 7)),
        ("alt", if (day % 2 == 0) 1 else 3),
        ("flat", 2))
      i <- 0 until cnt
    } yield (1L, at(day, i), typ)).toDF("user_id", "ts", "event_type")
    val got = Sessionize.evSeasonality(evs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(3), Option(r.get(4)),
          Option(r.get(5)))).toMap
    assert(got("weekly") == ((14L, 0.0, Some(1.0), Some(1.0))))
    // zero between-group signal: raw strength 0, adjusted strength at
    // its floor 1 − (n−1)/(n−k) = −6/7 for n=14, k=7
    assert(got("alt")._3 == Some(0.0) && got("alt")._2 > 0.0)
    assert(got("alt")._4 == Some(BigDecimal(1.0 - 13.0 / 7)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    assert(got("flat") == ((14L, 0.0, None, None)))
    // oracle form: strength in [0,1], within never exceeds total, the
    // adjusted statistic never exceeds the raw one
    val orc = Sessionize.evSeasonality(spark, "/root/testdata/sf0.001")
      .collect()
    assert(orc.length == 5)
    orc.foreach { r =>
      val (tot, win, st) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(win >= -1e-6 && win <= tot + 1e-6 && st >= 0.0 && st <= 1.0)
      assert(r.getDouble(5) <= st + 1e-9)
    }
  }

  test("evPowerlaw: alpha replays the CSN discrete MLE; degenerate corpus NULL") {
    import spark.implicits._
    def at(i: Int) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(i.toLong))
    // type 'a': users with counts 1,2,4,8 → alpha = 1 + 4/Σ round(ln x, 9)
    // (the x=1 user contributes ln 1 = 0 but counts in n). type 'b':
    // every user exactly once → Σ ln = 0 → NULL.
    val evs = ((for {
      (u, cnt) <- Seq((1L, 1), (2L, 2), (3L, 4), (4L, 8))
      i <- 0 until cnt
    } yield (u, at(i), "a")) ++ Seq((1L, at(0), "b"), (2L, at(1), "b")))
      .toDF("user_id", "ts", "event_type")
    val got = Sessionize.evPowerlaw(evs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)))).toMap
    def rln(x: Double) = BigDecimal(math.log(x))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = BigDecimal(1 + 4 / (rln(2) + rln(4) + rln(8)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("a") == ((4L, 8L, Some(want))))
    assert(got("b") == ((2L, 1L, None)))
    // oracle form: a uniform synthetic stream has a thin tail — alpha
    // well above the 2-3 band a scale-free heavy tail would read
    val orc = Sessionize.evPowerlaw(spark, "/root/testdata/sf0.001").collect()
    assert(orc.length == 5)
    orc.foreach { r => assert(r.getDouble(3) > 1.0 && r.getLong(2) >= 1L) }
  }

  test("taLogOdds: a planted source-exclusive token tops its source; shared vocab does not") {
    import spark.implicits._
    // source A says 'zebra' in every doc; the filler vocabulary is split
    // evenly — the z-score must put zebra first for A and keep the
    // shared fillers off rank 1 for B
    val docs = (
      (0 until 10).map(i => (s"A", s"zebra alpha beta gamma d$i")) ++
      (0 until 10).map(i => (s"B", s"alpha beta gamma delta d$i"))
    ).toDF("source", "text")
    val got = TextAnalysis.taLogOdds(docs, k = 3).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getInt(4)))
    val aTop = got.filter(_._1 == "A").minBy(_._5)
    assert(aTop._2 == "zebra" && aTop._3 == 10L && aTop._4 > 0)
    val bTop = got.filter(_._1 == "B").minBy(_._5)
    assert(bTop._2 == "delta" && bTop._4 > 0)
    // replay A/zebra's z in plain scala: y=10, yr=0, n=50, nr=50,
    // nn=100 and the frequency prior α_zebra = 0.01·g = 0.1
    val (y, yr, n, nr, nn, g) = (10.0, 0.0, 50.0, 50.0, 100.0, 10.0)
    val aw = 0.01 * g
    val z = (math.log((y + aw) / (n + 0.01 * nn - y - aw)) -
      math.log((yr + aw) / (nr + 0.01 * nn - yr - aw))) /
      math.sqrt(1.0 / (y + aw) + 1.0 / (yr + aw))
    assert(math.abs(aTop._4 - z) < 1e-6)
    // oracle form: 5 rows per source, ranks dense, z finite
    val orc = TextAnalysis.taLogOdds(spark, "/root/testdata/sf0.001")
      .collect()
    assert(orc.groupBy(_.getString(0)).forall { case (_, rs) =>
      rs.map(_.getInt(4)).sorted.toSeq == (1 to 5) })
    orc.foreach(r => assert(!r.getDouble(3).isNaN))
  }

  test("dsNearLeakOn: digest-steered twins land in the right matrix cells") {
    import spark.implicits._
    // split digits are md5-determined: ids 0,2,3 → train, 10 → test
    // (verified by the digest rule). 0 and 10 share a text → ONE
    // cross-split leak pair; 2 and 3 share another → one train-train
    // pair; 21 is unique noise.
    val a = "the quick brown fox jumps over the lazy dog every single day"
    val b = "colorless green ideas sleep furiously under warm summer rain clouds"
    val docs = Seq(
      (0L, a), (10L, a), (2L, b), (3L, b),
      (21L, "totally unrelated words that nobody else ever uses here"))
      .toDF("doc_id", "text")
    val got = Dedup.dsNearLeakOn(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2),
        r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      ("test", "train", true, 1L, 1.0),
      ("train", "train", false, 1L, 1.0)))
    // oracle form: the full matrix's pair mass equals the pair relation
    val matrix = Dedup.dsNearLeak(spark, "/root/testdata/sf0.001").collect()
    val nPairs = Dedup.ddMinhashLsh(spark, "/root/testdata/sf0.001").count()
    assert(matrix.map(_.getLong(3)).sum == nPairs)
    assert(matrix.exists(_.getBoolean(2))) // twins do straddle splits
  }

  test("evBenford: digit extraction spans magnitudes, chi2/mad replay, nonpositive excluded") {
    import spark.implicits._
    def at(i: Int) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(i.toLong))
    // digits: 1.0→1, 1.5→1, 19.0→1, 2.0→2, 0.03→3 (sub-unit magnitude);
    // 0 and −5 must be excluded from the population entirely
    val vals = Seq(1.0, 1.5, 19.0, 2.0, 0.03, 0.0, -5.0)
    val evs = vals.zipWithIndex
      .map { case (v, i) => (1L, at(i), "x", v) }
      .toDF("user_id", "ts", "event_type", "value")
    val got = Sessionize.evBenford(evs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nd = Map(1 -> 3L, 2 -> 1L, 3 -> 1L).withDefaultValue(0L)
    val n = 5.0
    val chi2 = r6((1 to 9).map { d =>
      val p = math.log10(1 + 1.0 / d)
      BigDecimal(r9((nd(d) - n * p) * (nd(d) - n * p) / (n * p)))
    }.sum.toDouble)
    val mad = r6((1 to 9).map { d =>
      val p = math.log10(1 + 1.0 / d)
      BigDecimal(r9(math.abs(nd(d) / n - p)))
    }.sum.toDouble / 9)
    assert(got.toSeq == Seq(("x", 5L, chi2, mad)))
    // oracle form: statistic well-defined per type (the generator's
    // value column happens to be near-log-uniform, so it sits CLOSE to
    // the law at sf0.001 — chi2 single digits; conformity calls belong
    // to the caller's threshold, not the op)
    val orc = Sessionize.evBenford(spark, "/root/testdata/sf0.001")
      .collect()
    assert(orc.length == 5)
    orc.foreach { r =>
      assert(r.getLong(1) > 0 && r.getDouble(2) > 0.0 &&
        r.getDouble(3) > 0.0 && r.getDouble(3) < 1.0)
    }
  }

  test("taBm25: scores replay the Okapi formula; rare terms outrank common ones") {
    import spark.implicits._
    // 'cherry' appears in 1 of 4 docs, 'apple' in 3 — a cherry match
    // must outscore an equal-tf apple match from the same doc length
    val docs = Seq(
      (0L, "apple banana"),
      (1L, "apple apple cherry"),
      (2L, "durian cherry"),
      (3L, "apple banana banana")).toDF("doc_id", "text")
    val q = Seq((100L, "apple cherry")).toDF("query_id", "text")
    val got = TextAnalysis.taBm25(docs, q, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: BigDecimal) =
      x.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dl = Map(0L -> 2.0, 1L -> 3.0, 2L -> 2.0, 3L -> 3.0)
    val avgdl = 10.0 / 4
    val df = Map("apple" -> 3.0, "cherry" -> 2.0) // N=4 docs
    def idf(t: String) = math.log(1 + (4 - df(t) + 0.5) / (df(t) + 0.5))
    def term(t: String, tf: Double, d: Long) =
      r9(idf(t) * tf * 2.2 /
        (tf + 1.2 * (0.25 + 0.75 * dl(d) / avgdl)))
    val want = Map(
      0L -> r6(term("apple", 1, 0L)),
      1L -> r6(term("apple", 2, 1L) + term("cherry", 1, 1L)),
      2L -> r6(term("cherry", 1, 2L)),
      3L -> r6(term("apple", 1, 3L)))
    assert(got.map(r => r._2 -> r._4).toMap == want)
    // ranks dense, scores non-increasing
    assert(got.map(_._5).toSeq == (1L to 4L))
    assert(got.map(_._4).toSeq == got.map(_._4).sortBy(-_).toSeq)
    // doc 1 (apple×2 + cherry) must rank first; the cherry-only doc 2
    // must outrank the apple-only doc 0 despite equal tf and length
    assert(got.head._2 == 1L)
    assert(got.find(_._2 == 2L).get._5 < got.find(_._2 == 0L).get._5)
    // oracle form: 5 queries, self excluded, ranks dense from 1
    val orc = TextAnalysis.taBm25(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(orc.map(_._1).distinct.sorted.toSeq == (0L to 4L))
    orc.foreach { case (qid, nid, _) => assert(qid != nid) }
    assert(orc.groupBy(_._1).forall { case (_, rs) =>
      rs.map(_._3).sorted.toSeq == (1L to rs.length) })
  }

  test("dsBatchPad: padding algebra replays the shard fold; sorted batching never pads more than random") {
    import spark.implicits._
    def md5hex(s: String) = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    // doc u has u tokens; replay the per-shard rank/batch/pad fold
    val docs = (1L to 40L).map(u => (u, Seq.fill(u.toInt)("x")
      .mkString(" "))).toDF("doc_id", "text")
    val B = 4
    val lens = (1L to 40L).map(u => (u, md5hex(s"bp:$u").take(1), u))
    def summarize(ranked: Seq[(String, Long)]): (Long, Long, Long) = {
      // ranked: (shard, n_tok) in rank order per shard
      val batches = ranked.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
        xs.map(_._2).grouped(B).toSeq
      }
      (batches.size.toLong, batches.map(_.sum).sum,
        batches.map(b => b.max * b.length).sum)
    }
    val sorted = summarize(lens.groupBy(_._2).toSeq.flatMap {
      case (sh, xs) => xs.sortBy(t => (t._3, t._1)).map(t => sh -> t._3)
    })
    val random = summarize(lens.groupBy(_._2).toSeq.flatMap {
      case (sh, xs) => xs.sortBy(t => (md5hex(s"bq:${t._1}"), t._1))
        .map(t => sh -> t._3)
    })
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Pipeline.dsBatchPad(docs, batchSize = B).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    assert(got("sorted") == ((sorted._1, sorted._2, sorted._3,
      r6(1 - sorted._2.toDouble / sorted._3))))
    assert(got("random") == ((random._1, random._2, random._3,
      r6(1 - random._2.toDouble / random._3))))
    // oracle form: same token mass both strategies; sorted no worse
    val orc = Pipeline.dsBatchPad(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getDouble(4)))).toMap
    assert(orc("sorted")._1 == orc("random")._1)
    assert(orc("sorted")._2 <= orc("random")._2)
  }

  test("taLangConf: confusion matrix replays; the zh blind spot is visible, row shares close to 1") {
    import spark.implicits._
    val docs = Seq(
      ("en", "the a and"), ("de", "der die und"),
      ("fr", "le les et"), ("zh", "wen yan wen")).toDF("lang", "text")
    val got = TextAnalysis.taLangConf(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    // zero-evidence zh falls through the >= ties to 'en' — visibly wrong
    assert(got.toSeq == Seq(
      ("de", "de", 1L, 1.0, true), ("en", "en", 1L, 1.0, true),
      ("fr", "fr", 1L, 1.0, true), ("zh", "en", 1L, 1.0, false)))
    // oracle form: every declared-language block's shares sum to 1;
    // no zh row is ever correct (the heuristic has no zh family)
    val orc = TextAnalysis.taLangConf(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getString(0), r.getDouble(3), r.getBoolean(4)))
    orc.groupBy(_._1).foreach { case (_, rs) =>
      assert(math.abs(rs.map(_._2).sum - 1.0) < 1e-5)
    }
    assert(orc.filter(_._1 == "zh").nonEmpty)
    orc.filter(_._1 == "zh").foreach { case (_, _, c) => assert(!c) }
  }

  test("taRake: degree/frequency algebra replays; multi-word phrases outrank their parts") {
    import spark.implicits._
    // islands around stopwords: doc0 → [label propagation],
    // [dense graphs], [label propagation again]; doc1 → [dense graphs].
    // deg: label 2+3=5, propagation 5, dense 4, graphs 4, again 3;
    // freq: 2,2,2,2,1 → word scores 2.5, 2.5, 2, 2, 3 →
    // phrase scores 8 / 5 / 4 in that rank order
    val docs = Seq(
      (0L, "label propagation of dense graphs and label propagation again"),
      (1L, "dense graphs")).toDF("doc_id", "text")
    val got = TextAnalysis.taRake(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getDouble(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      ("label propagation again", 1L, 3, 8.0, 1L),
      ("label propagation", 1L, 2, 5.0, 2L),
      ("dense graphs", 2L, 2, 4.0, 3L)))
    // oracle form: k rows, dense ranks, non-increasing scores
    val orc = TextAnalysis.taRake(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getDouble(3), r.getLong(4)))
    assert(orc.length == 20)
    assert(orc.map(_._2).toSeq == (1L to 20L))
    assert(orc.map(_._1).toSeq == orc.map(_._1).sortBy(-_).toSeq)
    // hostile stopwords must neither parse-error nor rewrite the
    // predicate: apostrophe and trailing backslash both stay literal
    val hostile = TextAnalysis.taRake(docs,
      stops = Seq("don't", "a\\", "of", "and")).collect()
    assert(hostile.map(_.getString(0)).contains("label propagation again"))
    // maxPhraseLen cap (RAKE convention + the O(len²) explode guard): a
    // 5-word stopword-free island is not a candidate at the default 4 —
    // dropped entirely, not truncated — and returns under a raised cap
    val longIsland = Seq((0L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    assert(TextAnalysis.taRake(longIsland).count() == 0)
    val raised = TextAnalysis.taRake(longIsland, maxPhraseLen = 5).collect()
    assert(raised.length == 1 &&
      raised.head.getString(0) == "alpha beta gamma delta epsilon")
  }

  test("taBpe: textbook merge sequence replays; repeat runs merge canonically and exhaust gracefully") {
    import spark.implicits._
    // the Sennrich example shape: low×3, lower×2, newest×1.
    // round 1: (l,o)=5 ties (o,w)=5 → lexicographic → (l,o).
    // round 2: (lo,w)=5. round 3: (e,r)=2 ties (low,e)=2 → (e,r).
    val docs = Seq("low low low", "lower lower", "newest").toDF("text")
    val got = TextAnalysis.taBpe(docs).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getString(4)))
    assert(got.toSeq == Seq(
      (1, "l", "o", 5L, "lo"),
      (2, "lo", "w", 5L, "low"),
      (3, "e", "r", 2L, "er")))
    // runs of repeats merge pairwise (canonical greedy fold, not a
    // separator-consuming string replace): aaaa → [aa,aa] → [aaaa];
    // round 3 finds no pair left and emits nothing
    val runs = Seq("aaaa aaaa aaaa").toDF("text")
    val g2 = TextAnalysis.taBpe(runs).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getString(4)))
    assert(g2.toSeq == Seq(
      (1, "a", "a", 9L, "aa"), (2, "aa", "aa", 3L, "aaaa")))
    // oracle form: ≤3 merges, positive weighted counts, symbol algebra
    val orc = TextAnalysis.taBpe(spark, "/root/testdata/sf0.001").collect()
    assert(orc.nonEmpty && orc.length <= 3)
    orc.foreach { r =>
      assert(r.getLong(3) > 0 &&
        r.getString(4) == r.getString(1) + r.getString(2))
    }
  }

  test("taBpeEncode: train-then-encode round-trips taBpe's learned table") {
    import spark.implicits._
    // same Sennrich corpus as the taBpe test: learned merges
    // (l,o) → (lo,w) → (e,r). Encoding replays them in round order:
    // low → [low]; lower → [low, er]; newest untouched (no e,r adjacency)
    val docs = Seq((0L, "low low low"), (1L, "lower lower"), (2L, "newest"))
      .toDF("doc_id", "text")
    val merges = TextAnalysis.taBpe(docs.select("text"))
    val got = TextAnalysis.taBpeEncode(docs, merges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq(
      (0L, 3L, "low low low"),
      (1L, 4L, "low er low er"),
      (2L, 6L, "n e w e s t")))
    // merge order matters and is taken from merge_round, not input order:
    // the same rules fed reversed must produce the same encoding
    val shuffled = merges.orderBy(org.apache.spark.sql.functions
      .col("merge_round").desc)
    val got2 = TextAnalysis.taBpeEncode(docs, shuffled).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got2.toSeq == got.toSeq)
    // oracle form (planted t+a / ta+b / l+e on testdata): token counts
    // consistent, no empty symbol, and the 2-rule chain actually fired
    val orc = TextAnalysis.taBpeEncode(spark, sf).collect()
    assert(orc.nonEmpty)
    orc.foreach { r =>
      val toks = r.getString(2).split(" ")
      assert(toks.length == r.getLong(1) && toks.forall(_.nonEmpty))
    }
    assert(orc.exists(_.getString(2).split(" ").contains("tab")),
      "the chained ta+b merge never fired on the corpus")
  }

  test("taClassify: hashed-logit algebra replays; keep thresholds the rounded logit") {
    import spark.implicits._
    def feat(tok: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val hex = "0123456789abcdef"
      (hex.indexOf(h(0)) * 16 + hex.indexOf(h(1))).toLong
    }
    val docs = Seq((0L, "x x y"), (1L, "y")).toDF("doc_id", "text")
    val weights = Seq((feat("x"), 1.0), (feat("y"), -0.5))
      .toDF("feat", "w")
    // replicate Spark ROUND(double, n): HALF_UP on the shortest decimal
    // repr (BigDecimal.valueOf — the taPerplexity replay convention)
    def term(w: Double, n: Long): java.math.BigDecimal =
      java.math.BigDecimal.valueOf(w * math.log1p(n.toDouble))
        .setScale(9, java.math.RoundingMode.HALF_UP)
    def r6(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val z0 = term(1.0, 2).add(term(-0.5, 1)) // doc0: x twice, y once
    val z1 = term(-0.5, 1)
    val got = TextAnalysis.taClassify(docs, weights).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (0L, 2L, r6(z0.doubleValue),
        r6(1.0 / (1.0 + math.exp(-z0.doubleValue))),
        r6(z0.doubleValue) >= 0.0),
      (1L, 1L, r6(z1.doubleValue),
        r6(1.0 / (1.0 + math.exp(-z1.doubleValue))),
        r6(z1.doubleValue) >= 0.0)))
    assert(got(0)._5 && !got(1)._5) // x-heavy kept, y-only dropped
    // oracle form: scores in (0,1), keep consistent with the logit sign
    val orc = TextAnalysis.taClassify(spark, sf).collect()
      .map(r => (r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
    assert(orc.nonEmpty)
    orc.foreach { case (z, sc, keep) =>
      assert(sc > 0.0 && sc < 1.0 && keep == (z >= 0.0))
    }
  }

  test("evCuped: theta/means/variances replay the decimal fold; flat covariate reads theta 0") {
    import spark.implicits._
    def variant(u: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ab:$u".getBytes("UTF-8"))
      if (((d(0) >> 4) & 0xf) < 8) "A" else "B"
    }
    def ts(day: Int) = java.sql.Timestamp.from(
      java.time.Instant.parse("2024-01-01T00:00:00Z")
        .plusSeconds(day * 86400L + 60))
    // whole-dollar values keep every ROUND a no-op on exact integers:
    // pre (day 0 < cut at day 15) X = u; post (day 20) Y = 2u + 5·1{B}
    // plus a u-parity wiggle so neither arm is exactly linear
    def y(u: Long) = 2.0 * u + (if (variant(u) == "B") 5.0 else 0.0) +
      (if (u % 2 == 0) 1.0 else 0.0)
    val evs = (1L to 20L).flatMap { u =>
      Seq((u * 2, ts(0), u, "purchase", u.toDouble),
        (u * 2 + 1, ts(20), u, "purchase", y(u)))
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    def r(x: Double, s: Int) = BigDecimal(x)
      .setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val us = (1L to 20L).map(u => (variant(u), u.toDouble, y(u)))
    val n = us.length
    val (sx, sy) = (us.map(_._2).sum, us.map(_._3).sum)
    val (sxy, sxx) = (us.map(t => t._2 * t._3).sum, us.map(t => t._2 * t._2).sum)
    val theta = r((sxy - sx * sy / n) / (sxx - sx * sx / n), 9)
    val mx = sx / n
    val byArm = us.groupBy(_._1).map { case (v, rs) =>
      val ys = rs.map(_._3)
      val yas = rs.map(t => r(t._3 - theta * (t._2 - mx), 6))
      val m = rs.length
      val (my, ma) = (ys.sum / m, yas.map(BigDecimal(_)).sum.toDouble / m)
      val vy = ys.map(v => r(v * v, 6)).sum / m - my * my
      val va = yas.map(v => r(v * v, 6)).map(BigDecimal(_)).sum.toDouble / m - ma * ma
      v -> ((m.toLong, r(theta, 6), r(my, 6), r(ma, 6), r(vy, 6), r(va, 6),
        r(1 - va / vy, 6)))
    }
    val got = Sessionize.evCuped(evs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7)))).toMap
    assert(got == byArm)
    // the adjustment bought real variance: strongly X-correlated Y
    got.values.foreach { case (_, _, _, _, vy, va, red) =>
      assert(va < vy && red > 0.5)
    }
    // the B-arm lift survives adjustment (≈5 between adjusted means)
    assert(math.abs((got("B")._4 - got("A")._4) - 5.0) < 1.5)
    // degenerate covariate (all X equal): guard reads theta 0 and the
    // adjusted column degenerates to Y exactly
    val flat = (1L to 20L).flatMap { u =>
      Seq((u * 2, ts(0), u, "purchase", 7.0),
        (u * 2 + 1, ts(20), u, "purchase", y(u)))
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    Sessionize.evCuped(flat).collect().foreach { r =>
      assert(r.getDouble(2) == 0.0 &&
        r.getDouble(3) == r.getDouble(4) && r.getDouble(7) == 0.0)
    }
  }

  test("evChangepoint: planted level shift localized exactly; constant series ties to the first day with gain 0") {
    import spark.implicits._
    def at(day: Int, j: Int) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(day * 86400L + j))
    // type 'a': 5/day for days 0..9, then 50/day for days 10..19 —
    // the split must land at boundary_day 9 with means 5 and 50 and
    // gain = 45² · (10·10/20) = 10125; type 'b' is constant 2/day
    val evs = ((for { d <- 0 until 10; j <- 0 until 5 }
      yield (1L, at(d, j), "a")) ++
      (for { d <- 10 until 20; j <- 0 until 50 }
        yield (1L, at(d, j), "a")) ++
      (for { d <- 0 until 10; j <- 0 until 2 }
        yield (2L, at(d, j), "b"))).toDF("user_id", "ts", "event_type")
    val got = Sessionize.evChangepoint(evs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5),
        r.getDouble(6)))).toMap
    assert(got("a") == ((9L, 10, 10L, 5.0, 50.0, 10125.0)))
    assert(got("b") == ((0L, 1, 9L, 2.0, 2.0, 0.0)))
    // oracle form: every type scored, gains nonnegative
    val orc = Sessionize.evChangepoint(spark, "/root/testdata/sf0.001")
      .collect()
    assert(orc.length == 5)
    orc.foreach(r => assert(r.getDouble(6) >= 0.0))
  }

  test("evQsketch: quarter-octave brackets replay and always contain the true order statistic") {
    import spark.implicits._
    // cent values 1..100 (value = c/100): the k-th order statistic IS k
    // cents, so every quantile bracket must contain its own target rank
    def key(c: Long): Int =
      if (c >= 4) {
        val b = 63 - java.lang.Long.numberOfLeadingZeros(c)
        b * 4 + (c >> (b - 2)).toInt - 4
      } else c.toInt
    def edges(k: Int): (Long, Long) =
      if (k < 4) (k.toLong, k.toLong)
      else ((4L + k % 4) << (k / 4 - 2), (5L + k % 4) << (k / 4 - 2))
    val cs = (1L to 100L)
    val hist = cs.map(key).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val cumKeys = hist.keys.toSeq.sorted
    def pick(k: Long): Int = {
      var cum = 0L
      cumKeys.find { kk => cum += hist(kk); cum >= k }.get
    }
    val evs = cs.map(c => (c, new java.sql.Timestamp(c * 1000), c, "e",
      c / 100.0)).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Sessionize.evQsketch(evs).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getLong(5)))
    assert(got.map(_._1).toSeq == Seq(0.5, 0.9, 0.95, 0.99))
    got.foreach { case (q, n, k, kk, lo, hi) =>
      assert(n == 100L && k == math.ceil(q * 100).toLong)
      assert(kk == pick(k) && (lo, hi) == edges(kk))
      // the bracket contains the true k-th order statistic (= k cents)
      assert(lo <= k && (k < hi || lo == hi))
      // guaranteed 25 % relative width
      if (kk >= 8) assert(hi.toDouble / lo <= 1.25 + 1e-12)
    }
    // oracle form: 4 rows, brackets ordered and bounded
    val orc = Sessionize.evQsketch(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(4), r.getLong(5), r.getInt(3)))
    assert(orc.length == 4)
    orc.foreach { case (lo, hi, kk) =>
      assert(lo <= hi && (kk < 8 || hi.toDouble / lo <= 1.25 + 1e-12))
    }
  }

  test("evCms: sketch estimates replay the md5 bucket fold; estimates never undercount") {
    import spark.implicits._
    // triangular frequencies: user u appears u times (u = 1..50);
    // top-20 = users 31..50. The in-memory replay builds the exact
    // same 4×256 sketch, so est must match value-for-value.
    def md5hex(s: String) = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def bucket(r: Int, k: Long) =
      Integer.parseInt(md5hex(s"cms$r:$k").take(4), 16) % 256
    val freq = (1L to 50L).map(u => u -> u).toMap
    // freq.toSeq: iterating the Map directly would rebuild a Map keyed
    // by (r, bucket) inside the comprehension and silently drop
    // bucket-colliding users before the groupBy sum
    val sketch = (for {
      r <- 0 until 4; (u, n) <- freq.toSeq
    } yield ((r, bucket(r, u)), n))
      .groupBy(_._1).map { case (rb, xs) => rb -> xs.map(_._2).sum }
    def est(u: Long) = (0 until 4).map(r => sketch((r, bucket(r, u)))).min
    val evs = (1L to 50L).flatMap(u => (1L to u).map(i =>
      (u * 1000 + i, new java.sql.Timestamp(i * 1000), u, "e")))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = Sessionize.evCms(evs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == (50L to 31L by -1))
    got.foreach { case (u, exact, e, over) =>
      assert(exact == u && e == est(u) && over == e - exact && over >= 0)
    }
    // oracle form at sf0.001: min(20, distinct users) rows, est >=
    // exact, sorted by exact count
    val orc = Sessionize.evCms(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(1), r.getLong(3)))
    val nUsers = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("user_id").distinct().count()
    assert(orc.length == math.min(20L, nUsers))
    assert(orc.map(_._1).toSeq == orc.map(_._1).sortBy(-_).toSeq)
    orc.foreach { case (_, over) => assert(over >= 0) }
  }

  test("evDid: planted treatment effect recovered exactly net of the common trend") {
    import spark.implicits._
    def variant(u: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ab:$u".getBytes("UTF-8"))
      if (((d(0) >> 4) & 0xf) < 8) "A" else "B"
    }
    def ts(day: Int) = java.sql.Timestamp.from(
      java.time.Instant.parse("2024-01-01T00:00:00Z")
        .plusSeconds(day * 86400L + 60))
    // pre X = u; post Y = u + 3 (shared shock) + 5·1{B} (treatment):
    // delta_a = 3, delta_b = 8, did = 5 — all integer-exact
    val evs = (1L to 20L).flatMap { u =>
      val lift = if (variant(u) == "B") 5.0 else 0.0
      Seq((u * 2, ts(0), u, "purchase", u.toDouble),
        (u * 2 + 1, ts(20), u, "purchase", u.toDouble + 3.0 + lift))
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Sessionize.evDid(evs).collect()
    assert(r.length == 1)
    val row = r.head
    val as = (1L to 20L).filter(variant(_) == "A").map(_.toDouble)
    val bs = (1L to 20L).filter(variant(_) == "B").map(_.toDouble)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getLong(0) == as.length && row.getLong(1) == bs.length)
    assert(row.getDouble(2) == r6(as.sum / as.length))
    assert(row.getDouble(4) == r6(bs.sum / bs.length))
    assert(row.getDouble(6) == 3.0 && row.getDouble(7) == 8.0 &&
      row.getDouble(8) == 5.0)
    // a user silent in one period counts as 0 there, not a dropped row:
    // removing an A-user's post event moves delta_a by −(u+3)/|A|
    // without re-basing the denominator
    val uHole = (1L to 20L).find(variant(_) == "A").get
    val holed = evs.where(s"NOT (user_id = $uHole AND event_id % 2 = 1)")
    val r2 = Sessionize.evDid(holed).collect().head
    assert(r2.getLong(0) == as.length)
    assert(r2.getDouble(6) == r6(3.0 - (uHole + 3.0) / as.length))
    // oracle form: one row, arms populated
    val orc = Sessionize.evDid(spark, "/root/testdata/sf0.001").collect()
    assert(orc.length == 1 && orc.head.getLong(0) > 0 &&
      orc.head.getLong(1) > 0)
  }

  test("evForecast: calendar-joined MAEs and MASE replay; constant series reads NULL mase") {
    import spark.implicits._
    def at(day: Int, j: Int) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(day * 86400L + j))
    // type 'a': count on day i is i+1 (0..9) — scored days 7,8,9 have
    // |n-f1| = 1 and |n-f7| = 7 exactly; type 'b' is constant 2/day
    val evs = ((for {
      d <- 0 until 10; j <- 0 to d
    } yield (1L, at(d, j), "a")) ++ (for {
      d <- 0 until 10; j <- 0 until 2
    } yield (2L, at(d, j), "b"))).toDF("user_id", "ts", "event_type")
    val rows = Sessionize.evForecast(evs).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3), Option(r.get(4))))).toMap
    assert(rows("a") == ((3L, 1.0, 7.0, Some(7.0))))
    assert(rows("b") == ((3L, 0.0, 0.0, None)))
    // a gap day scores nothing: drop day 8 of 'a' entirely — day 8
    // can't be scored (absent) and day 9 loses its day-1 neighbor
    val gappy = evs.where("event_type = 'b' OR ts < timestamp'1970-01-09' OR ts >= timestamp'1970-01-10'")
    val g2 = Sessionize.evForecast(gappy).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(g2("a") == 1L) // only day 7 still has both neighbors
    // oracle form: 5 types, all scored; mase finite positive
    val orc = Sessionize.evForecast(spark, "/root/testdata/sf0.001")
      .collect()
    assert(orc.length == 5)
    orc.foreach { r =>
      assert(r.getLong(1) > 0 && r.getDouble(2) >= 0.0 &&
        (r.isNullAt(4) || r.getDouble(4) > 0.0))
    }
  }

  test("evMannWhitney: midrank U/z replay; separation reads cles 1; all-tied reads z NULL") {
    import spark.implicits._
    def variant(u: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ab:$u".getBytes("UTF-8"))
      if (((d(0) >> 4) & 0xf) < 8) "A" else "B"
    }
    // per-user sums land on a small integer grid WITH ties across arms:
    // user u contributes value (u % 7) + (3 if B) — overlapping supports
    val evs = (1L to 40L).map { u =>
      val lift = if (variant(u) == "B") 3.0 else 0.0
      (u, (u % 7).toDouble + lift)
    }.toDF("user_id", "value")
    val as = (1L to 40L).filter(variant(_) == "A").map(u => (u % 7) * 100L)
    val bs = (1L to 40L).filter(variant(_) == "B")
      .map(u => (u % 7) * 100L + 300L)
    // pair-count replay (cents): U_B = #{b > a} + 0.5 #{b == a}
    val u2 = (for { b <- bs; a <- as } yield
      (if (b > a) 2L else if (b == a) 1L else 0L)).sum
    val (na, nb) = (as.size.toLong, bs.size.toLong)
    val n = na + nb
    val ties = (as ++ bs).groupBy(identity).values
      .map { g => val t = g.size.toLong; t * t * t - t }.sum
    val varu = na.toDouble * nb / 12 *
      ((n + 1).toDouble - ties.toDouble / (n.toDouble * (n - 1)))
    val r = Sessionize.evMannWhitney(evs).collect().head
    assert(r.getLong(0) == na && r.getLong(1) == nb)
    assert(r.getDouble(2) == u2.toDouble / 2)
    assert(math.abs(r.getDouble(3) - u2.toDouble / (2.0 * na * nb)) < 1e-6)
    assert(math.abs(r.getDouble(4) -
      (u2.toDouble - na.toDouble * nb) / (2 * math.sqrt(varu))) < 1e-6)
    // complete separation: every B above every A — U = na*nb, cles = 1
    val sep = (1L to 40L).map { u =>
      (u, if (variant(u) == "B") 1000.0 + u else u.toDouble)
    }.toDF("user_id", "value")
    val rs = Sessionize.evMannWhitney(sep).collect().head
    assert(rs.getDouble(2) == rs.getLong(0).toDouble * rs.getLong(1) &&
      rs.getDouble(3) == 1.0 && rs.getDouble(4) > 3.0)
    // all users tied on one value: zero variance, z must read NULL
    val flat = (1L to 40L).map(u => (u, 5.0)).toDF("user_id", "value")
    val rf = Sessionize.evMannWhitney(flat).collect().head
    assert(rf.getDouble(3) == 0.5 && rf.isNullAt(4))
    // multiple events per user fold into ONE per-user sum first
    val split2 = evs.union(evs.withColumn("value",
      org.apache.spark.sql.functions.expr("value * 0")))
    assert(Sessionize.evMannWhitney(split2).collect().head.getDouble(2)
      == u2.toDouble / 2)
    // a user whose metric sums to NULL is excluded from both arms
    // (no place on the value axis; engine NULL-ordering differs)
    val withNull = evs.union(spark.sql(
      "SELECT 41L AS user_id, CAST(NULL AS DOUBLE) AS value"))
    val rn = Sessionize.evMannWhitney(withNull).collect().head
    assert(rn.getLong(0) == na && rn.getLong(1) == nb &&
      rn.getDouble(2) == u2.toDouble / 2)
    // oracle form: one row, both arms populated
    val orc = Sessionize.evMannWhitney(spark, "/root/testdata/sf0.001")
      .collect()
    assert(orc.length == 1 && orc.head.getLong(0) > 0 &&
      orc.head.getLong(1) > 0)
  }

  test("evKs: integer-argmax D replay with smallest-value tiebreak; identical arms read 0") {
    import spark.implicits._
    def variant(u: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ab:$u".getBytes("UTF-8"))
      if (((d(0) >> 4) & 0xf) < 8) "A" else "B"
    }
    val evs = (1L to 40L).map { u =>
      val lift = if (variant(u) == "B") 3.0 else 0.0
      (u, (u % 7).toDouble + lift)
    }.toDF("user_id", "value")
    val as = (1L to 40L).filter(variant(_) == "A").map(u => (u % 7) * 100L)
    val bs = (1L to 40L).filter(variant(_) == "B")
      .map(u => (u % 7) * 100L + 300L)
    val (na, nb) = (as.size.toLong, bs.size.toLong)
    // CDF replay on the distinct-cents grid, exact integer compare
    val vs = (as ++ bs).distinct.sorted
    val diffs = vs.map { v =>
      val cuma = as.count(_ <= v).toLong
      val cumb = bs.count(_ <= v).toLong
      (v, math.abs(cuma * nb - cumb * na))
    }
    val md = diffs.map(_._2).max
    val atV = diffs.filter(_._2 == md).map(_._1).min
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = Sessionize.evKs(evs).collect().head
    assert(r.getLong(0) == na && r.getLong(1) == nb)
    assert(r.getDouble(2) == r6(md.toDouble / (na.toDouble * nb)))
    assert(r.getDouble(3) == atV.toDouble / 100)
    // identical per-arm distributions: every user the same value → D = 0
    val flat = (1L to 40L).map(u => (u, 5.0)).toDF("user_id", "value")
    val rf = Sessionize.evKs(flat).collect().head
    assert(rf.getDouble(2) == 0.0 && rf.getDouble(4) == 0.0)
    // disjoint supports: D = 1 at the top of A's support
    val sep = (1L to 40L).map { u =>
      (u, if (variant(u) == "B") 1000.0 + u else u.toDouble)
    }.toDF("user_id", "value")
    assert(Sessionize.evKs(sep).collect().head.getDouble(2) == 1.0)
    // oracle form: one row
    assert(Sessionize.evKs(spark, "/root/testdata/sf0.001")
      .collect().length == 1)
  }

  test("evQte: per-arm order statistics replay the exact rank rule; a tail-only shift moves only the top rung") {
    import spark.implicits._
    def variant(u: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ab:$u".getBytes("UTF-8"))
      if (((d(0) >> 4) & 0xf) < 8) "A" else "B"
    }
    // exact rank-rule replay: quantile = smallest cents value whose
    // cumulative arm count reaches ceil(q*n)
    def rung(cents: Seq[Long], pq: Int): Long = {
      val sorted = cents.sorted
      sorted((pq * sorted.size + 99) / 100 - 1)
    }
    val evs = (1L to 40L).map { u =>
      val lift = if (variant(u) == "B") 3.0 else 0.0
      (u, (u % 7).toDouble + lift)
    }.toDF("user_id", "value")
    val as = (1L to 40L).filter(variant(_) == "A").map(u => (u % 7) * 100L)
    val bs = (1L to 40L).filter(variant(_) == "B")
      .map(u => (u % 7) * 100L + 300L)
    val rows = Sessionize.evQte(evs).collect()
      .map(r => (r.getDouble(0), (r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    assert(rows.keySet == Set(0.25, 0.5, 0.75, 0.9))
    for ((q, pq) <- Seq(0.25 -> 25, 0.5 -> 50, 0.75 -> 75, 0.9 -> 90)) {
      val (va, vb) = (rung(as, pq), rung(bs, pq))
      assert(rows(q) == ((va.toDouble / 100, vb.toDouble / 100,
        (vb - va).toDouble / 100)), s"rung $q")
    }
    // tail-only treatment: identical base, B's top two deciles
    // (u%10 >= 8) get +1000 — the 25/50/75 rungs must read the same
    // replay values while the 0.9 rung carries the shift (the rank
    // ceil(0.9n) order statistic sits inside the bumped top-20% mass)
    val tail = (1L to 200L).map { u =>
      val bump = if (variant(u) == "B" && u % 10 >= 8) 1000.0 else 0.0
      (u, (u % 10).toDouble + bump)
    }.toDF("user_id", "value")
    val tas = (1L to 200L).filter(variant(_) == "A").map(u => (u % 10) * 100L)
    val tbs = (1L to 200L).filter(variant(_) == "B")
      .map(u => (u % 10) * 100L + (if (u % 10 >= 8) 100000L else 0L))
    val trows = Sessionize.evQte(tail).collect()
      .map(r => r.getDouble(0) -> r.getDouble(3)).toMap
    for ((q, pq) <- Seq(0.25 -> 25, 0.5 -> 50, 0.75 -> 75, 0.9 -> 90))
      assert(trows(q) == (rung(tbs, pq) - rung(tas, pq)).toDouble / 100)
    assert(math.abs(trows(0.25)) <= 1 && math.abs(trows(0.5)) <= 1 &&
      math.abs(trows(0.75)) <= 1 && trows(0.9) >= 900.0)
    // all-tied input: every rung reads the tie, qte 0
    val flat = (1L to 40L).map(u => (u, 5.0)).toDF("user_id", "value")
    Sessionize.evQte(flat).collect().foreach { r =>
      assert(r.getDouble(1) == 5.0 && r.getDouble(3) == 0.0)
    }
    // oracle form: 4 rungs
    assert(Sessionize.evQte(spark, "/root/testdata/sf0.001")
      .collect().length == 4)
  }

  test("evKsTwoSample/evMannWhitneyTwoSample: explicit frames == the hash split over the same arms") {
    import spark.implicits._
    def variant(u: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ab:$u".getBytes("UTF-8"))
      if (((d(0) >> 4) & 0xf) < 8) "A" else "B"
    }
    val evs = (1L to 40L).map { u =>
      val lift = if (variant(u) == "B") 3.0 else 0.0
      (u, (u % 7).toDouble + lift)
    }
    val all = evs.toDF("user_id", "value")
    val a = evs.filter(e => variant(e._1) == "A").toDF("user_id", "value")
    val b = evs.filter(e => variant(e._1) == "B").toDF("user_id", "value")
    assert(Sessionize.evKsTwoSample(a, b).collect().toSeq ==
      Sessionize.evKs(all).collect().toSeq)
    assert(Sessionize.evMannWhitneyTwoSample(a, b).collect().toSeq ==
      Sessionize.evMannWhitney(all).collect().toSeq)
    assert(Sessionize.evQteTwoSample(a, b).collect().toSeq ==
      Sessionize.evQte(all).collect().toSeq)
    assert(Sessionize.evWinsorTwoSample(a, b).collect().toSeq ==
      Sessionize.evWinsor(all).collect().toSeq)
    // identical snapshots: no drift
    val rf = Sessionize.evKsTwoSample(a, a.withColumn("user_id",
      org.apache.spark.sql.functions.expr("user_id + 1000"))).collect()
    assert(rf.head.getDouble(2) == 0.0)
  }

  test("evKmv: sketch estimates replay the k-min fold; planted overlaps and sub-k sides read exactly") {
    import spark.implicits._
    def h(u: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"kmv:$u".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
    }
    def r(x: Double, dp: Int) = BigDecimal(x)
      .setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble
    val M = 1152921504606846976.0
    def est(hs: Seq[Long]): Double = {
      val mins = hs.sorted.take(64)
      if (mins.size < 64) mins.size.toDouble else 63.0 * M / mins.last
    }
    // a: users 1-600, b: 301-900 (overlap 300, J=1/3), c: 1-50 (< k)
    val sets = Map("a" -> (1L to 600L), "b" -> (301L to 900L),
      "c" -> (1L to 50L))
    val evs = sets.toSeq.flatMap { case (t, us) => us.map(u => (u, t)) }
      .toDF("user_id", "event_type")
    val got = Sessionize.evKmv(evs).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x).toMap
    def unionEst(ta: String, tb: String): (Double, Double) = {
      val ma = sets(ta).map(h).sorted.take(64)
      val mb = sets(tb).map(h).sorted.take(64)
      val u = (ma ++ mb).distinct.sorted.take(64)
      val shared = u.count(x => ma.contains(x) && mb.contains(x))
      val j = shared.toDouble / u.size
      val eu = if (u.size < 64) u.size.toDouble else 63.0 * M / u.last
      (j, j * eu)
    }
    for ((ta, tb) <- Seq(("a", "b"), ("a", "c"), ("b", "c"))) {
      val row = got((ta, tb))
      assert(row.getLong(2) == sets(ta).size &&
        row.getLong(4) == sets(tb).size)
      assert(row.getDouble(3) == r(est(sets(ta).map(h)), 2), s"$ta est")
      assert(row.getDouble(5) == r(est(sets(tb).map(h)), 2), s"$tb est")
      val (j, ei) = unionEst(ta, tb)
      assert(row.getDouble(8) == r(j, 6) && row.getDouble(7) == r(ei, 2),
        s"($ta,$tb) overlap")
    }
    // ground truth columns: planted intersections exact
    assert(got(("a", "b")).getLong(6) == 300 &&
      got(("a", "c")).getLong(6) == 50 && got(("b", "c")).getLong(6) == 0)
    // sub-k side reads its exact count as the estimate
    assert(got(("a", "c")).getDouble(5) == 50.0)
    // estimator within the ~1/sqrt(k) band on the 600/900-sized sides
    assert(math.abs(got(("a", "b")).getDouble(3) - 600) < 600 * 0.4)
    // oracle form: 10 type pairs at sf0.001
    assert(Sessionize.evKmv(spark, "/root/testdata/sf0.001")
      .collect().length == 10)
  }

  test("evWinsor: pooled rank-rule cap replays; a planted whale moves the raw mean only") {
    import spark.implicits._
    def variant(u: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ab:$u".getBytes("UTF-8"))
      if (((d(0) >> 4) & 0xf) < 8) "A" else "B"
    }
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // base value u % 10; the largest B user becomes a 10,000x whale
    val whale = (1L to 200L).filter(variant(_) == "B").max
    val evs = (1L to 200L).map { u =>
      (u, if (u == whale) 100000.0 else (u % 10).toDouble)
    }.toDF("user_id", "value")
    val cents = (1L to 200L).map { u =>
      u -> (if (u == whale) 10000000L else (u % 10) * 100L)
    }.toMap
    // exact replay: pooled p99 rank rule, capped decimal means
    val sorted = cents.values.toSeq.sorted
    val cap = sorted((99 * 200 + 99) / 100 - 1)
    def arm(tag: String) = (1L to 200L).filter(variant(_) == tag)
    val rows = Sessionize.evWinsor(evs).collect()
      .map(r => r.getString(0) -> r).toMap
    for (tag <- Seq("A", "B")) {
      val us = arm(tag); val n = us.size
      val raw = us.map(cents).sum
      val w = us.map(u => math.min(cents(u), cap)).sum
      val nc = us.count(u => cents(u) > cap)
      val row = rows(tag)
      assert(row.getLong(1) == n)
      assert(row.getDouble(2) == r6(raw.toDouble / n / 100))
      assert(row.getDouble(3) == r6(w.toDouble / n / 100))
      assert(row.getDouble(4) == cap.toDouble / 100)
      assert(row.getLong(5) == nc)
    }
    // the whale detector: B's raw mean dwarfs its winsorized mean;
    // A's two columns agree to within the cap's bite
    assert(rows("B").getDouble(2) > 10 * rows("B").getDouble(3))
    assert(rows("A").getDouble(2) == rows("A").getDouble(3))
    // oracle form: two arms
    assert(Sessionize.evWinsor(spark, "/root/testdata/sf0.001")
      .collect().length == 2)
  }

  test("taWatermark: planted green-list docs flag; natural text does not") {
    val rows = TextAnalysis.taWatermark(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getDouble(5), r.getBoolean(6)))
    assert(rows.length == 500)
    val (planted, natural) = rows.partition(_._1 % 9 == 0)
    // every planted doc: >= half its bigrams green (even positions are
    // green by construction, odd-seeded ones add ~gamma more). The z
    // statistic needs length to clear the 4-sigma bar — ~+0.35 green
    // excess per position × sqrt(T)/0.43 ⇒ certain from T≈40; shorter
    // docs still read a strong positive signal
    // even positions are green unless all 8 candidates missed (~0.75⁸
    // ≈ 10% fallback), so expect ~57% green overall — assert ≥ 40%
    // the plant reads ~57% green (even positions green unless all 8
    // candidates miss, ~10% fallback) vs the 25% null; per-doc z at the
    // corpus's T≈16–60 is a noisy 0.75·√T, so the contract is
    // distributional: every planted doc positive, the mean far out,
    // and ≥80% individually past 4σ
    planted.foreach { case (id, _, _, z, _) =>
      assert(z > 0.0, s"doc $id: z=$z not positive")
    }
    assert(planted.map(_._4).sum / planted.length > 3.5,
      s"planted mean z too low: ${planted.map(_._4).sum / planted.length}")
    assert(planted.count(_._5) * 10 >= planted.length * 8,
      s"under 80% of planted docs flagged: ${planted.count(_._5)}" +
        s"/${planted.length}")
    // natural text sits at the binomial null: z ~ N(0,1); a false flag
    // needs z >= 4 (p ~ 3e-5) — none expected over 445 docs
    assert(natural.forall(!_._5),
      s"false flags: ${natural.filter(_._5).map(_._1).toSeq}")
    val meanZ = natural.map(_._4).sum / natural.length
    assert(math.abs(meanZ) < 0.5, s"natural mean z drifted: $meanZ")
  }

  test("dsKanon: the ladder coarsens exactly until every class reaches k") {
    import spark.implicits._
    // level 0 buckets: [0,250) holds 4 rows, [250,500) holds 2 — the
    // small class forces ONE doubling; the merged [0,500) class holds 6
    val rows = Seq(
      ("g", 10L, "x"), ("g", 20L, "x"), ("g", 100L, "y"), ("g", 200L, "x"),
      ("g", 300L, "z"), ("g", 400L, "z")).toDF("cat", "v", "s")
    val got = Pipeline.dsKanon(rows, Seq("cat"), "v", "s", k = 3).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getInt(0) == 1 && r.getLong(2) == 0L && // level 1, bucket 0
      r.getLong(3) == 6L && r.getLong(4) == 3L && // n=6, l_div {x,y,z}
      !r.getBoolean(5))
    // already-k-anonymous data stays at level 0 untouched
    val fine = Seq.tabulate(6)(i => ("g", (i % 2) * 250L, s"s$i"))
      .toDF("cat", "v", "s")
    val g2 = Pipeline.dsKanon(fine, Seq("cat"), "v", "s", k = 3).collect()
    assert(g2.length == 2 && g2.forall(_.getInt(0) == 0) &&
      g2.forall(_.getLong(3) == 3L))
  }

  test("dsKanon: near-unique sensitive proxy (worst case) completes and " +
      "signals suppress-or-widen") {
    import spark.implicits._
    // every row its own sensitive value AND its own quasi class even at
    // the coarsest ladder level: base relation is corpus-sized, no level
    // reaches k — the declared degenerate contract is complete + every
    // row under_k at maxLevel, never an error or a silent publish
    val worst = Seq.tabulate(8)(i => (s"c$i", i * 1000000L, s"sv$i"))
      .toDF("cat", "v", "s")
    val got = Pipeline.dsKanon(worst, Seq("cat"), "v", "s",
      k = 3, maxLevel = 2).collect()
    assert(got.length == 8)
    assert(got.forall(_.getInt(0) == 2), "must land at the coarsest level")
    assert(got.forall(_.getBoolean(5)), "every class must flag under_k")
    assert(got.forall(_.getLong(3) == 1L) && got.forall(_.getLong(4) == 1L))
    assert(got.forall(_.getDouble(6) == 1.0), "1/n risk bound at n=1")
  }

  test("evSequential: planted lift drives the always-valid p down; null stays up") {
    import spark.implicits._
    // replicate the md5 'ab:' arm rule so the lift is planted BY arm
    def armA(id: Long): Boolean = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ab:$id".getBytes("UTF-8"))
      ((h(0) >> 4) & 0xf) < 8
    }
    def events(lift: Double) = (for {
      u <- 0L until 200L
      d <- 0 until 10
    } yield {
      val base = 10.0 + ((u * 7 + d) % 5) * 0.1
      (u * 1000 + d, new java.sql.Timestamp(d * 86400000L), u, "purchase",
        base + (if (armA(u)) lift else 0.0))
    }).toDF("event_id", "ts", "user_id", "event_type", "value")
    val lifted = Sessionize.evSequential(events(5.0)).collect()
    assert(lifted.length == 10)
    val ps = lifted.map(_.getDouble(8))
    // always-valid p is monotone nonincreasing and certain by day 10
    assert(ps.zip(ps.tail).forall { case (a, b) => b <= a }, ps.toSeq)
    assert(ps.last < 0.05, s"planted lift not detected: p=${ps.last}")
    val nullPs = Sessionize.evSequential(events(0.0)).collect()
      .map(_.getDouble(8))
    assert(nullPs.last > 0.3, s"null effect rejected: p=${nullPs.last}")
    // oracle form runs on the testdata events
    assert(Sessionize.evSequential(spark, "/root/testdata/sf0.001")
      .collect().nonEmpty)
  }

  test("taTextRank: hub word wins the co-occurrence PageRank") {
    import spark.implicits._
    // star around 'hub': every other word co-occurs ONLY with it, so
    // centrality concentrates there — the recursive signal RAKE's
    // degree/frequency scoring also sees, but via the rank fixpoint
    val docs = Seq(
      (1L, "hub alpha hub beta"),
      (2L, "gamma hub"),
      (3L, "hub delta")).toDF("doc_id", "text")
    val got = TextAnalysis.taTextRank(docs, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.head._1 == "hub" && got.head._3 == 1L)
    assert(got.map(_._3).toSeq == (1L to got.length))
    // spokes tie exactly (identical position in the graph): same pr
    val spokes = got.filter(_._1 != "hub").map(_._2).distinct
    assert(spokes.length == 1, s"spoke ranks diverged: ${got.toSeq}")
    // oracle form: exactly k contiguous ranks over the testdata corpus
    val orc = TextAnalysis.taTextRank(spark, "/root/testdata/sf0.001")
      .collect()
    assert(orc.length == 30 &&
      orc.map(_.getLong(2)).toSeq == (1L to 30L))
  }

  test("ddDespanOn: shared spans vanish at ARBITRARY offsets; context stays") {
    import spark.implicits._
    val span = (1 to 8).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 a3 $span b1 b2"), // span at offset 4
      (2L, s"c1 $span d1 d2 d3"),    // SAME span at offset 2
      (3L, (1 to 10).map(i => s"e$i").mkString(" "))).toDF("doc_id", "text")
    val out = Dedup.ddDespanOn(docs, n = 4).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    // only the 8 shared tokens are covered (windows straddling the span
    // edge differ by context and are unique) — the fixed-segment
    // dd_paragraph would MISS the offset-2 copy entirely
    assert(out(1L) == ((13, 8, "a1 a2 a3 b1 b2")))
    assert(out(2L) == ((12, 8, "c1 d1 d2 d3")))
    assert(out(3L) == ((10, 0, (1 to 10).map(i => s"e$i").mkString(" "))))
  }

  test("dsDsir: target-resembling docs win the importance resample") {
    import spark.implicits._
    // two disjoint-vocabulary classes, 50 docs each of 20 tokens; the
    // target distribution is the xx-class, so every xx doc's log weight
    // sits ~ +25 while aa docs sit ~ -270 — far outside Gumbel noise
    def doc(id: Long, w1: String, w2: String): (Long, String) =
      (id, Seq.tabulate(20)(i => if (i % 2 == 0) w1 else w2).mkString(" "))
    val raw = ((0L until 50L).map(doc(_, "aa", "bb")) ++
      (50L until 100L).map(doc(_, "xx", "yy"))).toDF("doc_id", "text")
    val target = (0 until 50)
      .map(i => Seq.tabulate(20)(j => if (j % 2 == 0) "xx" else "yy")
        .mkString(" ")).toDF("text")
    val out = Pipeline.dsDsir(raw, target, k = 40).collect()
    assert(out.length == 40)
    // every winner is from the target-resembling class
    assert(out.forall(_.getLong(0) >= 50L), out.map(_.getLong(0)).toSeq)
    // weights separate the classes by construction
    val all = Pipeline.dsDsir(raw, target, k = 100).collect()
    val (xs, as) = all.partition(_.getLong(0) >= 50L)
    assert(xs.map(_.getDouble(1)).min > as.map(_.getDouble(1)).max + 100)
    // score = logw + gumbel at 6 dp on every row
    all.foreach { r =>
      assert(math.abs(r.getDouble(1) + r.getDouble(2) - r.getDouble(3))
        < 2e-6, r)
    }
  }

  test("dsDsirWithin: single-pass flagged form == two-corpus dsDsir exactly") {
    import spark.implicits._
    val docs = (0L until 60L).map { i =>
      (i, Seq.tabulate(12)(j => s"w${(i * 7 + j * 3) % 9}").mkString(" "))
    }
    val flagged = docs.map { case (id, t) => (id, t, id % 3 == 0) }
      .toDF("doc_id", "text", "is_target")
    val viaWithin = Pipeline.dsDsirWithin(flagged, k = 25).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    val viaTwo = Pipeline.dsDsir(
        docs.toDF("doc_id", "text"),
        docs.filter(_._1 % 3 == 0).map(_._2).toDF("text"), k = 25)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(viaWithin == viaTwo && viaWithin.size == 25)
  }

  test("dsDsir: degenerate inputs — empty target still scores (prior-only)") {
    import spark.implicits._
    val raw = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    val out = Pipeline.dsDsir(raw, raw.limit(0).select("text"), k = 5)
      .collect()
    // both docs emitted (k caps, never pads); weights finite
    assert(out.length == 2)
    assert(out.forall(r => !r.getDouble(1).isNaN && !r.getDouble(1).isInfinite))
  }

  test("dsCcnet: per-language terciles rank by cross-entropy; tail dropped") {
    import spark.implicits._
    // lang 'a': 'c' is the dominant token, so docs with more 'r*' rare
    // tokens score strictly higher xent; lang 'b' is independent (its own
    // LM) — one doc per tercile. 6 docs/lang → terciles of 2.
    val docs = (Seq(
      (1L, "a", "c c c c c c c c"), (2L, "a", "c c c c c c c r1"),
      (3L, "a", "c c c c c c r1 r2"), (4L, "a", "c c c c c r1 r2 r3"),
      (5L, "a", "c c c c r1 r2 r3 r4"), (6L, "a", "c c c r1 r2 r3 r4 r5")) ++
      Seq((7L, "b", "x x x x"), (8L, "b", "x x x y1"),
        (9L, "b", "x x y1 y2"), (10L, "b", "x y1 y2 y3"),
        (11L, "b", "x x x x"), (12L, "b", "x x x x")))
      .toDF("doc_id", "lang", "text")
    val got = Pipeline.dsCcnet(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(3),
        r.getString(4), r.getBoolean(5))).toMap
    // lang a: xent strictly increases with doc_id by construction
    assert(Seq(1L, 2L).forall(got(_)._3 == "head"))
    assert(Seq(3L, 4L).forall(got(_)._3 == "middle"))
    assert(Seq(5L, 6L).forall(got(_)._3 == "tail"))
    assert(Seq(1L, 2L, 3L, 4L).forall(got(_)._4) &&
      Seq(5L, 6L).forall(!got(_)._4))
    // per-lang models are independent: lang b's three identical all-'x'
    // docs rank lowest there (ties broken by doc_id), tail = the two
    // rarest-token docs by xent order
    assert(got(9L)._2 < got(10L)._2 && got(10L)._3 == "tail")
    // xent is monotone in planted rarity within lang a
    assert((1 to 5).forall(i => got(i.toLong)._2 < got(i + 1L)._2))
  }

  test("ddUrlOn: canonicalization folds every declared mess and no more") {
    import spark.implicits._
    val urls = Seq(
      // one logical page, five fetch records of it
      (1L, "https://www.ex.com/a/b?x=1&y=2"),
      (2L, "HTTP://EX.COM:80/a/b?y=2&x=1"),
      (3L, "https://ex.com:443/a//b/?utm_source=z&x=1&y=2#frag"),
      (4L, "http://www.ex.com/a/b/?x=1&y=2&fbclid=abc&ref=rss"),
      (5L, "https://ex.com/a///b?gclid=1&utm_campaign=c&x=1&y=2"),
      // NOT the same page: different param value, extra param,
      // non-default port, different path case
      (6L, "https://ex.com/a/b?x=9&y=2"),
      (7L, "https://ex.com/a/b?x=1&y=2&z=3"),
      (8L, "https://ex.com:8080/a/b?x=1&y=2"),
      (9L, "https://ex.com/A/b?x=1&y=2")).toDF("id", "url")
    val got = Dedup.ddUrlOn(urls).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byKeep = got.map(t => t._1 -> t).toMap
    assert(byKeep(1L) ==
      (1L, "https://ex.com/a/b?x=1&y=2", 5L))
    assert(byKeep(6L)._3 == 1L && byKeep(7L)._3 == 1L)
    assert(byKeep(7L)._2 == "https://ex.com/a/b?x=1&y=2&z=3")
    assert(byKeep(8L)._2 == "https://ex.com:8080/a/b?x=1&y=2")
    assert(byKeep(9L)._2 == "https://ex.com/A/b?x=1&y=2")
    assert(got.length == 5)
  }

  test("ddCdcOn: content-defined chunks survive an insertion shift; " +
      "unrelated docs share nothing") {
    import spark.implicits._
    val p = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, p),                       // the passage
      (2L, "zz yy " + p),            // same passage shifted by an insertion
      (3L, (50 to 90).map(i => s"v$i").mkString(" "))) // unrelated
      .toDF("doc_id", "text")
    val got = Dedup.ddCdcOn(docs, div = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // fixed-width windows would misalign after the 2-token insertion;
    // content-defined boundaries re-synchronize, so both docs share the
    // passage's interior chunks
    assert(got(1L)._2 > 0, s"doc 1 shared no chunks: $got")
    assert(got(2L)._2 > 0, s"doc 2 shared no chunks: $got")
    assert(got(3L)._2 == 0, s"unrelated doc shared chunks: $got")
    // identical duplicated-chunk COUNT on the shared passage side
    assert(got(1L)._2 <= got(1L)._1 && got(2L)._2 <= got(2L)._1)
  }

  test("dsDpCounts: Laplace release is reproducible, clamped, and " +
      "scales with 1/epsilon") {
    import spark.implicits._
    val rows = (for { l <- Seq("a", "b"); i <- 1 to (if (l == "a") 40 else 3) }
      yield (i.toLong, l)).toDF("doc_id", "lang")
    def run(eps: Double, salt: String = "dp") =
      Pipeline.dsDpCounts(rows, Seq("lang"), eps, salt).collect()
        .map(r => (r.getString(0), r.getDouble(2), r.getLong(3))).toSeq
    val a = run(0.5)
    // reproducible: same salt, same release
    assert(a == run(0.5))
    // a different salt draws different noise (the fresh-release path)
    assert(a.map(_._2) != run(0.5, "dp2").map(_._2))
    // released counts are non-negative integers near truth: Laplace tail
    // P(|noise| > 30b) = e^-30, so 40 ± 60 and 3 ± 60 with b = 2
    val byLang = a.map(t => t._1 -> t._3).toMap
    assert(byLang("a") >= 0 && byLang("a") <= 100)
    assert(byLang("b") >= 0 && byLang("b") <= 63)
    // same uniform draw, 10x epsilon → noise shrinks ~10x (6-dp rounding)
    val hi = run(5.0)
    a.zip(hi).foreach { case ((l1, n1, _), (l2, n2, _)) =>
      assert(l1 == l2 && math.abs(n2 - n1 / 10) < 1e-4,
        s"$l1 noise $n1 -> $n2")
    }
    // epsilon guard fails fast
    intercept[IllegalArgumentException] {
      Pipeline.dsDpCounts(rows, Seq("lang"), 0.0)
    }
  }

  test("dsD4: exactly the most-prototypical quarter of each cluster drops") {
    val got = Pipeline.dsD4(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getBoolean(3)))
    assert(got.nonEmpty)
    got.groupBy(_._2).foreach { case (cid, rows) =>
      val n = rows.length
      val dropped = rows.filter(!_._4)
      assert(dropped.length == (n + 3) / 4,
        s"cluster $cid: ${dropped.length} dropped of $n")
      // the dropped set is exactly the top-(cos, -vec_id) prefix
      val byRank = rows.sortBy(t => (-t._3, t._1)).take((n + 3) / 4)
      assert(byRank.map(_._1).toSet == dropped.map(_._1).toSet,
        s"cluster $cid dropped the wrong members")
    }
  }

  test("evMad: the robust chart flags a 3x day the 10x day hides from " +
      "a z-chart; integer med2/mad4 arithmetic exact") {
    import spark.implicits._
    val day = 86400000L
    // 12 calm days cycling 3/4/5 events, then a 3x day (12) and a 10x
    // day (40): mean/sigma with the 40 in-window read z(12) ~ 0.5 —
    // invisible at z>3 — while the MAD bar is untouched by either
    val counts = Seq(3, 4, 5, 3, 4, 5, 3, 4, 5, 3, 4, 5, 12, 40)
    val evs = counts.zipWithIndex.flatMap { case (n, d) =>
      (0 until n).map(i => (d.toLong * 100 + i,
        new java.sql.Timestamp(d * day + (8 + i % 10) * 3600000L),
        i.toLong, "m", 1.0))
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Sessionize.evMad(evs).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getBoolean(6)))
    assert(got.length == 14)
    // hand-computed: med2 = 4+4, dev2 of 3/4/5 = 2/0/2, mad4 = 2+2
    assert(got.forall(t => t._2 == 8L && t._4 == 4L))
    val alarms = got.filter(_._5).map(_._1).sorted.toSeq
    assert(alarms == Seq(12L, 40L),
      s"expected exactly the planted days to alarm: $alarms")
    // the z-chart comparison the scaladoc claims: with the 10x day in
    // window, the 3x day sits under z=1
    val xs = counts.map(_.toDouble)
    val mu = xs.sum / xs.size
    val sd = math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / xs.size)
    assert((12.0 - mu) / sd < 1.0)
  }

  test("evPsi: a planted distribution shift reads high; a stable stream " +
      "reads near zero") {
    import spark.implicits._
    def ev(i: Long, dayUs: Long, v: Double) =
      (i, new java.sql.Timestamp(dayUs / 1000), i % 100, "m", v)
    val day = 86400000000L
    // stable: the same 0..9 value cycle in both halves
    val stable = (0L until 2000L).map(i =>
      ev(i, i * day / 100, (i % 10).toDouble))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val s1 = Sessionize.evPsi(stable).collect()
    assert(s1.length == 10)
    val psiStable = s1.head.getDouble(4)
    assert(s1.forall(_.getDouble(4) == psiStable), "psi_total must repeat")
    assert(psiStable < 0.05, s"stable stream drifted: $psiStable")
    // shifted: late half moves the whole mass up 5 bins
    val shifted = (0L until 2000L).map { i =>
      val late = i >= 1000L
      ev(i, i * day / 100, (i % 5).toDouble + (if (late) 5.0 else 0.0))
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val s2 = Sessionize.evPsi(shifted).collect()
    val psiShift = s2.head.getDouble(4)
    assert(psiShift > 0.25, s"planted shift under the alert line: $psiShift")
    // early-fitted bins: the late mass lands in the top bins
    val lateTop = s2.filter(_.getInt(0) >= 5).map(_.getLong(2)).sum
    assert(lateTop == 1000L, s"late mass misbinned: ${s2.mkString(",")}")
  }

  test("taGarble: each corruption class trips exactly its signal") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "broken decode here �� tail"),
      (3L, "ocr case noise xXxXxXxX inside"),
      (4L, "keyboard mash bcdfghjklm end"),
      (5L, "borderline strngth run")) // 7-consonant run: below the 8 cut
      .toDF("doc_id", "text")
    val got = TextAnalysis.taGarble(docs).collect()
      .map(r => r.getLong(0) -> (r.getInt(2), r.getInt(3), r.getInt(4),
        r.getBoolean(6))).toMap
    assert(got(1L) == ((0, 0, 3, false)))
    assert(got(2L)._1 == 2 && got(2L)._4)
    assert(got(3L)._2 == 4 && got(3L)._4)
    assert(got(4L)._3 == 10 && got(4L)._4)
    assert(got(5L)._3 == 7 && !got(5L)._4)
  }

  test("dsDoremi: MWU shifts weight to the high-excess domain") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", 100L), (2L, "a", 100L), // domain a: mean 100 (no excess)
      (3L, "b", 300L), (4L, "b", 300L)) // domain b: mean 300, g = 1.0
      .toDF("doc_id", "source", "n_chars")
    // one round, by hand: m_a = 1e6, m_b = 1.25e6; w0 = 5e8 each;
    // wp = (5e8, 6.25e8), sum 1.125e9; renorm floor -> (444444444,
    // 555555555)
    val r1 = Pipeline.dsDoremi(docs, rounds = 1).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(r1 == Map("a" -> 444444444L, "b" -> 555555555L))
    // eta = 0: multiplier 1 everywhere, weights stay uniform all rounds
    val flat = Pipeline.dsDoremi(docs, rounds = 8, etaPpm = 0L).collect()
      .map(_.getLong(4)).toSet
    assert(flat == Set(500000000L))
    // 8 rounds: monotone concentration on b, mixture still sums to ~1e9
    val r8 = Pipeline.dsDoremi(docs, rounds = 8).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(r8("b") > r1("b") && r8("a") < r1("a"))
    assert(math.abs(r8.values.sum - 1000000000L) <= 2)
  }

  test("taSentiment: integer valence sums, labels, zero-hit contract") {
    import spark.implicits._
    val docs = Seq(
      (1L, "fast fast slow"), // +2 +2 -2 over 3 hits
      (2L, "the a data"), // no lexicon hits
      (3L, "dup small crash"), // -3 -1 -4
      (4L, "big small")) // +1 -1 cancels to neu
      .toDF("doc_id", "text")
    val got = TextAnalysis.taSentiment(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4))))
      .toMap
    assert(got(1L) == ((3L, 2L, 0.666667, "pos")))
    assert(got(2L) == ((0L, 0L, 0.0, "neu")))
    assert(got(3L) == ((3L, -8L, -2.666667, "neg")))
    assert(got(4L) == ((2L, 0L, 0.0, "neu")))
  }
}
