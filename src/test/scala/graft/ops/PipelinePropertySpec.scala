package graft.ops

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property-based invariants for the round-7 pipeline additions: each
  * case generates a small corpus, runs the REAL Spark operator, and
  * compares against an in-memory replay of its spec — the PropertySpec
  * discipline applied to the DataFrame layer (few cases, real plans).
  */
class PipelinePropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def check(p: Prop): Unit = {
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(10)
    val res = org.scalacheck.Test.check(params, p)
    assert(res.passed, res.status.toString)
  }

  private val genScored: Gen[(List[(Long, Int, Double)], Long)] = for {
    n <- Gen.choose(1, 30)
    toks <- Gen.listOfN(n, Gen.choose(1, 50))
    scs <- Gen.listOfN(n, Gen.choose(0, 1000000).map(_ / 1e6))
    budget <- Gen.choose(0L, toks.map(_.toLong).sum)
  } yield (toks.indices.map(i => ((i + 1).toLong, toks(i), scs(i))).toList,
    budget)

  test("dsTokBudget: two-pass cum == naive global prefix sum, any scores/budget") {
    import spark.implicits._
    check(Prop.forAll(genScored) { case (rows, budget) =>
      var cum = 0L
      val expected = rows.sortBy { case (id, _, sc) => (-sc, id) }
        .map { case (id, n, _) => cum += n; (id, cum, cum <= budget) }
        .sortBy(_._1)
      val got = Pipeline.dsTokBudget(rows.toDF("doc_id", "n_tok", "sc"), budget)
        .collect().map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4)))
        .toList
      got == expected
    })
  }

  private val genClassed: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 40)
    cls <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d"))
  } yield cls.indices.map(i => ((i + 1).toLong, cls(i))).toList

  test("dsBalance: every present class lands exactly on the min class size") {
    import spark.implicits._
    check(Prop.forAll(genClassed) { rows =>
      val k = rows.groupBy(_._2).values.map(_.size).min.toLong
      val got = Pipeline.dsBalance(rows.toDF("doc_id", "lang"), "lang")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3)))
      val byCls = got.groupBy(_._2)
      got.forall(_._4 == k) &&
        byCls.keySet == rows.map(_._2).toSet &&
        byCls.values.forall(g =>
          g.length == k && g.map(_._3).sorted.toSeq == (1L to k)) &&
        // the kept rows are a subset of the input ids in the right class
        got.forall { case (id, cls, _, _) => rows.contains((id, cls)) }
    })
  }

  private val genLinedDoc: Gen[String] = {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "javascript",
      "lorem", "ipsum", "{x}", "plain")
    val line = for {
      nw <- Gen.choose(1, 8)
      ws <- Gen.listOfN(nw, word)
      end <- Gen.oneOf(".", "!", "?", "", "", "")
    } yield ws.mkString(" ") + end
    for {
      nl <- Gen.choose(1, 6)
      ls <- Gen.listOfN(nl, line)
    } yield ls.mkString("\n")
  }

  test("taC4Filter: Spark rules == an in-memory replay on arbitrary line docs") {
    import spark.implicits._
    check(Prop.forAll(Gen.listOfN(5, genLinedDoc)) { texts =>
      val rows = texts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }
      val expected = rows.map { case (id, t) =>
        val lines = t.split("\n", -1)
        val kept = lines.filter(l => l.matches(".*[.!?]$") &&
          l.split(" ", -1).length >= 5 &&
          !l.toLowerCase.contains("javascript"))
        val boiler = t.toLowerCase.contains("lorem ipsum") || t.contains("{")
        (id, lines.length, kept.length, kept.mkString("\n").length,
          !boiler && kept.length >= 3)
      }
      val got = TextAnalysis.taC4Filter(rows.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
          r.getInt(3), r.getBoolean(4))).toList
      got == expected
    })
  }

  private val genEvents: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 60)
    us <- Gen.listOfN(n, Gen.choose(1L, 6L))
    ds <- Gen.listOfN(n, Gen.choose(0L, 15L))
  } yield us.zip(ds)

  test("evStreaks: Spark rollup == an in-memory island replay on arbitrary (user, day) sets") {
    import spark.implicits._
    check(Prop.forAll(genEvents) { rows =>
      val expected = rows.distinct.groupBy(_._1).map { case (u, uds) =>
        val days = uds.map(_._2).distinct.sorted
        val runs = days.zipWithIndex.map { case (d, i) => d - i }
          .groupBy(identity).values.map(_.size.toLong).toList
        (u, days.size.toLong, runs.size.toLong, runs.max)
      }.toSet
      // days → timestamps at midday of each epoch-day
      val evs = rows.map { case (u, d) =>
        (u, new java.sql.Timestamp(d * 86400000L + 43200000L))
      }.toDF("user_id", "ts")
      val got = Sessionize.evStreaks(evs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      got == expected
    })
  }

  test("evGini: closed-form tie-run rank sum == naive sorted-rank Gini") {
    import spark.implicits._
    check(Prop.forAll(genEvents) { rows =>
      val counts = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val xs = counts.values.toList.sorted
      val (nu, tn) = (xs.size.toLong, xs.sum)
      val sin = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      val gini = BigDecimal(2d * sin / (nu.toDouble * tn) - (nu + 1d) / nu)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val evs = rows.map { case (u, d) =>
        (u, new java.sql.Timestamp(d * 86400000L + 43200000L))
      }.toDF("user_id", "ts")
      val r = Sessionize.evGini(evs).head()
      r.getLong(0) == nu && r.getLong(1) == tn &&
        math.abs(r.getDouble(2) - gini) < 1e-9
    })
  }

  private val genMix: Gen[(List[(String, Long, Int)], Long, Int)] = for {
    n <- Gen.choose(1, 8)
    toks <- Gen.listOfN(n, Gen.choose(1L, 1000L))
    ws <- Gen.listOfN(n, Gen.choose(1, 9))
    cap <- Gen.choose(1, 4)
    budget <- Gen.choose(0L, toks.sum * (cap + 2))
  } yield (toks.indices.map(i => (s"s$i", toks(i), ws(i))).toList, budget, cap)

  test("dsEpochs: budget conservation, cap respected, capped iff at cap") {
    import spark.implicits._
    check(Prop.forAll(genMix) { case (src, budget, cap) =>
      val rows = Pipeline.dsEpochs(src.toDF("source", "tokens", "w"),
        budget, cap).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getBoolean(3),
          r.getDouble(4), r.getDouble(5)))
      val capTotal = src.map { case (_, t, _) => cap * t }.sum
      val totalAlloc = rows.map(_._5).sum
      val conserve = math.abs(totalAlloc - math.min(budget, capTotal)) <
        1e-3 * math.max(1d, totalAlloc)
      rows.forall { case (_, tok, capped, ep, alloc) =>
        ep <= cap + 1e-9 &&                        // never beyond the cap
        (capped == (math.abs(ep - cap) < 1e-9)) && // flag ⟺ at the cap
        math.abs(alloc - ep * tok) < 1e-2 * math.max(1d, alloc)
      } && conserve
    })
  }

  test("dsWeightedSample: prefix-monotone in k and deterministic") {
    import spark.implicits._
    check(Prop.forAll(Gen.choose(1, 25), Gen.choose(1, 10)) { (n, k) =>
      val docs = (1L to n.toLong).map(i => (i, (i % 7 + 1).toDouble))
        .toDF("doc_id", "w")
      val small = Pipeline.dsWeightedSample(docs, "w", k).collect()
        .map(_.getLong(0)).toList
      val large = Pipeline.dsWeightedSample(docs, "w", k + 5).collect()
        .map(_.getLong(0)).toList
      large.take(small.size) == small && small.size == math.min(k, n)
    })
  }

  test("log2 bucketing: SQL floor(log2(n+1)) == the trackers' bit-length rule") {
    import spark.implicits._
    // the cross-engine claim behind ev_lag/ev_lifespan and LagTracker:
    // double log2 cannot misplace an integer bucket boundary
    check(Prop.forAll(Gen.listOfN(40, Gen.choose(0L, 1L << 50))) { ns =>
      val sql = ns.toDF("n")
        .selectExpr("CAST(floor(log2(n + 1)) AS BIGINT) AS b")
        .collect().map(_.getLong(0)).toList
      sql == ns.map(graft.streaming.LagTracker.bucket)
    })
  }

  test("LagTracker batch fold == in-memory firsts oracle, any event soup") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 6L)
        t <- Gen.choose(0L, 5000L)
        ty <- Gen.oneOf("view", "purchase", "click")
      } yield (u, t, ty))
    } yield rows
    check(Prop.forAll(gen) { rows =>
      val evs = rows.zipWithIndex.map { case ((u, t, ty), i) =>
        (new java.sql.Timestamp(t * 1000L), u, ty) }
        .toDF("ts", "user_id", "event_type")
      val got = graft.streaming.LagTracker.lagBatch(
        evs.as[graft.streaming.LagTracker.LEv]).collect()
        .map(r => r.user_id -> r.lag_s).toMap
      val want = rows.groupBy(_._1).flatMap { case (u, rs) =>
        val fv = rs.filter(_._3 == "view").map(_._2).minOption
        val fp = rs.filter(_._3 == "purchase").map(_._2).minOption
        (fv, fp) match {
          case (Some(v), Some(p)) if v <= p => Some(u -> (p - v))
          case _ => None
        }
      }
      got == want
    })
  }

  test("AutocorrTracker batch == direct Pearson over the zero-filled series") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(2, 40)
      ms <- Gen.listOfN(n, Gen.choose(0L, 60L))
    } yield ms
    check(Prop.forAll(gen) { mins =>
      val evs = mins.map(m => (new java.sql.Timestamp(m * 60000L), "a"))
        .toDF("ts", "event_type")
      val got = graft.streaming.AutocorrTracker.autocorrBatch(
        evs.as[graft.streaming.AutocorrTracker.AEv]).collect()
        .map(r => (r.n_pairs, r.autocorr, r.defined)).toList
      // direct replay: counts per minute over [lo, hi] with zeros
      val cnt = mins.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val series = (mins.min to mins.max).map(m => cnt.getOrElse(m, 0L))
      val x = series.dropRight(1).map(_.toDouble)
      val y = series.drop(1).map(_.toDouble)
      val n = x.length
      val want =
        if (n == 0) List((0L, 0.0, false))
        else {
          val vx = n * x.map(a => a * a).sum - x.sum * x.sum
          val vy = n * y.map(a => a * a).sum - y.sum * y.sum
          if (vx <= 0 || vy <= 0) List((n.toLong, 0.0, false))
          else {
            val r = (n * x.zip(y).map { case (a, b) => a * b }.sum
              - x.sum * y.sum) / (math.sqrt(vx) * math.sqrt(vy))
            List((n.toLong, BigDecimal(r)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, true))
          }
        }
      got == want
    })
  }

  private val genUserVals: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(2, 60)
    vs <- Gen.listOfN(n, Gen.choose(0L, 20L))
  } yield vs.indices.map(i => ((i + 1).toLong, vs(i))).toList

  test("evMannWhitney/evKs: rank statistics are invariant under strictly monotone value maps") {
    import spark.implicits._
    check(Prop.forAll(genUserVals) { case rows =>
      val df = rows.map { case (u, v) => (u, v.toDouble) }
        .toDF("user_id", "value")
      // 3v + 7 is strictly increasing and cent-exact — every rank
      // comparison, tie group, and CDF step is preserved
      val mapped = rows.map { case (u, v) => (u, 3.0 * v + 7.0) }
        .toDF("user_id", "value")
      def mw(d: org.apache.spark.sql.DataFrame) =
        Sessionize.evMannWhitney(d).collect().headOption
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
            r.getDouble(3), Option(r.get(4))))
      def ks(d: org.apache.spark.sql.DataFrame) =
        Sessionize.evKs(d).collect().headOption
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
            r.getDouble(4)))
      mw(df) == mw(mapped) && ks(df) == ks(mapped)
    })
  }

  private val genBpeCorpus: Gen[(List[(Long, String)], List[(Int, String, String)])] =
    for {
      nDocs <- Gen.choose(1, 5)
      docs <- Gen.listOfN(nDocs, for {
        nw <- Gen.choose(1, 5)
        ws <- Gen.listOfN(nw, for {
          len <- Gen.choose(1, 6)
          cs <- Gen.listOfN(len, Gen.oneOf('a', 'b'))
        } yield cs.mkString)
      } yield ws.mkString(" "))
      nRules <- Gen.choose(0, 3)
      syms = Seq("a", "b", "ab", "ba", "aa", "bb")
      rules <- Gen.listOfN(nRules, for {
        l <- Gen.oneOf(syms); r <- Gen.oneOf(syms)
      } yield (l, r))
    } yield (docs.indices.map(i => (i.toLong, docs(i))).toList,
      rules.zipWithIndex.map { case ((l, r), i) => (i + 1, l, r) })

  test("taBpeEncode: any corpus/rule list matches the in-memory greedy fold") {
    import spark.implicits._
    // reference: the canonical greedy left-to-right pass with consumption
    def applyRule(syms: List[String], lhs: String, rhs: String): List[String] =
      syms.foldLeft(List.empty[String]) { (out, c) =>
        if (out.nonEmpty && out.last == lhs && c == rhs)
          out.init :+ (lhs + rhs)
        else out :+ c
      }
    def encodeWord(w: String, rules: List[(Int, String, String)]): List[String] =
      rules.sortBy(_._1).foldLeft(w.map(_.toString).toList) {
        case (syms, (_, l, r)) => applyRule(syms, l, r)
      }
    check(Prop.forAll(genBpeCorpus) { case (docs, rules) =>
      val want = docs.map { case (id, text) =>
        val toks = text.split(" ").filter(_.nonEmpty).toList
          .flatMap(encodeWord(_, rules))
        (id, toks.length.toLong, toks.mkString(" "))
      }.filter(_._2 > 0).sortBy(_._1)
      val got = TextAnalysis.taBpeEncode(
          docs.toDF("doc_id", "text"),
          rules.toDF("merge_round", "lhs", "rhs")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toList
      got == want
    })
  }

  private val genDespanCorpus: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(2, 10)
    vocab = Vector("aa", "bb", "cc", "dd")
    docs <- Gen.listOfN(n, Gen.choose(4, 14).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))))
  } yield docs.indices.map(i => ((i + 1).toLong, docs(i))).toList

  test("ddDespan: removals match an in-memory covered-position replay") {
    import spark.implicits._
    val nGram = 3
    check(Prop.forAll(genDespanCorpus) { docs =>
      // in-memory replay of the contract: a token index is covered iff
      // some n-window over it appears in >= 2 distinct docs
      val grams = docs.flatMap { case (id, text) =>
        val t = text.split(" ")
        (0 to t.length - nGram).map(p => (id, p, t.slice(p, p + nGram)
          .mkString(" ")))
      }
      val dup = grams.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2)
        .keySet
      val want = docs.map { case (id, text) =>
        val t = text.split(" ")
        val cov = (0 to t.length - nGram)
          .filter(p => dup(t.slice(p, p + nGram).mkString(" ")))
          .flatMap(p => p until p + nGram).toSet
        val clean = t.indices.filterNot(cov).map(t)
        (id, t.length, cov.size, clean.mkString(" "))
      }.sortBy(_._1)
      val got = Dedup.ddDespanOn(docs.toDF("doc_id", "text"), nGram)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
        .toList
      got == want
    })
  }

  private val genKanonRows: Gen[(List[(String, Long, String)], Int)] = for {
    n <- Gen.choose(2, 40)
    rows <- Gen.listOfN(n, for {
      cat <- Gen.oneOf("g1", "g2")
      v <- Gen.choose(0L, 4000L)
      s <- Gen.oneOf("s1", "s2", "s3")
    } yield (cat, v, s))
    k <- Gen.choose(2, 5)
  } yield (rows, k)

  test("dsKanon: the chosen ladder level is MINIMAL and classes honest") {
    import spark.implicits._
    check(Prop.forAll(genKanonRows) { case (rows, k) =>
      val got = Pipeline.dsKanon(rows.toDF("cat", "v", "s"),
        Seq("cat"), "v", "s", k = k).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getBoolean(5)))
      val level = got.head._1
      def classesAt(l: Int) = rows.groupBy { case (c, v, _) =>
        (c, v / 250 / (1L << l)) }
      val sizesOk = got.forall { case (_, c, b, n, l, under) =>
        val members = classesAt(level).getOrElse((c, b), Nil)
        n == members.size && l == members.map(_._3).distinct.size &&
          under == (n < k)
      }
      // minimality: every level BELOW the chosen one has some class < k
      // (unless level 0 already suffices); the chosen level itself only
      // fails when even the coarsest rung can't reach k (level 9)
      val minimal = (0 until level).forall(l =>
        classesAt(l).values.exists(_.size < k))
      val chosenOk = got.forall(!_._6) || level == 9
      sizesOk && minimal && chosenOk &&
        got.length == classesAt(level).size
    })
  }

  test("ssMips: per-query rows equal the in-memory inner-product top-k") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(3, 25)
      vecs <- Gen.listOfN(n, Gen.listOfN(4,
        Gen.choose(-100, 100).map(_ / 16.0f)))
    } yield vecs.indices.map(i => (i.toLong, vecs(i).toArray)).toList
    check(Prop.forAll(gen) { emb =>
      val k = 4
      val got = Similarity.ssMips(spark,
          emb.toDF("vec_id", "embedding"), "vec_id < 2", k).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toList
      val want = emb.filter(_._1 < 2).flatMap { case (q, qv) =>
        emb.filter(_._1 != q).map { case (c, cv) =>
          val ip = qv.zip(cv).foldLeft(0.0) { case (a, (x, y)) =>
            a + x.toDouble * y.toDouble } // graft_dot's index-order fold
          (q, c, BigDecimal(ip).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble)
        }.sortBy { case (_, c, ip) => (-ip, c) }.take(k).zipWithIndex
          .map { case ((q2, c, _), i) => (q2, c, (i + 1).toLong) }
      }.sortBy(t => (t._1, t._3))
      got == want
    })
  }

  test("evSequential: p_always_valid IS the running min; p in (0, 1]") {
    import spark.implicits._
    val gen = for {
      nu <- Gen.choose(4, 30)
      nd <- Gen.choose(2, 8)
      vals <- Gen.listOfN(nu * nd, Gen.choose(0, 2000).map(_ / 100.0))
    } yield (nu, nd, vals)
    check(Prop.forAll(gen) { case (nu, nd, vals) =>
      val evs = (for { u <- 0 until nu; d <- 0 until nd } yield (
        (u * 100 + d).toLong,
        new java.sql.Timestamp(d * 86400000L + (u % 24) * 3600000L),
        u.toLong, "e", vals(u * nd + d)))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
      val rows = Sessionize.evSequential(evs).collect()
        .map(r => (r.getLong(0), r.getDouble(7), r.getDouble(8)))
        .sortBy(_._1)
      val runMin = rows.map(_._2).scanLeft(Double.MaxValue)(math.min).tail
      // p can legitimately ROUND to 0.000000 under an extreme likelihood
      // ratio, so the bound is [0, 1]; the running-min identity is exact
      rows.map(_._3).toSeq == runMin.toSeq &&
        rows.forall { case (_, p, pa) =>
          p >= 0 && p <= 1.0 && pa >= 0 && pa <= 1.0 }
    })
  }
}
