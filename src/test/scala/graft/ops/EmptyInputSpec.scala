package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input contract: every DataFrame-in production entry either
  * returns an EMPTY result or fails fast with a clear message on an empty
  * corpus — never an obscure executor crash.
  */
class EmptyInputSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private def emptyEvents = Seq.empty[(Long, java.sql.Timestamp, Long, String, Double)]
    .toDF("user_id", "ts", "event_id", "event_type", "value")

  test("doc-corpus entries return empty on an empty corpus") {
    assert(Pipeline.taNormalize(emptyDocs).count() == 0)
    assert(Pipeline.taChunk(emptyDocs, 32, 24).count() == 0)
    assert(Pipeline.dsPack(emptyDocs, 256).count() == 0)
    assert(Pipeline.dsShuffle(emptyDocs).count() == 0)
    assert(Pipeline.dsLenBucket(emptyDocs, 16, 32).count() == 0)
    assert(Dedup.ddExactOn(emptyDocs).count() == 0)
    assert(Dedup.ddMinhashLshOn(emptyDocs).count() == 0)
    assert(Dedup.ddSubstring(emptyDocs, 20).count() == 0)
    assert(TextAnalysis.taPerplexity(emptyDocs).count() == 0)
    assert(TextAnalysis.taEntropy(emptyDocs).count() == 0)
    assert(Dedup.ddParagraphOn(emptyDocs).count() == 0)
    assert(TextAnalysis.taDerep(emptyDocs).count() == 0)
    assert(TextAnalysis.taGopher(emptyDocs).count() == 0)
    assert(Dedup.ddContainment(emptyDocs,
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")).count() == 0)
    assert(Pipeline.dsQualityFilter(
      Seq.empty[(Long, String, Double)].toDF("doc_id", "source", "score"),
      "score", 0.5).count() == 0)
    assert(TextAnalysis.taC4Filter(emptyDocs).count() == 0)
    assert(TextAnalysis.taBigramPpl(emptyDocs).count() == 0)
    assert(TextAnalysis.taNgramTop(emptyDocs, 3, 20).count() == 0)
    assert(Pipeline.dsTokBudget(
      Seq.empty[(Long, Int, Double)].toDF("doc_id", "n_tok", "sc"),
      100L).count() == 0)
    assert(TextAnalysis.taReadability(emptyDocs).count() == 0)
    assert(Pipeline.taPiiCount(emptyDocs,
      Seq("emails" -> "[a-z0-9]+@[a-z]+\\.[a-z]+")).count() == 0)
    assert(Pipeline.dsKfold(
      Seq.empty[(Long, String, String)].toDF("doc_id", "lang", "source"),
      5).count() == 0)
    assert(Pipeline.dsCurriculum(
      Seq.empty[(Long, Double)].toDF("doc_id", "sc"), 4).count() == 0)
    assert(Dedup.ddKeepBest(
      Seq.empty[(String, Long, Int)].toDF("cluster_id", "doc_id", "score"))
      .count() == 0)
    assert(Dedup.ddDespanOn(emptyDocs, 20).count() == 0)
    assert(TextAnalysis.taGarble(emptyDocs).count() == 0)
    assert(Dedup.ddUrlOn(
      Seq.empty[(Long, String)].toDF("id", "url")).count() == 0)
    assert(Pipeline.dsCcnet(
      Seq.empty[(Long, String, String)].toDF("doc_id", "lang", "text"))
      .count() == 0)
    assert(Pipeline.dsDsir(emptyDocs, emptyDocs.select("text"), 10)
      .count() == 0)
    assert(Pipeline.dsDsirWithin(
      Seq.empty[(Long, String, Boolean)].toDF("doc_id", "text", "is_target"),
      10).count() == 0)
    assert(Pipeline.dsKanon(
      Seq.empty[(String, Long, String)].toDF("cat", "v", "s"),
      Seq("cat"), "v", "s", 3).count() == 0)
    assert(TextAnalysis.taSentiment(emptyDocs).count() == 0)
    assert(Pipeline.dsDoremi(
      Seq.empty[(Long, String, Long)].toDF("doc_id", "source", "n_chars"))
      .count() == 0)
    assert(Pipeline.dsGroupSplit(
      Seq.empty[(Long, String, String)].toDF("doc_id", "source", "text"))
      .count() == 0)
    assert(TextAnalysis.taFertility(
      emptyDocs.selectExpr("doc_id", "'en' AS lang", "text"),
      Seq.empty[(Int, String, String)].toDF("merge_round", "lhs", "rhs"))
      .count() == 0)
    assert(Multimodal.mmDupBlob(
      Seq.empty[(Long, Array[Byte])].toDF("media_id", "payload"))
      .count() == 0)
    assert(Multimodal.mmHistDiff(
      Seq.empty[Multimodal.MediaRecord].toDS()).count() == 0)
    assert(Multimodal.mmThumb(
      Seq.empty[Multimodal.MediaRecord].toDS()).count() == 0)
    assert(Dedup.ddEditDistOn(emptyDocs).count() == 0)
  }

  test("embedding entries return empty on an empty corpus") {
    val emptyEmb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.ssSqTopkOn(spark, emptyEmb, "vec_id < 5", 10).count() == 0)
    assert(Similarity.ssPqTopkOn(spark, emptyEmb, "vec_id < 5", 10).count() == 0)
    assert(Dedup.ddSemDedupOn(spark, emptyEmb, 16, 0.9).count() == 0)
    assert(Similarity.ssRangeSearch(spark, emptyEmb, "vec_id < 5", 0.5)
      .count() == 0)
    assert(Similarity.ssIvfPqTopkOn(spark, emptyEmb, "vec_id < 5", 10)
      .count() == 0)
    assert(Similarity.bruteTopkOn(spark, emptyEmb, "vec_id < 5", 10).count() == 0)
    assert(Similarity.ssMips(spark, emptyEmb, "vec_id < 5", 10).count() == 0)
    assert(Similarity.ssRqTopkOn(spark, emptyEmb, "vec_id < 5", 10)
      .count() == 0)
    assert(Similarity.ssOpqTopkOn(spark, emptyEmb, "vec_id < 5", 10)
      .count() == 0)
    assert(Similarity.ssL2TopkOn(spark, emptyEmb, "vec_id < 5", 10)
      .count() == 0)
    assert(Similarity.ssMipsAugmentOn(spark, emptyEmb).count() == 0)
    // ssMmr with an absent query id: no candidates, zero picks
    assert(Similarity.ssMmr(spark, emptyEmb, 0L, 3, 0.7).count() == 0)
    assert(Similarity.ssRqTopkOn(spark, emptyEmb, "vec_id < 5", 10,
      nprobe = 2).count() == 0)
    assert(Similarity.ssBqTopkOn(spark, emptyEmb, "vec_id < 5", 10)
      .count() == 0)
    assert(Similarity.ssRpTopkOn(spark, emptyEmb, "vec_id < 5", 10)
      .count() == 0)
  }

  test("event entries return empty on an empty stream") {
    assert(Sessionize.evSessionize(emptyEvents, 1000000L).count() == 0)
    assert(Sessionize.evPaths(emptyEvents, 1000000L, 10).count() == 0)
    assert(Sessionize.evFunnel(emptyEvents, Seq("view", "click")).count() == 0)
    assert(Sessionize.evRetention(emptyEvents).count() == 0)
    assert(Sessionize.evAttribution(emptyEvents).count() == 0)
    assert(Sessionize.evActiveUsers(emptyEvents).count() == 0)
    assert(Sessionize.evSpike(emptyEvents).count() == 0)
    assert(Sessionize.evMarkov(emptyEvents).count() == 0)
    assert(Sessionize.evRfm(emptyEvents).count() == 0)
    assert(Sessionize.evStreaks(emptyEvents).count() == 0)
    assert(Sessionize.evGini(emptyEvents).count() == 0)
    assert(Sessionize.evGaps(emptyEvents).count() == 0)
    assert(Sessionize.evFeatures(emptyEvents).count() == 0)
    assert(Sessionize.evSurvival(
      Seq.empty[(Long, Boolean)].toDF("t", "censored")).count() == 0)
    assert(TextAnalysis.taColloc(emptyDocs).count() == 0)
    assert(TextAnalysis.taWinnow(emptyDocs).count() == 0)
    assert(TextAnalysis.taJsd(
      Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source"))
      .count() == 0)
    assert(Sessionize.evDailyTop(emptyEvents).count() == 0)
    assert(Sessionize.evChurn(emptyEvents).count() == 0)
    assert(TextAnalysis.taBurstiness(emptyDocs).count() == 0)
    assert(TextAnalysis.taHeaps(emptyDocs).count() == 0)
    assert(TextAnalysis.taNovelty(emptyDocs).count() == 0)
    assert(Pipeline.dsDropout(emptyDocs).count() == 0)
    assert(Pipeline.dsLeakage(emptyDocs).count() == 0)
    assert(TextAnalysis.taRarity(emptyDocs).count() == 0)
    assert(TextAnalysis.taCondEntropy(
      Seq.empty[(String, String)].toDF("text", "source")).count() == 0)
    assert(Sessionize.evEntropy(emptyEvents).count() == 0)
    assert(Sessionize.evTheil(emptyEvents).count() == 0)
    assert(Sessionize.evHolt(emptyEvents).count() == 0)
    assert(Sessionize.evCusum(emptyEvents).count() == 0)
    assert(Sessionize.evMad(emptyEvents).count() == 0)
    assert(Sessionize.evHoltWinters(emptyEvents).count() == 0)
    assert(Sessionize.evGrowth(emptyEvents).count() == 0)
    assert(Sessionize.evMannWhitney(emptyEvents).count() == 0)
    assert(Sessionize.evKs(emptyEvents).count() == 0)
    assert(Sessionize.evQte(emptyEvents).count() == 0)
    assert(graft.streaming.ConversionJoin.convPairs(emptyEvents)
      .count() == 0)
    assert(graft.graph.Scc.run(spark,
      Seq.empty[(Long, Long)].toDF("src", "dst")).count() == 0)
    assert(Sessionize.evKmv(emptyEvents).count() == 0)
    assert(Sessionize.evWinsor(emptyEvents).count() == 0)
    assert(graft.graph.Betweenness.run(spark,
      Seq.empty[(Long, Long)].toDF("u", "v")).count() == 0)
    assert(graft.graph.Katz.run(spark,
      Seq.empty[(Long, Long)].toDF("u", "v")).count() == 0)
    assert(Sessionize.evHod(emptyEvents).count() == 0)
    assert(Sessionize.evDispersion(emptyEvents).count() == 0)
    assert(Sessionize.evLag(emptyEvents).count() == 0)
    assert(Sessionize.evStickiness(emptyEvents).count() == 0)
    assert(Sessionize.evTrigrams(emptyEvents).count() == 0)
    assert(Dedup.ddPrefixOn(emptyDocs).count() == 0)
    assert(Similarity.ssMatryoshkaOn(spark,
      Seq.empty[(Long, Array[Float], Int)].toDF("vec_id", "embedding", "label"),
      dims = 2, queryPred = "vec_id < 5", topK = 3).count() == 0)
    assert(graft.graph.GraphQueries.lccOn(
      Seq.empty[(Long, Long)].toDF("u", "v")).count() == 0)
    assert(Pipeline.dsClassWeight(
      Seq.empty[(Long, String)].toDF("doc_id", "lang"), "lang").count() == 0)
    assert(TextAnalysis.taCodeFrac(
      Seq.empty[(String, String)].toDF("source", "text")).count() == 0)
    assert(Similarity.ssCosHist(
      Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding"))
      .count() == 0)
    assert(Pipeline.dsPackEff(emptyDocs).count() == 0)
    assert(Pipeline.dsSplitDrift(emptyDocs).count() == 0)
    assert(Sessionize.evLifespan(emptyEvents).count() == 0)
    assert(Sessionize.evAutocorr(emptyEvents).count() == 0)
    assert(Sessionize.evSrm(emptyEvents).count() == 0)
    assert(Sessionize.evDecay(emptyEvents).count() == 0)
    // empty corpus → empty encode; empty MERGE TABLE → char-split passthrough
    locally {
      val m0 = Seq.empty[(Int, String, String)]
        .toDF("merge_round", "lhs", "rhs")
      assert(TextAnalysis.taBpeEncode(emptyDocs, m0).count() == 0)
      val one = Seq((7L, "ab")).toDF("doc_id", "text")
      val r = TextAnalysis.taBpeEncode(one, m0).collect()
      assert(r.length == 1 && r.head.getLong(1) == 2L &&
        r.head.getString(2) == "a b")
    }
    assert(TextAnalysis.taVocabJaccard(
      Seq.empty[(String, String)].toDF("source", "text")).count() == 0)
    assert(Pipeline.dsIngestBias(emptyDocs).count() == 0)
    assert(Similarity.ssLabelSep(
      Seq.empty[(Long, Array[Float], Int)].toDF("vec_id", "embedding", "label"))
      .count() == 0)
    assert(TextAnalysis.taNonAscii(
      Seq.empty[(String, String)].toDF("source", "text")).count() == 0)
    assert(Similarity.ssOutliers(
      Seq.empty[(Long, Array[Float], Int)].toDF("vec_id", "embedding", "label"))
      .count() == 0)
    assert(Similarity.ssNorms(
      Seq.empty[(Long, Array[Float], Int)].toDF("vec_id", "embedding", "label"))
      .count() == 0)
    assert(TextAnalysis.taChecksum(
      Seq.empty[(String, String)].toDF("text", "source")).count() == 0)
    assert(Sessionize.evOverlap(emptyEvents).count() == 0)
    assert(Multimodal.mmWindows(
      Seq.empty[(Long, Long)].toDF("media_id", "n_bytes")).count() == 0)
    assert(Similarity.ssHardNeg(spark,
      Seq.empty[(Long, Array[Float], Int)].toDF("vec_id", "embedding", "label"),
      "vec_id < 5", 3).count() == 0)
    assert(Similarity.ssDrift(
      Seq.empty[(Long, Array[Float], Int)].toDF("vec_id", "embedding", "label"))
      .count() == 0)
    assert(Pipeline.dsSoftDedup(
      Seq.empty[Long].toDF("doc_id"),
      Seq.empty[(Long, Long)].toDF("doc_id", "canon_id")).count() == 0)
    assert(Dedup.ddCrossDedup(emptyDocs, emptyDocs).count() == 0)
    assert(Dedup.ddStats(
      Seq.empty[(String, String)].toDF("source", "text")).count() == 0)
    assert(Pipeline.dsWeightedSample(
      Seq.empty[(Long, Double)].toDF("doc_id", "w"), "w", 5).count() == 0)
    assert(Pipeline.dsEpochs(
      Seq.empty[(String, Long, Int)].toDF("source", "tokens", "w"),
      100L, 3).count() == 0)
  }

  test("PageRank on an empty graph fails fast with a clear message") {
    val edges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      graft.graph.PageRank.run(spark, edges, 3)
    }
    assert(e.getMessage.contains("empty"))
  }

  test("eighth-to-tenth-batch entries honor the empty-input contract") {
    val emptyEmb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Sessionize.evBots(emptyEvents).count() == 0)
    assert(Sessionize.botsFromGaps(
      Seq.empty[(Long, Long)].toDF("user_id", "gap")).count() == 0)
    assert(Sessionize.evEwma(emptyEvents).count() == 0)
    assert(Sessionize.evDow(emptyEvents).count() == 0)
    assert(TextAnalysis.taZipf(emptyDocs).count() == 0)
    assert(Similarity.ssKnnGraph(emptyEmb, 5).count() == 0)
    assert(Similarity.ssMaxSim(emptyEmb).count() == 0)
    assert(Multimodal.mmShard(
      Seq.empty[(Long, Array[Byte])].toDF("media_id", "payload")).count() == 0)
    assert(Dedup.ddCrossFuzzy(emptyDocs, emptyDocs).count() == 0)
    // HITS degenerates to the empty relation (no driver-side action to
    // trip on), matching the lazy-empty side of the contract
    assert(graft.graph.Hits.run(spark,
      Seq.empty[(Long, Long)].toDF("src", "dst"), 2).count() == 0)
    // round-10 entries
    val emptyMedia = spark.emptyDataset(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord])
    assert(Multimodal.mmAudioSeg(emptyMedia).count() == 0)
    assert(Multimodal.mmImgHist(emptyMedia).count() == 0)
    assert(Dedup.ddCdcOn(emptyDocs).count() == 0)
    assert(Pipeline.dsDpCounts(
      Seq.empty[(Long, String)].toDF("doc_id", "lang"),
      Seq("lang"), 0.5).count() == 0)
  }
}
