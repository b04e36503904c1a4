package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: stress the dedup/pipeline tier at 50–100× sf0.1 (VERDICT r5
  * "what's missing" #1) — the counterpart of ScaleProbe's 5.1M-vertex run
  * for the beyond-reference tier. Generates a synthetic corpus with a
  * zipf-ish vocabulary (log-uniform ranks — heavy stopword tier, long
  * unique tail, the shape real web text has), runs the REAL query code
  * paths (`SparkEntry`'s entries, unmodified) end-to-end to parquet, and
  * measures the invariants the small-N specs lock:
  *
  *  - MinHash LSH band buckets stay pair-sized (no quadratic block);
  *  - SimHash band buckets stay far from the corpus size;
  *  - dd_resolve's label propagation converges in few rounds, components
  *    stay chain-sized;
  *  - dd_decontam's gram-frequency fan-in stays bounded;
  *  - ds_pack's md5 shards stay balanced;
  *  - ta_df's output stays vocabulary-sized.
  *
  * Run with `sbt "runMain graft.PipelineScaleProbe [nDocs] [outBase]"`
  * (default 500000 docs = 100× sf0.1; the dedup queries double that with
  * planted twins). Not part of the driver contract.
  */
object PipelineScaleProbe {

  /** Wall-clock a probe leg — the one shared timing helper (every
    * addendum used to redeclare an identical local copy).
    */
  private def wall[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Deterministic per-doc text — a pure function of (id, seed), so
    * executors generate their slice without anything being shipped
    * (ScaleProbe's edgesFor discipline). Token ranks are log-uniform over
    * a 10k-word vocabulary: rank-1 words land in nearly every doc (the
    * stopword tier ta_df must keep) while the tail is near-unique.
    */
  def docFor(id: Long, seed: Long): (Long, String, String, String, Long) = {
    val rng = new scala.util.Random(seed ^ (id * 0x9E3779B97F4A7C15L))
    val len = 20 + rng.nextInt(71) // 20..90 tokens, like the sf tables
    val lnV = math.log(10000.0)
    val sb = new StringBuilder
    var i = 0
    while (i < len) {
      if (i > 0) sb.append(' ')
      sb.append('w').append((math.exp(rng.nextDouble() * lnV)).toLong.max(1L))
      i += 1
    }
    val text = sb.toString
    val lang = Seq("en", "zh", "de", "fr", "es")(rng.nextInt(5))
    (id, text, lang, s"src${rng.nextInt(10)}", text.length.toLong)
  }

  def main(args: Array[String]): Unit = {
    // addendum mode: run the round-6 additions against an ALREADY
    // generated corpus dir (documents.parquet inside), with their own
    // invariants — `runMain graft.PipelineScaleProbe addendum <dir>`
    if (args.headOption.contains("addendum")) { addendum(args(1)); return }
    // round-7 additions: `addendum7 <docsDir> <eventsDir>`
    if (args.headOption.contains("addendum7")) {
      addendum7(args(1), args(2)); return
    }
    // ev_paths leg: `addendum8 <eventsDir>`
    if (args.headOption.contains("addendum8")) { addendum8(args(1)); return }
    // dd_containment / ds_qfilter / ta_gopher / k-core legs:
    // `addendum9 <docsDir>`
    if (args.headOption.contains("addendum9")) { addendum9(args(1)); return }
    // ds_tokbudget / ta_c4filter legs (generates its own corpus):
    // `addendum10 <nDocs> <dir>`
    if (args.headOption.contains("addendum10")) {
      addendum10(args(1).toInt, args(2)); return
    }
    // `addendum11 <nDocs> <nVec> <outBase>` — readability/pii/kfold/
    // keepbest at corpus scale + PQ recall regimes at vector scale
    if (args.headOption.contains("addendum11")) {
      addendum11(args(1).toInt, args(2).toInt, args(3)); return
    }
    // `addendum12 <nDocs> <nEvents> <outBase>` — streaks/features at
    // event scale, crossdedup/wsample at corpus scale
    if (args.headOption.contains("addendum12")) {
      addendum12(args(1).toInt, args(2).toInt, args(3)); return
    }
    // `addendum14 <nDocs> <nEvents> <outBase>` — cooccur at event scale,
    // bloom-vs-join cross-dedup at corpus scale
    if (args.headOption.contains("addendum14")) {
      addendum14(args(1).toInt, args(2).toInt, args(3)); return
    }
    // `addendum15 <nDocs> <nEvents> <nVec> <outBase>` — zipf/bots at
    // corpus scale, exact mutual-kNN at 10k vectors, HITS on a
    // power-law bipartite graph
    if (args.headOption.contains("addendum15")) {
      addendum15(args(1).toInt, args(2).toInt, args(3).toInt, args(4)); return
    }
    // `zipfleg <dir>` — re-time just ta_zipf against an existing corpus
    // (used to measure the single-agg-pass rewrite on the same data)
    if (args.headOption.contains("zipfleg")) { zipfLeg(args(1)); return }
    // `addendum16 <existingDir>` — ninth/tenth-batch ops against the
    // addendum15 corpus: cross-corpus LSH decontam at 250k×250k docs,
    // shard manifest at 500k media, ewma/dow at 10M events
    if (args.headOption.contains("addendum16")) { addendum16(args(1)); return }
    // `addendum17 <nDocs> <nEvents> <outBase>` — round-7 batch-A..E ops:
    // colloc/winnow/softdedup/align at corpus scale, survival at event
    // scale
    if (args.headOption.contains("addendum17")) {
      addendum17(args(1).toInt, args(2).toInt, args(3)); return
    }
    // `addendum18 <existingDir>` — the six grid/vocabulary-bounded ops of
    // the round-7 close (jsd/burstiness/heaps/daily_top/churn/overlap)
    // against the addendum17 corpus
    if (args.headOption.contains("addendum18")) { addendum18(args(1)); return }
    // `addendum19 <existingDir> <nVec>` — retrieval/graph closers against
    // the addendum17 corpus + fresh vectors: drift/hardneg/hybrid at 100k
    // vectors, truss on the 10M-event co-occurrence graph
    if (args.headOption.contains("addendum19")) {
      addendum19(args(1), args(2).toInt); return
    }
    // `addendum20 <existingDir>` — the continuation-session ops: ev_lag/
    // ev_stickiness/ev_trigrams at 10M events, dd_prefix with planted
    // truncation twins at 500k docs, ss_matryoshka at 100k vectors,
    // lccOn on the 6-hour co-occurrence window graph
    if (args.headOption.contains("addendum20")) { addendum20(args(1)); return }
    // `addendum21 <existingDir>` — second continuation batch:
    // transitivity on the window graph, classweight/codefrac/nonascii/
    // packeff at 500k docs, coshist/outliers at 100k vectors
    if (args.headOption.contains("addendum21")) { addendum21(args(1)); return }
    // `addendum22 <existingDir>` — third continuation batch: splitdrift
    // null + planted drift at 500k docs, lifespan/autocorr at 10M
    // events, labelsep at 100k vectors, compdist on the full star graph
    if (args.headOption.contains("addendum22")) { addendum22(args(1)); return }
    // `addendum23 <existingDir>` — fourth continuation batch: srm at 10M
    // events, hamming histogram + media resolve on the 1M twin corpus
    if (args.headOption.contains("addendum23")) { addendum23(args(1)); return }
    // `addendum24 <existingDir>` — fifth continuation batch: decay at
    // 10M events, vocab-jaccard + ingest-bias (null and planted trend)
    // at 500k docs
    if (args.headOption.contains("addendum24")) { addendum24(args(1)); return }
    // `addendum25 <existingDir>` — coreness decomposition at scale:
    // sf0.1 bipartite + the 6-hour co-occurrence window graph, each
    // KCore-cross-checked
    if (args.headOption.contains("addendum25")) { addendum25(args(1)); return }
    // `addendum26 <existingDir>` — sixth continuation batch: basket
    // rules + seasonality (planted weekend dip) + power-law (planted
    // Pareto tail) at 10M events, log-odds (planted source token) at
    // 500k docs, silhouette/quanterr at 100k vectors, random walks on
    // the 1.6M-edge window graph (edge-validity corpus-wide)
    if (args.headOption.contains("addendum26")) { addendum26(args(1)); return }
    // `addendum27 <existingDir>` — seventh continuation batch: LPA +
    // modularity on a 200k-node planted-block graph, changepoint /
    // forecast / CUPED at 10M events (planted shift, weekly dip,
    // correlated covariate), BM25 needle + BPE merges at 500k docs,
    // power-iteration eigenpair vs dimvar at 100k vectors
    if (args.headOption.contains("addendum27")) { addendum27(args(1)); return }
    // `addendum28 <existingDir>` — eighth continuation batch: DiD planted
    // uplift at 1M users, CM-sketch width dial at 10M events, IVF
    // inertia at 100k vectors, RAKE at 500k docs + corpus-scale algebra
    if (args.headOption.contains("addendum28")) { addendum28(args(1)); return }
    // `addendum29 <existingDir>` — ninth continuation batch: batching
    // padding audit + language-ID confusion at 500k docs
    if (args.headOption.contains("addendum29")) { addendum29(args(1)); return }
    // `addendum30 <existingDir>` — quantile sketch vs an analytic
    // log-uniform at 10M values
    if (args.headOption.contains("addendum30")) { addendum30(args(1)); return }
    // `addendum31` (no dir) — Mann-Whitney / KS at 1M users: hash-null
    // z/D bounds and a planted complete separation on 1M distinct values
    // (the sharded CDF prefix at distinct ~= users)
    if (args.headOption.contains("addendum31")) {
      addendum31(args.lift(1).map(_.toLong).getOrElse(1000000L)); return
    }
    // `addendum32` (no dir) — the conversion interval join at 1.2M
    // events / 100k users with an analytic pair count
    if (args.headOption.contains("addendum32")) { addendum32(); return }
    // `addendum33` (no dir) — KMV set-operation sketches at 1.6M
    // distinct (type, user) memberships with planted overlap
    if (args.headOption.contains("addendum33")) { addendum33(); return }
    // `addendum34` (no dir) — pivot betweenness on the 200k-node
    // planted-block graph: bridge dominance + frontier-bounded cost
    if (args.headOption.contains("addendum34")) { addendum34(); return }
    // `addendum35 <existingDir>` — round-8 re-measure: ta_rake under the
    // maxPhraseLen=4 cap on the 500k corpus AND on a stopword-poor
    // hostile corpus (long islands — the O(len²) pathology the cap bounds)
    if (args.headOption.contains("addendum35")) { addendum35(args(1)); return }
    // `addendum36 <existingDir>` — train-then-encode at 500k docs:
    // taBpe learns 6 merges on the corpus, taBpeEncode applies them
    if (args.headOption.contains("addendum36")) { addendum36(args(1)); return }
    // `addendum37` (no dir) — REAL JDK codec tier at 100k images:
    // generate real PNGs in-executor, decode/resample/dHash-dedup them
    if (args.headOption.contains("addendum37")) { addendum37(); return }
    // `addendum38 <existingDir>` — ta_classify at 500k docs with a
    // planted single-feature model (score separates by token presence)
    if (args.headOption.contains("addendum38")) { addendum38(args(1)); return }
    // `addendum39 <existingDir>` — Coreness/Layers driver-vs-distributed
    // tier equivalence at scale (1.6M-edge dense graph + the q44 DAG)
    if (args.headOption.contains("addendum39")) { addendum39(args(1)); return }
    // `addendum40` (no dir) — primitive-CSR driver tiers AT the 5M-edge
    // cap: planted known-answer graphs, exact checks, wall + heap
    if (args.headOption.contains("addendum40")) { addendum40(); return }
    // `addendum41 <existingDir>` — round-9 ops at 100×: ds_dsir 500k,
    // dd_despan 500k (planted spans), ss_mips + augment at 100k vectors
    if (args.headOption.contains("addendum41")) { addendum41(args(1)); return }
    // `addendum42` (no dir) — mm_audiofeat at 100k REAL WAV clips:
    // planted square waves, every clip's integer cores checked exactly
    if (args.headOption.contains("addendum42")) { addendum42(); return }
    // `addendum43 <existingDir>` — ta_textrank at 500k docs: corpus pass
    // vs vocabulary-sized rank-loop split measured
    if (args.headOption.contains("addendum43")) { addendum43(args(1)); return }
    // `addendum44 <existingDir>` — ev_sequential at 10M events: the SQL
    // day-grid path vs the tracker's declared single-key fold cost
    if (args.headOption.contains("addendum44")) { addendum44(args(1)); return }
    // `addendum45 <existingDir>` — dsDsirWithin (single-pass target⊆raw)
    // vs the two-corpus dsDsir at 500k docs, equality sampled
    if (args.headOption.contains("addendum45")) { addendum45(args(1)); return }
    // `addendum46 <existingDir>` — ss_mmr over the full 100k-vector
    // corpus at k=16 (the per-round-pass cost curve) + the ANN-candidate
    // composition it is designed for
    if (args.headOption.contains("addendum46")) { addendum46(args(1)); return }
    // `addendum47 <existingDir>` — round-10 ops at 100×: dd_url 1M fetch
    // records, ds_ccnet 500k docs × 5 langs, ta_garble 1M docs,
    // dd_cdc 1M docs; content invariants required, walls recorded
    if (args.headOption.contains("addendum47")) { addendum47(args(1)); return }
    // `addendum48` (no dir) — mm_audioseg at 100k REAL multi-burst WAV
    // clips, every clip's segmentation analytic-exact
    if (args.headOption.contains("addendum48")) { addendum48(); return }
    // `addendum49 <existingDir>` — round-10b ops at 100×: ds_doremi 500k
    // docs, ta_sentiment 1M (planted-delta exactness), ev_holt 10M
    // events (+ tracker parity), mm_dupblob 1M blobs, ss_rq_topk 100k
    // vectors (recall vs brute)
    if (args.headOption.contains("addendum49")) { addendum49(args(1)); return }
    // `addendum50 <existingDir>` — round-10c ops at 100×: ds_groupsplit
    // 500k, ta_fertility 500k, ev_holtwinters 10M events (+ Scala
    // replay), q60_anf on a 1M-event co-occurrence graph, mm_histdiff
    // 100k REAL frames (planted cuts exact)
    if (args.headOption.contains("addendum50")) { addendum50(args(1)); return }
    // `addendum51 [dir]` — round-11: ss_ivfrq probed-vs-full ADC + the
    // ds_d4 √N window default, both at 100k vectors (self-generating
    // corpus — no 500k docs needed)
    if (args.headOption.contains("addendum51")) {
      addendum51(args.lift(1).getOrElse("target/pscale19")); return }
    // `addendum52 [dir]` — round-11 second batch: ev_cusum/+tracker and
    // ev_mad at 10M events, ss_bq/ss_rp at 100k vectors, dd_editdist at
    // 500k docs, mm_ahash at 100k real PNGs (self-generating corpus)
    if (args.headOption.contains("addendum52")) {
      addendum52(args.lift(1).getOrElse("target/pscale19")); return }
    // `addendum53 [dir]` — round-12: the DensityGuard under the two
    // measured blow-up regimes (templated-head docs, aliasing images)
    // + the ss_ivfbq probed-vs-full scan at 100k vectors
    if (args.headOption.contains("addendum53")) {
      addendum53(args.lift(1).getOrElse("target/pscale19")); return }
    // `addendum54` — round-12 stretch op dd_lines at 500k docs:
    // boilerplate-heavy regime (10% share a 3-line footer), exact
    // planted accounting via by-construction-unique organic lines
    if (args.headOption.contains("addendum54")) { addendum54(); return }
    // `addendum55 [dir]` — round-13: (a) the train-once IVF codebook
    // (ssIvfTrain + pretrained) query-path A/B vs the inline chain at
    // 100k vectors, (b) the MinHash band-join guard under a
    // mass-boilerplate 500k corpus, (c) the ss_lsh_ann bucket guard
    // under an aliasing vector corpus — the two pair generators the
    // r12 sweep missed
    if (args.headOption.contains("addendum55")) {
      addendum55(args.lift(1).getOrElse("target/pscale19")); return }
    // `addendum56` — round-13: mm_video_scenes over 100k REAL Y4M
    // clips (~1.8 GB of raw frames), every planted cut recovered
    // exactly through the byte-level parse
    if (args.headOption.contains("addendum56")) { addendum56(); return }
    // `addendum57 [dir]` — round-13: the COMPLETE RQ index hoist
    // (coarse + residual codebooks both pretrained) vs coarse-only vs
    // inline at 100k vectors
    if (args.headOption.contains("addendum57")) {
      addendum57(args.lift(1).getOrElse("target/pscale19")); return }
    // `addendum13 <nDocs> <nEvents> <nVec> <outBase>` — gaps/gini at
    // event scale, epochs/ngram at corpus scale, range at vector scale
    if (args.headOption.contains("addendum13")) {
      addendum13(args(1).toInt, args(2).toInt, args(3).toInt, args(4)); return
    }
    // ANN + events families at 100x: generate embeddings/events, probe
    // ss_lsh_ann / ss_ivf_ann (with measured recall vs in-probe brute
    // force), dd_embed_cos twin recall, ev_sessionize, ev_funnel —
    // `runMain graft.PipelineScaleProbe scale2 <nVec> <nEvents> <dir>`
    if (args.headOption.contains("scale2")) {
      scale2(args(1).toInt, args(2).toInt, args(3)); return
    }
    // the TIGHT-cluster config that filled the disk unguarded in the r6
    // probe (strong label signal -> quadratic >=0.9 pair density), re-run
    // under the dd_embed_cos density guard —
    // `runMain graft.PipelineScaleProbe scale2tight <nVec> <dir>`
    if (args.headOption.contains("scale2tight")) {
      scale2tight(args(1).toInt, args(2)); return
    }
    // round-7 events additions (ev_retention, ev_attribution) at the
    // scale2 events volume —
    // `runMain graft.PipelineScaleProbe scale3 <nEvents> <dir>`
    if (args.headOption.contains("scale3")) {
      scale3(args(1).toInt, args(2)); return
    }
    val nDocs = args.headOption.map(_.toInt).getOrElse(500000)
    val outBase = args.lift(1).getOrElse("target/pscale")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // heap comes from SPARK_DRIVER_MEM via build.sbt's -Xmx (local mode:
    // spark.driver.memory is ignored once the JVM is up)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val seed = 2026L
    val dir = s"$outBase/sf${nDocs}"
    spark.range(0L, nDocs.toLong).map(docFor(_, seed))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val nTok = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("explode(split(text, ' ')) AS t")
    println(s"PSCALE gen nDocs=$nDocs totalTokens=${nTok.count()} " +
      s"distinctTokens=${nTok.distinct().count()}")

    // drop caches/checkpoints a query left behind (operators persist
    // internally, e.g. ddMinhashLsh's shingle relation) so later queries
    // aren't taxed by pinned memory — the Bench cleanup discipline
    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    def timed(tag: String)(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      val d = df
      d.write.mode("overwrite").parquet(s"$dir/results/$tag.parquet")
      val dt = (System.nanoTime() - t0) / 1e9
      cleanup()
      val rows = spark.read.parquet(s"$dir/results/$tag.parquet").count()
      println(f"PSCALE q=$tag t=$dt%.1f s rows=$rows")
      dt
    }

    // --- dd_minhash_lsh: run + band-bucket distribution on the real index
    timed("dd_minhash_lsh")(ops.Dedup.ddMinhashLsh(spark, dir))
    val (tok, band) = ops.Dedup.minhashShinglesAndBands(spark, dir)
    // Bucket fan-in: docs sharing the globally-commonest shingles co-bucket
    // (that IS the LSH design), so the scale invariants are (a) no bucket
    // approaches the corpus size and (b) the total candidate-pair fan-in
    // Σ C(bucket, 2) — the real join cost — stays O(n), not O(n²).
    val buckets = band.groupBy("band", "bh").count()
      .agg(max("count").as("mx"), expr("percentile(count, 0.99)").as("p99"),
        avg("count").as("mean"), count(lit(1)).as("nBuckets"),
        sum(expr("count * (count - 1) div 2")).as("candPairs"))
      .head()
    val corpusN = 2L * nDocs
    println(f"PSCALE mh_buckets max=${buckets.getLong(0)} " +
      f"p99=${buckets.getDouble(1)}%.1f mean=${buckets.getDouble(2)}%.2f " +
      f"n=${buckets.getLong(3)} candPairs=${buckets.getLong(4)} " +
      f"corpus=$corpusN")
    require(buckets.getLong(0) <= math.max(64L, corpusN / 100),
      s"minhash bucket blow-up: ${buckets.getLong(0)}")
    require(buckets.getLong(4) <= 10L * corpusN,
      s"candidate fan-in superlinear: ${buckets.getLong(4)}")
    tok.unpersist()
    cleanup()

    // --- dd_resolve: run (counted) + simhash band buckets + component sizes
    val t0 = System.nanoTime()
    val (resolved, ccRounds) = ops.Pipeline.ddResolveCounted(spark, dir)
    resolved.write.mode("overwrite").parquet(s"$dir/results/dd_resolve.parquet")
    println(f"PSCALE q=dd_resolve t=${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"rows=${spark.read.parquet(s"$dir/results/dd_resolve.parquet").count()} " +
      s"ccRounds=$ccRounds")
    val comp = spark.read.parquet(s"$dir/results/dd_resolve.parquet")
      .groupBy("canon_id").count()
      .agg(max("count").as("mx"), count(lit(1)).as("nComps")).head()
    println(s"PSCALE resolve maxComponent=${comp.getLong(0)} " +
      s"nComponents=${comp.getLong(1)}")
    // the invariant is that rounds do NOT grow with corpus size (near-dup
    // chains are shallow; measured 2 at every scale) — a bound well under
    // ddResolve's maxIter also avoids the converged-at-cap ambiguity
    require(ccRounds <= 10, s"label propagation rounds grew to $ccRounds")
    ops.Dedup.simhash64(spark, dir).createOrReplaceTempView("__sig_probe")
    val sb = spark.sql(
      """SELECT MAX(c) AS mx, percentile(c, 0.99) AS p99, AVG(c) AS mean FROM (
        |  SELECT COUNT(*) AS c
        |  FROM (SELECT doc_id, shiftright(simhash, 16 * bno) & 65535 AS bk, bno
        |        FROM __sig_probe LATERAL VIEW explode(sequence(0, 3)) AS bno)
        |  GROUP BY bno, bk)""".stripMargin).head()
    println(f"PSCALE sh_buckets max=${sb.getLong(0)} p99=${sb.getDouble(1)}%.1f " +
      f"mean=${sb.getDouble(2)}%.2f corpus=$corpusN")
    require(sb.getLong(0) <= math.max(16L, corpusN / 10),
      s"simhash bucket blow-up: ${sb.getLong(0)}")

    // --- dd_decontam: run + gram-frequency fan-in on the same carve
    timed("dd_decontam")(ops.Pipeline.ddDecontam(spark, dir))
    val docsDf = Tables.load(spark, dir, "documents").select("doc_id", "text")
    def grams(df: DataFrame, idCol: String): DataFrame =
      df.select(col(idCol), explode(expr(
        """CASE WHEN size(split(text, ' ')) >= 13
          |THEN transform(sequence(1, size(split(text, ' ')) - 12),
          |       i -> xxhash64(array_join(slice(split(text, ' '), i, 13), ' ')))
          |ELSE array() END""".stripMargin)).as("g")).distinct()
    val twins = docsDf.select((col("doc_id") + ops.Pipeline.TwinIdOffset).as("doc_id"),
      expr("array_join(slice(split(text, ' '), 1, " +
        "(size(split(text, ' ')) * 4) div 5), ' ')").as("text"))
    val gf = grams(docsDf.unionAll(twins), "doc_id").groupBy("g").count()
      .agg(max("count").as("mx"), avg("count").as("mean")).head()
    println(f"PSCALE decontam_gram_freq max=${gf.getLong(0)} " +
      f"mean=${gf.getDouble(1)}%.3f")
    require(gf.getLong(0) <= 64, s"gram fan-in blow-up: ${gf.getLong(0)}")

    // --- ds_pack: run + shard balance
    timed("ds_pack")(ops.Pipeline.dsPack(spark, dir))
    val shards = spark.read.parquet(s"$dir/results/ds_pack.parquet")
      .groupBy("bucket").count()
      .agg(min("count").as("mn"), max("count").as("mx"), count(lit(1)).as("k"))
      .head()
    println(s"PSCALE pack_shards min=${shards.getLong(0)} " +
      s"max=${shards.getLong(1)} k=${shards.getLong(2)}")
    require(shards.getLong(2) == 16 &&
      shards.getLong(1) <= (shards.getLong(0) * 1.2).toLong,
      "md5 shard imbalance > 20%")

    // --- ta_df: run; output must stay vocabulary-sized
    timed("ta_df")(ops.TextAnalysis.taDf(spark, dir))
    val dfRows = spark.read.parquet(s"$dir/results/ta_df.parquet").count()
    require(dfRows > 0 && dfRows < 10000, s"ta_df not vocabulary-sized: $dfRows")

    println("PSCALE done")
    spark.stop()
  }

  private def addendum(dir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nDocs = Tables.load(spark, dir, "documents").count()

    def timed(tag: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val d = df
      d.write.mode("overwrite").parquet(s"$dir/results/$tag.parquet")
      val dt = (System.nanoTime() - t0) / 1e9
      val rows = spark.read.parquet(s"$dir/results/$tag.parquet").count()
      println(f"PSCALE q=$tag t=$dt%.1f s rows=$rows")
    }

    timed("ta_derep")(ops.TextAnalysis.taDerep(spark, dir))
    val derep = spark.read.parquet(s"$dir/results/ta_derep.parquet")
    require(derep.count() == nDocs, "ta_derep lost documents")
    val means = derep.selectExpr(
      "avg(CASE WHEN doc_id % 5 = 0 THEN dup_ratio END) AS rep",
      "avg(CASE WHEN doc_id % 5 != 0 THEN dup_ratio END) AS clean").head()
    println(f"PSCALE derep repMean=${means.getDouble(0)}%.4f " +
      f"cleanMean=${means.getDouble(1)}%.4f")
    require(means.getDouble(0) > means.getDouble(1) + 0.05,
      "planted repetition not separable at scale")

    timed("ds_sample")(ops.Pipeline.dsSample(spark, dir))
    val sample = spark.read.parquet(s"$dir/results/ds_sample.parquet")
    val maxPerStratum = sample.groupBy("lang", "source").count()
      .agg(max("count")).head().getLong(0)
    println(s"PSCALE sample rows=${sample.count()} maxPerStratum=$maxPerStratum")
    require(maxPerStratum <= 5, "stratum k exceeded")

    timed("ds_shuffle")(ops.Pipeline.dsShuffle(spark, dir))
    val shuffle = spark.read.parquet(s"$dir/results/ds_shuffle.parquet")
    require(shuffle.count() == nDocs &&
      shuffle.select("doc_id").distinct().count() == nDocs,
      "ds_shuffle is not a permutation")
    val sb = shuffle.groupBy("shard").count()
      .agg(min("count").as("mn"), max("count").as("mx")).head()
    println(s"PSCALE shuffle shards min=${sb.getLong(0)} max=${sb.getLong(1)}")
    require(sb.getLong(1) <= (sb.getLong(0) * 1.2).toLong,
      "shuffle shard imbalance > 20%")

    println("PSCALE addendum done")
    spark.stop()
  }

  /** Round-7 additions against already-generated corpora:
    * `runMain graft.PipelineScaleProbe addendum7 <docsDir> <eventsDir>` —
    * ta_perplexity + ds_lenbucket at the 100× doc corpus, ev_active_users
    * at the 10M-event corpus, and a 1M-vertex PageRank leg on the
    * ScaleProbe small-world generator (executor-side, never shipped),
    * locking the fixed-point determinism claim: an input repartition must
    * reproduce the rank vector BIT-EXACTLY, which float PR cannot do.
    */
  private def addendum7(docsDir: String, eventsDir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    def timed(tag: String, dir: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").parquet(s"$dir/results/$tag.parquet")
      val dt = (System.nanoTime() - t0) / 1e9
      val rows = spark.read.parquet(s"$dir/results/$tag.parquet").count()
      println(f"PSCALE q=$tag t=$dt%.1f s rows=$rows")
    }

    val nDocs = Tables.load(spark, docsDir, "documents").count()

    timed("ta_perplexity", docsDir)(
      ops.TextAnalysis.taPerplexity(spark, docsDir))
    val ppl = spark.read.parquet(s"$docsDir/results/ta_perplexity.parquet")
    require(ppl.count() == nDocs, "ta_perplexity lost documents")
    val px = ppl.agg(min("xent"), max("xent")).head()
    println(f"PSCALE perplexity xent=[${px.getDouble(0)}%.3f, " +
      f"${px.getDouble(1)}%.3f]")
    require(px.getDouble(0) > 0 && px.getDouble(1) < 30,
      "cross-entropy out of sane range")

    timed("ds_lenbucket", docsDir)(ops.Pipeline.dsLenBucket(
      Tables.load(spark, docsDir, "documents"), bandWidth = 16,
      batchSize = 32))
    val lb = spark.read.parquet(s"$docsDir/results/ds_lenbucket.parquet")
    require(lb.count() == nDocs, "ds_lenbucket lost documents")
    val batches = lb.groupBy("band", "shard", "batch_id").agg(
      count(lit(1)).as("k"), (max("pos") + 1).as("kp"),
      (max("n_tokens") - min("n_tokens")).as("spread"))
    val bad = batches.filter("k > 32 OR kp <> k OR spread >= 16").count()
    require(bad == 0, s"$bad batches violate size/contiguity/homogeneity")
    println(s"PSCALE lenbucket batches=${batches.count()} (all <=32, " +
      "contiguous, band-homogeneous)")

    // dd_substring at 100×: the gram-df aggregate runs over ~corpus-position
    // rows, but the df≥2 join-back set must stay boilerplate-sized (the
    // broadcast the plan lock depends on) even with planted twins around
    timed("dd_substring", docsDir)(ops.Dedup.ddSubstring(
      Tables.load(spark, docsDir, "documents"), n = 20))
    val sub = spark.read.parquet(s"$docsDir/results/dd_substring.parquet")
    val dupDocs = sub.filter("n_dup > 0").count()
    println(s"PSCALE substring docs=${sub.count()} withDupSpans=$dupDocs")
    require(sub.filter("n_dup > n_grams").count() == 0, "dup > total grams")

    timed("ev_active_users", eventsDir)(
      ops.Sessionize.evActiveUsers(spark, eventsDir))
    val au = spark.read.parquet(s"$eventsDir/results/ev_active_users.parquet")
    val days = au.count()
    require(days <= 31, s"more output days than the 30-day corpus: $days")
    require(au.filter("wau_7d < dau").count() == 0, "wau below dau somewhere")
    println(s"PSCALE active_users days=$days " +
      s"maxWau=${au.agg(max("wau_7d")).head().getLong(0)}")

    // PageRank at 1M vertices: the small-world generator runs executor-side
    val nV = 1000000
    import spark.implicits._
    val fwd = spark.range(0L, nV.toLong)
      .flatMap(ScaleProbe.edgesFor(_, nV, 3, 0.1, 5, 77L))
      .select($"_1".as("src"), $"_2".as("dst")).distinct()
      .localCheckpoint(eager = true)
    val t0 = System.nanoTime()
    val pr = graph.PageRank.run(spark, fwd, iters = 3)
    val agg1 = pr.agg(sum("pr"), count(lit(1)),
      sum(expr("pr * node"))).head()
    println(f"PSCALE pagerank nV=${agg1.getLong(1)} " +
      f"t=${(System.nanoTime() - t0) / 1e9}%.1f s mass=${agg1.getLong(0)}")
    require(agg1.getLong(0) > graph.PageRank.Scale * 99L / 100 &&
      agg1.getLong(0) <= graph.PageRank.Scale, "rank mass not conserved")
    // fixed-point determinism: a different physical layout, the same bits
    val pr2 = graph.PageRank.run(spark, fwd.repartition(7), iters = 3)
    val agg2 = pr2.agg(sum("pr"), count(lit(1)),
      sum(expr("pr * node"))).head()
    require(agg1 == agg2,
      s"rank vector depends on partitioning: $agg1 vs $agg2")
    println("PSCALE pagerank repartition-invariant (bit-exact)")
    println("PSCALE addendum7 done")
    spark.stop()
  }

  /** ev_paths at the scale3 events volume (10M events / ~15k users):
    * wall-clock plus the invariants the small-N specs lock — the top-k
    * relation is min(k, |paths|)-sized with a total (n DESC, path)
    * order, the full path histogram is bounded by |types|³ = 125 rows
    * and Σn ≤ nEvents (each event starts at most one trigram), session
    * splitting is monotone (a tighter gap can only shrink Σn), and the
    * result is deterministic across independent runs.
    */
  private def addendum8(eventsDir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    val events = Tables.load(spark, eventsDir, "events")
    val nEvents = events.count()

    val t0 = System.nanoTime()
    val top = ops.Sessionize.evPaths(events, ops.Sessionize.GapMicros, 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    println(f"PSCALE q=ev_paths t=${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"rows=${top.length}")
    require(top.length == 10, s"expected 10 top paths, got ${top.length}")
    require(top.forall(_._2 > 0), "non-positive path count")
    require(top.sameElements(top.sortBy { case (p, n) => (-n, p) }),
      "top-k order not total")

    // full histogram: |types|^3-bounded, Σn ≤ nEvents, gap-monotone
    def hist(gapMicros: Long) = ops.Sessionize
      .evPaths(events, gapMicros, 200).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val wide = hist(ops.Sessionize.GapMicros)
    val tight = hist(60L * 1000000)
    require(wide.length <= 125 && tight.length <= 125,
      s"path space not types^3-bounded: ${wide.length}/${tight.length}")
    val (sumW, sumT) = (wide.map(_._2).sum, tight.map(_._2).sum)
    require(sumW <= nEvents, s"more trigrams than events: $sumW > $nEvents")
    require(sumT <= sumW,
      s"tighter gap grew the trigram count: $sumT > $sumW")
    println(s"PSCALE paths hist=${wide.length} sum30m=$sumW sum60s=$sumT " +
      s"top1=${top.head}")

    // determinism across independent runs
    val again = ops.Sessionize.evPaths(events, ops.Sessionize.GapMicros, 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    require(top.sameElements(again), "ev_paths result not deterministic")
    println("PSCALE addendum8 done")
    spark.stop()
  }

  /** The round-7 second-batch ops at scale: dd_containment scoring the
    * REAL MinHash-LSH candidate pairs of a twin-planted 550k-doc corpus
    * (the composition a production pipeline runs), ds_qfilter + ta_gopher
    * over the 500k corpus, and k-core peeling at 1M vertices with the
    * nesting invariant core(k+1) ⊆ core(k).
    */
  private def addendum9(docsDir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import spark.implicits._

    val docs = Tables.load(spark, docsDir, "documents")
      .select("doc_id", "text").localCheckpoint(eager = true)
    val nDocs = docs.count()

    // containment over REAL LSH candidates: plant 80%-prefix twins for
    // every 10th doc, generate MinHash candidates, score them
    val twinned = docs.unionAll(docs.filter("doc_id % 10 = 0").selectExpr(
      s"doc_id + ${ops.Dedup.TwinIdOffset} AS doc_id",
      "array_join(slice(split(text, ' '), 1, " +
        "(size(split(text, ' ')) * 4) div 5), ' ') AS text"))
      .localCheckpoint(eager = true)
    var t0 = System.nanoTime()
    val cand = ops.Dedup.ddMinhashLshOn(twinned)
      .select("doc_a", "doc_b").localCheckpoint(eager = true)
    val nCand = cand.count()
    println(f"PSCALE minhash_cand t=${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"pairs=$nCand")
    t0 = System.nanoTime()
    val scored = ops.Dedup.ddContainment(twinned, cand)
      .localCheckpoint(eager = true)
    val nScored = scored.count()
    println(f"PSCALE q=dd_containment t=${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"rows=$nScored")
    require(nScored == nCand, s"scored $nScored != candidates $nCand")
    require(scored.filter(
      "c_ab < 0 OR c_ab > 1 OR c_ba < 0 OR c_ba > 1").count() == 0,
      "containment out of [0,1]")
    // every candidate pair that IS an (orig, prefix-twin) pair must score
    // twin-in-original containment exactly 1.0 — the subset property at 550k
    val twinPairs = scored.filter(
      s"doc_b = doc_a + ${ops.Dedup.TwinIdOffset}")
    val nTwinPairs = twinPairs.count()
    require(nTwinPairs > 0, "LSH found no planted twin pairs")
    require(twinPairs.filter("c_ba <> 1.0").count() == 0,
      s"prefix twins must contain exactly (n=$nTwinPairs)")
    println(s"PSCALE containment twinPairs=$nTwinPairs all c_ba=1.0")

    t0 = System.nanoTime()
    val qf = ops.Pipeline.dsQualityFilter(spark, docsDir)
      .localCheckpoint(eager = true)
    println(f"PSCALE q=ds_qfilter t=${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"rows=${qf.count()}")
    val fullBySrc = Tables.load(spark, docsDir, "documents")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val badSrc = qf.groupBy("source").count().collect()
      .count(r => r.getLong(1) != (fullBySrc(r.getString(0)) + 1) / 2)
    require(badSrc == 0, s"$badSrc sources kept != ceil(n/2)")
    println(s"PSCALE qfilter sources=${fullBySrc.size} all ceil(n/2)")

    t0 = System.nanoTime()
    val go = ops.TextAnalysis.taGopher(docs).localCheckpoint(eager = true)
    val nGo = go.count()
    println(f"PSCALE q=ta_gopher t=${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"rows=$nGo")
    require(nGo == nDocs, "ta_gopher lost documents")
    require(go.filter("ttr < 0 OR ttr > 1 OR symbol_ratio < 0").count() == 0,
      "gopher ratios out of range")
    println("PSCALE gopher keepFrac=" +
      f"${go.filter("keep").count().toDouble / nGo}%.3f")

    // k-core at 1M vertices on the small-world graph; nesting invariant
    val nV = 1000000
    val fwd = spark.range(0L, nV.toLong)
      .flatMap(ScaleProbe.edgesFor(_, nV, 3, 0.1, 5, 77L))
      .select($"_1".as("src"), $"_2".as("dst")).distinct()
      .localCheckpoint(eager = true)
    val edges = fwd.unionAll(fwd.select($"dst".as("src"), $"src".as("dst")))
      .distinct().localCheckpoint(eager = true)
    // the generator's symmetric degree centers on 6, but rewires create
    // degree-5 vertices whose removal unzips the ring lattice — k-core
    // percolation collapses the 6-core (and possibly lower) to EMPTY in a
    // deep cascade. That collapse is itself the scale stressor: peel down
    // from k=6 to the largest non-empty core, then verify nesting
    var kSel = 7
    var nCore = 0L
    var core: org.apache.spark.sql.DataFrame = null
    while (nCore == 0 && kSel > 3) {
      kSel -= 1
      t0 = System.nanoTime()
      core = graph.KCore.run(spark, edges, kSel).localCheckpoint(eager = true)
      nCore = core.count()
      println(f"PSCALE q=kcore k=$kSel t=${(System.nanoTime() - t0) / 1e9}%.1f s " +
        s"core=$nCore of $nV")
    }
    require(nCore > 0, "even the 4-core is empty")
    require(core.agg(min("deg")).head().getLong(0) >= kSel,
      "a core vertex is below the k threshold")
    val coreUp = graph.KCore.run(spark, edges, kSel + 1)
      .localCheckpoint(eager = true)
    require(coreUp.join(core, Seq("node"), "left_anti").count() == 0,
      s"core(${kSel + 1}) not nested in core($kSel)")
    println(s"PSCALE kcore nesting holds: ${coreUp.count()} <= $nCore <= $nV")
    println("PSCALE addendum9 done")
    spark.stop()
  }

  /** Third-batch round-7 ops at 100x: token-budget selection's two-pass
    * prefix-sum (the greedy-prefix contract must hold exactly at any
    * corpus size — cum strictly increasing along the selection order,
    * kept = the maximal prefix within budget) and the C4 line rules
    * (linear single pass; the planted boilerplate docs must all flag).
    */
  private def addendum10(nDocs: Int, outBase: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import spark.implicits._

    val seed = 2026L
    val dir = s"$outBase/sf$nDocs"
    spark.range(0L, nDocs.toLong).map(docFor(_, seed))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // ds_tokbudget at a budget of ~25% of the corpus tokens
    val scored = Tables.load(spark, dir, "documents").selectExpr(
      "doc_id", "size(split(text, ' ')) AS n_tok",
      "round(size(array_distinct(split(text, ' '))) " +
        "/ size(split(text, ' ')), 6) AS sc")
      .localCheckpoint(eager = true)
    val total = scored.agg(sum("n_tok")).head().getLong(0)
    val budget = total / 4
    var t0 = System.nanoTime()
    val sel = ops.Pipeline.dsTokBudget(scored, budget)
      .localCheckpoint(eager = true)
    val nSel = sel.count()
    println(f"PSCALE q=ds_tokbudget t=${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"rows=$nSel totalTok=$total budget=$budget")
    require(nSel == nDocs.toLong, s"row count $nSel != corpus $nDocs")
    // cum is a permutation-free exact prefix sum: max == total, strictly
    // increasing along the selection order (all values distinct since
    // every doc has >= 1 token)
    require(sel.agg(max("cum")).head().getLong(0) == total,
      "cum does not close to the corpus total")
    require(sel.select("cum").distinct().count() == nSel,
      "cum values not strictly increasing")
    // the greedy-prefix contract: every kept cum <= budget < every
    // dropped cum, and the kept token mass is within one doc of budget
    val keptTok = sel.filter("kept").agg(sum("n_tok")).head().getLong(0)
    val maxKeptCum = sel.filter("kept").agg(max("cum")).head().getLong(0)
    val minDropCum = sel.filter("NOT kept").agg(min("cum")).head().getLong(0)
    require(maxKeptCum == keptTok && keptTok <= budget && minDropCum > budget,
      s"prefix contract broken: $maxKeptCum/$keptTok/$budget/$minDropCum")
    println(s"PSCALE tokbudget keptTok=$keptTok (<= $budget), " +
      s"nextCum=$minDropCum (> budget): greedy prefix exact at $nDocs docs")

    // ta_c4filter over the same corpus (line synthesis as the sf form)
    t0 = System.nanoTime()
    val c4 = ops.TextAnalysis.taC4Filter(spark, dir)
      .localCheckpoint(eager = true)
    val nC4 = c4.count()
    println(f"PSCALE q=ta_c4filter t=${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"rows=$nC4")
    require(nC4 == nDocs.toLong, s"c4 rows $nC4 != corpus $nDocs")
    // every planted boilerplate page (lorem-ipsum or brace docs) flags
    require(c4.filter("doc_id % 7 = 0 OR doc_id % 13 = 0")
      .filter("keep_doc").count() == 0, "a planted boilerplate doc kept")
    val keepFrac = c4.filter("keep_doc").count().toDouble / nC4
    println(f"PSCALE c4 keepFrac=$keepFrac%.4f " +
      s"(planted boilerplate all flagged)")

    // ta_bigram_ppl: the bigram model relation must stay
    // vocabulary-bounded (|V|^2 at worst) no matter the corpus size, and
    // the zipf corpus must compress under its own bigram model
    t0 = System.nanoTime()
    val big = ops.TextAnalysis.taBigramPpl(
      Tables.load(spark, dir, "documents").select("doc_id", "text"))
      .localCheckpoint(eager = true)
    val nBig = big.count()
    println(f"PSCALE q=ta_bigram_ppl t=${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"rows=$nBig")
    require(nBig == nDocs.toLong, s"bigram rows $nBig != corpus $nDocs")
    val vocab = Tables.load(spark, dir, "documents")
      .selectExpr("explode(split(text, ' ')) AS t").distinct().count()
    val maxPpl = big.agg(max("ppl2")).head().getDouble(0)
    require(maxPpl > 0 && maxPpl < vocab.toDouble,
      s"ppl2 $maxPpl outside (0, V=$vocab): model not compressing")
    println(s"PSCALE bigram maxPpl=$maxPpl < V=$vocab at $nDocs docs")

    // ds_balance: the data-driven cap must equal the independently
    // computed min class size, every class must land exactly on it
    t0 = System.nanoTime()
    val bal = ops.Pipeline.dsBalance(
      Tables.load(spark, dir, "documents").select("doc_id", "source"),
      "source").localCheckpoint(eager = true)
    val nBal = bal.count()
    println(f"PSCALE q=ds_balance t=${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"rows=$nBal")
    val minClass = Tables.load(spark, dir, "documents")
      .groupBy("source").count().agg(min("count")).head().getLong(0)
    val perClass = bal.groupBy("cls").count()
      .select("count").distinct().collect().map(_.getLong(0))
    require(perClass.length == 1 && perClass.head == minClass,
      s"classes not balanced to min=$minClass: ${perClass.mkString(",")}")
    require(bal.select("k").distinct().head().getLong(0) == minClass,
      "k column disagrees with the independent min class size")
    println(s"PSCALE balance k=$minClass, every class exact at $nDocs docs")
    println("PSCALE addendum10 done")
    spark.stop()
  }

  /** Scale legs for the round-7 fourth-batch operators: the narrow text
    * passes (ta_readability, ta_pii_count, ds_kfold) and the keep-best
    * window at `nDocs`; PQ recall regimes at `nVec` (the scale2 label-
    * cluster corpus — the mid-similarity regime where LSH collapses).
    */
  private def addendum11(nDocs: Int, nVec: Int, outBase: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)

    val seed = 2026L
    val dir = s"$outBase/sf$nDocs"
    spark.range(0L, nDocs.toLong).map(docFor(_, seed))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    spark.range(0L, nVec.toLong).map(vecFor(_, 64, 10, seed))
      .toDF("vec_id", "embedding", "label")
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    println(s"PSCALE gen11 nDocs=$nDocs nVec=$nVec")

    // ta_readability: narrow single pass; every row scores, sentences >= 1
    var t0 = System.nanoTime()
    val rd = ops.TextAnalysis.taReadability(spark, dir)
      .localCheckpoint(eager = true)
    val nRd = rd.count()
    println(f"PSCALE q=ta_readability t=${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"rows=$nRd")
    require(nRd == nDocs.toLong, s"readability rows $nRd != corpus $nDocs")
    require(rd.filter("n_sents < 1 OR n_words < 1").count() == 0,
      "degenerate sentence/word counts")
    val fl = rd.agg(min("flesch"), max("flesch")).head()
    println(s"PSCALE readability flesch range [${fl.get(0)}, ${fl.get(1)}]")

    // ta_pii_count: the clean flag must EXACTLY complement the planted
    // residues at any corpus size
    t0 = System.nanoTime()
    val pii = ops.Pipeline.taPiiCount(spark, dir)
      .localCheckpoint(eager = true)
    val nPii = pii.count()
    println(f"PSCALE q=ta_pii_count t=${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"rows=$nPii")
    require(nPii == nDocs.toLong, s"pii rows $nPii != corpus $nDocs")
    val wrongFlag = pii.filter(
      "clean = (doc_id % 3 = 0 OR doc_id % 7 = 0 OR doc_id % 11 = 0)")
      .count()
    require(wrongFlag == 0, s"$wrongFlag docs with a wrong clean flag")
    println(s"PSCALE pii clean flag exact on all $nPii docs")

    // ds_kfold: balance within 5% of N/5 at this scale (the declared
    // <=2% draw bias + sampling noise)
    t0 = System.nanoTime()
    val kf = ops.Pipeline.dsKfold(spark, dir).localCheckpoint(eager = true)
    val nKf = kf.count()
    println(f"PSCALE q=ds_kfold t=${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"rows=$nKf")
    val sizes = kf.groupBy("fold").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    require(sizes.keySet == Set(0, 1, 2, 3, 4), s"folds missing: $sizes")
    val expF = nDocs / 5.0
    require(sizes.values.forall(n => math.abs(n - expF) / expF < 0.05),
      s"fold imbalance beyond 5%: $sizes")
    println(s"PSCALE kfold sizes=$sizes (within 5% of ${expF.toLong})")

    // dd_keepbest: every planted multi-member cluster keeps its original
    t0 = System.nanoTime()
    val kb = ops.Dedup.ddKeepBest(spark, dir).localCheckpoint(eager = true)
    val nKb = kb.count()
    println(f"PSCALE q=dd_keepbest t=${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"rows=$nKb")
    val multi = kb.filter("n_members >= 2")
    val nMulti = multi.count()
    val twinSurvivors = multi
      .filter(s"doc_id >= ${ops.Dedup.TwinIdOffset}L").count()
    require(twinSurvivors == 0, s"$twinSurvivors truncated twins survived")
    // every 4th doc plants a twin; prefix collisions can merge clusters
    // but at least 90% of the planted pairs must surface as multi-member
    require(nMulti >= (0.9 * nDocs / 4).toLong,
      s"only $nMulti multi-member clusters for ${nDocs / 4} planted twins")
    println(s"PSCALE keepbest clusters=$nKb multi=$nMulti twinSurvivors=0")

    // ss_pq_topk recall regimes at nVec (mid-similarity label clusters):
    // the exact brute top-5 is the denominator, as in scale2
    val emb = Tables.load(spark, dir, "embeddings")
    val brute = ops.Similarity.bruteTopkOn(spark, emb, "vec_id < 20", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def pqRecall(tag: String, nSub: Int, nCode: Int, mult: Int): Double = {
      val t = System.nanoTime()
      val got = ops.Similarity.ssPqTopkOn(spark, emb, "vec_id < 20", 5,
        nSub = nSub, nCode = nCode, mult = mult)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val r = got.intersect(brute).size.toDouble / brute.size
      println(f"PSCALE q=ss_pq_topk($tag) t=${(System.nanoTime() - t) / 1e9}%.1f s " +
        f"recall@5=$r%.3f")
      r
    }
    val rBase = pqRecall("nSub=8,nCode=16,mult=3", 8, 16, 3)
    val rCut = pqRecall("nSub=8,nCode=16,mult=40", 8, 16, 40)
    val rRich = pqRecall("nSub=16,nCode=64,mult=40", 16, 64, 40)
    println(f"PSCALE pq regimes base=$rBase%.3f cut=$rCut%.3f rich=$rRich%.3f")
    require(rRich >= rBase,
      "richer codebook + deeper cut must not lose recall")
    // the IVF-PQ composition at the rich-PQ config: the coarse filter
    // cuts the ADC scan to ~nprobe/nlist of the corpus
    val t1 = System.nanoTime()
    val ivfpq = ops.Similarity.ssIvfPqTopkOn(spark, emb, "vec_id < 20", 5,
      nlist = 16, nprobe = 2, nSub = 16, nCode = 64, mult = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rIvfPq = ivfpq.intersect(brute).size.toDouble / brute.size
    println(f"PSCALE q=ss_ivfpq_topk(nSub=16,nCode=64,mult=40) " +
      f"t=${(System.nanoTime() - t1) / 1e9}%.1f s recall@5=$rIvfPq%.3f")
    println("PSCALE addendum11 done")
    spark.stop()
  }

  /** Deterministic embedding: per-label gaussian direction + per-vector
    * noise — the testdata's label-cluster shape (what makes label blocking
    * meaningful) at any scale.
    */
  def vecFor(i: Long, dims: Int, nLabels: Int, seed: Long,
             baseScale: Float = 0.15f, noiseScale: Float = 0.25f
            ): (Long, Array[Float], Int) = {
    val label = (i % nLabels).toInt
    val lr = new scala.util.Random(seed ^ (label * 0xC2B2AE3D27D4EB4FL))
    // weak label signal (mean intra-label cosine ~0.26, like the testdata):
    // same-label vectors are CLOSER (blocking stays meaningful) but only
    // the planted twins cross dd_embed_cos's 0.9 threshold — a strong
    // signal (0.25 base / 0.12 noise, the scale2tight config) makes the
    // >=0.9 pair set quadratic in the block size and exploded the first
    // unguarded 100k run's shuffle spill
    val base = Array.fill(dims)(lr.nextGaussian().toFloat * baseScale)
    val vr = new scala.util.Random(seed ^ (i * 0x9E3779B97F4A7C15L))
    (i, base.map(b => b + vr.nextGaussian().toFloat * noiseScale), label)
  }

  /** Deterministic event row; ts is NANOS-in-a-long (the driver table's
    * on-disk convention Tables.load converts).
    */
  def evFor(i: Long, nUsers: Int, seed: Long): (Long, Long, Long, String, Double, String) = {
    val rng = new scala.util.Random(seed ^ (i * 0xD6E8FEB86659FD93L))
    val types = Array("view", "click", "purchase", "signup", "error")
    val baseUs = 1717200000000000L // 2024-06-01 UTC, micros
    val us = baseUs + math.abs(rng.nextLong() % (30L * 24 * 3600 * 1000000))
    (i, us * 1000, math.abs(rng.nextLong()) % nUsers,
      types(rng.nextInt(types.length)),
      math.round(rng.nextDouble() * 10000) / 100.0, s"""{"k":${rng.nextInt(10)}}""")
  }

  private def scale2(nVec: Int, nEvents: Int, dir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val seed = 2026L

    spark.range(0L, nVec.toLong).map(vecFor(_, 64, 10, seed))
      .toDF("vec_id", "embedding", "label")
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val nUsers = math.max(100, nEvents / 666) // ~events-per-user of sf0.1
    spark.range(0L, nEvents.toLong).map(evFor(_, nUsers, seed))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    println(s"PSCALE gen2 nVec=$nVec nEvents=$nEvents nUsers=$nUsers")

    def timed(tag: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val d = df
      d.write.mode("overwrite").parquet(s"$dir/results/$tag.parquet")
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PSCALE q=$tag t=$dt%.1f s " +
        s"rows=${spark.read.parquet(s"$dir/results/$tag.parquet").count()}")
    }

    // exact top-5 for the 20 LSH query vectors — the recall ground truth,
    // via the SAME helper the ANN specs use as their denominator (one
    // brute pass, 20 x nVec dots, cheap at any nVec)
    val brute = ops.Similarity.bruteTopkOn(spark,
      Tables.load(spark, dir, "embeddings"), "vec_id < 20", 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    def recall(tag: String, df: DataFrame, qCol: Int, cCol: Int): Unit = {
      val got = df.collect().map(r => (r.getLong(qCol), r.getLong(cCol))).toSet
      val r = got.intersect(brute).size.toDouble / brute.size
      println(f"PSCALE $tag recall@5=${r}%.3f (${got.intersect(brute).size}/${brute.size})")
    }

    timed("ss_lsh_ann")(ops.Similarity.ssLshAnn(spark, dir))
    recall("ss_lsh_ann",
      spark.read.parquet(s"$dir/results/ss_lsh_ann.parquet"), 0, 1)
    // the scale knob: more planes = smaller buckets + more probes — the
    // 16-plane configuration the Similarity docstring prescribes beyond
    // the 8-plane oracle baseline
    timed("ss_lsh_ann16")(ops.Similarity.ssLshAnnOn(spark,
      Tables.load(spark, dir, "embeddings"), nPlanes = 16,
      queryPred = "vec_id < 20", topK = 5))
    recall("ss_lsh_ann16",
      spark.read.parquet(s"$dir/results/ss_lsh_ann16.parquet"), 0, 1)
    timed("ss_ivf_ann")(ops.Similarity.ssIvfAnnOn(spark,
      Tables.load(spark, dir, "embeddings"), "n.vec_id < 20", 5))
    recall("ss_ivf_ann",
      spark.read.parquet(s"$dir/results/ss_ivf_ann.parquet"), 0, 1)

    val t0 = System.nanoTime()
    val twins = ops.Dedup.ddEmbedCos(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    println(f"PSCALE q=dd_embed_cos t=${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"rows=${twins.length}")
    val twinHits = twins.count { case (a, b) => b == a + ops.Dedup.TwinIdOffset }
    println(f"PSCALE embed_twin_recall=${twinHits.toDouble / nVec}%.3f")
    require(twinHits >= (0.8 * nVec).toLong, "twin recall collapsed at scale")

    timed("ev_sessionize")(ops.Sessionize.evSessionize(spark, dir))
    timed("ev_funnel")(ops.Sessionize.evFunnel(spark, dir))
    val f = spark.read.parquet(s"$dir/results/ev_funnel.parquet")
    val depths = f.groupBy("depth").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    println(s"PSCALE funnel depths=$depths")
    val viewers = spark.sql(
      "SELECT COUNT(DISTINCT user_id) FROM __events WHERE event_type = 'view'")
    // __events registered by evFunnel via Tables.load
    require(f.count() == viewers.head().getLong(0),
      "funnel rows != users with a view")

    println("PSCALE scale2 done")
    spark.stop()
  }

  /** The r6 scale hazard, re-run to completion under the density guard:
    * tight clusters (0.25 base / 0.12 noise — mean intra-label cosine
    * ~0.8) whose unguarded ≥0.9 pair relation is quadratic in block
    * density (the 100k run filled the sandbox disk). The guarded default
    * must finish with a bounded pair set, and fail mode must abort with
    * its diagnostic BEFORE materializing pairs.
    */
  private def scale2tight(nVec: Int, dir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)

    spark.range(0L, nVec.toLong)
      .map(vecFor(_, 64, 10, 2026L, baseScale = 0.25f, noiseScale = 0.12f))
      .toDF("vec_id", "embedding", "label")
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    println(s"PSCALE gen2tight nVec=$nVec")

    // block census on the REAL twin-planted signature relation the query
    // joins — the density the guard is sized against
    val sig = ops.Dedup.embedSig(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val blocks = sig.groupBy("label", "bucket").count()
      .agg(org.apache.spark.sql.functions.max("count"),
        org.apache.spark.sql.functions.expr("sum(count * (count - 1) / 2)"))
      .head()
    println(f"PSCALE tight max_block=${blocks.getLong(0)} " +
      f"unguarded_pair_volume=${blocks.getDouble(1)}%.3g")

    // fail mode: the pre-flight diagnostic must fire without touching the
    // pair join
    val t1 = System.nanoTime()
    try {
      ops.Dedup.ddEmbedCosOn(spark, sig, onOverflow = "fail").count()
      println("PSCALE tight FAIL-MODE DID NOT TRIP (unexpected)")
    } catch {
      case e: IllegalStateException =>
        println(f"PSCALE tight fail_mode_tripped_in=${(System.nanoTime() - t1) / 1e9}%.1f s: " +
          e.getMessage.takeWhile(_ != ';'))
    }

    // guarded sample mode: must COMPLETE with a bounded pair set. The cap
    // is the sizing knob — scored-pair volume is bounded by ~9·cap·N/2
    // (N = corpus incl. twins), so a single 128-GiB box takes cap ≈ 512
    // (≈4.6e8 worst-case scored rows) where a 1000-executor cluster can
    // afford the 4096 default; the BOUND is what the guard guarantees,
    // the cap prices it to the hardware.
    val cap = sys.env.getOrElse("SPARK_GRAFT_COS_CAP", "512").toInt
    val corpusN = sig.count()
    val t2 = System.nanoTime()
    val n = ops.Dedup.ddEmbedCosOn(spark, sig, maxBlockRows = cap).count()
    val dt = (System.nanoTime() - t2) / 1e9
    println(f"PSCALE q=dd_embed_cos_guarded cap=$cap t=$dt%.1f s rows=$n " +
      f"bound=${9L * cap * corpusN / 2}")
    require(n > 0 && n < 9L * cap * corpusN / 2,
      s"guarded pair set out of bounds: $n")
    println("PSCALE scale2tight done")
    spark.stop()
  }

  /** ev_retention + ev_attribution at the scale2 events volume (10M
    * events / ~15k users over 30 days): wall-clock plus the structural
    * invariants the small-N specs lock — day-0 retention is exactly 1.0
    * per cohort, the cell space is days²-bounded, attribution emits one
    * row per purchase and never attributes to a touch after it.
    */
  private def scale3(nEvents: Int, dir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val nUsers = math.max(100, nEvents / 666)
    spark.range(0L, nEvents.toLong).map(evFor(_, nUsers, 2026L))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    println(s"PSCALE gen3 nEvents=$nEvents nUsers=$nUsers")

    def timed(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").parquet(s"$dir/results/$tag.parquet")
      println(f"PSCALE q=$tag t=${(System.nanoTime() - t0) / 1e9}%.1f s " +
        s"rows=${spark.read.parquet(s"$dir/results/$tag.parquet").count()}")
    }

    timed("ev_retention")(ops.Sessionize.evRetention(spark, dir))
    val ret = spark.read.parquet(s"$dir/results/ev_retention.parquet")
    val cells = ret.count()
    val badDay0 = ret.filter("day_offset = 0 AND (n_users <> cohort_size OR retention <> 1.0)")
      .count()
    require(badDay0 == 0, s"$badDay0 day-0 cells lost cohort members")
    require(cells <= 31L * 31, s"cell space not days^2-bounded: $cells")
    println(s"PSCALE retention cells=$cells (days^2-bounded)")

    timed("ev_attribution")(ops.Sessionize.evAttribution(spark, dir))
    val attr = spark.read.parquet(s"$dir/results/ev_attribution.parquet")
    val nPurch = spark.read.parquet(s"$dir/events.parquet")
      .filter("event_type = 'purchase'").count()
    require(attr.count() == nPurch,
      s"attribution rows ${attr.count()} != purchases $nPurch")
    val badOrder = attr.filter("t_touch IS NOT NULL AND t_touch >= t_purchase").count()
    require(badOrder == 0, s"$badOrder touches at/after their purchase")
    val mix = attr.groupBy("touch_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    println(s"PSCALE attribution purchases=$nPurch mix=$mix")
    println("PSCALE scale3 done")
    spark.stop()
  }

  /** Round-7 fifth-batch legs: ev_streaks / ev_features at event scale,
    * dd_crossdedup / ds_wsample at corpus scale —
    * `runMain graft.PipelineScaleProbe addendum12 <nDocs> <nEvents> <outBase>`
    */
  private def addendum12(nDocs: Int, nEvents: Int, outBase: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.{avg, max, sum}
    import spark.implicits._
    val seed = 2026L
    val dir = s"$outBase/sf$nDocs"
    spark.range(0L, nDocs.toLong).map(docFor(_, seed))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val nUsers = scala.math.max(100, nEvents / 666)
    spark.range(0L, nEvents.toLong).map(evFor(_, nUsers, seed))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    println(s"PSCALE gen12 nDocs=$nDocs nEvents=$nEvents nUsers=$nUsers")

    def timed(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").parquet(s"$dir/results/$tag.parquet")
      println(f"PSCALE q=$tag t=${(System.nanoTime() - t0) / 1e9}%.1f s " +
        s"rows=${spark.read.parquet(s"$dir/results/$tag.parquet").count()}")
    }

    // ev_streaks: rollup rows == users; the island algebra must close —
    // Σ active_days over users == |DISTINCT (user, day)|, every
    // max_streak bounded by its active_days
    timed("ev_streaks")(ops.Sessionize.evStreaks(spark, dir))
    val stk = spark.read.parquet(s"$dir/results/ev_streaks.parquet")
    val events = graft.Tables.load(spark, dir, "events")
    val userDays = events
      .selectExpr("user_id", "unix_micros(ts) div 86400000000 AS day")
      .distinct().count()
    val sumActive = stk.agg(sum("active_days")).head().getLong(0)
    require(sumActive == userDays,
      s"island algebra broke: sum(active_days)=$sumActive != (user,day)=$userDays")
    val badStk = stk.filter(
      "max_streak > active_days OR n_streaks > active_days OR " +
        "max_streak < 1 OR n_streaks < 1").count()
    require(badStk == 0, s"$badStk rollups violate streak bounds")
    // 10M events over 30 days at ~15k users saturates every day: the
    // dense regime (streak == observed span) must actually occur
    println(s"PSCALE streaks users=${stk.count()} userDays=$userDays " +
      s"maxStreak=${stk.agg(max("max_streak")).head().getLong(0)}")

    // ev_features: corpus-sized output, ONE user exchange; the window
    // algebra must close — exactly one seq_idx=1 (null lag) per user,
    // gaps never negative
    timed("ev_features")(ops.Sessionize.evFeatures(spark, dir))
    val ft = spark.read.parquet(s"$dir/results/ev_features.parquet")
    require(ft.count() == nEvents.toLong, "features lost rows")
    val nU = events.select("user_id").distinct().count()
    val firsts = ft.filter("seq_idx = 1").count()
    require(firsts == nU, s"seq_idx=1 rows $firsts != users $nU")
    val badFt = ft.filter(
      "(seq_idx = 1) != (prev_value IS NULL) OR gap_us < 0").count()
    require(badFt == 0, s"$badFt feature rows break the lag algebra")
    println(s"PSCALE features rows=${ft.count()} users=$nU")

    // dd_crossdedup: the planted doc_id%10=5 cross-set duplicates are
    // flagged EXACTLY (docFor texts are unique, so nothing else may flag)
    timed("dd_crossdedup")(ops.Dedup.ddCrossDedup(spark, dir))
    val xd = spark.read.parquet(s"$dir/results/dd_crossdedup.parquet")
    val flagged = xd.filter("dup_in_ref").count()
    val planted = xd.filter("doc_id % 10 = 5").count()
    val wrong = xd.filter("dup_in_ref != (doc_id % 10 = 5)").count()
    require(wrong == 0,
      s"$wrong docs mis-flagged (flagged=$flagged planted=$planted)")
    println(s"PSCALE crossdedup corpus=${xd.count()} planted=$planted exact")

    // ds_wsample: k exact; the race must actually pull weight — the
    // sample's mean n_chars strictly above the corpus mean
    val k = scala.math.min(10000, nDocs / 5)
    val t0 = System.nanoTime()
    val ws = ops.Pipeline.dsWeightedSample(
      graft.Tables.load(spark, dir, "documents"), "n_chars", k)
      .localCheckpoint(eager = true)
    println(f"PSCALE q=ds_wsample t=${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"rows=${ws.count()}")
    require(ws.count() == k.toLong, s"wsample rows ${ws.count()} != k=$k")
    val meanS = ws.agg(avg("weight")).head().getDouble(0)
    val meanC = spark.read.parquet(s"$dir/documents.parquet")
      .agg(avg("n_chars")).head().getDouble(0)
    require(meanS > meanC,
      f"race did not pull weight: sample mean $meanS%.1f <= corpus $meanC%.1f")
    println(f"PSCALE wsample meanW sample=$meanS%.1f corpus=$meanC%.1f")
    println("PSCALE addendum12 done")
    spark.stop()
  }

  /** Round-7 sixth-batch legs: ev_gaps / ev_gini at event scale,
    * ds_epochs / ta_ngram_top at corpus scale, ss_range at vector scale —
    * `runMain graft.PipelineScaleProbe addendum13 <nDocs> <nEvents> <nVec> <outBase>`
    */
  /** Round-7 seventh-batch legs: ev_cooccur against nEvents events
    * (presence-compaction + bounded pair fan-out invariants), dd_bloom
    * against nDocs docs (planted exactness + the bloom pruning ratio,
    * head-to-head with the dd_crossdedup shuffle join).
    */
  private def addendum14(nDocs: Int, nEvents: Int, outBase: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val seed = 2026L
    val dir = s"$outBase/sf$nDocs"
    spark.range(0L, nDocs.toLong).map(docFor(_, seed))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val nUsers = scala.math.max(100, nEvents / 666)
    spark.range(0L, nEvents.toLong).map(evFor(_, nUsers, seed))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    println(s"PSCALE gen14 nDocs=$nDocs nEvents=$nEvents")

    def timed(tag: String)(df: => org.apache.spark.sql.DataFrame): Long = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").parquet(s"$dir/results/$tag.parquet")
      val rows = spark.read.parquet(s"$dir/results/$tag.parquet").count()
      println(f"PSCALE q=$tag t=${(System.nanoTime() - t0) / 1e9}%.1f s " +
        s"rows=$rows")
      rows
    }

    // ev_cooccur: output is C(types,2)-bounded at any event volume; the
    // association algebra holds row-by-row (n_ab ≤ min(n_a, n_b) ≤ S)
    timed("ev_cooccur")(ops.Sessionize.evCooccur(spark, dir))
    val co = spark.read.parquet(s"$dir/results/ev_cooccur.parquet").collect()
    val nTypes = spark.read.parquet(s"$dir/events.parquet")
      .select("event_type").distinct().count()
    require(co.length <= nTypes * (nTypes - 1) / 2, "pair fan-out leak")
    val sess = co.map(_.getLong(5)).distinct
    require(sess.length == 1, s"inconsistent session total: ${sess.toSeq}")
    co.foreach { r =>
      val (ab, a, b) = (r.getLong(2), r.getLong(3), r.getLong(4))
      require(ab >= 1 && ab <= math.min(a, b) && math.max(a, b) <= sess.head,
        s"presence algebra broken: $r")
    }
    println(s"PSCALE cooccur pairs=${co.length} sessions=${sess.head} " +
      "algebra exact")

    // dd_bloom vs dd_crossdedup on the SAME planted corpus: identical
    // answers, and the bloom decides (corpus − candidates) rows map-side
    val tB = System.nanoTime()
    val bloom = ops.Dedup.ddBloomDedup(spark, dir)
      .localCheckpoint(eager = true)
    val bloomWall = (System.nanoTime() - tB) / 1e9
    val nCorpus = bloom.count()
    val flagged = bloom.filter("dup_in_ref").count()
    val planted = spark.read.parquet(s"$dir/documents.parquet")
      .filter("doc_id % 10 = 7 AND doc_id - 7 >= 0").count()
    require(flagged == planted,
      s"bloom flags $flagged != planted $planted")
    println(f"PSCALE q=dd_bloom t=$bloomWall%.1f s rows=$nCorpus " +
      s"flagged=$flagged (= planted, 0 mis-flags)")
    // pruning ratio: rebuild the same filter, count candidates map-side
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.Tables.load(spark, dir, "documents")
    val ref = docs.filter("doc_id % 10 = 0").select("doc_id", "text")
    val nRef = ref.count()
    val numBits = math.max(64L, math.ceil(-nRef * math.log(0.01)
      / (math.log(2) * math.log(2))).toLong)
    val bf = ref.selectExpr(
      s"graft_bloom_agg(xxhash64(text), ${nRef}L, ${numBits}L) AS bf")
      .head().getAs[Array[Byte]](0)
    val corpus = spark.sql(
      """SELECT a.doc_id,
        |       CASE WHEN a.doc_id % 10 = 7 THEN coalesce(b.text, a.text)
        |            ELSE a.text END AS text
        |FROM __docs a LEFT JOIN __docs b ON b.doc_id = a.doc_id - 7
        |WHERE a.doc_id % 10 <> 0""".stripMargin)
    val cand = corpus.withColumn("m",
      org.apache.spark.sql.functions.call_function("graft_might_contain",
        org.apache.spark.sql.functions.lit(bf),
        org.apache.spark.sql.functions.expr("xxhash64(text)")))
      .filter("m").count()
    println(f"PSCALE bloom bits=$numBits (${numBits / 8 / 1024} KiB) " +
      f"candidates=$cand of $nCorpus " +
      f"(fp=${(cand - planted).toDouble / (nCorpus - planted)}%.4f, " +
      "rest decided map-side, zero shuffle)")
    val tJ = System.nanoTime()
    val viaJoin = ops.Dedup.ddCrossDedup(corpus, ref)
      .localCheckpoint(eager = true)
    val joinWall = (System.nanoTime() - tJ) / 1e9
    require(viaJoin.filter("dup_in_ref").count() == flagged,
      "bloom and shuffle-join answers diverge")
    println(f"PSCALE q=dd_crossdedup(same corpus) t=$joinWall%.1f s " +
      "(answers identical)")
    println("PSCALE addendum14 done")
    spark.stop()
  }

  /** Ninth/tenth-batch scale legs against an already-generated addendum15
    * corpus dir: the cross-corpus LSH near-dup at 250k corpus × 250k
    * reference docs (the decontamination shape: candidates must stay
    * bucket-bounded across the two sides), the shard manifest at 500k
    * media records (tiling invariant in SQL), and the two events-table
    * profiles at 10M events (outputs days×types / 7×types bounded; the
    * EWMA closed form replayed against the sequential recurrence on the
    * driver — it must be EXACT, not close).
    */
  /** Round-7 retrieval/graph closers at scale: ss_drift / ss_hardneg /
    * ss_hybrid against `nVec` fresh vectors (+ the existing 500k-doc
    * corpus for the lexical leg), and Truss.run on the co-occurrence
    * graph of the existing 10M-event stream.
    */
  private def addendum19(dir: String, nVec: Int): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val seed = 2026L
    // 7 labels, not 10: label = i % nLabels must stay independent of the
    // drift halves (vec_id % 2) — an even label count puts even labels
    // ONLY in the even half and the per-label half pairing is empty
    spark.range(0L, nVec.toLong).map(vecFor(_, 64, 7, seed))
      .toDF("vec_id", "embedding", "label")
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/embeddings19.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings19.parquet")
    println(s"PSCALE gen19 nVec=$nVec")

    // ss_drift: one (label, half, dim) aggregate at 100k vectors; output
    // 10 rows; halves of the SAME generator must read near-aligned
    // centroids (the signal a drifted corpus would break)
    val (dr, dw) = wall(ops.Similarity.ssDrift(emb).collect())
    require(dr.length == 7, s"drift rows ${dr.length}")
    dr.foreach { r =>
      val c = r.getDouble(3)
      require(c >= -1.0 && c <= 1.0, "cosine out of range")
    }
    println(f"PSCALE q=ss_drift t=$dw%.1f s labels=7 " +
      f"mincos=${dr.map(_.getDouble(3)).min}%.3f " +
      f"maxcos=${dr.map(_.getDouble(3)).max}%.3f (same-generator halves)")

    // ss_hardneg: anchors vec_id < 5 against 100k candidates — labels
    // must differ on every row, ranks dense
    val (hn, hw) = wall(
      ops.Similarity.ssHardNeg(spark, emb, "vec_id < 5", 10).collect())
    require(hn.nonEmpty, "hardneg empty")
    require(hn.forall(r => r.getInt(1) != r.getInt(3)), "same-label negative")
    hn.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      require(rows.map(_.getLong(5)).sorted.toSeq == (1L to rows.length),
        "ranks not dense")
    }
    println(f"PSCALE q=ss_hardneg t=$hw%.1f s rows=${hn.length} " +
      s"anchors=${hn.map(_.getLong(0)).distinct.length}")

    // truss on a DENSITY-BOUNDED co-occurrence graph: at 10M events over
    // 15k users the full 30-day graph approaches a clique (most user
    // pairs co-bucket eventually) and triangle work is Θ(n³) NO MATTER
    // the enumeration — the first probe run spilled the disk dry. The
    // honest contract (recorded in PERF.md): co-occurrence truss needs a
    // bounded window / finer buckets; the degree-ordered orientation in
    // Truss.run bounds SKEW (Σ C(outdeg,2) ≤ m^1.5), not clique density.
    // Probe graph: the stream's first 6 hours.
    graft.Tables.load(spark, dir, "events").createOrReplaceTempView("__ev19")
    val windowed = spark.sql(
      """SELECT user_id, unix_micros(ts) div 10000000 AS b
        |FROM __ev19 CROSS JOIN (SELECT MIN(ts) AS t0 FROM __ev19)
        |WHERE ts < t0 + INTERVAL 6 HOUR""".stripMargin).distinct()
    val pairs = graph.GraphQueries.cooccurPairs(windowed)
      .localCheckpoint(eager = true)
    val nPairs = pairs.count()
    val (tr, tw) = wall {
      graph.Truss.run(spark, pairs, k = 3, rounds = 2)
        .localCheckpoint(eager = true)
    }
    val nTr = tr.count()
    require(nTr <= nPairs, "truss grew the edge set")
    val zeroSup = tr.filter("support = 0").count()
    println(f"PSCALE q=q47_truss t=$tw%.1f s edges=$nPairs -> kept=$nTr " +
      s"zero-support-after-peel=$zeroSup (6-hour window graph)")

    println("PSCALE addendum19 done")
    spark.stop()
  }

  /** Continuation-session ops at 100×: the shared invariant is again
    * metadata-sized outputs behind one linear corpus pass — lag/
    * stickiness/trigram tables are bucket/week/alphabet-bounded, prefix
    * families are dup-family-sized, matryoshka overlap is |Q|-sized, and
    * the LCC histogram is 10 rows.
    */
  private def addendum20(dir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    val events = graft.Tables.load(spark, dir, "events")
    val nUsers = events.select("user_id").distinct().count()

    // ev_lag: one conditional-min user aggregate at 10M events; output
    // is log2-bucket-sized; converting users bounded by the user count
    val (lag, lw) = wall(ops.Sessionize.evLag(events).collect())
    require(lag.nonEmpty, "lag empty")
    val lagBuckets = lag.map(_.getLong(0))
    require(lagBuckets.sorted.sameElements(lagBuckets), "buckets unsorted")
    require(lagBuckets.distinct.length == lagBuckets.length, "bucket dup")
    val nConv = lag.map(_.getLong(1)).sum
    require(nConv <= nUsers, "more converters than users")
    lag.foreach { r =>
      val (lo, hi, m) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      require(lo <= hi && m >= lo && m <= hi, "mean outside [min,max]")
    }
    println(f"PSCALE q=ev_lag t=$lw%.1f s buckets=${lag.length} " +
      s"converters=$nConv of $nUsers users")

    // ev_stickiness: weeks-sized output; a uniform 30-day stream reads
    // near 1.0 (every user active almost every day at 666 events/user)
    val (st, sw) = wall(ops.Sessionize.evStickiness(events).collect())
    require(st.length >= 4 && st.length <= 6, s"weeks ${st.length}")
    st.foreach { r =>
      require(r.getLong(1) <= 7, "more than 7 days in a week")
      val x = r.getDouble(4)
      require(x > 0.0 && x <= 1.0, s"stickiness $x out of range")
    }
    println(f"PSCALE q=ev_stickiness t=$sw%.1f s weeks=${st.length} " +
      f"min=${st.map(_.getDouble(4)).min}%.3f " +
      f"max=${st.map(_.getDouble(4)).max}%.3f")

    // ev_trigrams: the LEAD window shuffles once on user_id; the count
    // relation is 5^3-bounded no matter the event count
    val (tg, tw) = wall(ops.Sessionize.evTrigrams(events).collect())
    require(tg.length == 20, s"trigram rows ${tg.length}")
    require(tg.map(_.getLong(4)).sameElements(1L to 20L), "ranks not dense")
    val counts = tg.map(_.getLong(3))
    require(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      "counts not non-increasing")
    println(f"PSCALE q=ev_trigrams t=$tw%.1f s top=${counts.head} " +
      s"bottom=${counts.last}")

    // dd_prefix: the 500k corpus has NO natural 32-token-prefix family
    // (measured) — plant one truncation twin per 1000th doc and require
    // the families found to be EXACTLY the planted ones
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val planted = docs.filter(col("doc_id") % 1000 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        array_join(slice(split(col("text"), " "), 1, 40), " ").as("text"))
    val nPlanted = planted.count()
    val (pf, pw) = wall(
      ops.Dedup.ddPrefixOn(docs.unionAll(planted)).collect())
    require(pf.length == nPlanted,
      s"families ${pf.length} != planted $nPlanted")
    pf.foreach { r =>
      require(r.getLong(1) == 2 && r.getLong(2) < 10000000L,
        "family not a planted pair with the original as keeper")
    }
    println(f"PSCALE q=dd_prefix t=$pw%.1f s families=${pf.length} " +
      s"(all planted, corpus=${500000 + nPlanted})")

    // ss_matryoshka: two brute legs over the SAME scan at 100k vectors;
    // |Q|*k-bounded output. The probe's gaussian-mixture embeddings are
    // NOT matryoshka-trained, so the informative number is the measured
    // mean overlap (recorded, not asserted beyond range).
    val emb = spark.read.parquet(s"$dir/embeddings19.parquet")
    val (mt, mw) = wall(
      ops.Similarity.ssMatryoshkaOn(spark, emb, dims = 16,
        queryPred = "vec_id < 20", topK = 5).collect())
    require(mt.length == 20, s"matryoshka rows ${mt.length}")
    mt.foreach { r =>
      require(r.getLong(1) == 5 && r.getLong(2) <= 5, "bad overlap counts")
    }
    val meanOv = mt.map(_.getDouble(3)).sum / mt.length
    println(f"PSCALE q=ss_matryoshka t=$mw%.1f s queries=20 " +
      f"mean_overlap=$meanOv%.3f (16 of 64 dims, untrained embeddings)")

    // lccOn on the 6-hour co-occurrence window (the addendum19 truss
    // lesson: the full 30-day graph approaches a clique); histogram is
    // 10 rows whatever the graph
    events.createOrReplaceTempView("__ev20")
    val windowed = spark.sql(
      """SELECT user_id, unix_micros(ts) div 10000000 AS b
        |FROM __ev20 CROSS JOIN (SELECT MIN(ts) AS t0 FROM __ev20)
        |WHERE ts < t0 + INTERVAL 6 HOUR""".stripMargin).distinct()
    val pairs = graph.GraphQueries.cooccurPairs(windowed)
      .localCheckpoint(eager = true)
    val nPairs = pairs.count()
    val (lc, cw) = wall(graph.GraphQueries.lccOn(pairs).collect())
    require(lc.nonEmpty, "lcc empty")
    val nNodes = lc.map(_.getLong(1)).sum
    require(nNodes <= nUsers, "more lcc nodes than users")
    lc.foreach { r =>
      val (b, m) = (r.getInt(0), r.getDouble(2))
      require(b >= 0 && b <= 9 && m >= 0.0 && m <= 1.0, "bucket/mean range")
    }
    println(f"PSCALE q=lcc t=$cw%.1f s edges=$nPairs nodes=$nNodes " +
      s"buckets=${lc.length} (6-hour window graph)")

    println("PSCALE addendum20 done")
    spark.stop()
  }

  /** Second continuation batch at 100×: centroid/class/byte tables stay
    * labels/classes/sources-sized; the packing curve is |L|-sized; the
    * calibration histogram is ≤41 rows; transitivity is ONE row on a
    * 1.6M-edge graph.
    */
  private def addendum21(dir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    val docs = spark.read.parquet(s"$dir/documents.parquet")

    // ds_classweight over the 5 zipf langs: conservation Σ n_c·w_c = N
    // up to 6-dp per-class rounding
    val (cwR, cwW) = wall(
      ops.Pipeline.dsClassWeight(docs.select("doc_id", "lang"), "lang")
        .collect())
    val nTot = cwR.map(_.getLong(1)).sum
    val mass = cwR.map(r => r.getLong(1) * r.getDouble(2)).sum
    require(cwR.length == 5 && math.abs(mass - nTot) < 1e-3 * nTot,
      s"classweight mass $mass vs $nTot")
    println(f"PSCALE q=ds_classweight t=$cwW%.1f s classes=${cwR.length} " +
      f"mass_err=${math.abs(mass - nTot) / nTot}%.2e")

    // ta_codefrac with the oracle's planting rule inlined: the corpus
    // has ZERO natural keywords/symbols (measured), so n_code must be
    // exactly the planted count
    docs.createOrReplaceTempView("__a21_docs")
    val aug = spark.sql(
      """SELECT source,
        |       CASE WHEN doc_id % 9 = 0
        |            THEN concat(text, ' def run(x); return {x};')
        |            ELSE text END AS text
        |FROM __a21_docs""".stripMargin)
    val planted = docs.filter(col("doc_id") % 9 === 0).count()
    val (cfR, cfW) = wall(ops.TextAnalysis.taCodeFrac(aug).collect())
    require(cfR.map(_.getLong(2)).sum == planted,
      s"codefrac ${cfR.map(_.getLong(2)).sum} != planted $planted")
    println(f"PSCALE q=ta_codefrac t=$cfW%.1f s sources=${cfR.length} " +
      s"planted=$planted recovered exactly")

    // ta_nonascii with the accent plant: same exact-count contract
    val augNa = spark.sql(
      """SELECT source,
        |       CASE WHEN doc_id % 11 = 0
        |            THEN concat(text, ' café naïve résumé')
        |            ELSE text END AS text
        |FROM __a21_docs""".stripMargin)
    val plantedNa = docs.filter(col("doc_id") % 11 === 0).count()
    val (naR, naW) = wall(ops.TextAnalysis.taNonAscii(augNa).collect())
    require(naR.map(_.getLong(2)).sum == plantedNa,
      s"nonascii ${naR.map(_.getLong(2)).sum} != planted $plantedNa")
    println(f"PSCALE q=ta_nonascii t=$naW%.1f s sources=${naR.length} " +
      s"planted=$plantedNa recovered exactly")

    // ds_packeff: ideal never exceeds padded bins, both utils in (0, 1]
    val (peR, peW) = wall(
      ops.Pipeline.dsPackEff(docs.select("doc_id", "text")).collect())
    require(peR.length == 3, s"packeff rows ${peR.length}")
    peR.foreach { r =>
      require(r.getLong(5) <= r.getLong(3) &&
        r.getDouble(4) <= r.getDouble(6) && r.getDouble(6) <= 1.0,
        "packing bound violated")
    }
    println(f"PSCALE q=ds_packeff t=$peW%.1f s " +
      peR.map(r => s"L=${r.getInt(0)} pad=${r.getDouble(4)} " +
        s"ideal=${r.getDouble(6)}").mkString(" "))

    // ss_coshist at 100k vectors: exactly the available lag partners
    val emb = spark.read.parquet(s"$dir/embeddings19.parquet")
    val nVec = emb.count()
    val (chR, chW) = wall(ops.Similarity.ssCosHist(emb).collect())
    val nPairs = chR.map(_.getLong(1)).sum
    require(nPairs == (nVec - 1) + (nVec - 7) + (nVec - 29),
      s"coshist pairs $nPairs")
    println(f"PSCALE q=ss_coshist t=$chW%.1f s pairs=$nPairs " +
      s"buckets=${chR.length}")

    // ss_outliers at 100k vectors / 7 labels: ranks dense per label
    val (olR, olW) = wall(ops.Similarity.ssOutliers(emb).collect())
    require(olR.map(_.getInt(0)).distinct.length == 7, "labels missing")
    olR.groupBy(_.getInt(0)).foreach { case (_, rs) =>
      require(rs.map(_.getLong(3)).sorted.toSeq == (1L to rs.length),
        "ranks not dense")
    }
    println(f"PSCALE q=ss_outliers t=$olW%.1f s rows=${olR.length} " +
      f"worst=${olR.map(_.getDouble(2)).min}%.3f")

    // transitivity on the 6-hour window graph (the lcc leg's graph)
    graft.Tables.load(spark, dir, "events").createOrReplaceTempView("__ev21")
    val windowed = spark.sql(
      """SELECT user_id, unix_micros(ts) div 10000000 AS b
        |FROM __ev21 CROSS JOIN (SELECT MIN(ts) AS t0 FROM __ev21)
        |WHERE ts < t0 + INTERVAL 6 HOUR""".stripMargin).distinct()
    val pairs = graph.GraphQueries.cooccurPairs(windowed)
      .localCheckpoint(eager = true)
    val (trR, trW) = wall(
      graph.GraphQueries.transitivityOn(pairs).collect())
    val (nTri, nWedge, trans) =
      (trR(0).getLong(0), trR(0).getLong(1), trR(0).getDouble(2))
    require(nWedge >= 3 * nTri && trans > 0.0 && trans <= 1.0,
      "transitivity bound violated")
    println(f"PSCALE q=transitivity t=$trW%.1f s triangles=$nTri " +
      f"wedges=$nWedge ratio=$trans%.4f (6-hour window graph)")

    println("PSCALE addendum21 done")
    spark.stop()
  }

  /** Coreness at scale: the h-index fixpoint must agree with KCore's
    * survivor sets on real graphs two orders apart in density.
    */
  /** Sixth continuation batch at 100×: every op of the round-7 eighth
    * session measured on the persisted 500k/10M/100k corpus, each with a
    * planted signal its small-SF oracle cannot exercise.
    */
  private def addendum26(dir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    val events = graft.Tables.load(spark, dir, "events")

    // ev_basket: ~2M purchases → (user, day) baskets of the 10-value
    // item key; rules must stay directionally consistent (n_ab, lift
    // symmetric; confidence ≥ support) at any support floor
    val (bkR, bkW) = wall(
      ops.Sessionize.evBasket(events, minSupport = 1000).collect())
    require(bkR.nonEmpty, "basket rules empty")
    val byPair = bkR.map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getLong(2), r.getDouble(7))).toMap
    bkR.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      require(byPair((b, a)) == ((r.getLong(2), r.getDouble(7))),
        s"rule $a->$b not symmetric in (n_ab, lift)")
      require(r.getDouble(6) >= r.getDouble(5) - 1e-9,
        s"confidence < support on $a->$b")
    }
    println(f"PSCALE q=ev_basket t=$bkW%.1f s rules=${bkR.length} " +
      f"lift_band=[${bkR.map(_.getDouble(7)).min}%.4f," +
      f"${bkR.map(_.getDouble(7)).max}%.4f]")

    // ev_seasonality: the uniform generator carries no weekly cycle, but
    // RAW R² inflates to ~(k−1)/(n−1) ≈ 0.21 on 30 samples (this very
    // leg first measured 0.38 and motivated the strength_adj column);
    // the ADJUSTED statistic must sit near 0 under the null while a
    // planted 90 % weekend dip drives both toward 1
    val (seR, seW) = wall(ops.Sessionize.evSeasonality(events).collect())
    val nullAdjMax = seR.map(_.getDouble(5)).max
    require(math.abs(nullAdjMax) < 0.35,
      s"uniform stream adjusted seasonality $nullAdjMax not ~0")
    val planted = events.where(
      "NOT(unix_micros(ts) div 86400000000 % 7 IN (5, 6) " +
        "AND event_id % 10 <> 0)")
    val (spR, spW) = wall(ops.Sessionize.evSeasonality(planted).collect())
    val plMin = spR.map(_.getDouble(5)).min
    require(plMin > 0.9, s"planted weekend dip adj strength $plMin not ~1")
    println(f"PSCALE q=ev_seasonality t=$seW%.1f s " +
      f"null_raw_max=${seR.map(_.getDouble(4)).max}%.4f " +
      f"null_adj_max=$nullAdjMax%.4f planted_adj_min=$plMin%.4f " +
      f"(t=$spW%.1f s)")

    // ev_powerlaw: the uniform stream concentrates all users at ~133
    // events/type, far above xmin=1 — the estimator reads alpha ≈ 1 +
    // 1/ln(typical x) ≈ 1.20, the "not scale-free from 1" verdict; a
    // planted Pareto (continuous alpha 2.5) must read inside the known
    // floor-bias band of the plain xmin=1 discrete MLE (~3.3 — CSN's
    // xmin−0.5 correction would recenter it, deliberately not applied)
    val (plR, plW) = wall(ops.Sessionize.evPowerlaw(events).collect())
    plR.foreach { r => require(r.getDouble(3) < 1.3,
      s"uniform concentrated stream alpha ${r.getDouble(3)} not ~1.2") }
    val pareto = spark.sql(
      """SELECT CAST(id AS BIGINT) AS user_id,
        |       TIMESTAMP '2024-01-01 00:00:00' AS ts, 'p' AS event_type
        |FROM (
        |  SELECT id, explode(sequence(1,
        |    CAST(LEAST(pow((CAST(conv(substring(md5(concat('pl:',
        |      CAST(id AS STRING))), 1, 15), 16, 10) AS DOUBLE)
        |      / 1152921504606846976.0 + 1e-12), -1.0 / 1.5),
        |      100000.0) AS INT))) AS e
        |  FROM range(200000))""".stripMargin)
    val (p2R, p2W) = wall(ops.Sessionize.evPowerlaw(pareto).collect())
    val alpha = p2R(0).getDouble(3)
    require(alpha > 3.1 && alpha < 3.5,
      s"planted Pareto(2.5) read $alpha outside the floor-bias band ~3.3")
    println(f"PSCALE q=ev_powerlaw t=$plW%.1f s " +
      f"uniform_min_alpha=${plR.map(_.getDouble(3)).min}%.2f " +
      f"planted_alpha=$alpha%.3f (t=$p2W%.1f s, 200k Pareto users)")

    // ev_benford: the generator's value column is NOT log-uniform at
    // 10M samples — chi2 grows linearly in n under any fixed deviation,
    // so the null corpus reads astronomically non-conformant while a
    // planted log-uniform value (10^u, the Benford-generating family)
    // must pass the practitioner MAD < 0.012 "close conformity" cut
    val (bfR, bfW) = wall(ops.Sessionize.evBenford(events).collect())
    require(bfR.forall(_.getDouble(2) > 100.0),
      s"10M-sample uniform values read conformant")
    val logu = events.selectExpr("event_type", "ts",
      "pow(10, (CAST(conv(substring(md5(concat('bf:', " +
        "CAST(event_id AS STRING))), 1, 15), 16, 10) AS DOUBLE) " +
        "/ 1152921504606846976.0) * 3) AS value")
    val (b2R, b2W) = wall(ops.Sessionize.evBenford(logu).collect())
    require(b2R.forall(_.getDouble(3) < 0.012),
      s"planted log-uniform MAD ${b2R.map(_.getDouble(3)).max} not conformant")
    println(f"PSCALE q=ev_benford t=$bfW%.1f s " +
      f"null_min_chi2=${bfR.map(_.getDouble(2)).min}%.0f " +
      f"planted_max_mad=${b2R.map(_.getDouble(3)).max}%.6f (t=$b2W%.1f s)")

    // ta_logodds: the shared-zipf sources have no distinctive vocabulary
    // of their own; a token planted into ONE source must take its rank 1
    // with a z far above the shared-vocab noise floor
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("source", "text")
    val aug = docs.select(col("source"),
      expr("CASE WHEN source = 'src3' " +
        "THEN concat(text, ' xylophonequark') ELSE text END").as("text"))
    val (loR, loW) = wall(ops.TextAnalysis.taLogOdds(aug).collect())
    val s3top = loR.filter(r => r.getString(0) == "src3" && r.getInt(4) == 1)
    require(s3top.length == 1 && s3top(0).getString(1) == "xylophonequark",
      s"planted token not rank 1: ${s3top.map(_.getString(1)).mkString}")
    val otherZ = loR.filter(_.getString(0) != "src3").map(_.getDouble(3)).max
    require(s3top(0).getDouble(3) > 5 * otherZ,
      s"planted z ${s3top(0).getDouble(3)} not >> noise $otherZ")
    println(f"PSCALE q=ta_logodds t=$loW%.1f s rows=${loR.length} " +
      f"planted_z=${s3top(0).getDouble(3)}%.1f noise_max=$otherZ%.2f")

    // ss_silhouette + ss_quanterr at 100k vectors
    val emb = spark.read.parquet(s"$dir/embeddings19.parquet")
    val (siR, siW) = wall(ops.Similarity.ssSilhouette(emb).collect())
    require(siR.map(_.getLong(1)).sum == emb.count(), "silhouette n tile")
    siR.foreach { r => require(r.getDouble(2) > 0.0,
      s"label ${r.get(0)} mean silhouette ${r.getDouble(2)} <= 0 " +
        "on the separating mixture") }
    println(f"PSCALE q=ss_silhouette t=$siW%.1f s labels=${siR.length} " +
      f"mean_band=[${siR.map(_.getDouble(2)).min}%.4f," +
      f"${siR.map(_.getDouble(2)).max}%.4f] " +
      f"neg_frac=${siR.map(_.getLong(3)).sum.toDouble / 100000}%.4f")
    val (qeR, qeW) = wall(ops.Similarity.ssQuantErr(emb).collect())
    qeR.foreach { r => require(r.getDouble(2) >= 0.999 &&
      r.getDouble(3) >= 0.99, s"SQ8 fidelity ${r.getDouble(2)} low") }
    println(f"PSCALE q=ss_quanterr t=$qeW%.1f s " +
      f"min_mean=${qeR.map(_.getDouble(2)).min}%.6f " +
      f"worst=${qeR.map(_.getDouble(3)).min}%.6f")

    // random walks on the dense 6-hour window graph: every trajectory
    // complete (symmetric graph, no dead ends) and EVERY hop an edge —
    // checked corpus-wide in SQL, zero violations allowed
    events.createOrReplaceTempView("__ev26")
    val windowed = spark.sql(
      """SELECT user_id, unix_micros(ts) div 10000000 AS b
        |FROM __ev26 CROSS JOIN (SELECT MIN(ts) AS t0 FROM __ev26)
        |WHERE ts < t0 + INTERVAL 6 HOUR""".stripMargin).distinct()
    val und = graph.GraphQueries.cooccurPairs(windowed)
    val sym2 = und.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(und.select(col("v").as("src"), col("u").as("dst")))
      .localCheckpoint(eager = true)
    val nodes = sym2.select(col("src")).distinct()
      .select(col("src").as("walk_id"), col("src").as("node"))
      .localCheckpoint(eager = true)
    val nNodes = nodes.count()
    val steps = 8
    val (wkDf, wkW) = wall {
      val w = graph.Walks.run(spark, sym2, nodes, steps, salt = "26")
        .localCheckpoint(eager = true)
      w.count(); w
    }
    val nRows = wkDf.count()
    require(nRows == nNodes * (steps + 1),
      s"walks incomplete: $nRows of ${nNodes * (steps + 1)}")
    wkDf.createOrReplaceTempView("__wk26")
    sym2.createOrReplaceTempView("__wedges26")
    val badHops = spark.sql(
      """SELECT COUNT(*) AS bad FROM (
        |  SELECT a.walk_id, a.node AS u, b.node AS v
        |  FROM __wk26 a JOIN __wk26 b
        |    ON b.walk_id = a.walk_id AND b.step = a.step + 1) h
        |LEFT ANTI JOIN __wedges26 e ON e.src = h.u AND e.dst = h.v"""
        .stripMargin).collect()(0).getLong(0)
    require(badHops == 0L, s"$badHops non-edge hops")
    println(f"PSCALE q=walks t=$wkW%.1f s walks=$nNodes steps=$steps " +
      s"rows=$nRows bad_hops=0 (1.6M-edge window graph)")

    println("PSCALE addendum26 done")
    spark.stop()
  }

  /** Seventh continuation batch at 100×: the q55/q56 community pair on a
    * planted-block graph, the three new events statistics with planted
    * effects at 10M events, the two retrieval/tokenizer text ops at 500k
    * docs, and the eigenpair audit at 100k vectors.
    */
  private def addendum27(dir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    // LPA + modularity: 20k planted 10-cliques on a bridge ring (920k
    // undirected edges). The self-inclusive vote must converge every
    // block onto its base id in round 1 and hold it — 20k communities
    // of exactly 10, and the partition's modularity ~0.978
    val blocks = spark.sql(
      """SELECT b * 10 + i AS u, b * 10 + j AS v
        |FROM range(20000) t(b), range(10) s(i), range(10) r(j)
        |WHERE i < j
        |UNION ALL
        |SELECT b * 10 + 9 AS u, (b + 1) * 10 AS v
        |FROM range(19999) t(b)""".stripMargin)
      .localCheckpoint(eager = true)
    val labelsDf = graph.LabelProp.run(spark, blocks, rounds = 3)
    val (lpR, lpW) = wall(labelsDf.collect())
    require(lpR.length == 200000, s"labelled ${lpR.length} of 200k")
    // reuse the materialized labels — a second LabelProp.run would pay
    // the full 3-round LPA again and double-count it in the q56 timing
    val (mdR, mdW) = wall(
      graph.GraphQueries.modularity(blocks, labelsDf).collect())
    require(mdR.length == 20000, s"${mdR.length} communities, want 20k")
    require(mdR.forall(_.getLong(1) == 10L), "community size != 10")
    val q = mdR.map(_.getDouble(4)).sum
    require(q > 0.97, s"planted-block modularity $q not ~0.978")
    println(f"PSCALE q=q55/q56 t=${lpW + mdW}%.1f s communities=20000 " +
      f"Q=$q%.4f (200k nodes / 920k edges, 3 rounds)")

    val events = graft.Tables.load(spark, dir, "events")
    events.createOrReplaceTempView("__ev27")

    // ev_changepoint: drop 70 % of one type's volume after day 15 — the
    // split must land on the exact planted boundary with the planted
    // mean ratio, and its gain must dwarf the null types'
    val d0 = spark.sql(
      "SELECT MIN(unix_micros(ts) div 86400000000) FROM __ev27")
      .collect()(0).getLong(0)
    val shifted = spark.sql(
      s"""SELECT * FROM __ev27
         |WHERE event_type <> 'click'
         |   OR unix_micros(ts) div 86400000000 < ${d0 + 15}
         |   OR event_id % 10 < 3""".stripMargin)
    val (cpR, cpW) = wall(ops.Sessionize.evChangepoint(shifted).collect())
    val click = cpR.find(_.getString(0) == "click").get
    require(click.getLong(1) == d0 + 14,
      s"boundary ${click.getLong(1)} != planted ${d0 + 14}")
    val ratio = click.getDouble(5) / click.getDouble(4)
    require(ratio > 0.28 && ratio < 0.32, s"mean ratio $ratio not ~0.30")
    val nullMax = cpR.filter(_.getString(0) != "click")
      .map(_.getDouble(6)).max
    require(click.getDouble(6) > 100 * nullMax,
      s"planted gain ${click.getDouble(6)} not >> null $nullMax")
    println(f"PSCALE q=ev_changepoint t=$cpW%.1f s boundary=day+14 " +
      f"ratio=$ratio%.4f gain=${click.getDouble(6)}%.0f " +
      f"null_max=$nullMax%.1f")

    // ev_forecast: the uniform stream has no weekly cycle — MASE ≈ 1;
    // a planted 90 % dip on days ≡ 5,6 (mod 7) makes snaive-7 exact on
    // structure where naive-1 errs at every dip edge — MASE ≪ 1
    val (fcR, fcW) = wall(ops.Sessionize.evForecast(events).collect())
    fcR.foreach { r =>
      require(r.getDouble(4) > 0.5 && r.getDouble(4) < 2.0,
        s"null MASE ${r.getDouble(4)} not ~1 for ${r.getString(0)}")
    }
    val dipped = events.where(
      "NOT(unix_micros(ts) div 86400000000 % 7 IN (5, 6) " +
        "AND event_id % 10 <> 0)")
    val (f2R, f2W) = wall(ops.Sessionize.evForecast(dipped).collect())
    f2R.foreach { r =>
      require(r.getDouble(4) < 0.5,
        s"planted weekly cycle MASE ${r.getDouble(4)} not << 1")
    }
    println(f"PSCALE q=ev_forecast t=$fcW%.1f s " +
      f"null_mase=[${fcR.map(_.getDouble(4)).min}%.3f," +
      f"${fcR.map(_.getDouble(4)).max}%.3f] " +
      f"planted_mase_max=${f2R.map(_.getDouble(4)).max}%.3f (t=$f2W%.1f s)")

    // ev_cuped: 1M users, Y = 2X + noise — theta must recover 2 and the
    // adjustment must buy ~R² = 4varX/(4varX+varN) ≈ 0.997 of the
    // variance in BOTH arms, with the md5 split near 50/50
    val cuped = spark.sql(
      """SELECT id * 2 AS event_id,
        |       TIMESTAMP '2024-01-01 00:00:00' AS ts,
        |       id AS user_id, 'p' AS event_type,
        |       ROUND((CAST(conv(substring(md5(concat('cx:',
        |         CAST(id AS STRING))), 1, 15), 16, 10) AS DOUBLE)
        |         / 1152921504606846976.0) * 100, 2) AS value
        |FROM range(1000000)
        |UNION ALL
        |SELECT id * 2 + 1,
        |       TIMESTAMP '2024-01-21 00:00:00', id, 'p',
        |       ROUND(2 * ROUND((CAST(conv(substring(md5(concat('cx:',
        |         CAST(id AS STRING))), 1, 15), 16, 10) AS DOUBLE)
        |         / 1152921504606846976.0) * 100, 2)
        |         + (CAST(conv(substring(md5(concat('cn:',
        |         CAST(id AS STRING))), 1, 15), 16, 10) AS DOUBLE)
        |         / 1152921504606846976.0) * 10, 2)
        |FROM range(1000000)""".stripMargin)
    val (cuR, cuW) = wall(ops.Sessionize.evCuped(cuped).collect())
    require(cuR.length == 2, "arms missing")
    val nA = cuR.map(_.getLong(1)).min.toDouble
    require(nA / 1000000 > 0.49, s"md5 split skewed: $nA")
    cuR.foreach { r =>
      require(math.abs(r.getDouble(2) - 2.0) < 0.05,
        s"theta ${r.getDouble(2)} not ~2")
      require(r.getDouble(7) > 0.99,
        s"var_reduction ${r.getDouble(7)} not ~0.997")
    }
    println(f"PSCALE q=ev_cuped t=$cuW%.1f s theta=${cuR(0).getDouble(2)}%.4f " +
      f"var_reduction=${cuR.map(_.getDouble(7)).min}%.4f arms=50/50")

    // ta_bm25: a needle token exclusive to 3 planted docs — the query
    // for it must rank exactly those three at the top
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val aug = docs.unionAll(spark.sql(
      """SELECT 10000000 + id AS doc_id,
        |       concat('zzzneedle probe corpus filler id ',
        |              CAST(id AS STRING)) AS text
        |FROM range(3)""".stripMargin))
    val qdf = spark.sql(
      "SELECT CAST(1 AS BIGINT) AS query_id, 'zzzneedle' AS text")
    val (bmR, bmW) = wall(
      ops.TextAnalysis.taBm25(aug, qdf, k = 10).collect())
    require(bmR.length == 3, s"needle hit ${bmR.length} docs, want 3")
    require(bmR.map(_.getLong(1)).toSet ==
      Set(10000000L, 10000001L, 10000002L), "needle ranks wrong docs")
    println(f"PSCALE q=ta_bm25 t=$bmW%.1f s needle_top3=exact " +
      "(500k-doc postings, single-term query)")

    // ta_bpe: merge counts are monotone non-increasing by construction
    // (a merge can only shrink or preserve surviving pair counts) —
    // must hold on the 500k-doc zipf corpus
    val (bpR, bpW) = wall(
      ops.TextAnalysis.taBpe(docs.select("text")).collect())
    require(bpR.length == 3, s"${bpR.length} merges")
    val cnts = bpR.sortBy(_.getInt(0)).map(_.getLong(3))
    require(cnts(0) >= cnts(1) && cnts(1) >= cnts(2) && cnts(2) > 0,
      s"merge counts not monotone: ${cnts.mkString(",")}")
    bpR.foreach { r => require(
      r.getString(4) == r.getString(1) + r.getString(2), "symbol algebra") }
    println(f"PSCALE q=ta_bpe t=$bpW%.1f s " +
      s"merges=${bpR.map(r => r.getString(1) + '+' + r.getString(2))
        .mkString(",")} counts=${cnts.mkString(",")}")

    // ss_power vs ss_dimvar on the same 100k vectors: the loading is
    // unit-norm and the eigenvalue estimate must dominate the largest
    // per-dimension variance (λ1 ≥ max C_ii for symmetric PSD C) and
    // stay under the trace
    val emb = spark.read.parquet(s"$dir/embeddings19.parquet")
    val (dvR, dvW) = wall(ops.Similarity.ssDimvar(emb).collect())
    val maxVar = dvR.map(_.getDouble(3)).max
    val trace = dvR.map(_.getDouble(3)).sum
    val (pwR, pwW) = wall(ops.Similarity.ssPower(emb).collect())
    val norm = pwR.map(r => r.getDouble(1) * r.getDouble(1)).sum
    require(math.abs(norm - 1.0) < 1e-5, s"loading norm $norm != 1")
    val ev = pwR(0).getDouble(2)
    require(ev >= 0.8 * maxVar && ev <= trace + 1e-6,
      s"eigenvalue $ev outside [0.8*$maxVar, $trace]")
    println(f"PSCALE q=ss_power t=$pwW%.1f s eigenvalue=$ev%.4f " +
      f"max_dimvar=$maxVar%.4f trace=$trace%.4f norm=$norm%.8f " +
      f"(dimvar t=$dvW%.1f s)")

    println("PSCALE addendum27 done")
    spark.stop()
  }

  /** Eighth continuation batch at 100×: DiD with a planted uplift, the
    * CM-sketch width dial, IVF cell-geometry audit, and RAKE's algebra
    * at corpus scale.
    */
  private def addendum28(dir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    // ev_did: 1M users, pre X = u100 (hash-uniform), post Y = X + 3 +
    // 5·1{B} + noise — DiD must read the planted 5 net of the +3 shock
    val did = spark.sql(
      """SELECT id * 2 AS event_id,
        |       TIMESTAMP '2024-01-01 00:00:00' AS ts,
        |       id AS user_id, 'p' AS event_type,
        |       ROUND((CAST(conv(substring(md5(concat('cx:',
        |         CAST(id AS STRING))), 1, 15), 16, 10) AS DOUBLE)
        |         / 1152921504606846976.0) * 100, 2) AS value
        |FROM range(1000000)
        |UNION ALL
        |SELECT id * 2 + 1,
        |       TIMESTAMP '2024-01-21 00:00:00', id, 'p',
        |       ROUND(ROUND((CAST(conv(substring(md5(concat('cx:',
        |         CAST(id AS STRING))), 1, 15), 16, 10) AS DOUBLE)
        |         / 1152921504606846976.0) * 100, 2) + 3
        |         + CASE WHEN instr('0123456789abcdef',
        |             substring(md5(concat('ab:', CAST(id AS STRING))),
        |             1, 1)) - 1 < 8 THEN 0 ELSE 5 END
        |         + (CAST(conv(substring(md5(concat('dn:',
        |         CAST(id AS STRING))), 1, 15), 16, 10) AS DOUBLE)
        |         / 1152921504606846976.0) * 2 - 1, 2)
        |FROM range(1000000)""".stripMargin)
    val (ddR, ddW) = wall(ops.Sessionize.evDid(did).collect())
    val row = ddR.head
    require(math.abs(row.getDouble(8) - 5.0) < 0.05,
      s"DiD ${row.getDouble(8)} not ~5")
    require(math.abs(row.getDouble(6) - 3.0) < 0.05,
      s"delta_a ${row.getDouble(6)} not ~3 (the shared shock)")
    println(f"PSCALE q=ev_did t=$ddW%.1f s did=${row.getDouble(8)}%.4f " +
      f"delta_a=${row.getDouble(6)}%.4f (1M users)")

    // ev_cms on the real 10M-event stream: est >= exact rowwise at two
    // widths, and the 16× wider sketch must carry strictly less mean
    // collision mass — the sizing dial the audit exists for
    val events = graft.Tables.load(spark, dir, "events")
    val (cmR, cmW) = wall(ops.Sessionize.evCms(events).collect())
    cmR.foreach { r => require(r.getLong(3) >= 0,
      s"undercount on ${r.getLong(0)}") }
    val over256 = cmR.map(_.getLong(3).toDouble).sum / cmR.length
    val (c2R, c2W) = wall(
      ops.Sessionize.evCms(events, width = 4096).collect())
    c2R.foreach(r => require(r.getLong(3) >= 0, "undercount at 4096"))
    val over4096 = c2R.map(_.getLong(3).toDouble).sum / c2R.length
    require(over4096 < over256,
      s"wider sketch not tighter: $over4096 !< $over256")
    println(f"PSCALE q=ev_cms t=$cmW%.1f s mean_overest_256=$over256%.0f " +
      f"mean_overest_4096=$over4096%.0f (t=$c2W%.1f s, 10M events)")

    // ss_inertia at 100k vectors: census closes — and the audit must
    // DETECT the over-provisioned index: 16 cells over 7 natural
    // clusters means ~2.3 centroids per cluster, so nearest-centroid
    // similarity exceeds member cohesion (cells leak; nprobe=1 recall
    // collapses) — the exact verdict this operator exists to read
    // (first measured here: within 0.506 vs between 0.874)
    val (inR, inW) = wall(ops.Similarity.ssInertia(
      spark.read.parquet(s"$dir/embeddings19.parquet")).collect())
    require(inR.map(_.getLong(1)).sum == 100000L, "inertia census")
    val mw = inR.map(_.getDouble(2)).sum / inR.length
    val mb = inR.map(_.getDouble(4)).sum / inR.length
    require(mb > mw,
      s"16-cell/7-cluster crowding not detected: between $mb vs within $mw")
    println(f"PSCALE q=ss_inertia t=$inW%.1f s cells=${inR.length} " +
      f"within=$mw%.4f between=$mb%.4f " +
      "(crowded-index verdict at 100k vectors)")

    // ta_rake: top-20 on the 500k-doc corpus (rank/monotonic algebra),
    // then a 500k-row planted corpus whose exact scores are known
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val (rkR, rkW) = wall(ops.TextAnalysis.taRake(docs).collect())
    require(rkR.length == 20 &&
      rkR.map(_.getLong(4)).toSeq == (1L to 20L), "rake ranks")
    val scores = rkR.map(_.getDouble(3)).toSeq
    require(scores == scores.sortBy(-(_: Double)), "rake monotone")
    val planted = spark.sql(
      """SELECT id AS doc_id,
        |       'alpha beta and alpha beta' AS text
        |FROM range(500000)""".stripMargin)
    val (p2R, p2W) = wall(
      ops.TextAnalysis.taRake(planted, k = 5).collect())
    // freq(alpha)=1M, deg=2M → word score 2; phrase score 4, 1M occs
    require(p2R.length == 1, s"${p2R.length} phrases, want 1")
    val p = p2R.head
    require(p.getString(0) == "alpha beta" && p.getLong(1) == 1000000L &&
      p.getDouble(3) == 4.0,
      s"planted algebra: ${p.getString(0)} ${p.getLong(1)} ${p.getDouble(3)}")
    println(f"PSCALE q=ta_rake t=$rkW%.1f s top=${rkR.head.getString(0)
      .take(40)} planted_exact t=$p2W%.1f s (500k docs)")

    println("PSCALE addendum28 done")
    spark.stop()
  }

  /** Ninth continuation batch at 100×: ds_batchpad and ta_langconf over
    * the persisted 500k-doc corpus.
    */
  private def addendum29(dir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$dir/documents.parquet")

    // ds_batchpad: on the zipf-length corpus the sorted batcher must
    // collapse padding versus the random baseline, same token mass
    val (bpR, bpW) = wall(ops.Pipeline.dsBatchPad(
      docs.select("doc_id", "text")).collect())
    val bp = bpR.map(r => r.getString(0) ->
      ((r.getLong(2), r.getDouble(4)))).toMap
    require(bp("sorted")._1 == bp("random")._1, "token mass differs")
    require(bp("sorted")._2 < bp("random")._2,
      s"sorted ${bp("sorted")._2} !< random ${bp("random")._2}")
    println(f"PSCALE q=ds_batchpad t=$bpW%.1f s " +
      f"pad_sorted=${bp("sorted")._2}%.4f " +
      f"pad_random=${bp("random")._2}%.4f (500k docs)")

    // ta_langconf: per-declared-language shares close to 1 and the
    // matrix is (langs × ≤4)-sized at any corpus size
    val (lcR, lcW) = wall(ops.TextAnalysis.taLangConf(
      docs.select("lang", "text")).collect())
    val byLang = lcR.groupBy(_.getString(0))
    byLang.foreach { case (l, rs) =>
      val sum = rs.map(_.getDouble(3)).sum
      require(math.abs(sum - 1.0) < 1e-5, s"$l shares sum $sum")
    }
    require(lcR.map(_.getString(1)).distinct.forall(
      Set("en", "de", "fr", "es")), "prediction outside the vote family")
    println(f"PSCALE q=ta_langconf t=$lcW%.1f s cells=${lcR.length} " +
      s"langs=${byLang.keys.toSeq.sorted.mkString(",")} (500k docs)")

    println("PSCALE addendum29 done")
    spark.stop()
  }

  /** ev_qsketch at 10M values of a planted log-uniform (value = 10^{3u},
    * u hash-uniform): the analytic quantile 10^{3q} must land inside
    * every reported quarter-octave bracket.
    */
  private def addendum30(dir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val events = graft.Tables.load(spark, dir, "events")
    val logu = events.selectExpr("ts", "event_type",
      "pow(10, (CAST(conv(substring(md5(concat('qs:', " +
        "CAST(event_id AS STRING))), 1, 15), 16, 10) AS DOUBLE) " +
        "/ 1152921504606846976.0) * 3) AS value")
    val t0 = System.nanoTime()
    val rows = ops.Sessionize.evQsketch(logu).collect()
    val w = (System.nanoTime() - t0) / 1e9
    require(rows.length == 4, s"${rows.length} quantile rows")
    rows.foreach { r =>
      val (q, lo, hi) = (r.getDouble(0), r.getLong(4), r.getLong(5))
      val trueCents = math.pow(10, 3 * q) * 100
      require(lo <= trueCents * 1.01 && trueCents * 0.99 <= hi,
        s"q=$q analytic $trueCents outside [$lo, $hi]")
      require(hi.toDouble / lo <= 1.25 + 1e-12, s"bracket wider than 25%")
    }
    val summary = rows.map(r => f"q=${r.getDouble(0)}%.2f " +
      s"[${r.getLong(4)},${r.getLong(5)}]").mkString(" ")
    println(f"PSCALE q=ev_qsketch t=$w%.1f s $summary " +
      "(10M log-uniform values, analytic quantiles bracketed)")

    println("PSCALE addendum30 done")
    spark.stop()
  }

  /** ev_mannwhitney / ev_ks at 1M users. Null leg: per-user value is an
    * md5-uniform on a 3,000-point grid, independent of the arm hash —
    * z must sit in the normal null band and D under the KS critical
    * value. Planted leg: value = user_id cents with a disjoint +1e6
    * shift on arm B — 1M DISTINCT values (the sharded cumulative prefix
    * runs at distinct ~= users, ~96 value shards), and the readouts must
    * hit their separation extremes exactly (cles = 1, D = 1).
    */
  private def addendum31(n: Long): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nullEv = spark.range(1, n + 1).selectExpr("id AS user_id",
      "CAST(CAST(conv(substring(md5(concat('v:', CAST(id AS STRING))), " +
        "1, 8), 16, 10) AS BIGINT) % 3000 AS DOUBLE) / 100 AS value")
    val (mw0, mwW0) = wall(
      ops.Sessionize.evMannWhitney(nullEv).collect().head)
    val (ks0, ksW0) = wall(ops.Sessionize.evKs(nullEv).collect().head)
    val (z0, d0, k0) = (mw0.getDouble(4), ks0.getDouble(2),
      ks0.getDouble(4))
    require(math.abs(z0) < 5, s"null z $z0 outside the normal band")
    require(d0 < 0.006, s"null KS D $d0 above the 1e-6 critical value")
    println(f"PSCALE q=ev_mannwhitney/ev_ks(null) t=$mwW0%.1f/$ksW0%.1f s" +
      f" z=$z0%.3f D=$d0%.5f ks=$k0%.3f" +
      f" ($n users, arms ${mw0.getLong(0)}/${mw0.getLong(1)})")

    val sepEv = spark.range(1, n + 1).selectExpr("id AS user_id",
      "CAST(id AS DOUBLE) / 100 + CASE WHEN instr('0123456789abcdef', " +
        "substring(md5(concat('ab:', CAST(id AS STRING))), 1, 1)) - 1 < 8 " +
        "THEN 0 ELSE 1000000 END AS value")
    val (mw1, mwW1) = wall(
      ops.Sessionize.evMannWhitney(sepEv).collect().head)
    val (ks1, ksW1) = wall(ops.Sessionize.evKs(sepEv).collect().head)
    require(mw1.getDouble(3) == 1.0, s"separation cles ${mw1.getDouble(3)}")
    require(mw1.getDouble(2) ==
      mw1.getLong(0).toDouble * mw1.getLong(1), "separation U != na*nb")
    require(mw1.getDouble(4) > 500, s"separation z ${mw1.getDouble(4)}")
    require(ks1.getDouble(2) == 1.0, s"separation D ${ks1.getDouble(2)}")
    println(f"PSCALE q=ev_mannwhitney/ev_ks(sep) t=$mwW1%.1f/$ksW1%.1f s" +
      f" z=${mw1.getDouble(4)}%.1f cles=1 D=1" +
      s" ($n users, $n distinct values through the sharded prefix)")

    // every QTE rung must carry the disjoint +1e6 shift (arm rank
    // geometry can move it only by the within-arm id spread)
    val (qt, qtW) = wall(ops.Sessionize.evQte(sepEv).collect())
    require(qt.length == 4, s"${qt.length} rungs")
    qt.foreach { r =>
      require(r.getDouble(3) > 999000,
        s"rung ${r.getDouble(0)} qte ${r.getDouble(3)}") }
    println(f"PSCALE q=ev_qte(sep) t=$qtW%.1f s " +
      qt.map(r => f"q${r.getDouble(0)}%.2f=${r.getDouble(3)}%.0f")
        .mkString(" ") + " (all rungs carry the planted shift)")

    println("PSCALE addendum31 done")
    spark.stop()
  }

  /** ev_convpairs at 1.2M events / 100k users, planted geometry: each
    * user fires clicks at t0 + i·10 min and purchases at t0 + i·10 min
    * + 5 min (i < 6). A purchase at slot i reaches the clicks at slots
    * i−2..i (gaps 5/15/25 min ≤ 30), so pairs/user = 1+2+3+3+3+3 = 15
    * and the join must read EXACTLY 15·n rows — the co-partitioned
    * interval join at fan-out, with the analytic count as the oracle.
    */
  private def addendum32(): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = 100000L
    val ev = spark.range(1, n + 1).selectExpr("id AS user_id")
      .selectExpr("user_id", "explode(sequence(0, 5)) AS slot")
      .selectExpr("user_id", "slot",
        "explode(array('click', 'purchase')) AS event_type")
      .selectExpr(
        "user_id * 100 + slot * 2 + IF(event_type = 'purchase', 1, 0) " +
          "AS event_id",
        "timestamp_micros(1717200000000000 + user_id * 7 " +
          "+ CAST(slot AS BIGINT) * 600000000 " +
          "+ IF(event_type = 'purchase', 300000000, 0)) AS ts",
        "user_id", "event_type", "CAST(slot AS DOUBLE) AS value")
      .localCheckpoint(eager = true)
    require(ev.count() == 12 * n, "corpus size")
    val t0 = System.nanoTime()
    // one job yields the spectrum AND the total (sum of its counts)
    val gaps = streaming.ConversionJoin.convPairs(ev)
      .groupBy("gap_us").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = gaps.values.sum
    val w = (System.nanoTime() - t0) / 1e9
    require(got == 15 * n, s"pairs $got, want ${15 * n}")
    require(gaps.keySet == Set(300000000L, 900000000L, 1500000000L),
      s"gap spectrum ${gaps.keySet}")
    require(gaps(300000000L) == 6 * n && gaps(900000000L) == 5 * n &&
      gaps(1500000000L) == 4 * n, s"gap counts $gaps")
    println(f"PSCALE q=ev_convpairs t=$w%.1f s pairs=$got " +
      s"(1.2M events / ${n} users, analytic 15n count + exact gap spectrum)")

    println("PSCALE addendum32 done")
    spark.stop()
  }

  /** ev_kmv at 1.6M (type, user) memberships: type A = users 1..1M,
    * type B = 700,001..1.3M (true |∩| = 300k, J = 300k/1.3M ≈ 0.2308).
    * The k=64 sketch must land every cardinality estimate within the
    * 4σ ≈ 4/√(k−2) ≈ 51 % KMV band (it lands much closer in practice)
    * while the exact audit columns read the planted truth — at this
    * scale only the DISTINCT pass and the audit self-join touch the
    * corpus; everything else is 64·types rows.
    */
  private def addendum33(): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = spark.range(1, 1000001)
      .selectExpr("id AS user_id", "'a' AS event_type")
      .unionAll(spark.range(700001, 1300001)
        .selectExpr("id AS user_id", "'b' AS event_type"))
      .localCheckpoint(eager = true)
    val t0 = System.nanoTime()
    val r = ops.Sessionize.evKmv(ev).collect()
    val w = (System.nanoTime() - t0) / 1e9
    require(r.length == 1, s"${r.length} pairs")
    val row = r.head
    require(row.getLong(2) == 1000000 && row.getLong(4) == 600000 &&
      row.getLong(6) == 300000, "exact audit columns")
    def band(est: Double, truth: Double): Boolean =
      math.abs(est - truth) < truth * 0.51
    require(band(row.getDouble(3), 1000000), s"est_a ${row.getDouble(3)}")
    require(band(row.getDouble(5), 600000), s"est_b ${row.getDouble(5)}")
    require(band(row.getDouble(7), 300000),
      s"est_inter ${row.getDouble(7)}")
    println(f"PSCALE q=ev_kmv t=$w%.1f s est_a=${row.getDouble(3)}%.0f " +
      f"est_b=${row.getDouble(5)}%.0f est_inter=${row.getDouble(7)}%.0f " +
      f"j=${row.getDouble(8)}%.4f (truth 1M/600k/300k, J=0.2308, k=64)")

    // the k dial: 16x more mins must shrink the error band ~4x
    val (r2, w2) = {
      val t1 = System.nanoTime()
      val x = ops.Sessionize.evKmv(ev, k = 1024).collect().head
      (x, (System.nanoTime() - t1) / 1e9)
    }
    def relerr(est: Double, truth: Double) = math.abs(est - truth) / truth
    require(relerr(r2.getDouble(3), 1000000) < 0.13 &&
      relerr(r2.getDouble(5), 600000) < 0.13 &&
      relerr(r2.getDouble(7), 300000) < 0.2,
      s"k=1024 errors ${r2.getDouble(3)} ${r2.getDouble(5)} " +
        s"${r2.getDouble(7)}")
    println(f"PSCALE q=ev_kmv(k=1024) t=$w2%.1f s " +
      f"est_a=${r2.getDouble(3)}%.0f est_b=${r2.getDouble(5)}%.0f " +
      f"est_inter=${r2.getDouble(7)}%.0f j=${r2.getDouble(8)}%.4f " +
      "(the accuracy dial: 16x mins, ~4x tighter)")

    println("PSCALE addendum33 done")
    spark.stop()
  }

  /** q58 betweenness on the addendum27 planted-block graph (200k nodes
    * / 920k undirected edges: 20k 10-cliques chained by bridge edges
    * b·10+9 → (b+1)·10). The 8 pivots live in blocks 0-1, so the
    * 4-hop frontier covers a bounded neighborhood REGARDLESS of graph
    * size — the scale property the operator claims — and the planted
    * structure fixes the ranking: bridge endpoints must dominate
    * intra-clique nodes.
    */
  private def addendum34(): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same construction as addendum27's blocks, as undirected u < v
    val und = spark.sql(
      """SELECT b * 10 + i AS u, b * 10 + j AS v
        |FROM range(20000) t(b)
        |LATERAL VIEW explode(sequence(0, 8)) ii AS i
        |LATERAL VIEW explode(sequence(1, 9)) jj AS j
        |WHERE i < j
        |UNION ALL
        |SELECT b * 10 + 9 AS u, (b + 1) * 10 AS v
        |FROM range(19999) t(b)""".stripMargin)
      .localCheckpoint(eager = true)
    val t0 = System.nanoTime()
    val bc = graph.Betweenness.run(spark, und).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val w = (System.nanoTime() - t0) / 1e9
    // 4 hops from pivots 0..7 (all in block 0) reach block 0, bridge
    // node 10, block 1, and bridge node 20 — 21 nodes; the relation
    // must stay neighborhood-sized
    require(bc.size < 100, s"frontier leaked: ${bc.size} nodes")
    // bridge endpoints 9 and 10 carry the inter-block flow; any
    // non-pivot intra-clique node of block 1 (e.g. 15) sits on none
    require(bc(9L) > bc(15L) && bc(10L) > bc(15L),
      s"bridge dominance: bc(9)=${bc(9L)} bc(10)=${bc(10L)} " +
        s"bc(15)=${bc(15L)}")
    println(f"PSCALE q=q58_betweenness t=$w%.1f s reached=${bc.size} " +
      f"bc9=${bc(9L)}%.2f bc10=${bc(10L)}%.2f bc15=${bc(15L)}%.2f " +
      "(200k nodes / 920k edges; 4-hop frontier stays neighborhood-sized)")

    println("PSCALE addendum34 done")
    spark.stop()
  }

  /** Round-8 re-measure of ta_rake under the maxPhraseLen=4 cap: the
    * uncapped 500k-doc leg cost 68 s (addendum28) because the phrase→word
    * explode carries the full phrase text on every word row — O(len²)
    * bytes per stopword-free island. Two legs: the real 500k corpus
    * (rank/monotone invariants unchanged) and a hostile 200k-doc
    * stopword-POOR corpus (40-word islands, the pathological shape) that
    * the uncapped form paid ~1600 bytes/row on and the capped form must
    * drop outright.
    */
  private def addendum35(dir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // leg 1: the persisted 500k zipf corpus. Its vocabulary is synthetic
    // (wN tokens, zero English function words), so the corpus-appropriate
    // stopword list — the declared production parameter — is its zipf
    // head w1..w15, the exact analogue of English function words. The
    // uncapped addendum28 run treated every document as ONE island (no
    // English stopword ever hit) and paid 68 s on whole-document phrases;
    // under real stopwords + the cap the islands are short and real.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val zipfStops = (1 to 15).map("w" + _)
    val (rkR, rkW) = wall(
      ops.TextAnalysis.taRake(docs, stops = zipfStops).collect())
    require(rkR.length == 20 &&
      rkR.map(_.getLong(4)).toSeq == (1L to 20L), "rake ranks")
    val scores = rkR.map(_.getDouble(3)).toSeq
    require(scores == scores.sortBy(-(_: Double)), "rake monotone")
    require(rkR.forall(_.getInt(2) <= 4), "cap leaked a >4-word phrase")
    println(f"PSCALE q=ta_rake t=$rkW%.1f s top=${rkR.head.getString(0)
      .take(40)} (500k docs, zipf-head stops, maxPhraseLen=4; " +
      "addendum28 uncapped single-island: 68 s)")

    // leg 2: stopword-poor hostile corpus — every doc one 40-word island
    // (docs alternate between two island texts so phrase stats stay
    // vocabulary-sized) plus a planted capped phrase that must win
    val hostile = spark.sql(
      """SELECT id AS doc_id,
        |  CASE WHEN id % 10 = 0 THEN 'alpha beta of alpha beta'
        |  ELSE concat_ws(' ', transform(sequence(1, 40),
        |    i -> concat('w', CAST((id % 2) * 40 + i AS STRING)))) END
        |  AS text
        |FROM range(200000)""".stripMargin)
    val (hR, hW) = wall(ops.TextAnalysis.taRake(hostile, k = 5).collect())
    // the 40-word islands are dropped whole; only the planted phrase ranks
    require(hR.length == 1 && hR.head.getString(0) == "alpha beta",
      s"hostile corpus: got ${hR.map(_.getString(0)).mkString("|")}")
    println(f"PSCALE q=ta_rake_hostile t=$hW%.1f s " +
      "(200k docs x 40-word islands dropped by the cap)")

    println("PSCALE addendum35 done")
    spark.stop()
  }

  /** Round-8 tokenizer closure at 100×: taBpe trains 6 merge rounds on
    * the 500k-doc corpus (vocabulary-sized work per round), then
    * taBpeEncode applies the learned table corpus-wide — the encode
    * pass every training-data pipeline runs. Invariants: one output row
    * per document, token counts internally consistent, and the merges
    * actually compress (total tokens strictly below the char-split
    * total, which equals total non-space characters).
    */
  private def addendum36(dir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val (merges, trainW) = wall {
      val m = ops.TextAnalysis.taBpe(docs.select("text"), merges = 6)
        .localCheckpoint(eager = true)
      (m, m.count())
    }
    require(merges._2 == 6L, s"trained ${merges._2} merges, want 6")
    val (encStats, encW) = wall {
      val enc = ops.TextAnalysis.taBpeEncode(docs, merges._1)
      enc.agg(count(lit(1)), sum("n_tokens"),
        sum(expr("size(split(tokens, ' '))"))).head()
    }
    val nDocs = docs.count()
    val chars = docs.agg(
      sum(length(regexp_replace(col("text"), " ", "")))).head().getLong(0)
    require(encStats.getLong(0) == nDocs,
      s"encoded ${encStats.getLong(0)} of $nDocs docs")
    require(encStats.getLong(1) == encStats.getLong(2),
      "n_tokens inconsistent with the token stream")
    require(encStats.getLong(1) < chars,
      s"merges did not compress: ${encStats.getLong(1)} !< $chars tokens")
    println(f"PSCALE q=ta_bpe_encode train=$trainW%.1f s " +
      f"encode=$encW%.1f s docs=$nDocs " +
      f"tokens=${encStats.getLong(1)} chars=$chars " +
      "(6 learned merges applied corpus-wide at 500k docs)")

    println("PSCALE addendum36 done")
    spark.stop()
  }

  /** Real-codec multimodal tier at 100k images — every byte a REAL PNG
    * produced by the same JDK encoder JdkCodecDecoder reads, generated
    * INSIDE the partition pass (no driver media, no disk staging):
    *
    *   1. decode: 100k 32×24 PNGs through decodeAll(JdkCodecDecoder) —
    *      dims/frame facts must be exact for every record;
    *   2. resample: resizeImage to maxDim 16 re-decoded — the integer
    *      dim rule must hold for every record;
    *   3. near-dup: corpus ∪ brightness-lifted twins (+8 on unclamped
    *      grays — gradient ORDERING unchanged, so the real dHash is
    *      IDENTICAL by construction) → the mm_phash_pairs banded-LSH
    *      join must recover every planted twin with hamming 0.
    */
  private def addendum37(): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val n = 100000L
    // id-unique pixel field, grays in [0, 200) so a +8 lift never clamps.
    // splitmix64 avalanche: a linear v = id·A + x·B + y·C progression made
    // every image a phase-shifted copy of ONE pattern — 100k images
    // collapsed into ~200 near-dup classes and the pair join (correctly)
    // exploded; pixels must be independent for the planted-twin census
    def gray(id: Long, x: Int, y: Int): Int = {
      var z = id * 768L + y * 32L + x + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^= (z >>> 31)
      ((z >>> 8) % 200L).toInt
    }
    def png(id: Long, lift: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(32, 24,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < 24) {
        var x = 0
        while (x < 32) {
          val g = gray(id, x, y) + lift
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    // 1. decode 100k real PNGs
    val media = spark.range(n)
      .map(i => ops.Multimodal.MediaRecord(i, "image", png(i, 0)))
    val (okDecode, decW) = wall {
      ops.Multimodal.decodeAll(media, ops.Multimodal.JdkCodecDecoder)
        .filter(d => d.width == 32 && d.height == 24 && d.n_frames == 1)
        .count()
    }
    require(okDecode == n, s"decoded $okDecode of $n with exact dims")
    println(f"PSCALE q=mm_decode_real t=$decW%.1f s imgs=$n " +
      "(100k real PNGs through javax.imageio in the partition pass)")

    // 2. real resample to maxDim 16 (aspect floor: 32x24 -> 16x12)
    val (okResize, rszW) = wall {
      media.map(r => ops.Multimodal.resizeImage(r.payload, 16))
        .map(b => {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(b))
          (img.getWidth, img.getHeight)
        })
        .filter(d => d._1 == 16 && d._2 == 12)
        .count()
    }
    require(okResize == n, s"resampled $okResize of $n to 16x12")
    println(f"PSCALE q=mm_resize_real t=$rszW%.1f s imgs=$n " +
      "(decode + bilinear resample + PNG re-encode per record)")

    // 3. real-dHash near-dup: every brightness twin at hamming 0
    val twinOff = ops.Multimodal.TwinOffset
    val (pairs, ddW) = wall {
      val sig = spark.range(n).flatMap { i =>
        val id = i.toLong
        def h(lift: Int) = ops.Multimodal.dhash64Image(
          javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(png(id, lift))))
        Seq((id, h(0)), (id + twinOff, h(8)))
      }.toDF("media_id", "phash")
      sig.createOrReplaceTempView("__rph")
      spark.sql(
        """WITH band AS (
          |  SELECT media_id, phash, bno,
          |         shiftright(phash, 16 * bno) & 65535 AS bk
          |  FROM __rph LATERAL VIEW explode(sequence(0, 3)) AS bno)
          |SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
          |       CAST(bit_count(a.phash ^ b.phash) AS BIGINT) AS hamming
          |FROM band a JOIN band b
          |  ON a.bno = b.bno AND a.bk = b.bk AND a.media_id < b.media_id
          |WHERE bit_count(a.phash ^ b.phash) <= 3""".stripMargin)
        .collect()
    }
    val twinPairs = pairs.filter(r =>
      r.getLong(1) == r.getLong(0) + twinOff)
    require(twinPairs.length == n,
      s"found ${twinPairs.length} of $n brightness twins")
    require(twinPairs.forall(_.getLong(2) == 0L),
      "a brightness twin moved a dHash bit")
    println(f"PSCALE q=mm_dhash_dedup t=$ddW%.1f s imgs=${2 * n} " +
      s"pairs=${pairs.length} twins=$n " +
      "(real 9x8 dHash, banded LSH, every planted twin at hamming 0)")

    println("PSCALE addendum37 done")
    spark.stop()
  }

  /** ta_classify at 500k docs: the planted model puts +1 on the hash
    * bucket of the zipf-head token 'w3' and −0.05 everywhere else, so
    * keep ⟺ the w3-bucket evidence outweighs the background penalty —
    * a separation the probe verifies against a direct per-doc count,
    * plus the corpus-linear wall cost.
    */
  private def addendum38(dir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val w3feat = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest("w3".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val hex = "0123456789abcdef"
      hex.indexOf(h(0)) * 16 + hex.indexOf(h(1))
    }
    val weights = spark.sql(
      s"SELECT id AS feat, CASE WHEN id = $w3feat THEN 1.0 ELSE -0.05 END " +
        "AS w FROM range(256)")
    val (rows, clW) = wall {
      ops.TextAnalysis.taClassify(docs, weights)
        .select("doc_id", "z", "keep").collect()
    }
    val nDocs = docs.count()
    require(rows.length == nDocs, s"${rows.length} scored of $nDocs")
    val kept = rows.count(_.getBoolean(2))
    require(kept > 0 && kept < nDocs,
      s"no separation: kept $kept of $nDocs")
    // every kept doc carries strictly more w3-bucket mass than penalty:
    // spot-check the extreme z docs against a direct token count
    val ordered = rows.sortBy(_.getDouble(1))
    val hiDoc = ordered.last.getLong(0)
    val hiHasW3 = docs.filter(col("doc_id") === hiDoc)
      .head().getString(1).split(" ").count(_ == "w3")
    require(hiHasW3 > 0, s"top-z doc $hiDoc has no w3")
    println(f"PSCALE q=ta_classify t=$clW%.1f s docs=$nDocs kept=$kept " +
      "(planted single-feature model separates at 500k docs)")

    println("PSCALE addendum38 done")
    spark.stop()
  }

  /** Round-8 tier adjudication: Coreness and Layers gained the bounded
    * driver-finish tier (the Mst/Scc discipline), which absorbs every
    * bench-scale graph — so THIS probe is where the distributed loops
    * keep their at-scale evidence: both tiers run on the addendum25
    * 1.6M-edge dense co-occurrence graph (coreness) and the sf0.1 q44
    * dependency DAG (layers), must agree exactly, and both walls are
    * recorded.
    */
  private def addendum39(dir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkHygiene.quietRddLogs()
    import org.apache.spark.sql.functions._

    // coreness: the dense 6-hour co-occurrence window graph
    graft.Tables.load(spark, dir, "events").createOrReplaceTempView("__ev39")
    val windowed = spark.sql(
      """SELECT user_id, unix_micros(ts) div 10000000 AS b
        |FROM __ev39 CROSS JOIN (SELECT MIN(ts) AS t0 FROM __ev39)
        |WHERE ts < t0 + INTERVAL 6 HOUR""".stripMargin).distinct()
    val und = graph.GraphQueries.cooccurPairs(windowed)
    val sym = und.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(und.select(col("v").as("src"), col("u").as("dst")))
      .localCheckpoint(eager = true)
    val nE = sym.count()
    val (cd, wd) = wall(graph.Coreness.run(spark, sym).collect())
    val (cx, wx) = wall(graph.Coreness.run(spark, sym,
      driverFinishMaxEdges = 0L).collect())
    val md = cd.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mx = cx.map(r => r.getLong(0) -> r.getLong(1)).toMap
    require(md == mx, "coreness tiers diverge at 1.6M edges")
    println(f"PSCALE q=coreness_tiers edges=$nE driver=$wd%.1f s " +
      f"distributed=$wx%.1f s nodes=${md.size} max=${md.values.max} " +
      "(exact agreement)")

    // layers: the q44 three-class dependency DAG at sf0.1
    val li = graft.Tables.load(spark, "/root/testdata/sf0.1", "lineitem")
    val e1 = li.filter(col("l_quantity") >= 30)
      .select(col("l_suppkey").as("src"),
        (col("l_partkey") + 1000000L).as("dst"))
    val e2 = li.filter(col("l_quantity") >= 30)
      .select((col("l_partkey") + 1000000L).as("src"),
        (col("l_orderkey") + 2000000L).as("dst"))
    graft.Tables.load(spark, "/root/testdata/sf0.1", "orders")
      .createOrReplaceTempView("__o39")
    val e3 = spark.sql(
      """SELECT prev + 2000000 AS src, o_orderkey + 2000000 AS dst
        |FROM (
        |  SELECT o_orderkey,
        |         LAG(o_orderkey) OVER (
        |           PARTITION BY o_custkey, date_trunc('QUARTER', o_orderdate)
        |           ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM __o39)
        |WHERE prev IS NOT NULL""".stripMargin)
    val dag = e1.unionAll(e2).unionAll(e3).localCheckpoint(eager = true)
    val nD = dag.count()
    val (ld, lwd) = wall(graph.Layers.run(spark, dag).collect())
    val (lx, lwx) = wall(graph.Layers.run(spark, dag,
      driverFinishMaxEdges = 0L).collect())
    val mld = ld.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mlx = lx.map(r => r.getLong(0) -> r.getLong(1)).toMap
    require(mld == mlx, "layer tiers diverge on the q44 DAG")
    println(f"PSCALE q=layers_tiers edges=$nD driver=$lwd%.1f s " +
      f"distributed=$lwx%.1f s nodes=${mld.size} " +
      s"depth=${mld.values.max} (exact agreement)")

    println("PSCALE addendum39 done")
    spark.stop()
  }

  /** Round-9 driver-tier adjudication AT the cap: the round-8 advisor
    * flagged the 5M-edge bounded collect tiers for building boxed
    * Map/ArrayBuffer adjacency (hundreds of MB of transient driver
    * allocation); round 9 rebuilt them on a primitive CSR
    * (graph/DriverGraph.scala). This probe runs each tier on a PLANTED
    * known-answer graph AT the 5M-edge default cap — clique union for
    * coreness (every K50 member exactly 49, path exactly 1), skip-chain
    * DAG for layers (layer = chain position), ring+DAG digraph for SCC
    * (scc = ring base) — checking every vertex exactly and recording
    * wall + settled driver heap. No distributed re-run here: tier
    * equivalence is spec-locked and addendum39 covers it at 1.6M/3.18M
    * edges; this is the cap-scale cost evidence.
    */
  private def addendum40(): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkHygiene.quietRddLogs()
    import org.apache.spark.sql.functions._
    def usedMb(): Long = {
      System.gc()
      val r = Runtime.getRuntime
      (r.totalMemory() - r.freeMemory()) >> 20
    }

    // coreness: 1950 disjoint K50 cliques (nodes [50c, 50c+50), coreness
    // 49 each) + a 100k-node undirected path (coreness 1) — 4.98M edges,
    // just under the 5M default cap so the DEFAULT driver tier fires
    val cliq = spark.range(1950).selectExpr("id AS c")
      .selectExpr("explode(sequence(0, 49)) AS i", "c")
      .selectExpr("c * 50 + i AS src", "c")
      .join(spark.range(50).selectExpr("id AS j"))
      .selectExpr("src", "(src div 50) * 50 + j AS dst")
      .filter(col("src") =!= col("dst"))
    val pathBase = 100000L
    val path = spark.range(100000L - 1).selectExpr(
      s"id + $pathBase AS src", s"id + ${pathBase + 1} AS dst")
    val csym = cliq.unionAll(
        path.select(col("src"), col("dst"))
          .unionAll(path.select(col("dst").as("src"), col("src").as("dst"))))
      .localCheckpoint(eager = true)
    val nC = csym.count()
    val h0 = usedMb()
    val (cres, cw) = wall(graph.Coreness.run(spark, csym).collect())
    val hC = usedMb()
    require(cres.length == 1950 * 50 + 100000, s"coreness rows ${cres.length}")
    cres.foreach { r =>
      val (n, c) = (r.getLong(0), r.getLong(1))
      val want = if (n < pathBase) 49L else 1L
      require(c == want, s"coreness($n)=$c want $want")
    }
    println(f"PSCALE q=coreness_driver_cap edges=$nC wall=$cw%.1f s " +
      s"nodes=${cres.length} heap=${h0}->${hC}MB (exact planted answer)")

    // layers: 84.5k chains of 31 nodes with i->i+1 and i->i+2 skip edges
    // (4.99M edges — under the cap — layer = position in chain, depth 30)
    val chains = spark.range(84500L * 31).selectExpr("id AS n")
      .selectExpr("n", "n % 31 AS pos")
    val l1 = chains.filter(col("pos") < 30)
      .selectExpr("n AS src", "n + 1 AS dst")
    val l2 = chains.filter(col("pos") < 29)
      .selectExpr("n AS src", "n + 2 AS dst")
    val dag = l1.unionAll(l2).localCheckpoint(eager = true)
    val nL = dag.count()
    val (lres, lw) = wall(graph.Layers.run(spark, dag).collect())
    val hL = usedMb()
    require(lres.length == 84500 * 31, s"layer rows ${lres.length}")
    lres.foreach { r =>
      require(r.getLong(1) == r.getLong(0) % 31,
        s"layer(${r.getLong(0)})=${r.getLong(1)}")
    }
    println(f"PSCALE q=layers_driver_cap edges=$nL wall=$lw%.1f s " +
      s"nodes=${lres.length} depth=30 heap=${hL}MB (exact planted answer)")

    // scc: 500k rings of 5 (scc = ring base) + forward-only cross-ring
    // edges (base b -> base b+5 for even rings; never merge SCCs), ~5.2M
    // edges. driverFinishMaxEdges is raised so the FIRST peel collects —
    // this is the driver-tier cost in isolation.
    val rings = spark.range(500000L * 5).selectExpr("id AS n")
      .selectExpr("n AS src",
        "CASE WHEN n % 5 = 4 THEN n - 4 ELSE n + 1 END AS dst")
    val cross = spark.range(500000L - 1).selectExpr("id AS r")
      .filter(col("r") % 2 === 0)
      .selectExpr("r * 5 AS src", "r * 5 + 5 AS dst")
    val dig = rings.unionAll(cross).localCheckpoint(eager = true)
    val nS = dig.count()
    val (sres, sw) = wall(graph.Scc.run(spark, dig,
      driverFinishMaxEdges = 10000000L).collect())
    val hS = usedMb()
    require(sres.length == 500000 * 5, s"scc rows ${sres.length}")
    sres.foreach { r =>
      require(r.getLong(1) == (r.getLong(0) / 5) * 5,
        s"scc(${r.getLong(0)})=${r.getLong(1)}")
    }
    println(f"PSCALE q=scc_driver_cap edges=$nS wall=$sw%.1f s " +
      s"nodes=${sres.length} heap=${hS}MB (exact planted answer)")

    println("PSCALE addendum40 done")
    spark.stop()
  }

  /** Round-9 new ops at 100×: ds_dsir over the full 500k zipf corpus
    * (target = the 400k non-en slice — the cross-lingual domain
    * targeting), dd_despan with the BoilerPhrase planting at 500k docs
    * (every 7th doc carries the shared 40-token tail → 71.4k docs must
    * shed ≥ 40 tokens; everyone else untouched unless naturally
    * duplicated), and ss_mips + the norm-augmentation transform at 100k
    * real embeddings.
    */
  private def addendum41(dir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkHygiene.quietRddLogs()
    import org.apache.spark.sql.functions._

    val docs = spark.read.parquet(s"$dir/documents.parquet")

    // ds_dsir: 500k raw, 400k-doc target slice, k=1000
    val (dsir, wDsir) = wall(ops.Pipeline.dsDsir(
      docs.select("doc_id", "text"),
      docs.filter(col("lang") =!= "en").select("text"), k = 1000).collect())
    require(dsir.length == 1000, s"dsir rows ${dsir.length}")
    require(dsir.forall(r => !r.getDouble(1).isNaN && !r.getDouble(3).isNaN))
    println(f"PSCALE q=ds_dsir docs=500000 target=400000 k=1000 " +
      f"wall=$wDsir%.1f s logw_range=[${dsir.map(_.getDouble(1)).min}%.2f, " +
      f"${dsir.map(_.getDouble(1)).max}%.2f]")

    // dd_despan: plant the BoilerPhrase tail on every 7th doc, n=20
    val planted = docs.selectExpr("doc_id",
      s"""CASE WHEN doc_id % 7 = 0
         |     THEN concat(text, ' ', '${ops.Dedup.BoilerPhrase}',
         |                 ' ', '${ops.Dedup.BoilerPhrase}')
         |     ELSE text END AS text""".stripMargin)
    val (despan, wDespan) = wall(
      ops.Dedup.ddDespanOn(planted, n = 20)
        .selectExpr("doc_id", "n_removed").collect())
    val plantedRemoved = despan.filter(r => r.getLong(0) % 7 == 0)
    require(plantedRemoved.forall(_.getInt(1) >= 40),
      "planted docs must shed the 40-token boilerplate tail")
    val untouched = despan.count(_.getInt(1) == 0)
    println(f"PSCALE q=dd_despan docs=500000 planted=${plantedRemoved.length} " +
      f"wall=$wDespan%.1f s untouched=$untouched " +
      s"removed_tokens=${despan.map(_.getInt(1).toLong).sum}")

    // ss_mips at 100k real vectors: 8 queries × top-10, plus the
    // augmented-norm invariant over the full corpus
    val emb = spark.read.parquet(s"$dir/embeddings19.parquet")
    val (mips, wMips) = wall(ops.Similarity.ssMips(
      spark, emb, "vec_id < 8", k = 10).collect())
    require(mips.length == 80, s"mips rows ${mips.length}")
    val (augN, wAug) = wall(ops.Similarity.ssMipsAugmentOn(spark, emb)
      .selectExpr("round(sqrt(graft_dot(v_aug, v_aug)), 3) AS n")
      .distinct().count())
    require(augN == 1L, s"augmented norms not constant: $augN distinct")
    println(f"PSCALE q=ss_mips vectors=100000 queries=8 wall=$wMips%.1f s " +
      f"augment_wall=$wAug%.1f s aug_norm_distinct=$augN")

    println("PSCALE addendum41 done")
    spark.stop()
  }

  /** Round-9 real-codec feature tier at 100×: 100k REAL square-wave WAV
    * clips (the mm_audiofeat planting, ~12–14 kB each ≈ 1.3 GB of
    * payload) generated in-executor, decoded and featurized through the
    * javax.sound batch pass, every clip's integer cores checked against
    * the closed form — the addendum37 discipline applied to audio
    * CONTENT features.
    */
  private def addendum42(): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkHygiene.quietRddLogs()
    import spark.implicits._

    val n = 100000L
    val media = spark.range(n).as[Long].map { id =>
      val amp = 1000 + 500 * (id % 7).toInt
      val half = 4 + 2 * (id % 3).toInt
      val act = 4800 + 240 * (id % 5).toInt
      val tail = 1200 + 240 * (id % 3).toInt
      val total = act + tail
      val pcm = new Array[Byte](2 * total)
      var i = 0
      while (i < act) {
        val v = if ((i / half) % 2 == 0) amp else -amp
        pcm(2 * i) = (v & 0xff).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, total.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      ops.Multimodal.MediaRecord(id, "audio", bos.toByteArray)
    }
    val (feats, w) = wall(ops.Multimodal.mmAudioFeat(media).collect())
    require(feats.length == n, s"audiofeat rows ${feats.length}")
    feats.foreach { f =>
      val id = f.media_id
      val amp = 1000L + 500 * (id % 7)
      val half = 4L + 2 * (id % 3)
      val act = 4800L + 240 * (id % 5)
      val tail = 1200L + 240 * (id % 3)
      require(f.n_samples == act + tail && f.sum_sq == act * amp * amp &&
        f.zero_crossings == act / half - 1 && f.silent_frames == tail / 240 &&
        f.n_frames_w == (act + tail) / 240,
        s"audiofeat($id) off the closed form: $f")
    }
    println(f"PSCALE q=mm_audiofeat clips=$n wall=$w%.1f s " +
      "(every clip's integer cores exact)")
    println("PSCALE addendum42 done")
    spark.stop()
  }

  /** Round-9 ta_textrank at 100×: the scaladoc's scale claim is that ONE
    * corpus pass builds the pair relation and everything after runs on
    * the VOCABULARY-sized graph — so the probe measures both halves:
    * the distinct adjacent-pair count (the graph), the full query wall,
    * and the rank sanity (contiguous ranks, hub words plausible).
    */
  private def addendum43(dir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkHygiene.quietRddLogs()

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    docs.createOrReplaceTempView("__tr43")
    val (nPairs, wPairs) = wall(spark.sql(
      """SELECT DISTINCT least(p.a, p.b) AS u, greatest(p.a, p.b) AS v
        |FROM (SELECT split(text, ' ') AS toks FROM __tr43)
        |LATERAL VIEW explode(transform(sequence(1, size(toks) - 1),
        |  i -> struct(element_at(toks, i) AS a,
        |              element_at(toks, i + 1) AS b))) pt AS p
        |WHERE size(toks) >= 2 AND p.a <> p.b""".stripMargin).count())
    val (rows, wAll) = wall(ops.TextAnalysis.taTextRank(docs, k = 30)
      .collect())
    require(rows.length == 30 &&
      rows.map(_.getLong(2)).toSeq == (1L to 30L),
      "textrank ranks not contiguous at 500k docs")
    println(f"PSCALE q=ta_textrank docs=500000 pairs=$nPairs " +
      f"pairs_pass=$wPairs%.1f s full=$wAll%.1f s " +
      s"top3=${rows.take(3).map(_.getString(0)).mkString(",")}")
    println("PSCALE addendum43 done")
    spark.stop()
  }

  /** Round-9 ev_sequential at 100×: 10M events over ~30 days. Measures
    * the SQL path (one distributed day-grid pass — the 100 TB shape) and
    * the tracker's batch fold (single-key, the DECLARED scale caveat:
    * one task swallows the corpus — recorded so the scaladoc's
    * "pre-aggregate upstream" advice has a number), and cross-checks the
    * two row-for-row (the StreamingSpec parity at volume).
    */
  private def addendum44(dir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkHygiene.quietRddLogs()
    import spark.implicits._

    val ev = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("event_id", "timestamp_micros(ts div 1000) AS ts",
        "user_id", "event_type", "value")
    val (sqlRows, wSql) = wall(ops.Sessionize.evSequential(ev).collect())
    require(sqlRows.nonEmpty, "no sequential rows at 10M events")
    val ps = sqlRows.map(_.getDouble(8))
    require(ps.zip(ps.tail).forall { case (a, b) => b <= a },
      "always-valid p not monotone at 10M events")
    val (trRows, wTr) = wall(streaming.SequentialTracker.sequentialBatch(
      ev.select("ts", "user_id", "value")
        .as[streaming.SequentialTracker.SqEv]).collect())
    val sqlKey = sqlRows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(6), r.getDouble(8))).sortBy(_._1).toSeq
    val trKey = trRows.map(r => (r.day, r.na, r.nb, r.lambda,
      r.p_always_valid)).sortBy(_._1).toSeq
    require(sqlKey == trKey, "tracker != SQL at 10M events")
    println(f"PSCALE q=ev_sequential events=10000000 days=${sqlRows.length} " +
      f"sql_wall=$wSql%.1f s tracker_fold_wall=$wTr%.1f s " +
      f"p_final=${ps.last}%.6f (paths row-identical)")
    println("PSCALE addendum44 done")
    spark.stop()
  }

  /** Round-9 dsDsirWithin at 100×: the target⊆raw single-pass form vs
    * the two-corpus entry on the SAME selection problem (500k raw,
    * 400k-doc non-en target) — outputs must be identical, and the saved
    * pass is the measurement.
    */
  private def addendum45(dir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkHygiene.quietRddLogs()
    import org.apache.spark.sql.functions._

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val (two, wTwo) = wall(ops.Pipeline.dsDsir(
      docs.select("doc_id", "text"),
      docs.filter(col("lang") =!= "en").select("text"), k = 1000).collect())
    graft.SparkHygiene.clearSessionCaches(spark)
    val (one, wOne) = wall(ops.Pipeline.dsDsirWithin(
      docs.selectExpr("doc_id", "text", "lang <> 'en' AS is_target"),
      k = 1000).collect())
    graft.SparkHygiene.clearSessionCaches(spark)
    val t2 = two.map(r => (r.getLong(0), r.getDouble(3))).toSeq
    val t1 = one.map(r => (r.getLong(0), r.getDouble(3))).toSeq
    require(t1 == t2, "single-pass and two-corpus DSIR diverge at 500k")
    println(f"PSCALE q=ds_dsir_within docs=500000 target=400000 k=1000 " +
      f"two_pass=$wTwo%.1f s one_pass=$wOne%.1f s (identical winners)")
    println("PSCALE addendum45 done")
    spark.stop()
  }

  /** Round-9 ss_mmr at 100×: the greedy loop over the FULL 100k-vector
    * corpus at k=16 (per-round one-pass cost, checkpoint-hygiene under
    * 16 rounds), then the composition the scaladoc prescribes — MMR over
    * an IVF-retrieved candidate set (top-200 by relevance) — which is
    * the 100 TB shape: corpus-sized work happens once in the ANN pass,
    * the greedy rounds run on hundreds of rows.
    */
  private def addendum46(dir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkHygiene.quietRddLogs()
    import org.apache.spark.sql.functions._

    val emb = spark.read.parquet(s"$dir/embeddings19.parquet")
      .select("vec_id", "embedding")
    val pinnedBefore = spark.sparkContext.getPersistentRDDs.size
    val (full, wFull) = wall(ops.Similarity.ssMmr(spark, emb,
      queryId = 0L, k = 16, lambda = 0.7).collect())
    require(full.length == 16 &&
      full.map(_.getLong(1)).distinct.length == 16,
      s"mmr full-corpus picks broken: ${full.length}")
    val pinnedAfter = spark.sparkContext.getPersistentRDDs.size
    require(pinnedAfter - pinnedBefore <= 1,
      s"mmr leaked ${pinnedAfter - pinnedBefore} checkpoint frames")

    // the prescribed composition: brute top-200 relevance cut (standing
    // in for the ANN generators' candidate output), then MMR on it
    val candIds = ops.Similarity.bruteTopkOn(spark, emb, "vec_id = 0", 200)
      .select(col("neighbor_id").as("vec_id")).collect().map(_.getLong(0))
    val cand = emb.filter(col("vec_id").isin(candIds: _*) ||
      col("vec_id") === 0L)
    val (sub, wSub) = wall(ops.Similarity.ssMmr(spark, cand,
      queryId = 0L, k = 16, lambda = 0.7).collect())
    require(sub.length == 16, s"mmr candidate-set picks: ${sub.length}")
    println(f"PSCALE q=ss_mmr vectors=100000 k=16 full_wall=$wFull%.1f s " +
      f"candidates200_wall=$wSub%.1f s " +
      s"overlap=${full.map(_.getLong(1)).toSet
        .intersect(sub.map(_.getLong(1)).toSet).size}/16")
    println("PSCALE addendum46 done")
    spark.stop()
  }

  /** Round-10b ops at 100×: content invariants required, walls recorded. */
  private def addendum49(dir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkHygiene.quietRddLogs()
    import spark.implicits._

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.createOrReplaceTempView("__a49_docs")
    val off = ops.Dedup.TwinIdOffset

    // ds_doremi: 500k docs — the MWU loop runs on the domains-sized
    // relation; weight mass must renormalize and concentrate on the
    // max-excess domain
    val (dw, wDw) = wall(ops.Pipeline.dsDoremi(
      docs.selectExpr("doc_id", "source", "length(text) AS n_chars"))
      .collect())
    val wSum = dw.map(_.getLong(4)).sum
    require(math.abs(wSum - 1000000000L) <= dw.length,
      s"doremi weights sum $wSum != ~1e9 over ${dw.length} domains")
    val maxExcess = dw.maxBy(_.getLong(3))
    val maxWeight = dw.maxBy(_.getLong(4))
    require(maxExcess.getString(0) == maxWeight.getString(0) ||
      maxExcess.getLong(3) == maxWeight.getLong(3),
      "max-excess domain did not take max weight")
    println(f"PSCALE q=ds_doremi docs=500000 domains=${dw.length} " +
      f"top=${maxWeight.getString(0)} w_ppb=${maxWeight.getLong(4)} " +
      f"w=$wDw%.1f s")
    graft.SparkHygiene.clearSessionCaches(spark)

    // ta_sentiment: 1M docs — twins append ' fast fast' (+2 hits, +4
    // valence); the HOF fold must reproduce the delta EXACTLY on every
    // one of the 500k pairs
    val sentIn = spark.sql(
      s"""SELECT doc_id, text FROM __a49_docs
         |UNION ALL
         |SELECT doc_id + $off AS doc_id, concat(text, ' fast fast')
         |FROM __a49_docs""".stripMargin)
    val (se, wSe) = wall {
      ops.TextAnalysis.taSentiment(sentIn)
        .createOrReplaceTempView("__a49_sent")
      spark.sql(
        s"""SELECT COUNT(*) AS pairs,
           |  SUM(CASE WHEN t.n_hits = o.n_hits + 2
           |            AND t.sum_val = o.sum_val + 4 THEN 1 ELSE 0 END)
           |    AS exact
           |FROM __a49_sent o JOIN __a49_sent t
           |  ON t.doc_id = o.doc_id + $off
           |WHERE o.doc_id < $off""".stripMargin).head()
    }
    require(se.getLong(0) == 500000L && se.getLong(1) == 500000L,
      s"ta_sentiment planted delta at 1M: $se")
    println(f"PSCALE q=ta_sentiment docs=1000000 exact_pairs=500000 " +
      f"w=$wSe%.1f s")
    graft.SparkHygiene.clearSessionCaches(spark)

    // mm_dupblob: 1M blob records (even-id twins byte-identical) — the
    // CAS report folds every planted pair under the original keeper
    val blobs = spark.sql(
      s"""SELECT doc_id AS media_id, encode(text, 'UTF-8') AS payload
         |FROM __a49_docs
         |UNION ALL
         |SELECT doc_id + $off AS media_id, encode(text, 'UTF-8')
         |FROM __a49_docs WHERE doc_id % 2 = 0""".stripMargin)
    val (bl, wBl) = wall(ops.Multimodal.mmDupBlob(blobs)
      .selectExpr("SUM(n_copies) AS n", "COUNT(*) AS groups",
        "SUM(CASE WHEN n_copies >= 2 THEN 1 ELSE 0 END) AS dupgroups",
        s"MAX(CASE WHEN n_copies >= 2 THEN keeper_id ELSE 0 END) AS mxk",
        "SUM(wasted_bytes) AS wasted").head())
    require(bl.getLong(0) == 750000L, s"mm_dupblob records: $bl")
    require(bl.getLong(2) >= 245000L, s"mm_dupblob dup groups: $bl")
    require(bl.getLong(3) < off, "a twin won a CAS keeper slot")
    require(bl.getLong(4) > 0L, "no wasted bytes at 250k planted dups")
    println(f"PSCALE q=mm_dupblob blobs=1000000 " +
      f"groups=${bl.getLong(1)} dupgroups=${bl.getLong(2)} " +
      f"wasted=${bl.getLong(4)} w=$wBl%.1f s")
    graft.SparkHygiene.clearSessionCaches(spark)

    // ev_holt: 10M events — the HOF fold at full event volume, and the
    // tracker's O(1) recursion must agree row-for-row on the last day
    if (!new java.io.File(s"$dir/events.parquet").exists) {
      val nEvents = 10000000L
      val nUsers = scala.math.max(100, (nEvents / 666).toInt)
      spark.range(0L, nEvents).map(evFor(_, nUsers, 2026L))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    }
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("timestamp_micros(ts div 1000) AS ts", "event_type")
    val (hs, wHs) = wall(ops.Sessionize.evHolt(
      ev.selectExpr("ts", "event_type")).collect())
    require(hs.nonEmpty, "no holt rows at 10M events")
    val (ht, wHt) = wall(streaming.HoltTracker.holtBatch(
      ev.as[streaming.HoltTracker.HEv]).collect())
    val sqlKey = hs.map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4), r.getDouble(5))).sortBy(_._1).toSeq
    val trKey = ht.groupBy(_.event_type).map { case (t, rows) =>
      val last = rows.maxBy(_.day)
      (t, last.n_days, last.level, last.trend, last.forecast, last.mae)
    }.toSeq.filter(_._2 >= 2).sortBy(_._1)
    require(sqlKey == trKey, "holt tracker != SQL at 10M events")
    println(f"PSCALE q=ev_holt events=10000000 types=${hs.length} " +
      f"sql_wall=$wHs%.1f s tracker_fold_wall=$wHt%.1f s (rows identical)")
    graft.SparkHygiene.clearSessionCaches(spark)

    // ss_rq_topk: 100k vectors, 100 queries — the 2-lookup ADC must
    // keep most of brute's top-5 at the 12x cut
    val embPath = s"$dir/embeddings19.parquet"
    if (!new java.io.File(embPath).exists) {
      spark.range(0L, 100000L).map(vecFor(_, 64, 7, 2026L))
        .toDF("vec_id", "embedding", "label")
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(embPath)
    }
    val emb = spark.read.parquet(embPath).select("vec_id", "embedding")
    val (br, wBr) = wall(ops.Similarity.bruteTopkOn(spark, emb,
      "vec_id % 5000 = 0", topK = 5).collect())
    val brMap = br.map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    val brTop = brMap.map(_._1).groupBy(_._1)
    def rqRecall(tag: String, nlist: Int, nCode: Int, mult: Int)
        : (Double, Double) = {
      val (rq, w) = wall(ops.Similarity.ssRqTopkOn(spark, emb,
        "vec_id % 5000 = 0", topK = 5, nlist = nlist, nCode = nCode,
        mult = mult).collect())
      // rescore exactness: overlapping pairs carry the identical cos
      val bm = brMap.toMap
      rq.foreach { r =>
        val k = (r.getLong(0), r.getLong(1))
        bm.get(k).foreach(b => require(b == r.getDouble(2),
          s"rescore drift at $k"))
      }
      val rqTop = rq.map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      val rs = brTop.map { case (q, exact) =>
        val g = rqTop.getOrElse(q, Array.empty).map(_._2).toSet
        exact.map(_._2).count(g) / exact.length.toDouble
      }
      val rec = rs.sum / rs.size
      println(f"PSCALE q=ss_rq_topk($tag) vectors=100000 " +
        f"recall@5=$rec%.3f w=$w%.1f s")
      graft.SparkHygiene.clearSessionCaches(spark)
      (rec, w)
    }
    val (rToy, _) = rqRecall("nlist=16,nCode=16,mult=12", 16, 16, 12)
    val (rSqrt, _) = rqRecall("nlist=316,nCode=64,mult=12", 316, 64, 12)
    val (rDeep, _) = rqRecall("nlist=316,nCode=64,mult=40", 316, 64, 40)
    val (rRich, _) = rqRecall("nlist=316,nCode=256,mult=40", 316, 256, 40)
    require(rSqrt >= rToy,
      s"sqrt-N coarse codebook lost recall: $rSqrt < $rToy")
    require(rDeep >= rSqrt,
      s"deeper rescore cut lost recall: $rDeep < $rSqrt")
    require(rRich >= rDeep,
      s"richer per-cell codebook lost recall: $rRich < $rDeep")
    require(rRich >= 0.6, s"rich-regime RQ recall $rRich < 0.6 at 100k")
    println(f"PSCALE rq regimes toy=$rToy%.3f sqrtN=$rSqrt%.3f " +
      f"deep=$rDeep%.3f rich=$rRich%.3f brute_wall=$wBr%.1f s")
    println("PSCALE addendum49 done")
    spark.stop()
  }

  /** Round-11 at 100×: the PROBED RQ composition (ss_ivfrq) against the
    * full-ADC calibration scan, and the ds_d4 √N window-sizing default —
    * content invariants required, walls recorded.
    */
  private def addendum51(dir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkHygiene.quietRddLogs()
    import spark.implicits._

    // the addendum49 corpus recipe: 100k weak-label clustered vectors
    val embPath = s"$dir/embeddings19.parquet"
    if (!new java.io.File(embPath).exists) {
      spark.range(0L, 100000L).map(vecFor(_, 64, 7, 2026L))
        .toDF("vec_id", "embedding", "label")
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(embPath)
    }
    val emb = spark.read.parquet(embPath).select("vec_id", "embedding")
    val (br, wBr) = wall(ops.Similarity.bruteTopkOn(spark, emb,
      "vec_id % 5000 = 0", topK = 5).collect())
    val brMap = br.map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    val brTop = brMap.keys.groupBy(_._1)

    // √N regime (nlist=316): the full-ADC scan is 100k codes/query;
    // nprobe=p cuts it to ~p·316 codes/query
    def rqAt(nprobe: Int, nCode: Int = 64, mult: Int = 12)
        : (Double, Double) = {
      val (rq, w) = wall(ops.Similarity.ssRqTopkOn(spark, emb,
        "vec_id % 5000 = 0", topK = 5, nlist = 316, nCode = nCode,
        mult = mult, nprobe = nprobe).collect())
      rq.foreach { r => // survivors rescore with the exact brute cosine
        val k = (r.getLong(0), r.getLong(1))
        brMap.get(k).foreach(b => require(b == r.getDouble(2),
          s"rescore drift at $k (nprobe=$nprobe)"))
      }
      val rqTop = rq.map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      val rs = brTop.map { case (q, exact) =>
        val g = rqTop.getOrElse(q, Array.empty).map(_._2).toSet
        exact.map(_._2).count(g) / exact.size.toDouble
      }
      graft.SparkHygiene.clearSessionCaches(spark)
      val rec = rs.sum / rs.size
      println(f"PSCALE q=ss_ivfrq_topk(nprobe=$nprobe,nCode=$nCode," +
        f"mult=$mult) vectors=100000 recall@5=$rec%.3f w=$w%.1f s")
      (rec, w)
    }
    val (rFull, wFull) = rqAt(0)
    val (r1, _) = rqAt(1)
    val (r8, w8) = rqAt(8)
    val (r32, _) = rqAt(32)
    require(r8 >= r1 && r32 >= r8,
      s"nprobe dial not monotone at 100k: $r1 -> $r8 -> $r32")
    // the coarse cut is a SCAN dial, not a fidelity dial: recall at any
    // nprobe is bounded by the full-ADC recall of the same codebook
    // (0.22 in this deliberately-lean 64-code regime — addendum49's
    // ladder; fidelity comes from nCode/mult, next block), and a wide
    // probe must recover it
    require(r32 >= rFull - 0.05,
      s"wide probe (32/316) lost full-ADC recall: $r32 < $rFull")
    require(r8 >= rFull - 0.05,
      s"nprobe=8 lost more than the cut should cost: $r8 vs full $rFull")
    println(f"PSCALE ivfrq ladder full=$rFull%.3f p1=$r1%.3f p8=$r8%.3f " +
      f"p32=$r32%.3f walls full=$wFull%.1f p8=$w8%.1f " +
      f"brute_wall=$wBr%.1f s")
    // production-fidelity regime (316/256 codes, mult=40 — addendum49's
    // rich ladder rung, full-ADC recall 0.88): the probe cut must keep
    // that recall while scanning ~1/10 of the code table
    val (richFull, wRichFull) = rqAt(0, nCode = 256, mult = 40)
    val (richP32, wRichP32) = rqAt(32, nCode = 256, mult = 40)
    require(richFull >= 0.8,
      s"rich-regime full-ADC recall fell: $richFull < 0.8")
    require(richP32 >= richFull - 0.05,
      s"probed rich regime lost recall: $richP32 vs full $richFull")
    println(f"PSCALE ivfrq rich full=$richFull%.3f p32=$richP32%.3f " +
      f"walls full=$wRichFull%.1f p32=$wRichP32%.1f s")

    // ds_d4 √N default at 100k: nlist auto-sizes to 316, so the
    // per-cid rank window tracks √N (~316 rows) instead of the old
    // fixed-16 default's N/16 = 6250; the keep-cut invariant holds in
    // every cluster
    val (d4, wD4) = wall {
      ops.Pipeline.dsD4(spark, emb).createOrReplaceTempView("__d4_100k")
      spark.sql(
        """SELECT CAST(SUM(cn) AS BIGINT) AS n, COUNT(*) AS nc,
          |       MAX(cn) AS mx,
          |       CAST(AVG(cn) AS BIGINT) AS mean_cn,
          |       SUM(CASE WHEN nd <> (cn + 3) div 4 THEN 1 ELSE 0 END)
          |         AS bad
          |FROM (SELECT cid, COUNT(*) AS cn,
          |             SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS nd
          |      FROM (SELECT cid, keep FROM __d4_100k) GROUP BY cid)"""
          .stripMargin).head()
    }
    require(d4.getLong(0) == 100000L, s"ds_d4 rows: $d4")
    require(d4.getLong(4) == 0L,
      s"ds_d4 keep-cut invariant broken in ${d4.getLong(4)} clusters")
    require(d4.getLong(2) < 6250L,
      s"ds_d4 max window ${d4.getLong(2)} not below the fixed-16 " +
        "default's 6250-row partition — √N sizing not effective")
    println(f"PSCALE q=ds_d4 vectors=100000 nlist_auto=316 " +
      f"clusters=${d4.getLong(1)} max_window=${d4.getLong(2)} " +
      f"mean_window=${d4.getLong(3)} (fixed16_window=6250) w=$wD4%.1f s")
    graft.SparkHygiene.clearSessionCaches(spark)
    println("PSCALE addendum51 done")
    spark.stop()
  }

  /** Round-11 second batch at 100×: ev_cusum (+PageTracker parity) and
    * ev_mad at 10M events, ss_bq/ss_rp at 100k vectors, dd_editdist at
    * 500k docs, mm_ahash at 100k REAL PNGs — content invariants
    * required, walls recorded.
    */
  private def addendum52(dir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkHygiene.quietRddLogs()
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)

    // ---- 10M events (the addendum49 recipe) with a PLANTED sustained
    // DOUBLING of 'click' over the last 10 observed days (the evCusum
    // oracle's sizing: +100% crosses the 2-mean bar on shift day 5;
    // +50% deterministically lands ~7% under it)
    if (!new java.io.File(s"$dir/events.parquet").exists) {
      val nEvents = 10000000L
      val nUsers = scala.math.max(100, (nEvents / 666).toInt)
      spark.range(0L, nEvents).map(evFor(_, nUsers, 2026L))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    }
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("event_id", "timestamp_micros(ts div 1000) AS ts",
        "event_type")
    ev.createOrReplaceTempView("__a52_ev")
    val cutTs = spark.sql(
      """SELECT timestampadd(DAY, -9, max(date_trunc('DAY', ts)))
        |FROM __a52_ev""".stripMargin).head().getTimestamp(0)
    val cutDay = cutTs.getTime / 86400000L
    val planted = ev.unionByName(
      ev.where(s"event_type = 'click' AND ts >= '$cutTs'"))
    val (cu, wCu) = wall(ops.Sessionize.evCusum(planted).collect())
    val alarms = cu.filter(_.getBoolean(5))
    require(alarms.length >= 4,
      s"planted doubled click shift: only ${alarms.length} alarm days")
    require(alarms.forall(r => r.getString(0) == "click" &&
      r.getTimestamp(1).getTime / 86400000L >= cutDay),
      s"alarm outside the planted shift: ${alarms.take(3).toSeq}")
    println(f"PSCALE q=ev_cusum events=${planted.count()} " +
      f"alarm_days=${alarms.length} (all click, all in-shift) " +
      f"w=$wCu%.1f s")
    // PageTracker parity at 10M: the tracker fed the batch op's own
    // per-type means reads the SQL rows bit-for-bit
    val daily = planted
      .groupBy(col("event_type"), date_trunc("DAY", col("ts")).as("day"))
      .count().collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 86400000L,
        r.getLong(2)))
    val means = daily.groupBy(_._1).map { case (t, rows) =>
      val s0 = rows.map(_._3).sum; val c = rows.length.toLong
      t -> ((s0 / c) * 1000000L + ((s0 % c) * 1000000L) / c)
    }
    val (pt, wPt) = wall(streaming.PageTracker.pageBatch(
      planted.select("ts", "event_type")
        .as[streaming.PageTracker.PgEv], means).collect())
    val sqlKey = cu.map(r => ((r.getString(0),
      r.getTimestamp(1).getTime / 86400000L),
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))))
      .sortBy(_._1).toSeq
    val trKey = pt.map(r => ((r.event_type, r.day),
      (r.n, r.dev_micro, r.cusum_micro, r.alarm))).sortBy(_._1).toSeq
    require(sqlKey == trKey, "PageTracker != evCusum SQL at 10M events")
    println(f"PSCALE q=ev_cusum tracker_parity rows=${pt.length} " +
      f"(bit-identical) fold_wall=$wPt%.1f s")
    graft.SparkHygiene.clearSessionCaches(spark)

    // ---- ev_mad at 10M: a 10x day AND a 3x day planted on 'view' —
    // the 10x day inflates sigma enough to hide the 3x day from a
    // z-chart; the MAD chart must flag BOTH
    val d10 = new java.sql.Timestamp(cutTs.getTime - 4L * 86400000L)
    val d3 = new java.sql.Timestamp(cutTs.getTime - 2L * 86400000L)
    def copies(dayTs: java.sql.Timestamp, k: Int) =
      ev.where(s"event_type = 'view' AND date_trunc('DAY', ts) = '$dayTs'")
        .crossJoin(spark.range(1, k + 1).toDF("rep")).drop("rep")
        .select("event_id", "ts", "event_type")
    val evMadIn = ev.select("event_id", "ts", "event_type")
      .unionByName(copies(d10, 9)).unionByName(copies(d3, 2))
    val (md, wMd) = wall(ops.Sessionize.evMad(evMadIn).collect())
    val vAlarm = md.filter(r => r.getString(0) == "view" &&
      r.getBoolean(6)).map(_.getTimestamp(1).getTime / 86400000L).toSet
    require(vAlarm.contains(d10.getTime / 86400000L) &&
      vAlarm.contains(d3.getTime / 86400000L),
      s"planted 10x/3x view days not flagged: $vAlarm")
    // the z-chart comparison: with the 10x day in-window, the 3x day
    // reads under z=3
    val vCounts = md.filter(_.getString(0) == "view")
      .map(r => (r.getTimestamp(1).getTime / 86400000L, r.getLong(2)))
    val xs = vCounts.map(_._2.toDouble)
    val mu = xs.sum / xs.length
    val sd = math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / xs.length)
    val n3 = vCounts.find(_._1 == d3.getTime / 86400000L).get._2
    require((n3 - mu) / sd < 3.0,
      f"3x day z=${(n3 - mu) / sd}%.2f not hidden — probe premise broken")
    println(f"PSCALE q=ev_mad events=${evMadIn.count()} " +
      f"view_alarms=${vAlarm.size} z3x=${(n3 - mu) / sd}%.2f (<3, " +
      f"hidden from the z-chart; MAD flags it) w=$wMd%.1f s")
    graft.SparkHygiene.clearSessionCaches(spark)

    // ---- ss_bq / ss_rp at 100k vectors (the addendum51 corpus):
    // rescore exactness is REQUIRED; recall reported against brute with
    // a conservative floor (these are mid-similarity weak-label vectors
    // — the spec-tier clustered locks carry the recall contract)
    val embPath = s"$dir/embeddings19.parquet"
    if (!new java.io.File(embPath).exists) {
      spark.range(0L, 100000L).map(vecFor(_, 64, 7, 2026L))
        .toDF("vec_id", "embedding", "label")
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(embPath)
    }
    val emb = spark.read.parquet(embPath).select("vec_id", "embedding")
    val (br, wBr) = wall(ops.Similarity.bruteTopkOn(spark, emb,
      "vec_id % 5000 = 0", topK = 5).collect())
    val brMap = br.map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    val brTop = brMap.keys.groupBy(_._1)
    def recallOf(rows: Array[org.apache.spark.sql.Row],
        tag: String, wall0: Double): Double = {
      rows.foreach { r =>
        val k = (r.getLong(0), r.getLong(1))
        brMap.get(k).foreach(b => require(b == r.getDouble(2),
          s"$tag rescore drift at $k"))
      }
      val top = rows.map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      val rs = brTop.map { case (q, exact) =>
        val g = top.getOrElse(q, Array.empty).map(_._2).toSet
        exact.map(_._2).count(g) / exact.size.toDouble
      }
      val rec = rs.sum / rs.size
      println(f"PSCALE q=$tag vectors=100000 recall@5=$rec%.3f " +
        f"w=$wall0%.1f s")
      graft.SparkHygiene.clearSessionCaches(spark)
      rec
    }
    val (bq, wBq) = wall(ops.Similarity.ssBqTopkOn(spark, emb,
      "vec_id % 5000 = 0", topK = 5, mult = 12).collect())
    val rBq = recallOf(bq, "ss_bq_topk(mult=12)", wBq)
    require(rBq >= 0.10,
      f"1-bit/dim recall collapsed to noise at 100k: $rBq%.3f")
    // RP is a DIMENSION dial: on this weak-label mid-sim corpus the
    // 1/√pDim JL distortion is comparable to the inter-neighbor cosine
    // gaps, so pDim=16 recall is expected LOW (the LSH-regime honesty
    // note) and doubling pDim must buy it back
    val (rp16, wRp16) = wall(ops.Similarity.ssRpTopkOn(spark, emb,
      "vec_id % 5000 = 0", topK = 5, mult = 12).collect())
    val r16 = recallOf(rp16, "ss_rp_topk(pDim=16,mult=12)", wRp16)
    val (rp32, wRp32) = wall(ops.Similarity.ssRpTopkOn(spark, emb,
      "vec_id % 5000 = 0", topK = 5, pDim = 32, mult = 12).collect())
    val r32 = recallOf(rp32, "ss_rp_topk(pDim=32,mult=12)", wRp32)
    require(r32 > r16 && r16 >= 0.03,
      f"pDim is not acting as the recall dial: $r16%.3f -> $r32%.3f")
    println(f"PSCALE bq/rp ladder brute_wall=$wBr%.1f s " +
      f"(bq=$rBq%.3f rp16=$r16%.3f rp32=$r32%.3f)")

    // ---- dd_editdist at 500k docs: diverse-head word-salad corpus
    // (20k distinct opening tokens — the field-diversity regime the
    // blocking discipline targets), a 1-substitution twin for every
    // 100th doc; every planted twin must link at dist <= 1 and the
    // block fan-in must stay bounded
    val vocab = Array("key", "agg", "row", "scan", "slow", "fast",
      "table", "value", "part", "hash", "merge", "batch", "window",
      "spark", "order", "data", "column", "join", "small", "line")
    val docs500 = spark.range(0L, 500000L).map { i =>
      val rng = new scala.util.Random(2026L ^ (i * 0x9E3779B97F4A7C15L))
      val head = f"t${math.abs(rng.nextLong()) % 20000}%05d"
      val body = Array.fill(20 + rng.nextInt(40))(
        vocab(rng.nextInt(vocab.length))).mkString(" ")
      (i, s"$head $body")
    }.toDF("doc_id", "text")
    docs500.createOrReplaceTempView("__a52_docs")
    val corpus = spark.sql(
      s"""SELECT doc_id, text FROM __a52_docs
         |UNION ALL
         |SELECT doc_id + ${ops.Dedup.TwinIdOffset},
         |       concat(substring(text, 1, 10), 'q', substring(text, 12))
         |FROM __a52_docs WHERE doc_id % 100 = 0""".stripMargin)
    val (edAgg, wEd) = wall(ops.Dedup.ddEditDistOn(corpus)
      .selectExpr("COUNT(*) AS pairs",
        s"SUM(CASE WHEN doc_b = doc_a + ${ops.Dedup.TwinIdOffset} " +
          "AND dist <= 1 THEN 1 ELSE 0 END) AS twins").head())
    require(edAgg.getLong(1) == 5000L,
      s"planted twins linked: ${edAgg.getLong(1)} of 5000")
    val blocks = corpus.selectExpr("length(text) div 16 AS lb",
      "substring(text, 1, 8) AS pk")
      .groupBy("lb", "pk").count()
      .agg(max("count").as("mx"), avg("count").as("mean")).head()
    println(f"PSCALE q=dd_editdist docs=505000 pairs=${edAgg.getLong(0)} " +
      f"twins=5000/5000 max_block=${blocks.getLong(0)} " +
      f"mean_block=${blocks.getDouble(1)}%.1f w=$wEd%.1f s")
    graft.SparkHygiene.clearSessionCaches(spark)

    // ---- mm_ahash at 100k REAL PNGs (+2k bright-corner twins): every
    // twin that links does so at a small Hamming distance, and the
    // planted pairs are found through the actual encode->decode walk
    val nImg = 100000L
    val pngs = spark.range(0L, nImg).flatMap { id =>
      def build(bright: Boolean): Array[Byte] = {
        val w = 16 + (id % 17).toInt
        val h = 16 + (id * 3 % 13).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val g0 = ((id * 31 + x * 7 + y * 13) % 256).toInt
            val g = if (bright && x * 8 / w == 0 && y * 8 / h == 0)
              math.min(255, g0 + 100) else g0
            img.setRGB(x, y, (g << 16) | (g << 8) | g)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        bos.toByteArray
      }
      val base = Seq(ops.Multimodal.MediaRecord(id, "image", build(false)))
      if (id % 50 == 0)
        base :+ ops.Multimodal.MediaRecord(
          id + ops.Multimodal.TwinOffset, "image", build(true))
      else base
    }
    val (ah, wAh) = wall(ops.Multimodal.mmAhashPairs(pngs)
      .selectExpr("COUNT(*) AS pairs",
        s"SUM(CASE WHEN media_b = media_a + ${ops.Multimodal.TwinOffset} " +
          "THEN 1 ELSE 0 END) AS twins",
        "MAX(hamming) AS mxham").head())
    require(ah.getLong(1) >= 1000L,
      s"too few planted twins linked: ${ah.getLong(1)} of 2000")
    require(ah.getLong(2) <= 3L, "banded verify admitted hamming > 3")
    println(f"PSCALE q=mm_ahash images=102000 pairs=${ah.getLong(0)} " +
      f"twin_links=${ah.getLong(1)}/2000 w=$wAh%.1f s")
    println("PSCALE addendum52 done")
    spark.stop()
  }

  /** Round-12: the shared DensityGuard measured in EXACTLY the two
    * blow-up regimes the r11 verdict flagged (templated-head record
    * linkage, aliasing image corpora), plus the BQ ladder's new
    * `nprobe` knob at 100k vectors. Content invariants asserted, not
    * just walls: fail-fast diagnostics must carry the unguarded pair
    * estimate; sampled runs must stay bounded AND keep the planted
    * twins that live in healthy (under-cap) blocks bit-exactly.
    */
  private def addendum53(dir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkHygiene.quietRddLogs()
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)

    // ---- dd_editdist on a TEMPLATED-HEAD corpus at 505k docs: half
    // the corpus is boilerplate-prefixed ("Subject: ..."), sharing the
    // 8-char block key and a handful of length buckets — the regime
    // the r11 verdict called out (log lines, form letters, templated
    // web pages). The other half is the diverse-head recipe with a
    // planted 1-substitution twin every 100th doc: twins live in
    // under-cap blocks, so the guard must keep ALL of them while
    // capping the templated class.
    val vocab = Array("key", "agg", "row", "scan", "slow", "fast",
      "table", "value", "part", "hash", "merge", "batch", "window",
      "spark", "order", "data", "column", "join", "small", "line")
    val nHalf = 250000L
    val docs = spark.range(0L, 2L * nHalf).map { i =>
      val rng = new scala.util.Random(2026L ^ (i * 0x9E3779B97F4A7C15L))
      val body = Array.fill(20 + rng.nextInt(40))(
        vocab(rng.nextInt(vocab.length))).mkString(" ")
      val text =
        if (i < nHalf) s"Subject: $body" // ONE shared 8-char prefix
        else f"t${math.abs(rng.nextLong()) % 20000}%05d $body"
      (i, text)
    }.toDF("doc_id", "text")
    docs.createOrReplaceTempView("__a53_docs")
    val corpus = spark.sql(
      s"""SELECT doc_id, text FROM __a53_docs
         |UNION ALL
         |SELECT doc_id + ${ops.Dedup.TwinIdOffset},
         |       concat(substring(text, 1, 10), 'q', substring(text, 12))
         |FROM __a53_docs WHERE doc_id % 100 = 0 AND doc_id >= $nHalf"""
        .stripMargin)
    // the templated class's block profile — the unguarded volume the
    // guard must prevent (reported from the fail-fast diagnostic too)
    val tb = corpus.where("substring(text, 1, 8) = 'Subject:'")
      .selectExpr("length(text) div 16 AS lb")
      .groupBy("lb").count()
      .agg(max("count"), sum(expr("count * (count - 1) / 2"))).head()
    println(f"PSCALE dd_editdist templated_class=${nHalf} " +
      f"max_block=${tb.getLong(0)} unguarded_pairs=${tb.getDouble(1)}%.3g")
    // fail-fast: abort BEFORE materializing any pair, estimate in text
    val t0 = System.nanoTime()
    val msg = try {
      ops.Dedup.ddEditDistOn(corpus, onOverflow = "fail").count()
      sys.error("templated corpus must trip the fail-fast guard")
    } catch {
      case e: IllegalStateException => e.getMessage
    }
    val wFail = (System.nanoTime() - t0) / 1e9
    require(msg.contains("dd_editdist density guard") &&
      msg.contains("pair volume"), s"weak diagnostic: $msg")
    println(f"PSCALE q=dd_editdist docs=505000 mode=fail " +
      f"fail_fast_w=$wFail%.1f s (no pair materialized; diagnostic " +
      "carries blocks + estimate)")
    graft.SparkHygiene.clearSessionCaches(spark)
    // sample (the default): completes bounded; every planted twin (all
    // in diverse under-cap blocks) still links at dist <= 1
    val (edAgg, wEd) = wall(ops.Dedup.ddEditDistOn(corpus)
      .selectExpr("COUNT(*) AS pairs",
        s"SUM(CASE WHEN doc_b = doc_a + ${ops.Dedup.TwinIdOffset} " +
          "AND dist <= 1 THEN 1 ELSE 0 END) AS twins").head())
    val capPairs = 1024L * 1024L / 2L // C(cap,2) per blown block, ~2^19
    val blownBlocks = 4L // observed lb spread of the templated class
    require(edAgg.getLong(1) == 2500L,
      s"planted diverse-block twins: ${edAgg.getLong(1)} of 2500 " +
        "(the guard must not touch under-cap blocks)")
    require(edAgg.getLong(0) < 20L * blownBlocks * capPairs,
      s"sampled pair volume not bounded: ${edAgg.getLong(0)}")
    println(f"PSCALE q=dd_editdist docs=505000 mode=sample " +
      f"pairs=${edAgg.getLong(0)} twins=2500/2500 " +
      f"(vs ${tb.getDouble(1)}%.3g unguarded) w=$wEd%.1f s")
    graft.SparkHygiene.clearSessionCaches(spark)

    // ---- mm_ahash on an ALIASING image corpus at 102k REAL PNGs: 100k
    // uniform-gray images (every aHash bit 0 — the white-product-shot /
    // document-scan class) + the addendum52 gradient twins (2k planted
    // pairs in healthy buckets). Unguarded, the uniform class alone is
    // 4 bands × C(100k,2) ≈ 2e10 candidate rows — the disk-fill mode;
    // addendum52 measured 30.9M pairs from far milder organic aliasing.
    val nImg = 100000L
    def gradient(id: Long, bright: Boolean): Array[Byte] = {
      val w = 16 + (id % 17).toInt
      val h = 16 + (id * 3 % 13).toInt
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g0 = ((id * 31 + x * 7 + y * 13) % 256).toInt
          val g = if (bright && x * 8 / w == 0 && y * 8 / h == 0)
            math.min(255, g0 + 100) else g0
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def uniform(id: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8 + (id % 9).toInt, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = (40 + id % 200).toInt // level varies; aHash is still all-0
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          img.setRGB(x, y, (g << 16) | (g << 8) | g); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = spark.range(0L, nImg).flatMap { id =>
      if (id < 50000L) // 50k uniform + 50k gradient (+1k twins each half)
        Seq(ops.Multimodal.MediaRecord(id, "image", uniform(id)))
      else {
        val base = Seq(
          ops.Multimodal.MediaRecord(id, "image", gradient(id, false)))
        if (id % 50 == 0)
          base :+ ops.Multimodal.MediaRecord(
            id + ops.Multimodal.TwinOffset, "image", gradient(id, true))
        else base
      }
    }
    // fail-fast first: the diagnostic must see the aliasing bands
    val t1 = System.nanoTime()
    val msg2 = try {
      ops.Multimodal.mmAhashPairs(media, onOverflow = "fail").count()
      sys.error("aliasing corpus must trip the fail-fast guard")
    } catch {
      case e: IllegalStateException => e.getMessage
    }
    val wFail2 = (System.nanoTime() - t1) / 1e9
    require(msg2.contains("mm_ahash density guard"), s"diagnostic: $msg2")
    graft.SparkHygiene.clearSessionCaches(spark)
    println(f"PSCALE q=mm_ahash images=101000 mode=fail " +
      f"fail_fast_w=$wFail2%.1f s (decode+count only, no pairs)")
    // sample: bounded at ~4 bands x C(cap,2) from the uniform class;
    // the gradient twins live in under-cap buckets and still link
    val (ah, wAh) = wall(ops.Multimodal.mmAhashPairs(media)
      .selectExpr("COUNT(*) AS pairs",
        s"SUM(CASE WHEN media_b = media_a + ${ops.Multimodal.TwinOffset} " +
          "THEN 1 ELSE 0 END) AS twins",
        "MAX(hamming) AS mxham").head())
    require(ah.getLong(2) <= 3L, "banded verify admitted hamming > 3")
    require(ah.getLong(1) >= 500L,
      s"planted gradient twins lost to the guard: ${ah.getLong(1)}/1000")
    val bound = 4L * 4096L * 4096L / 2L + 40000000L // blown bands + organic
    require(ah.getLong(0) < bound,
      s"sampled pair volume not bounded: ${ah.getLong(0)}")
    println(f"PSCALE q=mm_ahash images=101000 mode=sample " +
      f"pairs=${ah.getLong(0)} twin_links=${ah.getLong(1)}/1000 " +
      f"(vs ~2e10 unguarded candidates) w=$wAh%.1f s")
    graft.SparkHygiene.clearSessionCaches(spark)

    // ---- ss_ivfbq_topk at 100k vectors: the BQ ladder's new nprobe
    // knob (r11 verdict item #3), measured exactly like addendum51's
    // RQ cut — √N regime nlist=316, rescore exactness required
    val embPath = s"$dir/embeddings19.parquet"
    if (!new java.io.File(embPath).exists) {
      spark.range(0L, 100000L).map(vecFor(_, 64, 7, 2026L))
        .toDF("vec_id", "embedding", "label")
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(embPath)
    }
    val emb = spark.read.parquet(embPath).select("vec_id", "embedding")
    val (br, wBr) = wall(ops.Similarity.bruteTopkOn(spark, emb,
      "vec_id % 5000 = 0", topK = 5).collect())
    val brMap = br.map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    val brTop = brMap.keys.groupBy(_._1)
    def bqAt(nprobe: Int): (Double, Double) = {
      val (bq, w) = wall(ops.Similarity.ssBqTopkOn(spark, emb,
        "vec_id % 5000 = 0", topK = 5, mult = 12, nlist = 316,
        nprobe = nprobe).collect())
      bq.foreach { r =>
        val k = (r.getLong(0), r.getLong(1))
        brMap.get(k).foreach(b => require(b == r.getDouble(2),
          s"rescore drift at $k (nprobe=$nprobe)"))
      }
      val top = bq.map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      val rs = brTop.map { case (q, exact) =>
        val g = top.getOrElse(q, Array.empty).map(_._2).toSet
        exact.map(_._2).count(g) / exact.size.toDouble
      }
      graft.SparkHygiene.clearSessionCaches(spark)
      val rec = rs.sum / rs.size
      println(f"PSCALE q=ss_ivfbq_topk(nprobe=$nprobe,mult=12) " +
        f"vectors=100000 recall@5=$rec%.3f w=$w%.1f s")
      (rec, w)
    }
    val (bFull, wFull) = bqAt(0)
    val (b1, _) = bqAt(1)
    val (b8, w8) = bqAt(8)
    val (b32, _) = bqAt(32)
    require(b8 >= b1 && b32 >= b8,
      s"BQ nprobe dial not monotone at 100k: $b1 -> $b8 -> $b32")
    require(b32 >= bFull - 0.05,
      s"wide probe must recover the full-scan recall: $b32 vs $bFull")
    println(f"PSCALE bq cut: full=$bFull%.3f (w=$wFull%.1f s, 100k " +
      f"codes/query) nprobe8=$b8%.3f (w=$w8%.1f s, ~2.5k codes/query) " +
      f"brute_w=$wBr%.1f s")
    println("PSCALE addendum53 done")
    spark.stop()
  }

  /** Round-12 stretch op at 100×: dd_lines (corpus-wide duplicated-line
    * removal) on a 500k-doc pseudo-line corpus in the op's actual target
    * regime — a tenth of the corpus shares a 3-line site footer, every
    * 6th/15th doc carries a planted single-line boilerplate, and every
    * ORGANIC line embeds its (doc, position) so it is unique by
    * construction: the drop accounting must therefore be EXACT, not a
    * bound.
    */
  private def addendum54(): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkHygiene.quietRddLogs()
    import spark.implicits._

    val vocab = Array("key", "agg", "row", "scan", "slow", "fast",
      "table", "value", "part", "hash", "merge", "batch", "window",
      "spark", "order", "data", "column", "join", "small", "line")
    val footer = Seq(
      "home products pricing docs blog careers contact",
      "copyright two thousand twenty six example corp all rights reserved",
      "follow us on the usual networks for product updates")
    val news = "subscribe to our newsletter for weekly updates."
    val cook = "this site uses cookies to improve your experience."
    val n = 500000L
    val docs = spark.range(0L, n).map { id =>
      val rng = new scala.util.Random(2026L ^ (id * 0x9E3779B97F4A7C15L))
      val lines = (0 until 3 + rng.nextInt(6)).map { j =>
        s"u${id}p$j " + Array.fill(10)(
          vocab(rng.nextInt(vocab.length))).mkString(" ")
      }
      val withFooter =
        if (id % 10 == 0) lines ++ footer else lines
      val planted = withFooter ++
        (if (id % 6 == 0) Seq(news) else Nil) ++
        (if (id % 15 == 0) Seq(cook) else Nil)
      (id, planted.mkString("\n"))
    }.toDF("doc_id", "text")
    val (agg, w) = wall(ops.Dedup.ddLinesOn(docs)
      .selectExpr("COUNT(*) AS docs", "SUM(n_dropped) AS dropped",
        "SUM(n_lines) AS lines",
        s"SUM(CASE WHEN text_clean LIKE '%$news%' OR " +
          s"text_clean LIKE '%${footer.head}%' THEN 1 ELSE 0 END) " +
          "AS leaked").head())
    // exact accounting: footer 3 lines x n/10 carriers, news n/6
    // (ids 0, 6, ...: count = ceil), cookies n/15
    val expected = 3L * (n / 10) + ((n + 5) / 6) + ((n + 14) / 15)
    require(agg.getLong(0) == n, s"docs out: ${agg.getLong(0)}")
    require(agg.getLong(3) == 0L, s"boilerplate survived: ${agg.getLong(3)}")
    require(agg.getLong(1) == expected,
      s"dropped ${agg.getLong(1)} != expected $expected " +
        "(organic lines are unique by construction)")
    println(f"PSCALE q=dd_lines docs=$n lines=${agg.getLong(2)} " +
      f"dropped=${agg.getLong(1)}(=expected, exact) w=$w%.1f s")
    println("PSCALE addendum54 done")
    spark.stop()
  }

  /** Round-13 probes: (a) the train-once IVF codebook query-path A/B at
    * 100k vectors — the production pattern (ssIvfTrain once, parquet,
    * query many) vs the inline per-query retrain, results required
    * row-identical; (b) the MinHash band-join DensityGuard under a
    * mass-boilerplate 500k-doc corpus (identical texts alias a whole
    * class into one (band, bandhash) bucket per band — the unguarded
    * C(B,2)-per-band regime); (c) the ss_lsh_ann bucket guard under an
    * aliasing 100k-vector corpus. (b) and (c) are the two pair
    * generators the r12 guard sweep missed.
    */
  /** Listener delivery is async (the spec-tier awaitStats discipline):
    * poll until the guarded action's stats land or 15 s pass.
    */
  private def awaitGuardStats(tag: String,
      ok: ops.DensityGuard.GuardStats => Boolean)
      : Option[ops.DensityGuard.GuardStats] = {
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    var st = ops.DensityGuard.lastStats(tag)
    while (!st.exists(ok) && System.nanoTime() < deadline) {
      Thread.sleep(50)
      st = ops.DensityGuard.lastStats(tag)
    }
    st
  }

  private def addendum55(dir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkHygiene.quietRddLogs()
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)

    // ---- (a) train-once IVF at 100k (the addendum49/51 corpus) ----
    val embPath = s"$dir/embeddings19.parquet"
    if (!new java.io.File(embPath).exists) {
      spark.range(0L, 100000L).map(vecFor(_, 64, 7, 2026L))
        .toDF("vec_id", "embedding", "label")
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(embPath)
    }
    val emb = spark.read.parquet(embPath).select("vec_id", "embedding")
    val pred = "n.vec_id % 5000 = 0"
    // train ONCE at the √N sizing and pay the storage hop explicitly
    val (cent, wTrain) = wall(ops.Similarity.parquetRoundTrip(spark,
      ops.Similarity.ssIvfTrain(spark, emb, 316), "graft_a55_cent"))
    require(cent.count() == 316L, "codebook must hold nlist rows")
    println(f"PSCALE q=ss_ivf_train vectors=100000 nlist=316 " +
      f"w=$wTrain%.1f s (once; amortized over every query below)")
    def ab(name: String, inline: => Array[org.apache.spark.sql.Row],
           pre: => Array[org.apache.spark.sql.Row]): (Double, Double) = {
      val (ri, wi) = wall(inline)
      graft.SparkHygiene.clearSessionCaches(spark)
      val (rp, wp) = wall(pre)
      graft.SparkHygiene.clearSessionCaches(spark)
      require(ri.map(_.toString).toSeq == rp.map(_.toString).toSeq,
        s"$name: pretrained result differs from inline")
      println(f"PSCALE q=$name vectors=100000 inline_w=$wi%.1f s " +
        f"pretrained_w=$wp%.1f s speedup=${wi / wp}%.1fx " +
        "(row-identical)")
      (wi, wp)
    }
    val (wiAnn, wpAnn) = ab("ss_ivf_ann(316/8)",
      ops.Similarity.ssIvfAnnOn(spark, emb, pred, 5, nlist = 316,
        nprobe = 8).collect(),
      ops.Similarity.ssIvfAnnOn(spark, emb, pred, 5, nlist = 316,
        nprobe = 8, pretrained = Some(cent)).collect())
    val (wiRq, wpRq) = ab("ss_ivfrq_topk(316/8)",
      ops.Similarity.ssRqTopkOn(spark, emb, "vec_id % 5000 = 0", 5,
        nlist = 316, nCode = 64, mult = 12, nprobe = 8).collect(),
      ops.Similarity.ssRqTopkOn(spark, emb, "vec_id % 5000 = 0", 5,
        nlist = 316, nCode = 64, mult = 12, nprobe = 8,
        pretrained = Some(cent)).collect())
    // the contract: hoisting training can only help the query path —
    // and the train job itself must amortize within a few queries
    require(wpAnn <= wiAnn && wpRq <= wiRq,
      f"pretrained query path slower than inline: ann $wpAnn%.1f vs " +
        f"$wiAnn%.1f, rq $wpRq%.1f vs $wiRq%.1f")
    println(f"PSCALE ivf train-once summary: train=$wTrain%.1f s once; " +
      f"per-query savings ann=${wiAnn - wpAnn}%.1f s " +
      f"rq=${wiRq - wpRq}%.1f s — training cost amortizes after " +
      f"~${math.ceil(wTrain / math.max(0.1, wiAnn - wpAnn)).toInt} queries")

    // ---- (b) MinHash band guard under mass boilerplate at 500k ----
    // 100k docs of ONE boilerplate text (identical shingle sets ⇒ one
    // (band, bandhash) bucket per band: 4 × C(100k, 2) ≈ 2.0e10
    // unguarded candidates) + 400k diverse docs with a 80%-prefix twin
    // every 100th doc (the oracle's planting recipe) — twins live in
    // under-cap buckets and must ALL survive the guard.
    val vocab55 = Array("key", "agg", "row", "scan", "slow", "fast",
      "table", "value", "part", "hash", "merge", "batch", "window",
      "spark", "order", "data", "column", "join", "small", "line")
    val nBoiler = 100000L
    val nDiverse = 400000L
    val boiler = "please accept cookies to continue reading this " +
      "page content provided by the site operator all rights reserved"
    val docs55 = spark.range(0L, nBoiler + nDiverse).map { i =>
      if (i < nBoiler) (i, boiler)
      else {
        val rng = new scala.util.Random(2027L ^ (i * 0x9E3779B97F4A7C15L))
        val body = Array.fill(25 + rng.nextInt(30))(
          f"w${rng.nextInt(20000)}%05d" + vocab55(rng.nextInt(vocab55.length)))
          .mkString(" ")
        (i, body)
      }
    }.toDF("doc_id", "text")
    def corpusOf(base: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame = {
      base.createOrReplaceTempView("__a55_base")
      spark.sql(
        s"""SELECT doc_id, text FROM __a55_base
           |UNION ALL
           |SELECT doc_id + ${ops.Dedup.TwinIdOffset},
           |       array_join(slice(split(text, ' '), 1,
           |         (size(split(text, ' ')) * 4) div 5), ' ')
           |FROM __a55_base WHERE doc_id % 100 = 0 AND doc_id >= $nBoiler"""
          .stripMargin)
    }
    val corpus55 = corpusOf(docs55)
    // organic-recall baseline on the DIVERSE half alone: every bucket
    // is under-cap there, so the guard is inert and the twin count is
    // pure 4-band LSH recall on the 80%-prefix plant (a twin links only
    // if ≥1 band survives the cut — NOT 100% by construction). The
    // guarded full corpus must then find the SAME twin set: that
    // isolates the guard's effect exactly.
    val (baseRow, wBase) = wall(
      ops.Dedup.ddMinhashLshOn(corpusOf(docs55.where(s"doc_id >= $nBoiler")))
        .selectExpr(
          s"SUM(CASE WHEN doc_b = doc_a + ${ops.Dedup.TwinIdOffset} " +
            "THEN 1 ELSE 0 END) AS twins").head())
    val baseTwins = baseRow.getLong(0)
    require(baseTwins > 3800L,
      s"organic LSH twin recall unexpectedly low: $baseTwins")
    println(f"PSCALE dd_minhash_lsh diverse-only baseline twins=$baseTwins/4000 " +
      f"(organic 4-band recall on the 80%%-prefix plant) w=$wBase%.1f s")
    graft.SparkHygiene.clearSessionCaches(spark)
    // fail-fast: the diagnostic must name the blown buckets BEFORE any
    // candidate pair materializes
    val t0 = System.nanoTime()
    val msg = try {
      ops.Dedup.ddMinhashLshOn(corpus55, onOverflow = "fail").count()
      sys.error("boilerplate corpus must trip the band guard")
    } catch { case e: IllegalStateException => e.getMessage }
    val wFail = (System.nanoTime() - t0) / 1e9
    require(msg.contains("dd_minhash_band density guard") &&
      msg.contains("pair volume"), s"weak diagnostic: $msg")
    println(f"PSCALE q=dd_minhash_lsh docs=504000 mode=fail " +
      f"fail_fast_w=$wFail%.1f s (no candidate pair materialized)")
    graft.SparkHygiene.clearSessionCaches(spark)
    // sample (default): bounded, every under-cap twin kept, telemetry
    // reports the drops (the r12 observability item, probed at scale)
    val (mh, wMh) = wall(ops.Dedup.ddMinhashLshOn(corpus55)
      .selectExpr("COUNT(*) AS pairs",
        s"SUM(CASE WHEN doc_b = doc_a + ${ops.Dedup.TwinIdOffset} " +
          "THEN 1 ELSE 0 END) AS twins").head())
    require(mh.getLong(1) == baseTwins,
      s"under-cap twins: ${mh.getLong(1)} vs diverse-only baseline " +
        s"$baseTwins (the guard must not touch healthy buckets)")
    // bounded: the boilerplate class contributes ≤ 4 bands × C(cap, 2)
    // ≈ 33.5M distinct verified pairs (each band draws an independent
    // ~cap-doc sample; identical docs all pass verification) — vs
    // C(100k, 2) ≈ 5.0e9 verified pairs unguarded from that class alone
    require(mh.getLong(0) < 35000000L,
      s"sampled pair volume not bounded: ${mh.getLong(0)}")
    val gs = awaitGuardStats("dd_minhash_band", _.droppedRows > 0L)
    require(gs.exists(_.droppedRows > 0L),
      s"guard telemetry silent under a blown band: $gs")
    println(f"PSCALE q=dd_minhash_lsh docs=504000 mode=sample " +
      f"pairs=${mh.getLong(0)} twins=${mh.getLong(1)}/$baseTwins(baseline) " +
      f"dropped=${gs.get.droppedRows} max_block=${gs.get.maxBlockN} " +
      f"(vs ~2.0e10 unguarded candidates) w=$wMh%.1f s")
    graft.SparkHygiene.clearSessionCaches(spark)

    // ---- (c) ss_lsh_ann bucket guard under vector aliasing at 100k --
    // 50k copies of ONE vector alias into one 8-plane bucket
    // (C(50k,2) ≈ 1.2e9 unguarded in-bucket candidates at every probe
    // step) + the healthy clustered corpus for recoverable queries.
    val one = vecFor(7L, 64, 7, 2026L)._2
    val aliased = spark.range(0L, 100000L).map { i =>
      if (i < 50000L) (i, one)
      else (i, vecFor(i, 64, 7, 2026L)._2)
    }.toDF("vec_id", "embedding")
    val t1 = System.nanoTime()
    val msg2 = try {
      ops.Similarity.ssLshAnnOn(spark, aliased, nPlanes = 8,
        queryPred = "vec_id % 5000 = 1", topK = 5,
        onOverflow = "fail").count()
      sys.error("aliased corpus must trip the lsh bucket guard")
    } catch { case e: IllegalStateException => e.getMessage }
    val wFail2 = (System.nanoTime() - t1) / 1e9
    require(msg2.contains("ss_lsh_ann density guard"),
      s"weak diagnostic: $msg2")
    println(f"PSCALE q=ss_lsh_ann vectors=100000 mode=fail " +
      f"fail_fast_w=$wFail2%.1f s")
    graft.SparkHygiene.clearSessionCaches(spark)
    val (lsh, wLsh) = wall(ops.Similarity.ssLshAnnOn(spark, aliased,
      nPlanes = 8, queryPred = "vec_id % 5000 = 1", topK = 5).collect())
    require(lsh.nonEmpty, "guarded lsh returned nothing")
    val gs2 = awaitGuardStats("ss_lsh_ann", _.droppedRows > 0L)
    require(gs2.exists(_.droppedRows > 0L),
      s"lsh guard telemetry silent under a blown bucket: $gs2")
    println(f"PSCALE q=ss_lsh_ann vectors=100000 mode=sample " +
      f"rows=${lsh.length} dropped=${gs2.get.droppedRows} " +
      f"max_block=${gs2.get.maxBlockN} w=$wLsh%.1f s")
    graft.SparkHygiene.clearSessionCaches(spark)
    println("PSCALE addendum55 done")
    spark.stop()
  }

  /** Round-13 video rung at 100×: scene-cut detection over 100k REAL
    * Y4M clips — every payload is written and re-parsed byte-level
    * (headers, FRAME markers, C420 plane geometry), every planted cut
    * must be recovered EXACTLY (frame index, frame count, moved mass),
    * and the whole pass is one embarrassingly-parallel partition scan
    * (frames never leave their payload row — no shuffle before the
    * final aggregate).
    */
  private def addendum56(): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkHygiene.quietRddLogs()
    import spark.implicits._
    val n = 100000L
    // generate + parse in ONE pass (the payloads are deterministic, so
    // nothing needs materializing — the probe measures the real
    // write→parse→histogram walk, ~1.8 GB of raw frame bytes)
    val (agg, w) = wall {
      spark.range(0L, n).repartition(cpus.toInt).as[Long]
        .flatMap(id => ops.Multimodal.y4mSceneCuts(
          id, ops.Multimodal.y4mPlanted(id)))
        .toDF().createOrReplaceTempView("__a56_cuts")
      spark.sql(
        """SELECT COUNT(*) AS rows,
          |       COUNT(DISTINCT media_id) AS vids,
          |       SUM(CASE WHEN cut_frame =
          |             2 + (media_id % (5 + (media_id % 9)))
          |            AND n_frames = 8 + (media_id % 9)
          |            AND l1_moved = 2 * (16 + 2 * (media_id % 9))
          |                             * (12 + 2 * (media_id * 3 % 7))
          |           THEN 1 ELSE 0 END) AS exact
          |FROM __a56_cuts""".stripMargin).head()
    }
    require(agg.getLong(0) == n && agg.getLong(1) == n,
      s"expected one cut per clip: $agg")
    require(agg.getLong(2) == n,
      s"cuts not exact: ${agg.getLong(2)} of $n")
    println(f"PSCALE q=mm_video_scenes clips=$n cuts_exact=$n/$n " +
      f"w=$w%.1f s (REAL Y4M byte-level parse, zero shuffle)")
    println("PSCALE addendum56 done")
    spark.stop()
  }

  /** Round-13 follow-up: the RQ rung with the COMPLETE index hoisted —
    * addendum55 measured the coarse-codebook hoist (37.4 → 18.5 s at
    * 100k); this leg adds the residual-codebook hoist (ssRqTrain) and
    * quantifies what remains in-query (residuals, encode, probed ADC).
    * All three variants must be row-identical.
    */
  private def addendum57(dir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkHygiene.quietRddLogs()
    import spark.implicits._
    val embPath = s"$dir/embeddings19.parquet"
    if (!new java.io.File(embPath).exists) {
      spark.range(0L, 100000L).map(vecFor(_, 64, 7, 2026L))
        .toDF("vec_id", "embedding", "label")
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(embPath)
    }
    val emb = spark.read.parquet(embPath).select("vec_id", "embedding")
    val q = "vec_id % 5000 = 0"
    val (cent, wC) = wall(ops.Similarity.parquetRoundTrip(spark,
      ops.Similarity.ssIvfTrain(spark, emb, 316), "graft_a57_cent"))
    val (rcb, wR) = wall(ops.Similarity.parquetRoundTrip(spark,
      ops.Similarity.ssRqTrain(spark, emb, 316, nCode = 64,
        pretrained = Some(cent)), "graft_a57_rcb"))
    println(f"PSCALE ss_rq_train vectors=100000 coarse_w=$wC%.1f s " +
      f"residual_w=$wR%.1f s (each once)")
    def leg(name: String, pre: Option[org.apache.spark.sql.DataFrame],
            preRq: Option[org.apache.spark.sql.DataFrame])
        : (Array[org.apache.spark.sql.Row], Double) = {
      val (r, w) = wall(ops.Similarity.ssRqTopkOn(spark, emb, q, 5,
        nlist = 316, nCode = 64, mult = 12, nprobe = 8,
        pretrained = pre, pretrainedRq = preRq).collect())
      graft.SparkHygiene.clearSessionCaches(spark)
      println(f"PSCALE ss_ivfrq_topk(316/8) variant=$name w=$w%.1f s")
      (r, w)
    }
    val (rI, wI) = leg("inline", None, None)
    val (rCo, wCo) = leg("coarse-pretrained", Some(cent), None)
    val (rP, wP) = leg("pair-pretrained", Some(cent), Some(rcb))
    require(rI.map(_.toString).toSeq == rCo.map(_.toString).toSeq &&
      rI.map(_.toString).toSeq == rP.map(_.toString).toSeq,
      "RQ hoist variants differ")
    require(wP <= wCo && wCo <= wI * 1.2,
      f"hoist ladder not monotone: inline $wI%.1f coarse $wCo%.1f " +
        f"pair $wP%.1f")
    println(f"PSCALE rq hoist ladder: inline=$wI%.1f " +
      f"coarse=$wCo%.1f pair=$wP%.1f s (row-identical; " +
      f"pair speedup ${wI / wP}%.1fx)")
    println("PSCALE addendum57 done")
    spark.stop()
  }

  /** Round-10c ops at 100×: content invariants required, walls recorded. */
  private def addendum50(dir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkHygiene.quietRddLogs()
    import spark.implicits._

    val docs = spark.read.parquet(s"$dir/documents.parquet")

    // ds_groupsplit: 500k docs — group integrity must hold at scale
    val (gs, wGs) = wall(ops.Pipeline.dsGroupSplit(docs)
      .selectExpr("COUNT(*) AS n",
        "COUNT(DISTINCT source) AS srcs",
        "COUNT(DISTINCT concat(source, '|', split)) AS pairs").head())
    require(gs.getLong(0) == 500000L && gs.getLong(1) == gs.getLong(2),
      s"ds_groupsplit integrity at 500k: $gs")
    println(f"PSCALE q=ds_groupsplit docs=500000 groups=${gs.getLong(1)} " +
      f"w=$wGs%.1f s")
    graft.SparkHygiene.clearSessionCaches(spark)

    // ta_fertility: 500k docs — the merge fold stays vocabulary-sized;
    // word mass must reconcile with the corpus
    val merges = Seq((1, "t", "a"), (2, "ta", "b"), (3, "l", "e"))
      .toDF("merge_round", "lhs", "rhs")
    val (ft, wFt) = wall(ops.TextAnalysis.taFertility(
      docs.selectExpr("doc_id", "lang", "text"), merges).collect())
    require(ft.length == 5, s"ta_fertility langs: ${ft.length}")
    val totWords = ft.map(_.getLong(1)).sum
    require(totWords > 10000000L,
      s"ta_fertility word mass implausible: $totWords")
    ft.foreach { r =>
      require(r.getDouble(4) >= 1.0, s"fertility < 1: $r")
    }
    println(f"PSCALE q=ta_fertility docs=500000 words=$totWords " +
      f"w=$wFt%.1f s")
    graft.SparkHygiene.clearSessionCaches(spark)

    // ev_holtwinters: 10M events — the HOF fold with in-state seasonal
    // array; every output column must equal an independent Scala replay
    // over the same daily counts
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("timestamp_micros(ts div 1000) AS ts", "event_type")
    val (hw, wHw) = wall(ops.Sessionize.evHoltWinters(ev).collect())
    require(hw.length == 5, s"ev_holtwinters types: ${hw.length}")
    val daily = ev.selectExpr("event_type",
      "unix_micros(ts) div 86400000000 AS day")
      .groupBy("event_type", "day").count().collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq).toMap
    def replay(ys: Seq[Long]) = {
      val M = 1000000L
      val l0 = ys.take(7).sum * M / 7
      var (l, b, sae, t) = (l0, 0L, 0L, 7L)
      val sArr = ys.take(7).map(_ * M - l0).toArray
      ys.drop(7).foreach { y =>
        val slot = (t % 7).toInt
        sae += math.abs(y * M - (l + b + sArr(slot)))
        val lN = Math.floorDiv(y * M - sArr(slot) + l + b, 2L)
        val bN = Math.floorDiv((lN - l) + b, 2L)
        sArr(slot) = Math.floorDiv(y * M - lN + sArr(slot), 2L)
        l = lN; b = bN; t += 1
      }
      def r6(x: Double) = java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      (t, r6(l.toDouble / 1e6), r6(b.toDouble / 1e6),
        r6((l + b + sArr((t % 7).toInt)).toDouble / 1e6),
        if (t <= 7) 0.0 else r6(sae.toDouble / (1e6 * (t - 7))),
        r6((sArr.max - sArr.min).toDouble / 1e6))
    }
    hw.foreach { r =>
      val exp = replay(daily(r.getString(0)))
      val got = (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))
      require(got == exp, s"hw ${r.getString(0)}: $got != $exp")
    }
    println(f"PSCALE q=ev_holtwinters events=10000000 types=5 " +
      f"w=$wHw%.1f s (replay exact)")
    graft.SparkHygiene.clearSessionCaches(spark)

    // q60_anf: co-occurrence graph of a 1M-event subsample (10s nano
    // buckets) — sketch rounds over a multi-million-edge relation
    val ub = spark.read.parquet(s"$dir/events.parquet")
      .limit(1000000)
      .selectExpr("user_id", "ts div 10000000000L AS b").distinct()
    val und = graph.GraphQueries.cooccurPairs(ub)
    val (anf, wAnf) = wall(graph.GraphQueries.anfOn(und)
      .selectExpr("COUNT(*) AS n", "MIN(bits_sum) AS mn",
        "MAX(bits_sum) AS mx", "MAX(reach_est) AS rmax").head())
    require(anf.getLong(0) > 1000L, s"anf nodes: ${anf.getLong(0)}")
    require(anf.getLong(1) >= 0L && anf.getLong(2) <= 8L * 31L,
      s"anf bits out of range: $anf")
    println(f"PSCALE q=q60_anf nodes=${anf.getLong(0)} " +
      f"reach_max=${anf.getDouble(3)}%.0f w=$wAnf%.1f s")
    graft.SparkHygiene.clearSessionCaches(spark)

    // mm_histdiff: 100k REAL 32x24 PNG frames — the planted cuts (every
    // 16th frame) must flag EXACTLY through encode->decode->histogram
    val frames = spark.range(0L, 100000L)
      .map(ops.Multimodal.histDiffFrame(_))
    val (hd, wHd) = wall(ops.Multimodal.mmHistDiff(frames)
      .selectExpr("COUNT(*) AS n",
        "SUM(CASE WHEN is_cut THEN 1 ELSE 0 END) AS cuts",
        "SUM(CASE WHEN is_cut AND frame_id % 16 <> 0 THEN 1 ELSE 0 END)" +
          " AS falsecuts",
        "SUM(CASE WHEN NOT is_cut AND frame_id % 16 = 0 THEN 1 ELSE 0 " +
          "END) AS missed").head())
    require(hd.getLong(0) == 99999L, s"mm_histdiff pairs: $hd")
    require(hd.getLong(1) == 6249L && hd.getLong(2) == 0L &&
      hd.getLong(3) == 0L, s"mm_histdiff cut separation: $hd")
    println(f"PSCALE q=mm_histdiff frames=100000 cuts=6249 false=0 " +
      f"missed=0 w=$wHd%.1f s")
    println("PSCALE addendum50 done")
    spark.stop()
  }

  private def addendum25(dir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    // leg 1: sf0.1 supplier-part bipartite (sparse, ~21k nodes)
    val li = graft.Tables.load(spark, "/root/testdata/sf0.1", "lineitem")
    val fwd = li.selectExpr("l_suppkey AS src",
      "l_partkey + 1000000 AS dst").distinct()
    val sym = fwd.unionAll(fwd.selectExpr("dst AS src", "src AS dst"))
      .localCheckpoint(eager = true)
    val (c1, w1) = wall(graph.Coreness.run(spark, sym).collect())
    val m1 = c1.map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (k <- Seq(2L, m1.values.max / 2)) {
      val kc = graph.KCore.run(spark, sym, k.toInt).collect()
        .map(_.getLong(0)).toSet
      require(m1.filter(_._2 >= k).keySet == kc, s"bipartite k=$k mismatch")
    }
    println(f"PSCALE q=coreness(bipartite) t=$w1%.1f s nodes=${m1.size} " +
      s"max=${m1.values.max}")

    // leg 2: the DENSE 6-hour co-occurrence window graph (1.6M edges,
    // max degree in the thousands) — the round cost is the window sort
    // over each vertex's neighbor values, bounded by degree
    graft.Tables.load(spark, dir, "events").createOrReplaceTempView("__ev25")
    val windowed = spark.sql(
      """SELECT user_id, unix_micros(ts) div 10000000 AS b
        |FROM __ev25 CROSS JOIN (SELECT MIN(ts) AS t0 FROM __ev25)
        |WHERE ts < t0 + INTERVAL 6 HOUR""".stripMargin).distinct()
    val und = graph.GraphQueries.cooccurPairs(windowed)
    val sym2 = und.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(und.select(col("v").as("src"), col("u").as("dst")))
      .localCheckpoint(eager = true)
    val (c2, w2) = wall(graph.Coreness.run(spark, sym2).collect())
    val m2 = c2.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kMid = (m2.values.max / 2).toInt
    val kc2 = graph.KCore.run(spark, sym2, kMid).collect()
      .map(_.getLong(0)).toSet
    require(m2.filter(_._2 >= kMid).keySet == kc2, s"dense k=$kMid mismatch")
    println(f"PSCALE q=coreness(window) t=$w2%.1f s nodes=${m2.size} " +
      s"max=${m2.values.max} (1.6M-edge dense graph, k=$kMid cross-check)")

    println("PSCALE addendum25 done")
    spark.stop()
  }

  /** Fifth continuation batch at 100×: decay scores stay under the
    * geometric limit, the vocabulary-overlap matrix stays C(sources,2)-
    * sized, and the ingest-bias Pearson reads ~0 on the id-independent
    * generator and fires on a planted id-correlated truncation.
    */
  private def addendum24(dir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val events = graft.Tables.load(spark, dir, "events")
    val (dcR, dcW) = wall(ops.Sessionize.evDecay(events).collect())
    require(dcR.nonEmpty, "decay empty")
    dcR.foreach { r =>
      // the exact mass is < 2 but a full-month-active user's
      // 2 - 2^-29 ROUNDS to 2.0 at 6 dp — the bound on rounded values
      // is inclusive
      require(r.getDouble(2) > 0.0 && r.getDouble(2) <= 2.0,
        s"score ${r.getDouble(2)} out of the geometric bound")
    }
    println(f"PSCALE q=ev_decay t=$dcW%.1f s users=${dcR.length} " +
      f"max=${dcR.map(_.getDouble(2)).max}%.6f (<= 2 rounded geometric limit)")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "text")
    val (vjR, vjW) = wall(
      ops.TextAnalysis.taVocabJaccard(docs.select("source", "text"))
        .collect())
    require(vjR.length == 45, s"vocab pairs ${vjR.length}") // C(10,2)
    println(f"PSCALE q=ta_vocabjaccard t=$vjW%.1f s pairs=45 " +
      f"min=${vjR.map(_.getDouble(4)).min}%.4f " +
      f"max=${vjR.map(_.getDouble(4)).max}%.4f (shared zipf vocab)")

    // ingest bias: null case ~0 on the id-independent generator
    val (ibR, ibW) = wall(
      ops.Pipeline.dsIngestBias(docs.select("doc_id", "text")).collect())
    val r0 = ibR(0).getDouble(1)
    require(math.abs(r0) < 0.02, s"null ingest bias $r0 not ~0")
    // planted trend: truncate each doc to 5 + doc_id/5000 tokens — a
    // monotone length drift across ingest order (the crawl-shrink story)
    import org.apache.spark.sql.functions._
    val planted = docs.select(col("doc_id"),
      expr("array_join(slice(split(text, ' '), 1, " +
        "5 + CAST(doc_id div 5000 AS INT)), ' ')").as("text"))
    val (pbR, pbW) = wall(
      ops.Pipeline.dsIngestBias(planted).collect())
    val r1 = pbR(0).getDouble(1)
    require(math.abs(r1) > 5 * math.abs(r0).max(0.001),
      s"planted trend $r1 did not separate from null $r0")
    println(f"PSCALE q=ds_ingestbias t=$ibW%.1f s null=$r0%.5f " +
      f"planted=$r1%.4f (t=$pbW%.1f s)")

    println("PSCALE addendum24 done")
    spark.stop()
  }

  /** Fourth continuation batch at 100×: the SRM chi-square on a healthy
    * hash split stays under its critical value, the hamming histogram's
    * ≤3 cut replays dd_simhash_pairs exactly, and the media resolve
    * collapses every planted pHash twin.
    */
  private def addendum23(dir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ev_srm: 15k users, healthy hash split -> chi2 under 6.635
    val events = graft.Tables.load(spark, dir, "events")
    val (srmR, srmW) = wall(ops.Sessionize.evSrm(events).collect())
    val (na, nb, chi2, srm) = (srmR(0).getLong(0), srmR(0).getLong(1),
      srmR(0).getDouble(2), srmR(0).getBoolean(3))
    require(!srm && chi2 < 6.635, s"healthy split flagged: chi2=$chi2")
    println(f"PSCALE q=ev_srm t=$srmW%.1f s na=$na nb=$nb chi2=$chi2%.3f " +
      "srm=false (healthy split)")

    // dd_hamming_hist on the 1M twin corpus: cum monotone; the <=3 cut
    // must equal dd_simhash_pairs' own pair count (same signatures)
    val (hhR, hhW) = wall(ops.Dedup.ddHammingHist(spark, dir).collect())
    var run = 0L
    hhR.foreach { r => run += r.getLong(1)
      require(r.getLong(2) == run, "cum broken") }
    val cut3 = hhR.filter(_.getLong(0) <= 3).map(_.getLong(1)).sum
    val (nPairs, spW) = wall(ops.Dedup.ddSimhashPairs(spark, dir).count())
    require(cut3 == nPairs, s"hist cut $cut3 != pairs $nPairs")
    println(f"PSCALE q=dd_hamming_hist t=$hhW%.1f s buckets=${hhR.length} " +
      s"candidates=$run cut3=$cut3 == pairs (pairs leg ${spW.round} s)")

    // mm_resolve on 1M media (500k + planted twins): every twin pair
    // collapses; canon is idempotent
    val (mrR, mrW) = wall(ops.Multimodal.mmResolve(spark, dir).collect())
    val canon = mrR.map(r => r.getLong(0) -> r.getLong(1)).toMap
    canon.values.foreach(c => require(canon(c) == c, "canon not idempotent"))
    val twins = canon.keys.count(_ >= ops.Multimodal.TwinOffset)
    println(f"PSCALE q=mm_resolve t=$mrW%.1f s clustered=${mrR.length} " +
      s"(twin-side members $twins)")

    println("PSCALE addendum23 done")
    spark.stop()
  }

  /** Third continuation batch at 100×: the KS audit must read ~0 on the
    * null (a pure hash split) and ≫ 0 on a planted split-correlated
    * length drift; the arrival-memory test must read ~0 on the Poisson
    * generator; component sizes roll up from the star graph CC labels.
    */
  private def addendum22(dir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")

    // ds_splitdrift NULL case: a pure hash split of one distribution —
    // D must sit under the 99% KS band 1.63*sqrt((na+nb)/(na*nb))
    val (sdR, sdW) = wall(ops.Pipeline.dsSplitDrift(docs).collect())
    val (na, nb, d0) =
      (sdR(0).getLong(0), sdR(0).getLong(1), sdR(0).getDouble(2))
    val band = 1.63 * math.sqrt((na + nb).toDouble / (na.toDouble * nb))
    require(d0 < band, s"null-split D $d0 above the 99% band $band")
    println(f"PSCALE q=ds_splitdrift t=$sdW%.1f s null D=$d0%.5f " +
      f"(99%% band $band%.5f, na=$na nb=$nb)")

    // planted drift: group-1 docs (same hash rule) get 50 tokens
    // appended — D must leave the noise floor by an order of magnitude
    docs.createOrReplaceTempView("__a22_docs")
    val pad = (1 to 50).map(i => "drift" + i).mkString(" ")
    val drifted = spark.sql(
      s"""SELECT doc_id,
         |       CASE WHEN ((instr('0123456789abcdef', substring(h, 1, 1))
         |                   - 1) * 16
         |                  + instr('0123456789abcdef', substring(h, 2, 1))
         |                  - 1) % 2 = 1
         |            THEN concat(text, ' $pad') ELSE text END AS text
         |FROM (SELECT doc_id, text,
         |             md5(concat('drift:', CAST(doc_id AS STRING))) AS h
         |      FROM __a22_docs)""".stripMargin)
    val (plR, plW) = wall(ops.Pipeline.dsSplitDrift(drifted).collect())
    val d1 = plR(0).getDouble(2)
    require(d1 > 10 * band, s"planted drift D $d1 did not surface")
    println(f"PSCALE q=ds_splitdrift(planted) t=$plW%.1f s D=$d1%.4f " +
      "(50-token drift on one split half)")

    val events = graft.Tables.load(spark, dir, "events")

    // ev_lifespan: one user aggregate at 10M events; at 666 events/user
    // over 30 days every lifespan concentrates at the top buckets
    val (lfR, lfW) = wall(ops.Sessionize.evLifespan(events).collect())
    require(lfR.nonEmpty, "lifespan empty")
    val spanNodes = lfR.map(_.getLong(1)).sum
    println(f"PSCALE q=ev_lifespan t=$lfW%.1f s buckets=${lfR.length} " +
      s"users=$spanNodes top_bucket=${lfR.map(_.getLong(0)).max}")

    // ev_autocorr at 43k minute pairs per type: a truly memoryless feed
    // reads |r| ≲ 3/sqrt(n) ≈ 0.015. The probe's evFor generator does
    // NOT — java.util.Random's first-draw-per-sequential-seed structure
    // leaves a measurable minute-scale anti-correlation (~ −0.08), which
    // this op exists to catch; the DuckDB-generated sf corpora read
    // |r| < 0.005 (spec-locked). Record the artifact, require defined
    // values and a bounded magnitude.
    val (acR, acW) = wall(ops.Sessionize.evAutocorr(events).collect())
    require(acR.length == 5, s"autocorr rows ${acR.length}")
    acR.foreach { r =>
      require(!r.isNullAt(2) && math.abs(r.getDouble(2)) < 0.2,
        s"autocorr ${r.getString(0)} = ${r.getDouble(2)} out of band")
    }
    println(f"PSCALE q=ev_autocorr t=$acW%.1f s types=5 " +
      acR.map(r => f"${r.getString(0)}=${r.getDouble(2)}%.4f")
        .mkString(" ") + " (evFor PRNG artifact made visible)")

    // ss_labelsep: the 7-label gaussian mixture MUST separate — same-
    // label mean cosine above cross-label
    val emb = spark.read.parquet(s"$dir/embeddings19.parquet")
    val (lsR, lsW) = wall(ops.Similarity.ssLabelSep(emb).collect())
    val bySame = lsR.map(r => r.getBoolean(0) -> r.getDouble(2)).toMap
    require(bySame(true) > bySame(false),
      s"labelsep inverted: $bySame")
    println(f"PSCALE q=ss_labelsep t=$lsW%.1f s same=${bySame(true)}%.4f " +
      f"cross=${bySame(false)}%.4f")

    // component-size histogram off the full 30-day star graph (linear
    // edges — the construction that makes CC safe where the clique
    // detonates): sizes must account for every participating user
    events.createOrReplaceTempView("__ev22")
    val users = spark.sql(
      """SELECT user_id, unix_micros(ts) div 10000000 AS b
        |FROM __ev22""".stripMargin).distinct()
    val nPart = users.select("user_id").distinct().count()
    val (cdR, cdW) = wall {
      graph.ConnectedComponents
        .run(spark, graph.GraphQueries.ccStarEdges(users), maxIter = 30)
        .createOrReplaceTempView("__a22_comp")
      spark.sql(
        """WITH sizes AS (
          |  SELECT comp, COUNT(*) AS sz FROM __a22_comp GROUP BY comp)
          |SELECT CAST(length(bin(sz)) - 1 AS BIGINT) AS bucket,
          |       COUNT(*) AS n_comps, SUM(sz) AS n_nodes
          |FROM sizes GROUP BY 1 ORDER BY bucket""".stripMargin).collect()
    }
    val nodes = cdR.map(_.getLong(2)).sum
    require(nodes == nPart, s"compdist nodes $nodes != participants $nPart")
    println(f"PSCALE q=compdist t=$cdW%.1f s users=$nodes " +
      s"buckets=${cdR.length} giant=${cdR.map(_.getLong(0)).max}")

    println("PSCALE addendum22 done")
    spark.stop()
  }

  /** The six closing round-7 ops, all with vocabulary/grid-bounded
    * outputs: the invariant at 100× is that each one's OUTPUT stays
    * metadata-sized while the corpus pass scales linearly.
    */
  private def addendum18(dir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ta_jsd: sources×1 rows; jsd in [0,1] bits; zipf sources are drawn
    // from one distribution, so every divergence is small
    val (jsd, jw) = wall(ops.TextAnalysis.taJsd(spark, dir).collect())
    require(jsd.nonEmpty, "jsd empty")
    require(jsd.forall(r => r.getDouble(2) >= 0 && r.getDouble(2) <= 1.0),
      "jsd out of [0,1]")
    println(f"PSCALE q=ta_jsd t=$jw%.1f s sources=${jsd.length} " +
      f"max=${jsd.map(_.getDouble(2)).max}%.4f (same-generator sources stay close)")

    // ta_burstiness: 20 rows at any corpus; fano >= 0, replayed exactly
    val nDocs = graft.Tables.load(spark, dir, "documents").count()
    val (bu, bw) = wall(ops.TextAnalysis.taBurstiness(spark, dir).collect())
    require(bu.length == 20, s"burstiness rows ${bu.length}")
    bu.foreach { r =>
      val (tf, df, fano) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      require(df <= nDocs && tf >= df && fano >= 0, s"burstiness row broken")
    }
    println(f"PSCALE q=ta_burstiness t=$bw%.1f s rows=20 " +
      f"maxfano=${bu.map(_.getDouble(3)).max}%.3f")

    // ta_heaps: 10 rows; curves monotone; final row closes to totals
    val (hp, hw) = wall(ops.TextAnalysis.taHeaps(spark, dir).collect())
    require(hp.length == 10, s"heaps rows ${hp.length}")
    Seq(1, 2, 3).foreach { i =>
      val xs = hp.map(_.getLong(i)).toSeq
      require(xs == xs.sorted, s"heaps column $i not monotone")
    }
    require(hp.last.getLong(1) == nDocs, "heaps does not close to the corpus")
    println(f"PSCALE q=ta_heaps t=$hw%.1f s vocab(final)=${hp.last.getLong(3)} " +
      s"docs(final)=${hp.last.getLong(1)}")

    // ev_daily_top: groups × k rows; ranks dense, counts non-increasing
    val (dt, dw) = wall(ops.Sessionize.evDailyTop(spark, dir).collect())
    require(dt.nonEmpty, "daily_top empty")
    dt.groupBy(r => (r.getString(0), r.getLong(1))).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getLong(4))
      require(byRank.length <= 3 &&
        byRank.map(_.getLong(4)).toSeq == (1L to byRank.length),
        "rank not dense")
      val ns = byRank.map(_.getLong(3)).toSeq
      require(ns == ns.sorted.reverse, "counts not non-increasing")
    }
    println(f"PSCALE q=ev_daily_top t=$dw%.1f s rows=${dt.length} " +
      s"cells=${dt.map(r => (r.getString(0), r.getLong(1))).distinct.length}")

    // ev_churn: users-bounded; label algebra corpus-wide
    val (ch, cw) = wall(ops.Sessionize.evChurn(spark, dir).collect())
    require(ch.nonEmpty, "churn empty")
    require(ch.forall(r => r.getBoolean(3) == (r.getLong(2) == 0)),
      "churn label broken")
    println(f"PSCALE q=ev_churn t=$cw%.1f s users=${ch.length} " +
      s"churned=${ch.count(_.getBoolean(3))}")

    // ev_overlap: type-pair rows; jaccard replay
    val (ov, ow) = wall(ops.Sessionize.evOverlap(spark, dir).collect())
    require(ov.nonEmpty, "overlap empty")
    ov.foreach { r =>
      val (b, na, nb, j) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      require(b <= math.min(na, nb), "intersection exceeds audience")
      val want = BigDecimal(b.toDouble / (na + nb - b))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      require(j == want, "jaccard does not replay")
    }
    println(f"PSCALE q=ev_overlap t=$ow%.1f s pairs=${ov.length}")

    println("PSCALE addendum18 done")
    spark.stop()
  }

  /** Round-7 new-op legs at 100× the bench SF: generates a fresh zipf
    * corpus + event stream (the addendum15 generators), then runs each
    * new operator's REAL query path with its scale invariant.
    */
  private def addendum17(nDocs: Int, nEvents: Int, outBase: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val seed = 2026L
    val dir = s"$outBase/sf$nDocs"
    spark.range(0L, nDocs.toLong).map(docFor(_, seed))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val nUsers = scala.math.max(100, nEvents / 666)
    spark.range(0L, nEvents.toLong).map(evFor(_, nUsers, seed))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    println(s"PSCALE gen17 nDocs=$nDocs nEvents=$nEvents")

    // ta_colloc: count relations are vocabulary-sized at ANY corpus —
    // the planted pair must carry the table's max lift
    val (colloc, cw) = wall(ops.TextAnalysis.taColloc(spark, dir).collect())
    require(colloc.nonEmpty, "colloc empty")
    val maxLift = colloc.map(_.getDouble(5)).max
    val planted = colloc.find(r =>
      r.getString(0) == "aurora" && r.getString(1) == "borealis")
    require(planted.exists(_.getDouble(5) == maxLift),
      "planted collocation does not dominate")
    println(f"PSCALE q=ta_colloc t=$cw%.1f s rows=${colloc.length} " +
      f"planted lift=${planted.get.getDouble(5)}%.1f (table max)")

    // ta_winnow: fingerprint density ~2/(w+1); the paper's coverage bound
    // (no gap over w between selected positions) must hold corpus-wide
    val (_, ww) = wall {
      ops.TextAnalysis.taWinnow(spark, dir)
        .write.mode("overwrite").parquet(s"$dir/results/ta_winnow.parquet")
    }
    val fp = spark.read.parquet(s"$dir/results/ta_winnow.parquet")
    fp.createOrReplaceTempView("__fp17")
    val nFp = fp.count()
    val badGap = spark.sql(
      """SELECT COUNT(*) FROM (
        |  SELECT pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)
        |           AS gap
        |  FROM __fp17)
        |WHERE gap > 4""".stripMargin).head().getLong(0)
    require(badGap == 0, s"$badGap fingerprint gaps exceed the window")
    val nGrams = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("SUM(GREATEST(size(split(text, ' ')) - 2, 0)) AS g")
      .head().getLong(0)
    val density = nFp.toDouble / nGrams
    require(density > 0.2 && density < 0.6,
      f"winnow density $density%.3f outside the 2/(w+1) band")
    println(f"PSCALE q=ta_winnow t=$ww%.1f s fp=$nFp " +
      f"density=$density%.3f (theory 0.4) maxgap<=4 corpus-wide")

    // ev_survival: the risk-set table is duration-vocabulary-sized; risk
    // sets strictly decrease and bins close to the subject total
    val (surv, sw) = wall(ops.Sessionize.evSurvival(spark, dir).collect())
    require(surv.nonEmpty, "survival empty")
    val risks = surv.map(_.getLong(1)).toSeq
    require(risks == risks.sorted.reverse, "risk sets not non-increasing")
    require(surv.map(_.getLong(2)).sum == risks.head,
      "uncensored bins do not close to the subject total")
    println(f"PSCALE q=ev_survival t=$sw%.1f s bins=${surv.length} " +
      s"subjects=${risks.head} (risk sets monotone, bins close)")

    // mm_align: one segment per frame, exactly — parity with the frame
    // relation at media scale
    val (nFrames, fw) = wall(ops.Multimodal.mmFrames(spark, dir).count())
    val (al, aw) = wall {
      ops.Multimodal.mmAlign(spark, dir)
        .write.mode("overwrite").parquet(s"$dir/results/mm_align.parquet")
      spark.read.parquet(s"$dir/results/mm_align.parquet")
    }
    val nAl = al.count()
    require(nAl == nFrames, s"aligned $nAl != frames $nFrames")
    val dup = nAl - al.select("media_id", "frame_idx").distinct().count()
    require(dup == 0, s"$dup frames aligned to more than one segment")
    println(f"PSCALE q=mm_align t=$aw%.1f s frames=$nFrames " +
      f"(frame pass $fw%.1f s) one-segment-per-frame exact")

    // ds_softdedup: the full simhash+resolve chain at corpus scale, then
    // the weight algebra corpus-wide in SQL (no driver collect)
    val (sd, dw) = wall {
      ops.Pipeline.dsSoftDedup(spark, dir)
        .write.mode("overwrite").parquet(s"$dir/results/ds_softdedup.parquet")
      spark.read.parquet(s"$dir/results/ds_softdedup.parquet")
    }
    sd.createOrReplaceTempView("__sd17")
    val badW = spark.sql(
      """SELECT COUNT(*) FROM __sd17
        |WHERE weight <> ROUND(CAST(1 AS DOUBLE) / cluster_size, 6)""".stripMargin)
      .head().getLong(0)
    require(badW == 0, s"$badW rows break the 1/n weight algebra")
    val agg = spark.sql(
      "SELECT COUNT(*), SUM(weight), SUM(CASE WHEN cluster_size >= 2 " +
        "THEN 1 ELSE 0 END) FROM __sd17").head()
    val (rows, mass, clustered) =
      (agg.getLong(0), agg.getDouble(1), agg.getLong(2))
    require(mass < rows && clustered > 0, "no dedup mass reduction")
    println(f"PSCALE q=ds_softdedup t=$dw%.1f s rows=$rows " +
      f"effective=$mass%.0f clustered=$clustered")

    println("PSCALE addendum17 done")
    spark.stop()
  }

  private def addendum16(dir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // dd_crossfuzzy: odd docs (with the %10=5 near-dup planting) vs even
    // refs — 250k × 250k at nDocs=500k
    graft.Tables.load(spark, dir, "documents")
      .createOrReplaceTempView("__docs16")
    val corpus = spark.sql(
      """SELECT a.doc_id,
        |       CASE WHEN a.doc_id % 10 = 5
        |            THEN concat(b.text, ' zz qq ww')
        |            ELSE a.text END AS text
        |FROM __docs16 a LEFT JOIN __docs16 b ON b.doc_id = a.doc_id - 1
        |WHERE a.doc_id % 2 = 1""".stripMargin)
    val ref = spark.sql(
      "SELECT doc_id, text FROM __docs16 WHERE doc_id % 2 = 0")
    val t0 = System.nanoTime()
    val cf = ops.Dedup.ddCrossFuzzy(corpus, ref)
      .localCheckpoint(eager = true)
    val nC = cf.count()
    val cfWall = (System.nanoTime() - t0) / 1e9
    val flagged = cf.filter("n_matches > 0")
    val nFlagged = flagged.count()
    val planted = cf.filter("doc_id % 10 = 5 AND doc_id >= 5").count()
    val plantedHit = cf.filter(
      "doc_id % 10 = 5 AND doc_id >= 5 AND n_matches > 0").count()
    // LSH is probabilistic: a 20-token doc's 4-band signature misses its
    // near-dup with p ≈ 0.3^4 ≈ 0.6 % — at 50k plants a handful of
    // misses IS the honest contract (first run: 4 of 50,000, recall
    // 0.99992). Lock recall, not perfection.
    require(plantedHit * 1000 >= planted * 999,
      s"planted recall collapsed: $plantedHit of $planted")
    val badRef = flagged.filter("best_ref % 2 <> 0").count()
    require(badRef == 0, s"$badRef flags point at a non-reference doc")
    println(f"PSCALE q=dd_crossfuzzy t=$cfWall%.1f s corpus=$nC " +
      s"flagged=$nFlagged planted=$planted hit=$plantedHit " +
      "(refs all even)")

    // mm_shard at 500k media: tiling invariant in SQL — every shard
    // starts at 0 and its member sizes sum exactly to its byte span
    val media = spark.sql(
      "SELECT doc_id AS media_id, encode(text, 'UTF-8') AS payload " +
        "FROM __docs16")
    val t1 = System.nanoTime()
    val manifest = ops.Multimodal.mmShard(media, groups = 32,
      budgetBytes = 1L << 20)
      .localCheckpoint(eager = true)
    val nM = manifest.count()
    val shWall = (System.nanoTime() - t1) / 1e9
    manifest.createOrReplaceTempView("__manifest16")
    val tile = spark.sql(
      """SELECT COUNT(*) AS bad FROM (
        |  SELECT shard_id,
        |         MIN(offset_bytes) AS mn,
        |         MAX(offset_bytes + n_bytes) AS mxe,
        |         SUM(n_bytes) AS total
        |  FROM __manifest16 GROUP BY shard_id)
        |WHERE mn <> 0 OR mxe <> total""".stripMargin).head().getLong(0)
    require(tile == 0, s"$tile shards break the tiling invariant")
    val nShards = spark.sql(
      "SELECT COUNT(DISTINCT shard_id) FROM __manifest16").head().getLong(0)
    println(f"PSCALE q=mm_shard t=$shWall%.1f s members=$nM " +
      s"shards=$nShards tiling exact (32 writer groups, 1 MiB budget)")

    // ev_ewma at 10M events: output days×types; the closed form must
    // equal the sequential recurrence EXACTLY on the collected rows
    val t2 = System.nanoTime()
    val ew = ops.Sessionize.evEwma(spark, dir).collect()
    val ewWall = (System.nanoTime() - t2) / 1e9
    ew.groupBy(_.getString(0)).foreach { case (_, rows) =>
      var e = rows.head.getLong(2).toDouble
      rows.zipWithIndex.foreach { case (r, i) =>
        if (i > 0) e = 0.5 * r.getLong(2) + 0.5 * e
        require(r.getDouble(3) == e,
          s"closed form diverged from the recurrence at row $i")
      }
    }
    println(f"PSCALE q=ev_ewma t=$ewWall%.1f s rows=${ew.length} " +
      "closed form == recurrence bit-for-bit")

    // ev_dow at 10M events: 7×types rows, shares close to 1 per type
    val t3 = System.nanoTime()
    val dw = ops.Sessionize.evDow(spark, dir).collect()
    val dwWall = (System.nanoTime() - t3) / 1e9
    require(dw.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= 7),
      "dow out of ISO range")
    dw.groupBy(_.getString(0)).foreach { case (t, rows) =>
      require(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-4,
        s"shares for $t do not close")
    }
    println(f"PSCALE q=ev_dow t=$dwWall%.1f s rows=${dw.length}")

    println("PSCALE addendum16 done")
    spark.stop()
  }

  private def zipfLeg(dir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val rows = ops.TextAnalysis.taZipf(spark, dir).collect()
    println(f"PSCALE q=ta_zipf t=${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"rows=${rows.length} top_tf=${rows.head.getLong(2)} " +
      s"rel20=${rows.last.getDouble(4)}")
    spark.stop()
  }

  /** Scale legs for the eighth ops batch: ta_zipf / ev_bots at corpus
    * scale, exact mutual-kNN at 5× the bench corpus, and integer HITS on
    * a skewed synthetic bipartite graph ~17× the sf0.1 feed. Invariants,
    * not just wall-clock: zipf stays 20 rows with a dense rank order,
    * bots flags exactly the planted metronomic cohort (zero false
    * positives against exponential-ish natural traffic), every kNN edge
    * is reciprocal within rank k and the edge count respects the k·N/2
    * budget, and HITS max-normalization pins both score relations to
    * SCALE with everything in range.
    */
  private def addendum15(nDocs: Int, nEvents: Int, nVec: Int,
      outBase: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val seed = 2026L
    val dir = s"$outBase/sf$nDocs"
    spark.range(0L, nDocs.toLong).map(docFor(_, seed))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val nUsers = scala.math.max(100, nEvents / 666)
    spark.range(0L, nEvents.toLong).map(evFor(_, nUsers, seed))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    spark.range(0L, nVec.toLong).map(vecFor(_, 64, 10, seed))
      .toDF("vec_id", "embedding", "label")
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    println(s"PSCALE gen15 nDocs=$nDocs nEvents=$nEvents nVec=$nVec")

    def timed(tag: String)(df: => org.apache.spark.sql.DataFrame): Long = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").parquet(s"$dir/results/$tag.parquet")
      val rows = spark.read.parquet(s"$dir/results/$tag.parquet").count()
      println(f"PSCALE q=$tag t=${(System.nanoTime() - t0) / 1e9}%.1f s " +
        s"rows=$rows")
      rows
    }

    // ta_zipf: the output is 20 rows at ANY corpus size — the aggregate
    // is vocabulary-sized, the cut is a TakeOrderedAndProject
    timed("ta_zipf")(ops.TextAnalysis.taZipf(spark, dir))
    val zipf = spark.read.parquet(s"$dir/results/ta_zipf.parquet")
      .orderBy("rank").collect()
    require(zipf.length == 20, s"zipf rows ${zipf.length} != 20")
    require(zipf.map(_.getLong(0)).toSeq == (1L to 20L), "ranks not dense")
    val tfs = zipf.map(_.getLong(2)).toSeq
    require(tfs == tfs.sorted.reverse, "tf not non-increasing")
    println(s"PSCALE zipf top tf=${tfs.head} rel20=${zipf.last.getDouble(4)}")

    // ev_bots: the planted metronomic cohort (user_id % 29 = 3) flags,
    // natural exponential-ish traffic does not — at ANY event volume
    timed("ev_bots")(ops.Sessionize.evBots(spark, dir))
    val bots = spark.read.parquet(s"$dir/results/ev_bots.parquet").collect()
    val flagged = bots.filter(_.getBoolean(4)).map(_.getLong(0))
    val planted = bots.map(_.getLong(0))
      .filter(u => u % 29 == 3).toSet
    require(flagged.nonEmpty, "no bots flagged")
    require(flagged.forall(_ % 29 == 3),
      s"false positives: ${flagged.filterNot(_ % 29 == 3).take(5).toSeq}")
    val missed = bots.filter(r => r.getLong(0) % 29 == 3 &&
      r.getLong(1) >= 10 && !r.getBoolean(4))
    require(missed.isEmpty, s"missed planted bots: ${missed.take(5).toSeq}")
    println(s"PSCALE bots flagged=${flagged.length} " +
      s"planted=${planted.size} users=${bots.length} (0 false flags)")

    // ss_knn_graph: exact mutual top-5 at nVec — every edge reciprocal
    // within rank k, edge count within the k·N/2 slot budget
    val k = 5
    graft.functions.GraftFunctions.register(spark)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val t0 = System.nanoTime()
    val knn = ops.Similarity.ssKnnGraph(emb, k)
      .localCheckpoint(eager = true)
    val nEdges = knn.count()
    println(f"PSCALE q=ss_knn_graph t=${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"rows=$nEdges")
    require(nEdges <= nVec.toLong * k / 2,
      s"edge count $nEdges exceeds k*N/2 slot budget")
    val bad = knn.filter(s"rank_ab > $k OR rank_ba > $k OR vec_a >= vec_b")
      .count()
    require(bad == 0, s"$bad edges break the mutual-rank contract")
    println(s"PSCALE knn edges=$nEdges budget=${nVec.toLong * k / 2} " +
      "all reciprocal")

    // HITS on a skewed bipartite graph: 200k hubs × 20k authorities,
    // preferential attachment on the authority side (u^3 law) — the
    // integer max-normalization contract must hold at any skew
    val nS = 200000L; val nD = 20000L
    val edges = spark.range(0L, (nEvents / 2).toLong).map { i =>
      val r = new scala.util.Random(seed ^ (i * 0xA0761D6478BD642FL))
      val u = r.nextDouble()
      (i % nS, math.min(nD - 1, (u * u * u * nD).toLong) + 10000000L)
    }.toDF("src", "dst").distinct()
      .localCheckpoint(eager = true)
    val tH = System.nanoTime()
    val hits = graph.Hits.run(spark, edges, iters = 2)
      .localCheckpoint(eager = true)
    val hitsWall = (System.nanoTime() - tH) / 1e9
    val nNodes = hits.count()
    val mx = hits.groupBy("kind")
      .agg(org.apache.spark.sql.functions.max("score").as("mx"),
        org.apache.spark.sql.functions.min("score").as("mn"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    require(mx("hub")._1 == graph.Hits.Scale && mx("auth")._1 == graph.Hits.Scale,
      s"max-normalization broken: $mx")
    require(mx.values.forall(_._2 >= 0), s"negative score: $mx")
    println(f"PSCALE q=q42_hits t=$hitsWall%.1f s nodes=$nNodes " +
      s"edges=${edges.count()} max=SCALE both sides")

    println("PSCALE addendum15 done")
    spark.stop()
  }

  private def addendum13(nDocs: Int, nEvents: Int, nVec: Int,
      outBase: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.{countDistinct, expr, sum => fsum}
    import spark.implicits._
    val seed = 2026L
    val dir = s"$outBase/sf$nDocs"
    spark.range(0L, nDocs.toLong).map(docFor(_, seed))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val nUsers = scala.math.max(100, nEvents / 666)
    spark.range(0L, nEvents.toLong).map(evFor(_, nUsers, seed))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    spark.range(0L, nVec.toLong).map(vecFor(_, 64, 10, seed))
      .toDF("vec_id", "embedding", "label")
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    println(s"PSCALE gen13 nDocs=$nDocs nEvents=$nEvents nVec=$nVec")

    def timed(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").parquet(s"$dir/results/$tag.parquet")
      println(f"PSCALE q=$tag t=${(System.nanoTime() - t0) / 1e9}%.1f s " +
        s"rows=${spark.read.parquet(s"$dir/results/$tag.parquet").count()}")
    }
    val events = graft.Tables.load(spark, dir, "events")

    // ev_gaps: output is (types × ≤64 buckets)-bounded; the gap algebra
    // closes — Σ n per type == count(type) − |users seen for type|
    timed("ev_gaps")(ops.Sessionize.evGaps(spark, dir))
    val gp = spark.read.parquet(s"$dir/results/ev_gaps.parquet")
    val byType = gp.groupBy("event_type").agg(fsum("n").as("hist_n"))
    val wantGaps = events.groupBy("event_type")
      .agg(expr("count(*) - count(distinct user_id) AS want_n"))
    val gapMismatch = byType.join(wantGaps, "event_type")
      .filter("hist_n != want_n").count()
    require(gapMismatch == 0, s"$gapMismatch types break the gap algebra")
    println(s"PSCALE gaps rows=${gp.count()} (types x log2 buckets) algebra exact")

    // ev_gini: one row; totals exact, top decile at least proportional
    timed("ev_gini")(ops.Sessionize.evGini(spark, dir))
    val gn = spark.read.parquet(s"$dir/results/ev_gini.parquet").head()
    val nU = events.agg(countDistinct("user_id")).head().getLong(0)
    require(gn.getLong(0) == nU && gn.getLong(1) == nEvents.toLong,
      s"gini totals off: ${gn.getLong(0)}/$nU ${gn.getLong(1)}/$nEvents")
    val share = gn.getDouble(5)
    require(share >= (nU / 10).toDouble / nU - 1e-6,
      s"top decile below proportional: $share")
    println(f"PSCALE gini=${gn.getDouble(2)}%.6f topDecileShare=$share%.6f")

    // ds_epochs: conservation at corpus scale (taxonomy-sized relation)
    val t0e = System.nanoTime()
    val ep = ops.Pipeline.dsEpochs(spark, dir).localCheckpoint(eager = true)
    println(f"PSCALE q=ds_epochs t=${(System.nanoTime() - t0e) / 1e9}%.1f s " +
      s"rows=${ep.count()}")
    val alloc = ep.agg(fsum("alloc_tokens")).head().getDouble(0)
    val toks = ep.agg(fsum("tokens")).head().getLong(0)
    val budget = toks / 2
    val capTotal = 3.0 * toks
    val target = math.min(budget.toDouble, capTotal)
    require(math.abs(alloc - target) < 1e-6 * target,
      s"budget not conserved: alloc=$alloc target=$target")
    println(f"PSCALE epochs alloc=$alloc%.1f == min(budget, cap) exact")

    // ta_ngram_top: k rows, occurrence >= doc frequency, sorted
    timed("ta_ngram_top")(ops.TextAnalysis.taNgramTop(spark, dir))
    val ng = spark.read.parquet(s"$dir/results/ta_ngram_top.parquet")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    require(ng.length == 20 && ng.forall(t => t._1 >= t._2),
      "ngram top-k shape broken")
    require(ng.map(_._1).sliding(2).forall(p => p.head >= p.last),
      "ngram ranking not sorted")
    println(s"PSCALE ngram top n=${ng.head._1} df=${ng.head._2}")

    // ss_range: 5 queries against nVec vectors, threshold slice only
    val t0r = System.nanoTime()
    val rs = ops.Similarity.ssRangeSearch(spark,
      graft.Tables.load(spark, dir, "embeddings"), "vec_id < 5", 0.5)
      .localCheckpoint(eager = true)
    println(f"PSCALE q=ss_range t=${(System.nanoTime() - t0r) / 1e9}%.1f s " +
      s"rows=${rs.count()}")
    require(rs.filter("cos < 0.5").count() == 0, "threshold leak")
    require(rs.select("query_id").distinct().count() <= 5, "query leak")
    println("PSCALE addendum13 done")
    spark.stop()
  }

  /** Round-10 ops at 100×: dd_url over 1M synthesized fetch records
    * (500k pages × 2 messy fetches — canonicalization must fold every
    * pair), ds_ccnet at 500k docs across 5 language models (tercile
    * balance required per lang), ta_garble over 1M docs (500k corrupted
    * twins must flag, 500k naturals must not), dd_cdc over 1M docs (the
    * 80%-prefix twins must share chunks).
    */
  private def addendum47(dir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkHygiene.quietRddLogs()

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.createOrReplaceTempView("__a47_docs")
    val off = ops.Dedup.TwinIdOffset

    // dd_url: 1M fetch records, every page fetched once clean + once messy
    val urls = spark.sql(
      s"""SELECT doc_id AS id,
         |       concat('https://www.', source, '.example.com/', lang,
         |              '/article-', CAST(doc_id AS STRING),
         |              '?id=', CAST(doc_id AS STRING), '&sort=new') AS url
         |FROM __a47_docs
         |UNION ALL
         |SELECT doc_id + $off AS id,
         |       concat('HTTP://WWW.', upper(source), '.EXAMPLE.COM:80/',
         |              lang, '//article-', CAST(doc_id AS STRING),
         |              '/?utm_source=feed&sort=new&id=',
         |              CAST(doc_id AS STRING), '#frag') AS url
         |FROM __a47_docs""".stripMargin)
    val (urlAgg, wUrl) = wall(ops.Dedup.ddUrlOn(urls)
      .selectExpr("COUNT(*) AS n", "SUM(CASE WHEN n_dups = 2 THEN 1 ELSE 0 END) AS paired",
        "MAX(keep_id) AS mx").head())
    require(urlAgg.getLong(0) == 500000L && urlAgg.getLong(1) == 500000L,
      s"dd_url at 1M: ${urlAgg}")
    require(urlAgg.getLong(2) < off, "a twin won a keep-first group")
    println(f"PSCALE q=dd_url fetches=1000000 pages=500000 w=$wUrl%.1f s")
    graft.SparkHygiene.clearSessionCaches(spark)

    // ds_ccnet: 500k docs, 5 per-language LMs, tercile balance per lang
    val (ccn, wCcn) = wall(ops.Pipeline.dsCcnet(
        docs.select("doc_id", "lang", "text"))
      .groupBy("lang", "bucket").count().collect())
    val byLang = ccn.groupBy(_.getString(0))
    require(byLang.size == 5, s"expected 5 langs, got ${byLang.keySet}")
    byLang.foreach { case (lang, rows) =>
      val cs = rows.map(_.getLong(2))
      require(cs.sum > 0 && cs.max - cs.min <= 1,
        s"ccnet terciles unbalanced for $lang: ${rows.mkString(",")}")
    }
    println(f"PSCALE q=ds_ccnet docs=500000 langs=5 w=$wCcn%.1f s")
    graft.SparkHygiene.clearSessionCaches(spark)

    // ta_garble: 1M docs (500k corrupted twins), exact flag separation
    val garbleIn = spark.sql(
      s"""SELECT doc_id, text FROM __a47_docs
         |UNION ALL
         |SELECT doc_id + $off AS doc_id,
         |       concat(text, ' ', CASE CAST(doc_id % 3 AS INT)
         |         WHEN 0 THEN '����' WHEN 1 THEN 'xXxXxXxX'
         |         ELSE 'bcdfghjklm' END) AS text
         |FROM __a47_docs""".stripMargin)
    val (gb, wGb) = wall(ops.TextAnalysis.taGarble(garbleIn)
      .selectExpr(
        s"SUM(CASE WHEN doc_id >= $off AND garbled THEN 1 ELSE 0 END) AS tp",
        s"SUM(CASE WHEN doc_id < $off AND garbled THEN 1 ELSE 0 END) AS fp",
        "COUNT(*) AS n").head())
    require(gb.getLong(2) == 1000000L && gb.getLong(0) == 500000L &&
      gb.getLong(1) == 0L, s"ta_garble separation at 1M: $gb")
    println(f"PSCALE q=ta_garble docs=1000000 tp=500000 fp=0 w=$wGb%.1f s")
    graft.SparkHygiene.clearSessionCaches(spark)

    // dd_cdc: 1M docs (80%-prefix twins) — twins must share chunks
    val cdcIn = spark.sql(
      s"""SELECT doc_id, text FROM __a47_docs
         |UNION ALL
         |SELECT doc_id + $off AS doc_id,
         |       array_join(slice(split(text, ' '), 1,
         |         (size(split(text, ' ')) * 4) div 5), ' ') AS text
         |FROM __a47_docs""".stripMargin)
    val (cdc, wCdc) = wall(ops.Dedup.ddCdcOn(cdcIn)
      .selectExpr("COUNT(*) AS n",
        "SUM(CASE WHEN n_dup_chunks > 0 THEN 1 ELSE 0 END) AS withdup",
        "ROUND(AVG(dup_frac), 4) AS mean_frac").head())
    require(cdc.getLong(0) >= 999000L,
      s"dd_cdc rows at 1M: ${cdc.getLong(0)}")
    require(cdc.getLong(1) * 10 >= cdc.getLong(0) * 5,
      s"under half the corpus shares chunks: $cdc")
    println(f"PSCALE q=dd_cdc docs=${cdc.getLong(0)} " +
      f"withdup=${cdc.getLong(1)} meanfrac=${cdc.getDouble(2)} " +
      f"w=$wCdc%.1f s")
    println("PSCALE addendum47 done")
    spark.stop()
  }

  /** Round-10 mm_audioseg at 100k REAL multi-burst WAV clips: every
    * clip's segmentation must land on the analytic plant (k bursts,
    * frame-aligned gaps) — the mm_audiofeat addendum42 discipline for
    * the segmentation pass.
    */
  private def addendum48(): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkHygiene.quietRddLogs()
    import spark.implicits._

    val n = 100000L
    val media = spark.range(n).as[Long].map { id =>
      val amp = 1000 + 500 * (id % 7).toInt
      val half = 4 + 2 * (id % 3).toInt
      val k = 1 + (id % 3).toInt
      val actB = 2400 + 240 * (id % 4).toInt
      val gap = 480 + 240 * (id % 2).toInt
      val tail = 720 + 240 * (id % 3).toInt
      val total = k * actB + (k - 1) * gap + tail
      val pcm = new Array[Byte](2 * total)
      var b = 0
      while (b < k) {
        val offB = b * (actB + gap)
        var i = 0
        while (i < actB) {
          val v = if ((i / half) % 2 == 0) amp else -amp
          pcm(2 * (offB + i)) = (v & 0xff).toByte
          pcm(2 * (offB + i) + 1) = ((v >> 8) & 0xff).toByte
          i += 1
        }
        b += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, total.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      ops.Multimodal.MediaRecord(id, "audio", bos.toByteArray)
    }
    val (segs, w) = wall(ops.Multimodal.mmAudioSeg(media).collect())
    require(segs.length == n, s"audioseg rows ${segs.length}")
    segs.foreach { s =>
      val id = s.media_id
      val k = 1L + id % 3
      val actB = 2400L + 240 * (id % 4)
      val gap = 480L + 240 * (id % 2)
      val tail = 720L + 240 * (id % 3)
      val total = k * actB + (k - 1) * gap + tail
      require(s.n_samples == total && s.n_frames == total / 240 &&
        s.active_frames == k * (actB / 240) && s.n_segments == k &&
        s.longest_run == actB / 240,
        s"clip $id segmentation drifted: $s")
    }
    println(f"PSCALE q=mm_audioseg clips=$n w=$w%.1f s all_exact=true")
    println("PSCALE addendum48 done")
    spark.stop()
  }
}
