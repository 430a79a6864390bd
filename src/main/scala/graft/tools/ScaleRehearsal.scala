package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Scale rehearsal (dev harness, not part of the library API): replicate the
  * sf0.1 tables k-fold with shifted ids — every source doc gains k exact
  * copies, yielding a duplicate-dense corpus (the crawl-dedup regime) — and
  * time the shuffle-heavy operators at 1x vs kx. The point is the growth
  * EXPONENT: bucketed/banded operators should scale near-linearly in rows
  * plus true-duplicate work, never quadratically in corpus size.
  */
object ScaleRehearsal {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 8
    // optional 2nd arg: comma-separated family filter (docs, events,
    // graph, search, r9, r10, tpch, r10b, r11, r11b, r12b, dedup,
    // search32, tpch32, serving32, recall) — run ONLY those
    // families so a new-family rehearsal doesn't pay the full ~25-minute
    // sweep
    val fams: Set[String] = if (args.length > 1)
      args(1).split(',').map(_.trim).filter(_.nonEmpty).toSet else Set.empty
    def fam(name: String): Boolean = fams.isEmpty || fams.contains(name)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.tune(spark)

    val docs1 = graft.Tables.documents(spark, "/root/testdata/sf0.1")
      .select("doc_id", "text")
    val emb1 = graft.Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select("vec_id", "embedding")
    val n1 = docs1.count()
    def replicate(df: DataFrame, idCol: String): DataFrame =
      (0 until k).map(i => df.withColumn(idCol, col(idCol) + lit(i * 1000000L)))
        .reduce(_ unionByName _)
    val docsK = replicate(docs1, "doc_id").cache()
    val embK = replicate(emb1, "vec_id").cache()
    println(s"REHEARSE corpus 1x=$n1 ${k}x=${docsK.count()} vecs=${embK.count()}")

    // every timing also lands in REHEARSAL.json (merged per-op across
    // family-filtered runs), so scale-exponent regressions are diffable
    // round-over-round the way BENCH_DETAIL made per-query times diffable
    val recorded = collection.mutable.LinkedHashMap.empty[String, (Long, Double)]
    // quality-gate metric values at scale (merged into REHEARSAL.json
    // beside the wall ratios) — declared up here because both the recall
    // family and the serving32 family record into it
    val recordedGates = collection.mutable.LinkedHashMap.empty[String, Double]
    // Replicated k-leg caches are materialized BEFORE a family's timed
    // loop: the first timed op would otherwise absorb the union + cache
    // build (r14's REHEARSAL showed tpchQ6 -- a 1-row linear scan-agg --
    // at an 11.5x wall ratio for exactly this reason).
    def warm(dfs: DataFrame*): Unit = dfs.foreach(_.count())
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      recorded(name) = (n, sec)
      println(f"REHEARSE $name rows=$n t=$sec%.1f")
    }
    def run(tag: String, docs: DataFrame, emb: DataFrame): Unit = {
      time(s"$tag exactGroups") {
        Dedup.exactGroups(docs).queryExecution.toRdd.count() }
      time(s"$tag minhashPairs") {
        Dedup.minhashPairs(docs, 0.5).queryExecution.toRdd.count() }
      time(s"$tag simhashPairs") {
        Dedup.simhashPairs(docs, 3).queryExecution.toRdd.count() }
      time(s"$tag jaccardPairs") {
        Dedup.jaccardPairs(docs, 0.5).queryExecution.toRdd.count() }
      time(s"$tag dupClusters") {
        Dedup.duplicateClusters(Dedup.exactGroups(docs)
          .filter(col("n_docs") > 1)
          .select(col("canonical_doc").as("doc_a"),
            (col("canonical_doc") + 1).as("doc_b"))).queryExecution.toRdd.count() }
      time(s"$tag rpPairs") {
        Similarity.rpNearDupPairs(emb, 0.3).queryExecution.toRdd.count() }
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_embedding"))
      time(s"$tag rpTopK") {
        Similarity.rpTopK(emb, q, 3).queryExecution.toRdd.count() }
      time(s"$tag bqTopK") {
        Similarity.bqTopK(emb, q, 3).queryExecution.toRdd.count() }
      time(s"$tag detKMeans") {
        Similarity.detKMeans(emb, 8, 3)._2.queryExecution.toRdd.count() }
      time(s"$tag pqTopK") {
        Similarity.pqTopK(emb, q, 3).queryExecution.toRdd.count() }
      // k chosen so cells stay bounded as the corpus grows — the SemDeDup
      // operating rule; duplicate-dense replication makes output (and thus
      // intra-cell pair work) grow quadratically in CLUSTER size by design
      time(s"$tag semanticDedup") {
        Dedup.semanticDedup(emb, 0.35, k = 32).queryExecution.toRdd.count() }
      time(s"$tag boilerplate") {
        graft.operators.TextAnalysis.boilerplateStats(docs)
          .queryExecution.toRdd.count() }
      time(s"$tag bm25") {
        graft.operators.TextAnalysis.bm25(docs,
          Seq("transfer", "credit", "university")).queryExecution.toRdd.count() }
      time(s"$tag repetition") {
        graft.operators.TextAnalysis.repetitionStats(docs)
          .queryExecution.toRdd.count() }
      // duplicate-dense replication turns every planted near-dup prefix
      // into a k-clique — output grows k^2 per cluster BY DESIGN (the
      // semanticDedup note); the candidate space must stay length-banded
      time(s"$tag levPairs") {
        Dedup.levenshteinPairs(docs).queryExecution.toRdd.count() }
      time(s"$tag bigramLM") {
        graft.operators.TextAnalysis.bigramSurprisal(docs)
          .queryExecution.toRdd.count() }
      // pair fan-out is rows x window (nested array expr, no join):
      // linear growth expected even duplicate-dense
      time(s"$tag skipGrams") {
        graft.operators.TextAnalysis.skipGrams(docs)
          .queryExecution.toRdd.count() }
      // distributed rank frame + two index joins: linear in rows
      time(s"$tag quantileNorm") {
        graft.operators.TableStats.quantileNormalize(
          docs.selectExpr("doc_id", "CAST(doc_id % 20 AS STRING) AS src",
            "length(text) AS len"), "doc_id", "src", "len")
          .queryExecution.toRdd.count() }
      time(s"$tag bloomAnti") {
        val d = docs.withColumn("fp", expr("substring(text, 1, 60)"))
        Dedup.bloomAntiJoin(d.filter(col("doc_id") % 7 =!= 0),
          d.filter(col("doc_id") % 7 === 0).select("fp"), "fp")
          .queryExecution.toRdd.count() }
      time(s"$tag sharedSpans") {
        Dedup.sharedSpanPairs(docs).queryExecution.toRdd.count() }
    }
    if (fam("docs")) { run("1x", docs1, emb1); run(s"${k}x", docsK, embK) }

    // event-shaped operators replicate on event_id with shifted timestamps
    // (same per-user rate, k-fold longer horizon — the steady-state regime)
    val ev1 = graft.Tables.events(spark, "/root/testdata/sf0.1")
    val evK = (0 until k).map(i => ev1
        .withColumn("event_id", col("event_id") + lit(i * 10000000L))
        .withColumn("ts", col("ts") + expr(s"interval ${i * 40} days")))
      .reduce(_ unionByName _).cache()
    def runEv(tag: String, ev: DataFrame): Unit = {
      time(s"$tag asOfJoin") {
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"))
        val views = ev.filter(col("event_type") === "view")
          .groupBy("user_id", "ts").agg(max("value").as("view_value"))
        graft.operators.Joins.asOfJoin(clicks, views, "user_id", "ts",
          "event_id", "view_value").queryExecution.toRdd.count() }
      time(s"$tag intervalSelfJoin") {
        graft.operators.Joins.intervalSelfJoin(ev, "user_id", "ts",
          "event_id", 300).queryExecution.toRdd.count() }
      val ea = graft.operators.EventAnalytics
      time(s"$tag funnel") {
        ea.funnel(ev, Seq("view", "click", "purchase"))
          .queryExecution.toRdd.count() }
      time(s"$tag retention") {
        ea.retentionCohorts(ev).queryExecution.toRdd.count() }
      time(s"$tag gapFill") {
        ea.gapFillDaily(ev).queryExecution.toRdd.count() }
      time(s"$tag stateHistory") {
        ea.stateHistory(ev).queryExecution.toRdd.count() }
      time(s"$tag zscore") {
        ea.zscoreOutliers(ev).queryExecution.toRdd.count() }
      time(s"$tag dailyActive") {
        ea.dailyActiveUsers(ev).queryExecution.toRdd.count() }
    }
    if (fam("events")) { warm(evK); runEv("1x", ev1); runEv(s"${k}x", evK) }

    // graph/layout operators replicate the part-supplier edge space with
    // shifted keys: k-fold more nodes AND edges, degree distribution kept —
    // the growth axis PageRank and zone maps face in production
    val li1 = graft.Tables.lineitem(spark, "/root/testdata/sf0.1")
      .select("l_partkey", "l_suppkey")
    val liK = (0 until k).map(i => li1
        .withColumn("l_partkey", col("l_partkey") + lit(i * 1000000L))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * 1000000L)))
      .reduce(_ unionByName _).cache()
    def runGraph(tag: String, li: DataFrame): Unit = {
      time(s"$tag pageRank") {
        graft.operators.Graph.pageRank(li.select(
          concat(lit("p"), col("l_partkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst")).distinct(), 3)
          .queryExecution.toRdd.count() }
      time(s"$tag zZoneMap") {
        graft.operators.Layout.zZoneMap(li, "l_partkey", "l_suppkey", 21, 12)
          .queryExecution.toRdd.count() }
    }
    if (fam("graph")) { warm(liK); runGraph("1x", li1); runGraph(s"${k}x", liK) }

    // search-surface operators over an ingested index: per-query work must
    // stay flat (shortlists / top-k are corpus-size-independent in OUTPUT),
    // with only the one scan+score pass growing linearly in the corpus
    val docsSrc1 = graft.Tables.documents(spark, "/root/testdata/sf0.1")
      .select("doc_id", "text", "source")
    val docsSrcK = replicate(docsSrc1, "doc_id").cache()
    val qs = Seq("transfer credits", "spark window agg", "customer order batch")
    def runSearch(tag: String, docs: DataFrame): Unit = {
      val index = graft.Engine.ingest(docs).cache()
      index.count()
      time(s"$tag searchMany") {
        graft.Engine.searchMany(index, qs, 5).queryExecution.toRdd.count() }
      time(s"$tag hybridMany") {
        graft.Engine.hybridSearchMany(index, qs, 5).queryExecution.toRdd.count() }
      time(s"$tag mmrMany") {
        graft.operators.Rerank.mmrRerankMany(index, qs, 5, 20)
          .queryExecution.toRdd.count() }
      time(s"$tag radius") {
        graft.Engine.searchRadius(index, "transfer credits", 0.3)
          .queryExecution.toRdd.count() }
      time(s"$tag facets") {
        graft.Engine.searchFacets(index, "transfer credits", 100)
          .queryExecution.toRdd.count() }
      time(s"$tag diverse") {
        graft.Engine.searchDiverse(index, "transfer credits", 5)
          .queryExecution.toRdd.count() }
      time(s"$tag mixture") {
        graft.operators.Sampling.sampleToMixture(docs, "source",
          Seq("src0" -> 3.0, "src1" -> 1.0, "src2" -> 1.0), 2000)
          .queryExecution.toRdd.count() }
      time(s"$tag classTopics") {
        graft.operators.TextAnalysis.classTopTerms(docs, "source", 5)
          .queryExecution.toRdd.count() }
      time(s"$tag weightedSample") {
        graft.operators.Sampling.weightedSample(
          docs.withColumn("n_chars", length(col("text"))), "n_chars", 5)
          .queryExecution.toRdd.count() }
      index.unpersist()
    }
    if (fam("search")) { warm(docsSrcK); runSearch("1x", docsSrc1); runSearch(s"${k}x", docsSrcK) }

    // round-9 family: selection / sketch / PIT / PRF / mutual-kNN. Docs
    // replicate with lang kept (DSIR needs it); events reuse evK; the
    // mutual-kNN sides replicate on vec_id — its scorer is |a| x |b| per
    // side, so the rehearsal's job is confirming the memoized two-consumer
    // plan holds each side's scoring to ONE pass (quadratic in collection
    // size by SPEC — watch the exponent stay at ~k^2 for k-fold sides, and
    // wall-clock stay within the k^2 budget, not above it)
    val docsLang1 = graft.Tables.documents(spark, "/root/testdata/sf0.1")
      .select("doc_id", "text", "lang")
    val docsLangK = replicate(docsLang1, "doc_id").cache()
    def runR9(tag: String, docs: DataFrame, ev: DataFrame, emb: DataFrame): Unit = {
      time(s"$tag dsirSelect") {
        graft.operators.Sampling.dsirSelect(
          docs.filter(col("lang") =!= "en"), docs.filter(col("lang") === "en"),
          50, 256).queryExecution.toRdd.count() }
      time(s"$tag ddSketch") {
        graft.operators.Sketches.ddSketchQuantiles(
          ev.select(col("event_type").as("g"), col("value").as("v")), "g", "v")
          .queryExecution.toRdd.count() }
      time(s"$tag hllDailyRolling") {
        graft.operators.Sketches.hllDailyRolling(ev)
          .queryExecution.toRdd.count() }
      time(s"$tag kmvOverlap") {
        graft.operators.Sketches.kmvOverlap(ev)
          .queryExecution.toRdd.count() }
      time(s"$tag pitJoin") {
        graft.operators.Joins.pointInTimeJoin(
          ev.filter(col("event_id") % 10 === 0).select("user_id", "ts", "event_id"),
          graft.operators.EventAnalytics.stateHistory(ev),
          "user_id", "ts", "event_id", "valid_from", "event_type")
          .queryExecution.toRdd.count() }
      time(s"$tag searchPrf") {
        val index = graft.Engine.ingest(
          docs.select("doc_id", "text").withColumn("source", lit("s"))).cache()
        index.count()
        val n = graft.Engine.searchPrf(index, "transfer credits", 5, 5, 10)
          .queryExecution.toRdd.count()
        index.unpersist(); n }
      time(s"$tag mutualKnn") {
        Similarity.mutualTopKPairs(
          emb.filter(col("vec_id") % 2 === 0),
          emb.filter(col("vec_id") % 2 === 1), 4)
          .queryExecution.toRdd.count() }
    }
    if (fam("r9")) { warm(docsLangK, evK, embK); runR9("1x", docsLang1, ev1, emb1); runR9(s"${k}x", docsLangK, evK, embK) }

    // round-10 family: fingerprint/selection/event-band/eval/TPC-H-shape
    // operators. Docs replicate with lang kept (unimax buckets by lang);
    // events reuse evK (k-fold longer horizon, so daily bands gain k-fold
    // more calendar groups, not deeper ones); embeddings replicate on
    // vec_id — the lift/calibration probes and the covariance fold are
    // row-linear BY construction (covariance state is d² regardless of
    // rows), while kCenterCoreset pays its k scans over a k-fold corpus.
    // The labeled-emb frame tags vec_id%10 as the class, matching the
    // fixture's label domain shape.
    def runR10(tag: String, docs: DataFrame, ev: DataFrame,
               emb: DataFrame): Unit = {
      val lab = emb.withColumn("label", (col("vec_id") % 10).cast("int"))
      time(s"$tag winnowing") {
        graft.operators.TextAnalysis.winnowFingerprints(docs)
          .queryExecution.toRdd.count() }
      time(s"$tag unimax") {
        graft.operators.Sampling.unimaxSample(docs)
          .queryExecution.toRdd.count() }
      time(s"$tag rfm") {
        graft.operators.EventAnalytics.rfmSegments(ev)
          .queryExecution.toRdd.count() }
      time(s"$tag dailyBands") {
        graft.operators.EventAnalytics.dailyPercentileBands(ev)
          .queryExecution.toRdd.count() }
      time(s"$tag bootstrapCi") {
        graft.operators.EventAnalytics.bootstrapCi(ev)
          .queryExecution.toRdd.count() }
      time(s"$tag coreset") {
        Similarity.kCenterCoreset(emb).queryExecution.toRdd.count() }
      time(s"$tag lift") {
        Similarity.liftTable(lab).queryExecution.toRdd.count() }
      time(s"$tag auc") {
        Similarity.separabilityAuc(lab).queryExecution.toRdd.count() }
      time(s"$tag calibration") {
        Similarity.calibrationTable(lab).queryExecution.toRdd.count() }
      time(s"$tag embedCov") {
        Similarity.embeddingCovariance(emb.select("embedding"))
          .queryExecution.toRdd.count() }
    }
    if (fam("r10")) { warm(docsLangK, evK, embK); runR10("1x", docsLang1, ev1, emb1); runR10(s"${k}x", docsLangK, evK, embK) }

    // TPC-H shapes rehearse on replicated fact+dim key spaces (k-fold
    // orders AND parts AND suppliers — the real scale axis: dims grow with
    // the business, facts with time)
    val ord1 = graft.Tables.orders(spark, "/root/testdata/sf0.1")
    val liFull1 = graft.Tables.lineitem(spark, "/root/testdata/sf0.1")
    val ordK = (0 until k).map(i => ord1
        .withColumn("o_orderkey", col("o_orderkey") + lit(i * 100000000L))
        .withColumn("o_custkey", col("o_custkey") + lit(i * 1000000L)))
      .reduce(_ unionByName _).cache()
    val liFullK = (0 until k).map(i => liFull1
        .withColumn("l_orderkey", col("l_orderkey") + lit(i * 100000000L))
        .withColumn("l_partkey", col("l_partkey") + lit(i * 1000000L))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * 1000000L)))
      .reduce(_ unionByName _).cache()
    val part1 = graft.Tables.part(spark, "/root/testdata/sf0.1")
    val partK = (0 until k).map(i => part1
        .withColumn("p_partkey", col("p_partkey") + lit(i * 1000000L)))
      .reduce(_ unionByName _).cache()
    val supp1 = graft.Tables.supplier(spark, "/root/testdata/sf0.1")
    val suppK = (0 until k).map(i => supp1
        .withColumn("s_suppkey", col("s_suppkey") + lit(i * 1000000L)))
      .reduce(_ unionByName _).cache()
    def runTpch(tag: String, li: DataFrame, ord: DataFrame, part: DataFrame,
                supp: DataFrame): Unit = {
      time(s"$tag tpchQ6") {
        graft.operators.Joins.forecastRevenueChange(li)
          .queryExecution.toRdd.count() }
      time(s"$tag partValueShare") {
        graft.operators.Joins.topValueParts(li)
          .queryExecution.toRdd.count() }
      time(s"$tag supplierVariety") {
        graft.operators.Joins.supplierVariety(li, part, supp)
          .queryExecution.toRdd.count() }
      time(s"$tag soleBlockers") {
        graft.operators.Joins.soleBlockerSuppliers(ord, li, supp)
          .queryExecution.toRdd.count() }
      time(s"$tag joinSizeEst") {
        graft.operators.Sketches.cmsJoinSizeEstimate(li, ord,
          "l_orderkey", "o_orderkey").queryExecution.toRdd.count() }
    }
    if (fam("tpch")) { warm(liFullK, ordK, partK, suppK); runTpch("1x", liFull1, ord1, part1, supp1); runTpch(s"${k}x", liFullK, ordK, partK, suppK) }

    // round-10b family (q226-q237): event/eval/metadata operators. Events
    // reuse evK (8x events over an 8x-longer horizon); docs reuse the
    // full-column replica for the dedup/coverage ops; embeddings tag
    // vec_id%10 labels as in runR10. The expected shapes: funnels and
    // cohorts are user/calendar-bounded, the audits are group-frame
    // rollups, dedupRecall pays the exhaustive arm's pair space
    // (duplicate-dense k-cliques BY design — the semanticDedup note),
    // knnConfusion is sample×corpus through GroupedTopK.
    val docsSrcFull1 = graft.Tables.documents(spark, "/root/testdata/sf0.1")
    val docsSrcFullK = (0 until k).map(i => docsSrcFull1
        .withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
      .reduce(_ unionByName _).cache()
    def runR10b(tag: String, docs: DataFrame, ev: DataFrame,
                emb: DataFrame): Unit = {
      val ea = graft.operators.EventAnalytics
      val lab = emb.withColumn("label", (col("vec_id") % 10).cast("int"))
      time(s"$tag windowedFunnel") {
        ea.windowedFunnel(ev, Seq("view", "click", "purchase"))
          .queryExecution.toRdd.count() }
      time(s"$tag cohortLtv") {
        ea.cohortLtv(ev).queryExecution.toRdd.count() }
      time(s"$tag groupSplit") {
        graft.operators.Sampling.groupHoldoutSplit(ev)
          .queryExecution.toRdd.count() }
      time(s"$tag welch") {
        ea.welchTTest(ev).queryExecution.toRdd.count() }
      time(s"$tag seasonalNaive") {
        ea.seasonalNaiveBacktest(ev).queryExecution.toRdd.count() }
      time(s"$tag psi") {
        ea.psiDrift(ev).queryExecution.toRdd.count() }
      time(s"$tag kAnonymity") {
        graft.operators.Pipeline.kAnonymityAudit(ev,
          Seq("event_type", "dayofweek(ts)",
            "CAST(get_json_object(props, '$.k') AS BIGINT) DIV 10"),
          "CAST(round(value * 100) AS BIGINT) DIV 1000")
          .queryExecution.toRdd.count() }
      time(s"$tag compactionPlan") {
        graft.operators.Layout.compactionPlan(
          docs.selectExpr("source", "doc_id", "n_chars"),
          "source", "doc_id", "n_chars", 65536L)
          .queryExecution.toRdd.count() }
      time(s"$tag dupCoverage") {
        Dedup.duplicateCoverage(docs).queryExecution.toRdd.count() }
      time(s"$tag dedupRecall") {
        Dedup.dedupRecallAudit(docs, 0.5).queryExecution.toRdd.count() }
      // the 100 TB operating mode: both audit arms over the deterministic
      // sha-keyed 1/8 sample — the exhaustive pair space is bounded by the
      // SAMPLE, so the growth ratio should collapse toward the banded arm's
      time(s"$tag dedupRecallSampled") {
        Dedup.dedupRecallAudit(docs, 0.5, sampleHex = 2)
          .queryExecution.toRdd.count() }
      time(s"$tag knnConfusion") {
        Similarity.knnConfusion(lab).queryExecution.toRdd.count() }
    }
    if (fam("r10b")) {
      warm(docsSrcFullK, evK, embK)
      runR10b("1x", docsSrcFull1, ev1, emb1)
      runR10b(s"${k}x", docsSrcFullK, evK, embK)
    }

    // lean dedup-only family for HIGH-k octaves (32x): just the banded
    // pair generators + clustering + the sampled audit, so a 32x run
    // confirms the pair-output-bound exponents without paying the full
    // docs family (levPairs/jaccardPairs at 32x dup-dense are exhaustive
    // BY DESIGN and would dominate the sweep)
    def runDedup(tag: String, docs: DataFrame): Unit = {
      time(s"$tag minhashPairs32") {
        Dedup.minhashPairs(docs, 0.5).queryExecution.toRdd.count() }
      time(s"$tag dupClusters32") {
        Dedup.duplicateClusters(Dedup.minhashPairs(docs, 0.5))
          .queryExecution.toRdd.count() }
      time(s"$tag dedupRecallSampled32") {
        Dedup.dedupRecallAudit(docs, 0.5, sampleHex = 2)
          .queryExecution.toRdd.count() }
    }
    if (fam("dedup")) {
      warm(docsK)
      runDedup("1x", docs1)
      runDedup(s"${k}x", docsK)
    }

    // lean search family for HIGH-k octaves (32x), the runDedup convention
    // (distinct op names so a 32x run never overwrites the 8x entries of
    // the full search family): the three query-serving modes over an
    // UNCACHED ingest — the q06 recompute-not-cache rule; a cached 1024-f32
    // index column decompresses slower than the map-only re-embed — so the
    // measured growth is the one linear scan+score pass, and per-query
    // work beyond it (top-k, RRF fuse, MMR chain) must stay flat
    def runSearch32(tag: String, docs: DataFrame): Unit = {
      val index = graft.Engine.ingest(docs)
      time(s"$tag searchMany32") {
        graft.Engine.searchMany(index, qs, 5).queryExecution.toRdd.count() }
      time(s"$tag hybridMany32") {
        graft.Engine.hybridSearchMany(index, qs, 5).queryExecution.toRdd.count() }
      time(s"$tag mmrMany32") {
        graft.operators.Rerank.mmrRerankMany(index, qs, 5, 20)
          .queryExecution.toRdd.count() }
    }
    if (fam("search32")) {
      warm(docsSrcK)
      runSearch32("1x", docsSrc1)
      runSearch32(s"${k}x", docsSrcK)
    }

    // lean TPC-H family for HIGH-k octaves (32x): the scan-agg (Q6), a
    // three-way variety rollup, and the Q21 multi-self-correlation — fact
    // AND dims grown k-fold (the r12b axis). Joins on the SHUFFLE_HASH
    // convention should track rows ~linearly; 32x is the octave that would
    // expose any hidden super-linear shuffle the 8x run smoothed over
    def runTpch32(tag: String, li: DataFrame, ord: DataFrame,
                  part: DataFrame, supp: DataFrame): Unit = {
      time(s"$tag tpchQ6_32") {
        graft.operators.Joins.forecastRevenueChange(li)
          .queryExecution.toRdd.count() }
      time(s"$tag supplierVariety32") {
        graft.operators.Joins.supplierVariety(li, part, supp)
          .queryExecution.toRdd.count() }
      time(s"$tag soleBlockers32") {
        graft.operators.Joins.soleBlockerSuppliers(ord, li, supp)
          .queryExecution.toRdd.count() }
    }
    if (fam("tpch32")) {
      warm(liFullK, ordK, partK, suppK)
      runTpch32("1x", liFull1, ord1, part1, supp1)
      runTpch32(s"${k}x", liFullK, ordK, partK, suppK)
    }

    // serving family for HIGH-k octaves: the maintained-stack composition
    // q292/q299 declare — ivfPqProbe (coarse probe + ADC over the probed
    // cells + exact re-rank) and the full RRF-fused hybridServing. The
    // index build sits OUTSIDE the timed ops (at 100 TB the index is
    // prebuilt; the probe is the per-query serving path), and the lexical
    // leg reads cached postings for the same reason. Expected growth:
    // probed-cell candidate work scales with corpus/nLists (linear),
    // per-query tails (top-k, fuse) flat — so wall should track corpus
    // sublinearly, and per-query work must never go superlinear
    def runServing32(tag: String, docs: DataFrame, e: DataFrame): Unit = {
      val ta = graft.operators.TextAnalysis
      val coarse = Similarity.detIvfIndex(e, 8)
      val pq = Similarity.pqIndex(e)
      coarse.assignments.cache().count()
      pq.codes.cache().count()
      val post = ta.postings(docs).cache()
      val dl = ta.docLengths(docs).cache()
      warm(post, dl)
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_embedding"))
      // the DECLARED q292 term sets, referenced (not copied) so the
      // rehearsal always measures the workload the query actually runs
      val terms = graft.SparkEntry.ServingTerms
      time(s"$tag ivfPqProbe32") {
        Similarity.ivfPqProbe(coarse, pq, q, 3, nProbe = 3, shortlist = 64)
          .queryExecution.toRdd.count() }
      time(s"$tag hybridServing32") {
        graft.Engine.hybridServing(coarse, pq, q, terms,
          ts => ta.bm25Indexed(post, dl, ts), k = 5, nLeg = 10)
          .queryExecution.toRdd.count() }
      // the PERSISTED IVFADC layout (q282/q292's actual serving path):
      // codes saved cell-partitioned, probe statically partition-pruned
      // to the nProbe probed cells on BOTH the codes and the re-rank
      // scans — the r18 layout change whose scale claim this leg
      // measures (the flat-codes probe above is the legacy in-memory
      // shape). Build sits outside the timed op, as with the other legs.
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-rehearse-ivfpq").toString
      coarse.save(s"$idxDir/coarse")
      Similarity.savePqCellPartitioned(pq,
        spark.read.parquet(s"$idxDir/coarse/assignments"), s"$idxDir/pq")
      val pc = Similarity.loadIvfIndex(spark, s"$idxDir/coarse")
      val pp = Similarity.loadPqIndex(spark, s"$idxDir/pq")
      time(s"$tag ivfPqProbePersisted32") {
        Similarity.ivfPqProbe(pc, pp, q, 3, nProbe = 3, shortlist = 64)
          .queryExecution.toRdd.count() }
      // approximation QUALITY of the full serving composition at this
      // scale (the r17 ask: a recall arm for hybridServing beside its
      // wall ratio): the maintained-stack fused top-5 vs the SAME fusion
      // with an EXACT vector leg (bruteForceTopK at nLeg) — overlap@5
      // averaged over the batch, recorded beside the q29/q30/q34 gates
      time(s"$tag gateHybridServing") {
        import spark.implicits._
        val lexLegFn = (ts: Seq[String]) => ta.bm25Indexed(post, dl, ts)
        def topMap(df: DataFrame): Map[Long, Set[Long]] =
          df.select("query_id", "doc_id").as[(Long, Long)].collect()
            .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val approx = topMap(graft.Engine.hybridServing(
          pc, pp, q, terms, lexLegFn, k = 5, nLeg = 10))
        val vecEx = Similarity.bruteForceTopK(e, q, 10)
          .select(col("query_id"), col("vec_id").as("doc_id"),
            col("rnk").cast("int").as("rnk_vec"),
            lit(null).cast("int").as("rnk_lex"))
        val lexScored = terms.map { case (qid, ts) =>
          lexLegFn(ts).filter(col("bm25") > 0)
            .select(lit(qid).cast("long").as("query_id"), col("doc_id"),
              col("bm25"))
        }.reduce(_ unionByName _)
        val lexEx = graft.plans.GroupedTopK(lexScored,
            Seq(col("query_id")), Seq(desc("bm25"), asc("doc_id")), 10)
          .select(col("query_id"), col("doc_id"),
            lit(null).cast("int").as("rnk_vec"),
            col("rank").cast("int").as("rnk_lex"))
        val fusedEx = vecEx.unionByName(lexEx)
          .groupBy("query_id", "doc_id")
          .agg(min("rnk_vec").as("rnk_vec"), min("rnk_lex").as("rnk_lex"))
          .withColumn("rrf",
            coalesce(lit(1.0) / (lit(60) + col("rnk_vec")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(60) + col("rnk_lex")), lit(0.0)))
        val exact = topMap(graft.plans.GroupedTopK(fusedEx,
          Seq(col("query_id")), Seq(desc("rrf"), asc("doc_id")), 5))
        val per = exact.map { case (qid, ex) =>
          approx.getOrElse(qid, Set.empty).intersect(ex).size.toDouble / ex.size }
        recordedGates(s"$tag gate_serving_overlap_at_5") = per.sum / per.size
        per.size.toLong }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idxDir))
      coarse.assignments.unpersist(); pq.codes.unpersist()
      post.unpersist(); dl.unpersist()
    }
    if (fam("serving32")) {
      warm(docsK, embK)
      runServing32("1x", docs1, emb1)
      runServing32(s"${k}x", docsK, embK)
    }

    // round-11 family (q240-q243): the robust-stats trio is two range
    // exchanges + tiny broadcasts each (row-linear, all-core); the
    // spectral probe is one moment fold (row-linear) + d²-bounded
    // iteration — all should stay flat-to-linear at 8x
    def runR11(tag: String, ev: DataFrame, emb: DataFrame): Unit = {
      val ea = graft.operators.EventAnalytics
      time(s"$tag madOutliers") {
        ea.madOutliers(ev).queryExecution.toRdd.count() }
      time(s"$tag trimmedMean") {
        ea.trimmedMean(ev).queryExecution.toRdd.count() }
      time(s"$tag gini") {
        ea.giniConcentration(ev).queryExecution.toRdd.count() }
      time(s"$tag spectralProbe") {
        Similarity.dominantEigenProbe(emb.select("embedding"))
          .queryExecution.toRdd.count() }
    }
    if (fam("r11")) { warm(evK, embK); runR11("1x", ev1, emb1); runR11(s"${k}x", evK, embK) }

    // round-11b family (q249-q254): the indexed TF-IDF is
    // postings-linear; the Q2/Q12/Q20 shapes are one pruned fact pass
    // into dim-bounded frames; MI and the langid confusion are map-only
    // scoring into |cells|-bounded aggregates — all should track corpus
    // growth linearly
    def runR11b(tag: String, docs: DataFrame, li: DataFrame,
                ord: DataFrame, part: DataFrame, supp: DataFrame): Unit = {
      val ta = graft.operators.TextAnalysis
      val nat = graft.Tables.nation(spark, "/root/testdata/sf0.1")
      val reg = graft.Tables.region(spark, "/root/testdata/sf0.1")
      time(s"$tag tfidfIndexed") {
        ta.tfidfIndexed(ta.postings(docs), ta.docLengths(docs),
          Seq("transfer", "credit", "university"))
          .queryExecution.toRdd.count() }
      time(s"$tag tpchQ2") {
        graft.operators.Joins.minCostSupplier(li, part, supp, nat, reg)
          .queryExecution.toRdd.count() }
      time(s"$tag tpchQ12") {
        graft.operators.Joins.shipmodePriorityCounts(ord, li)
          .queryExecution.toRdd.count() }
      time(s"$tag tpchQ20") {
        graft.operators.Joins.excessShippers(li, part, supp, nat, reg)
          .queryExecution.toRdd.count() }
      time(s"$tag mutualInfo") {
        graft.operators.TableStats.mutualInformation(docs, "source", "lang")
          .queryExecution.toRdd.count() }
      time(s"$tag langidConfusion") {
        ta.langIdConfusion(docs).queryExecution.toRdd.count() }
    }
    if (fam("r11b")) {
      // full-column docs: MI/confusion need (source, lang), TF-IDF text
      warm(docsSrcFullK, liFullK, ordK, partK, suppK)
      runR11b("1x", docsSrcFull1, liFull1, ord1, part1, supp1)
      runR11b(s"${k}x", docsSrcFullK, liFullK, ordK, partK, suppK)
    }

    // round-12b family: the five TPC-H shapes whose SF-proportional dim
    // broadcasts round 12 replaced with SHUFFLE_HASH — rehearsed with the
    // DIMS grown k-fold alongside the fact (the r11 ask: fact-only growth
    // cannot expose a dim broadcast; the defect only bites when
    // part/supplier/customer grow with the business). Expected: flat-to-
    // sublinear growth per row, no OOM, and PlanAudit's pricer finding
    // zero BroadcastExchange over any of the grown frames.
    def runR12b(tag: String, li: DataFrame, ord: DataFrame, cust: DataFrame,
                part: DataFrame, supp: DataFrame): Unit = {
      val nat = graft.Tables.nation(spark, "/root/testdata/sf0.1")
      val reg = graft.Tables.region(spark, "/root/testdata/sf0.1")
      time(s"$tag promoRevenue(q194)") {
        graft.operators.Joins.promoRevenueShare(li, part)
          .queryExecution.toRdd.count() }
      time(s"$tag topRevSupplier(q205)") {
        graft.operators.Joins.topRevenueSupplier(li, supp)
          .queryExecution.toRdd.count() }
      time(s"$tag soleBlockers(q214)") {
        graft.operators.Joins.soleBlockerSuppliers(ord, li, supp)
          .queryExecution.toRdd.count() }
      time(s"$tag marketShare(q218)") {
        graft.operators.Joins.nationMarketShare(li, ord, cust, supp, nat,
          reg, part).queryExecution.toRdd.count() }
      time(s"$tag minCostSupplier(q250)") {
        graft.operators.Joins.minCostSupplier(li, part, supp, nat, reg)
          .queryExecution.toRdd.count() }
    }
    if (fam("r12b")) {
      val cust1 = graft.Tables.customer(spark, "/root/testdata/sf0.1")
      val custK = (0 until k).map(i => cust1
          .withColumn("c_custkey", col("c_custkey") + lit(i * 1000000L)))
        .reduce(_ unionByName _).cache()
      warm(liFullK, ordK, custK, partK, suppK)
      runR12b("1x", liFull1, ord1, cust1, part1, supp1)
      runR12b(s"${k}x", liFullK, ordK, custK, partK, suppK)
    }
    // approximate-path QUALITY at scale (the r16 ask: the wall-clock
    // octaves prove the runtime exponent, but GATES.json measures recall
    // only at the sf0.01 fixture) — re-measure the q29/q30/q34 gate
    // metrics on sf0.1 (10x the gated fixture) and on the k-fold octave,
    // writing the values into REHEARSAL.json beside the wall ratios.
    // Octave replicas are ROTATED (cyclic element shift by replica index),
    // never copied: an exact copy hashes into identical buckets/cells and
    // would make scale recall trivially 1.0 — a rotated vector is a
    // genuinely new point with the same norm and coordinate distribution.
    def gateRun(tag: String, e: DataFrame): Unit = {
      import spark.implicits._
      val ec = e.cache(); ec.count()
      val q = ec.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_embedding")).cache()
      def ids(df: DataFrame): Map[Long, Set[Long]] =
        df.select("query_id", "vec_id").as[(Long, Long)].collect()
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val exact = ids(Similarity.bruteForceTopK(ec, q, 3))
      def recall(approx: Map[Long, Set[Long]]): Double = {
        val per = exact.map { case (qid, ex) =>
          approx.getOrElse(qid, Set.empty).intersect(ex).size.toDouble / ex.size }
        per.sum / per.size
      }
      time(s"$tag gateLshTopK") {
        recordedGates(s"$tag gate_q29_recall_at_3") =
          recall(ids(Similarity.lshTopK(ec, q, 3))); 5L }
      time(s"$tag gateIvfTopK") {
        recordedGates(s"$tag gate_q30_recall_at_3") =
          recall(ids(Similarity.ivfTopK(ec, q, 3))); 5L }
      time(s"$tag gatePairJaccard") {
        val exactPairs = Similarity.cosinePairs(ec, 0.3)
          .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
        val lshPairs = Similarity.lshNearDupPairs(ec, 0.3)
          .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
        recordedGates(s"$tag gate_q34_pair_set_jaccard") =
          if (exactPairs.isEmpty && lshPairs.isEmpty) 1.0
          else lshPairs.intersect(exactPairs).size.toDouble /
            lshPairs.union(exactPairs).size
        exactPairs.size.toLong }
      q.unpersist(); ec.unpersist()
    }
    if (fam("recall")) {
      val embRotK = (0 until k).map(i => emb1
          .withColumn("vec_id", col("vec_id") + lit(i * 1000000L))
          .withColumn("embedding", expr(
            s"CAST(transform(sequence(0, 63), j -> embedding[(j + $i) % 64]) AS array<float>)")))
        .reduce(_ unionByName _)
      gateRun("1x", emb1)
      gateRun(s"${k}x", embRotK)
    }
    writeArtifact(k, recorded.toSeq, recordedGates.toSeq)
    spark.stop()
  }

  /** Fold this run's timings into `REHEARSAL.json` (repo cwd). Names come
    * in as "<tag> <op>" with tag "1x" or "<k>x"; the artifact groups per
    * op as {"1x": {rows, sec}, "kx": {rows, sec}, "ratio": kx.sec/1x.sec}
    * so a per-family run (the 2nd-arg filter) refreshes only its own ops
    * and the growth exponent stays one `jq` away. */
  private def writeArtifact(k: Int, recorded: Seq[(String, (Long, Double))],
                            gates: Seq[(String, Double)] = Nil): Unit = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val path = java.nio.file.Paths.get(sys.props("user.dir"), "REHEARSAL.json")
    val existing: Map[String, JValue] =
      if (java.nio.file.Files.exists(path))
        try JsonMethods.parse(java.nio.file.Files.readString(path)) match {
          case JObject(fields) => fields.toMap
          case other =>
            // a corrupt artifact silently discarding every previously
            // merged family's timings is worse than a loud stop: warn, and
            // keep going only because the file demonstrably parsed (it is
            // just not an object)
            System.err.println(
              s"[rehearse] WARNING: $path parsed as ${other.getClass.getSimpleName}, not an object — starting fresh")
            Map.empty
        } catch {
          case e: Exception =>
            System.err.println(
              s"[rehearse] WARNING: $path unreadable (${e.getMessage}) — prior per-family timings will be lost")
            Map.empty
        }
      else Map.empty
    val byOp = recorded.flatMap { case (name, (rows, sec)) =>
      name.split(" ", 2) match {
        case Array(tag, op) => Some(op -> (tag, rows, sec))
        case _ => None
      }
    }.groupBy(_._1)
    val updated = byOp.map { case (op, entries) =>
      val tags = entries.map { case (_, (tag, rows, sec)) =>
        tag -> JObject("rows" -> JLong(rows),
          "sec" -> JDouble(math.rint(sec * 1000) / 1000))
      }
      val ratio = for {
        t1 <- entries.collectFirst { case (_, ("1x", _, s)) => s }
        tk <- entries.collectFirst { case (_, (t, _, s)) if t != "1x" => s }
        if t1 > 0
      } yield "ratio" -> JDouble(math.rint(tk / t1 * 100) / 100)
      // k lives PER OP (the "<k>x" tag name plus this field), never at the
      // top level: a family-filtered run at a different k would otherwise
      // mislabel every other op's ratios
      op -> JObject((tags ++ ratio.toSeq :+ ("k" -> JInt(k))): _*)
    }
    // quality gates at scale: METRIC VALUES per tag (not wall seconds),
    // keyed gate_q* so they sit beside the wall ratios in one artifact —
    // {"1x": 0.93, "8x": 0.9, "k": 8, "threshold": 0.9} per gate
    val gateObjs = gates.flatMap { case (name, v) =>
      name.split(" ", 2) match {
        case Array(tag, op) => Some(op -> (tag, v))
        case _ => None
      }
    }.groupBy(_._1).map { case (op, entries) =>
      val vals = entries.map { case (_, (tag, v)) =>
        tag -> JDouble(math.rint(v * 10000) / 10000) }
      op -> JObject((vals :+ ("k" -> JInt(k)) :+
        ("threshold" -> JDouble(0.9))): _*)
    }
    val merged = JObject(
      ("sf" -> JString("sf0.1")) +:
        (existing - "k" - "sf" ++ updated ++ gateObjs).toSeq.sortBy(_._1): _*)
    // temp-then-ATOMIC_MOVE: a crash mid-write must never leave a torn
    // artifact (which the reader above would then discard wholesale)
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    java.nio.file.Files.writeString(tmp,
      JsonMethods.pretty(JsonMethods.render(merged)) + "\n")
    java.nio.file.Files.move(tmp, path,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    println(s"REHEARSE artifact -> $path (${updated.size} ops updated)")
  }
}
