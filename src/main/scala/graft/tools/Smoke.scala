package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{Engine, GraftFunctions, SparkEntry, Tables}

/** End-to-end smoke drive of the engine through its public API — the runtime
  * surface for verification. Mirrors the reference's own smoke script
  * (/root/reference/test_api.sh): ingest the corpus, run the two fixture
  * queries, print stats, and exercise the error paths.
  *
  * Usage: sbt "runMain graft.tools.Smoke [sfDir]"
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-smoke")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    SparkEntry.tune(spark)

    // POST /ingest equivalent (main.py:255-312)
    val index = Engine.ingest(Tables.documents(spark, sfDir)).cache()
    val total = index.count()
    println(s"== ingest: $total chunks from $sfDir")

    // GET /stats equivalent (main.py:340-360)
    println("== stats (per source, first 5):")
    Engine.statsBySource(index).orderBy("source").show(5, truncate = false)
    Engine.statsTotal(index).show()

    // POST /search equivalents (test_api.sh:36-57 fixtures)
    for ((q, k) <- Seq(
      ("What are the articulation agreements for University of Florida?", 3),
      ("transfer credits", 2))) {
      println(s"== search: '$q' top_k=$k")
      Engine.search(index, q, k).show(20, 60)
      val resp = Engine.searchResponse(index, q, k).collect()(0)
      println(s"   total_results=${resp.getAs[Long]("total_results")} " +
        s"context_len=${resp.getAs[String]("context").length}")
    }

    // self-retrieval: querying with an indexed chunk's own text must return
    // that chunk at rank 1 with score 1.0
    val probe = index.orderBy("id").select("id", "text").collect()(0)
    val hit = Engine.search(index, probe.getString(1), 1).collect()(0)
    println(s"== self-retrieval: query=chunk ${probe.getString(0)} -> " +
      s"top hit ${hit.getAs[String]("id")} score=${hit.getAs[Double]("score")}")

    // physical plan of the flagship query
    println("== flagship plan:")
    Engine.search(index, "transfer credits", 5).explain("formatted")

    // error path: empty query must be rejected (main.py:317-318)
    try { Engine.search(index, "   ", 5); println("!! empty query accepted") }
    catch { case e: IllegalArgumentException => println(s"== empty query rejected: ${e.getMessage}") }

    // retrieval-mode tour: hybrid (RRF + blend), filtered, diversified,
    // paginated, faceted, MMR, recommend — one line each
    val q = "transfer credits"
    def firstIds(df: org.apache.spark.sql.DataFrame, n: Int = 3): String =
      df.select("id").collect().take(n).map(_.getString(0)).mkString(",")
    println(s"== hybrid rrf top:   ${firstIds(Engine.hybridSearch(index, q, 3))}")
    println(s"== hybrid blend top: ${firstIds(Engine.hybridSearchBlend(index, q, 3))}")
    println(s"== filtered (doc_id%3=0): ${firstIds(Engine.searchWhere(index, q, org.apache.spark.sql.functions.expr("doc_id % 3 = 0"), 3))}")
    println(s"== diverse per-source:    ${firstIds(Engine.searchDiverse(index, q, 3))}")
    println(s"== page 1 (rows 6-10):    ${firstIds(Engine.searchPage(index, q, 1, 5))}")
    println(s"== facets: ${Engine.searchFacets(index, q, 50).count()} sources in top-50")
    println(s"== mmr:    ${firstIds(graft.operators.Rerank.mmrRerank(index, q, 3))}")
    val seed = index.orderBy("id").select("id").collect()(0).getString(0)
    println(s"== recommend(seed=$seed): ${firstIds(Engine.recommend(index, Seq(seed), Nil, 3))}")

    // index lifecycle tour on a temp copy: versioned write -> fsck ->
    // delete a source -> compact -> read back
    val root = java.nio.file.Files.createTempDirectory("graft-smoke-idx").toString
    val v1 = Engine.writeIndexVersioned(index, s"$root/idx")
    val fsck = Engine.indexFsck(Engine.readIndexLatest(spark, s"$root/idx")).collect()(0)
    println(s"== lifecycle: committed v$v1, fsck dup_ids=${fsck.getAs[Long]("n_duplicate_ids")} " +
      s"bad_emb=${fsck.getAs[Long]("n_bad_embeddings")}")
    Engine.deleteSourceAt(spark, s"$root/idx/v=$v1", "src0")
    val afterDelete = Engine.readIndexLatest(spark, s"$root/idx")
    println(s"== lifecycle: dropped src0 partition -> ${afterDelete.count()} rows remain")
    val compacted = Engine.compactIndexAt(spark, s"$root/idx/v=$v1")
    println(s"== lifecycle: compacted ${compacted.size} fragmented partitions")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))

    // ANN-index family + data-pipeline tour over the embeddings table:
    // every compressed index answers the same queries, then the corpus ops
    import graft.operators.{Dedup, Sampling, Similarity, TextAnalysis}
    val emb = graft.Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val qv = graft.Tables.embeddings(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("vec_id") < 2)
      .select(org.apache.spark.sql.functions.col("vec_id").as("query_id"),
        org.apache.spark.sql.functions.col("embedding").as("query_embedding"))
    def topIds(df: org.apache.spark.sql.DataFrame): String =
      df.filter("query_id = 0").orderBy("rnk").collect()
        .map(_.getAs[Long]("vec_id")).mkString(",")
    println(s"== ann pq:     ${topIds(Similarity.pqTopK(emb, qv, 3))}")
    println(s"== ann ivf-pq: ${topIds(Similarity.ivfPqTopK(emb, qv, 3))}")
    val docsAll = graft.Tables.documents(spark, sfDir)
    println(s"== semantic dedup: ${Dedup.semanticDedup(emb, 0.35).count()} of ${emb.count()} kept")
    println(s"== cross dedup vs corpus: ${Similarity.rpCrossNearDupPairs(
      emb.filter("vec_id % 10 = 0"), emb.filter("vec_id % 10 <> 0"), 0.3).count()} incoming near-dups")
    println(s"== mixture(src0:3,src1:1): ${Sampling.sampleToMixture(docsAll, "source",
      Seq("src0" -> 3.0, "src1" -> 1.0), 30).count()} rows kept")
    println(s"== quality quantile (top 40%/source): ${Sampling.topQualityByStratum(
      docsAll, "source", 0.4).count()} rows")
    val sup = TextAnalysis.surprisalScore(docsAll)
      .agg(org.apache.spark.sql.functions.min("surprisal"),
        org.apache.spark.sql.functions.max("surprisal")).collect()(0)
    println(f"== surprisal range: ${sup.getDouble(0)}%.3f .. ${sup.getDouble(1)}%.3f")
    println(s"== boilerplate docs (frac>=0.5): ${TextAnalysis.boilerplateStats(docsAll)
      .filter("boiler_frac >= 0.5").count()}")

    // analytics tour: the event/warehouse surface added in round 5
    val ea = graft.operators.EventAnalytics
    val events = graft.Tables.events(spark, sfDir)
    val funnelN = ea.funnel(events, Seq("view", "click", "purchase"))
      .groupBy("step").count().orderBy("step").collect()
      .map(r => s"step${r.getInt(0)}=${r.getLong(1)}").mkString(" ")
    println(s"== funnel: $funnelN")
    println(s"== retention cells: ${ea.retentionCohorts(events).count()}; " +
      s"daily-active days: ${ea.dailyActiveUsers(events).count()}")
    val audit = graft.operators.TableStats.dqAudit(Seq(
      "lineitem_orphan_orderkey" -> graft.operators.TableStats.orphans(
        graft.Tables.lineitem(spark, sfDir), "l_orderkey",
        graft.Tables.orders(spark, sfDir), "o_orderkey")))
      .collect()(0)
    println(s"== dq audit: ${audit.getString(0)} -> ${audit.getLong(1)} violations")
    val pr = graft.operators.Graph.pageRank(
      graft.Tables.lineitem(spark, sfDir).select(
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("p"),
          org.apache.spark.sql.functions.col("l_partkey")).as("src"),
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("s"),
          org.apache.spark.sql.functions.col("l_suppkey")).as("dst")).distinct(), 3)
      .orderBy(org.apache.spark.sql.functions.desc("rank_fx"),
        org.apache.spark.sql.functions.asc("node")).limit(3)
      .collect().map(r => r.getString(0)).mkString(",")
    println(s"== pagerank top-3 nodes: $pr")
    println(s"== postings: ${TextAnalysis.postings(docsAll).count()} entries; " +
      s"indexed bm25 hits: ${TextAnalysis.bm25Indexed(TextAnalysis.postings(docsAll),
        TextAnalysis.docLengths(docsAll), Seq("join", "hash")).count()}")

    // round-6 tour: quality gates, linkage, graph, multimodal, retrieval QA
    import org.apache.spark.sql.functions.{col, expr}
    val keepN = TextAnalysis.gopherQuality(docsAll).filter("keep = 1").count()
    println(s"== gopher rules: $keepN of ${docsAll.count()} kept")
    val leak = graft.operators.Pipeline.splitLeakage(docsAll)
      .filter("split_a <> split_b")
      .agg(org.apache.spark.sql.functions.sum("n_pairs")).collect()(0)
    println(s"== split leakage: ${if (leak.isNullAt(0)) 0L else leak.getLong(0)} cross-split near-dup pairs")
    val tri = graft.operators.Graph.triangleCount(
      graft.Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("g"), col("l_partkey").as("item")).distinct()
        .as("a").join(graft.Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey").as("g"), col("l_partkey").as("item")).distinct()
          .hint("SHUFFLE_HASH").as("b"),
          col("a.g") === col("b.g") && col("a.item") < col("b.item"))
        .groupBy(col("a.item").as("x"), col("b.item").as("y"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("ng"))
        .filter("ng >= 2").select("x", "y")).collect()(0)
    println(s"== triangles: ${tri.getLong(3)} in ${tri.getLong(1)}-edge co-purchase graph, " +
      f"clustering ${tri.getDouble(4)}%.4f")
    val fz = graft.operators.Joins.fuzzyLookup(
      graft.Tables.part(spark, sfDir).filter("p_partkey % 403 = 0"),
      graft.Tables.part(spark, sfDir), "p_partkey", "p_name").count()
    println(s"== fuzzy lookup: $fz probe matches (jaro-winkler)")
    val cuts = graft.multimodal.Multimodal.sceneCuts(
      graft.multimodal.Multimodal.asMedia(docsAll, "doc_id", "encode(text, 'utf-8')", "raw"))
      .filter("is_cut = 1").count()
    println(s"== scene cuts: $cuts")
    val rec = Similarity.annRecall(emb, qv, 3)
      .agg(expr("round(avg(recall), 4)")).collect()(0)
    println(s"== ann recall@3 (ivf vs exact): ${rec.get(0)}")

    // round-9 tour: tokenizer training + sketches + importance selection
    val bpe = graft.operators.Bpe.bpeMerges(docsAll, 4)
      .orderBy("iter").collect()
      .map(r => s"${r.getString(1)}+${r.getString(2)}").mkString(", ")
    println(s"== bpe merges (4): $bpe")
    val hh = graft.operators.Sketches.cmsTopK(docsAll, k = 3)
      .select("token").collect().map(_.getString(0)).mkString(", ")
    println(s"== cms heavy hitters: $hh")
    val dsir = graft.operators.Sampling.dsirSelect(
      docsAll.filter(col("lang") =!= "en"),
      docsAll.filter(col("lang") === "en"), 5, 256)
    println(s"== dsir top-5 non-en docs (en-like): " +
      dsir.select("doc_id").collect().map(_.getLong(0)).mkString(", "))

    // round-10 tour: eval triad + space audits + planner sketch + funnels
    val ev = graft.Tables.events(spark, sfDir)
    val embLab = graft.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding", "label")
    val cal = Similarity.calibrationTable(embLab)
      .agg(expr("round(max(abs(gap)), 4)")).collect()(0)
    println(s"== calibration: max |gap| ${cal.get(0)} over 10 bins")
    val hubs = Similarity.hubnessTopHubs(embLab.select("vec_id", "embedding"))
      .limit(3).collect().map(r => s"${r.getLong(0)}(${r.getLong(1)})")
    println(s"== hubness top-3 (k_occ): ${hubs.mkString(", ")}")
    val mat = Similarity.matryoshkaOverlap(embLab.select("vec_id", "embedding"))
      .agg(expr("round(avg(overlap_frac), 4)")).collect()(0)
    println(s"== matryoshka overlap@5 (16 of 64 dims): ${mat.get(0)}")
    val jse = graft.operators.Sketches.cmsJoinSizeEstimate(
      graft.Tables.lineitem(spark, sfDir), graft.Tables.orders(spark, sfDir),
      "l_orderkey", "o_orderkey").collect()(0)
    println(s"== join-size estimate: est ${jse.getLong(2)} vs exact " +
      s"${jse.getLong(3)} (rel_err ${jse.get(4)})")
    val wf = graft.operators.EventAnalytics.windowedFunnel(
      ev, Seq("view", "click", "purchase"))
      .collect().map(r => s"${r.getLong(1)}").mkString(" -> ")
    println(s"== windowed funnel (7d gaps): $wf")
    val tt = graft.operators.EventAnalytics.welchTTest(ev).collect()(0)
    println(f"== welch t (purchase vs click cents): t=${tt.getDouble(6)}%.3f df=${tt.getDouble(7)}%.1f")

    // round-11 tour: robust stats through the distributed-rank path, the
    // spectral probe over the covariance moments, and the JSONL boundary
    val madTop = graft.operators.EventAnalytics.madOutliers(ev)
      .orderBy(col("outlier_frac").desc).limit(1).collect()(0)
    println(s"== mad outliers: worst type ${madTop.getString(0)} " +
      s"frac ${madTop.get(5)} (med ${madTop.getLong(2)}c mad ${madTop.getLong(3)}c)")
    val gini = graft.operators.EventAnalytics.giniConcentration(ev)
      .agg(expr("round(max(gini), 4)")).collect()(0)
    println(s"== gini spend concentration: max over types ${gini.get(0)}")
    val spec = Similarity.dominantEigenProbe(embLab.select("embedding"))
      .limit(3).collect().map(r => s"${r.getInt(0)}(${r.get(2)})")
    println(s"== spectral probe top-3 dims (share): ${spec.mkString(", ")}")
    val jtmp = java.nio.file.Files.createTempDirectory("graft-smoke-jsonl")
    java.nio.file.Files.write(jtmp.resolve("c.jsonl"), java.util.Arrays.asList(
      """{"doc_id": 1, "text": "smoke alpha", "lang": "en", "source": "s"}""",
      "garbage line"))
    val jrep = graft.sources.JsonlCorpusSource.ingestReport(
      graft.sources.JsonlCorpusSource.read(spark, jtmp.toString)).collect()(0)
    println(s"== jsonl ingest: ${jrep.getLong(0)} valid, ${jrep.getLong(1)} corrupt (sampled)")
    // streamed-state tour (q257-q260 pillar): the lex index maintained as
    // waved epoch partials answers BM25 from state, batch-equal
    // ensureLexState IS the q258 build (same table, same mod-4 split,
    // same mid-lifecycle compactLexIndexAt), so Smoke shares the
    // marker-protected cache instead of building a duplicate copy
    val lexState = graft.streaming.Streams.ensureLexState(
      spark, graft.Tables.documents(spark, sfDir), sfDir)
    val sEpochs = spark.read.parquet(lexState)
      .select("epoch").distinct().count()
    val sBm = graft.streaming.Streams.bm25StreamedAt(
      spark, lexState, Seq("join", "hash", "customer")).count()
    println(s"== streamed lex state: $sEpochs epochs, bm25-from-state rows $sBm")

    // r18 tour: text-in hybrid serving over the maintained stack (fixture
    // strings embedded + keyword-normalized in-plan; persisted IVF-PQ
    // resolved through the generation pointer) and the cross-store
    // takedown audit (per-store leak counts must all be 0)
    val servedText = graft.SparkEntry
      .queries("q306_hybrid_serving_text")(spark, sfDir)
      .filter(col("query_id") === 1).collect()
      .map(r => s"${r.getLong(1)}").mkString(",")
    println(s"== text-in serving ('transfer credits' top docs): $servedText")
    val takedownAudit = graft.SparkEntry
      .queries("q307_takedown_audit")(spark, sfDir)
      .collect().map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(" ")
    println(s"== takedown audit (leaked ids per store): $takedownAudit")

    spark.stop()
  }
}
