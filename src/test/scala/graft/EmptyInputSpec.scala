package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Empty-input robustness sweep: a 100 TB pipeline routinely hands an
  * operator an EMPTY frame (a filter that matched nothing, a partition
  * with no rows, a source that drained). Every operator here must return
  * a well-formed result — usually 0 rows, occasionally a defined summary
  * row — and NEVER throw. Operators with an explicit non-empty contract
  * (the search entry points, which `require` a non-empty query, not a
  * non-empty corpus) are exercised against an empty CORPUS. */
class EmptyInputSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs0: DataFrame =
    Tables.documents(spark, TestSpark.sf0001).limit(0)
  private def emb0: DataFrame =
    Tables.embeddings(spark, TestSpark.sf0001).limit(0)
  private def ev0: DataFrame =
    Tables.events(spark, TestSpark.sf0001).limit(0)
  private def li0: DataFrame =
    Tables.lineitem(spark, TestSpark.sf0001).limit(0)

  private def rows(df: DataFrame): Long = df.count()

  test("dedup family: empty corpus yields empty results") {
    assert(rows(Dedup.exactGroups(docs0)) == 0)
    assert(rows(Dedup.minhashPairs(docs0, 0.5)) == 0)
    assert(rows(Dedup.simhashPairs(docs0, 3)) == 0)
    assert(rows(Dedup.jaccardPairs(docs0, 0.5)) == 0)
    assert(rows(Dedup.shingleNovelty(docs0)) == 0)
    assert(rows(Dedup.blockDedup(docs0)) == 0)
  }

  test("text-analysis family: empty corpus yields empty stats") {
    assert(rows(TextAnalysis.bm25(docs0, Seq("join", "hash"))) == 0)
    assert(rows(TextAnalysis.postings(docs0)) == 0)
    assert(rows(TextAnalysis.termBurstiness(docs0)) == 0)
    assert(rows(TextAnalysis.winnowFingerprints(docs0)) == 0)
    assert(rows(TextAnalysis.readability(docs0)) == 0)
    assert(rows(TextAnalysis.subwordFertility(docs0)) == 0)
  }

  test("sketch family: empty input degrades to empty or defined-zero state") {
    assert(rows(Sketches.tokenCounts(docs0)) == 0)
    assert(rows(Sketches.cmsTopK(docs0)) == 0)
    assert(rows(Sketches.merkleLeaves(docs0)) == 0)
    // the join-size estimate's summary row survives with a 0 exact count
    val est = Sketches.cmsJoinSizeEstimate(li0, li0, "l_orderkey", "l_orderkey")
      .selectExpr("exact_pairs").as[Long].collect().toSeq
    assert(est == Seq(0L) || est.isEmpty)
  }

  test("event-analytics family: empty stream yields empty analytics") {
    assert(rows(EventAnalytics.funnel(ev0, Seq("view", "click"))) == 0)
    assert(rows(EventAnalytics.windowedFunnel(ev0, Seq("view", "click"))) == 0)
    assert(rows(EventAnalytics.retentionCohorts(ev0)) == 0)
    assert(rows(EventAnalytics.cohortLtv(ev0)) == 0)
    assert(rows(EventAnalytics.rfmSegments(ev0)) == 0)
    assert(rows(EventAnalytics.benfordAudit(ev0)) == 0)
    assert(rows(EventAnalytics.dailyPercentileBands(ev0)) == 0)
    assert(rows(EventAnalytics.ksDrift(ev0)) == 0)
    assert(rows(EventAnalytics.seasonalNaiveBacktest(ev0)) == 0)
    assert(rows(EventAnalytics.bootstrapCi(ev0)) == 0)
    assert(rows(EventAnalytics.madOutliers(ev0)) == 0)
    assert(rows(EventAnalytics.trimmedMean(ev0)) == 0)
    assert(rows(EventAnalytics.giniConcentration(ev0)) == 0)
    assert(rows(EventAnalytics.stateHistory(ev0)) == 0)
  }

  test("eval/similarity family: empty collection yields empty tables") {
    val e = emb0.select("vec_id", "embedding", "label")
    assert(rows(Similarity.separabilityAuc(e)) == 0)
    assert(rows(Similarity.liftTable(e)) == 0)
    assert(rows(Similarity.calibrationTable(e)) == 0)
    assert(rows(Similarity.prototypeOutliers(e)) == 0)
    assert(rows(Similarity.embeddingCovariance(emb0.select("embedding"))) == 0)
    assert(rows(Similarity.dominantEigenProbe(emb0.select("embedding"))) == 0)
    assert(rows(Similarity.hubnessTopHubs(emb0.select("vec_id", "embedding"))) == 0)
    assert(rows(Similarity.matryoshkaOverlap(emb0.select("vec_id", "embedding"))) == 0)
  }

  test("joins/sampling family: empty fact yields empty or zero-row summaries") {
    assert(rows(Joins.topValueParts(li0)) == 0)
    assert(rows(Joins.forecastRevenueChange(li0)) == 1) // global agg: 1 null-sum row
    assert(rows(Sampling.splitByHash(docs0)) == 0)
    assert(rows(Sampling.groupHoldoutSplit(ev0)) == 0)
    assert(rows(Sampling.temperatureMixture(docs0)) == 0)
    assert(rows(Sampling.unimaxSample(docs0)) == 0)
  }

  test("driver-seeded operators: empty input yields empty output, not a crash") {
    // these three collect driver-side state (greedy seed, ratio table,
    // merge argmax) — the paths most likely to .head an empty frame
    assert(rows(Similarity.kCenterCoreset(emb0.select("vec_id", "embedding"))) == 0)
    assert(rows(Sampling.dsirSelect(docs0, docs0, 5, 256)) == 0)
    assert(rows(Bpe.bpeMerges(docs0)) == 0)
  }

  test("round-10b additions: empty input yields empty or defined-null summaries") {
    assert(rows(EventAnalytics.welchTTest(ev0)) == 0)
    assert(rows(EventAnalytics.psiDrift(ev0)) == 0)
    assert(rows(Pipeline.kAnonymityAudit(ev0, Seq("event_type"),
      "CAST(round(value * 100) AS BIGINT)")) <= 1)
    assert(rows(Layout.compactionPlan(
      docs0.selectExpr("source", "doc_id", "n_chars"),
      "source", "doc_id", "n_chars", 65536L)) == 0)
    assert(rows(Dedup.duplicateCoverage(docs0)) == 0)
    assert(rows(Dedup.dedupRecallAudit(docs0)) == 1) // 0/0/0 summary, NULL fracs
    assert(rows(Similarity.knnConfusion(
      emb0.select("vec_id", "embedding", "label"))) == 0)
    assert(rows(Joins.productTypeProfit(li0,
      Tables.orders(spark, TestSpark.sf0001).limit(0),
      Tables.supplier(spark, TestSpark.sf0001).limit(0),
      Tables.nation(spark, TestSpark.sf0001).limit(0),
      Tables.part(spark, TestSpark.sf0001).limit(0))) == 0)
  }

  test("round-11b additions: empty input yields empty or defined summaries") {
    val ord0 = Tables.orders(spark, TestSpark.sf0001).limit(0)
    val part0 = Tables.part(spark, TestSpark.sf0001).limit(0)
    val supp0 = Tables.supplier(spark, TestSpark.sf0001).limit(0)
    val nat = Tables.nation(spark, TestSpark.sf0001)
    val reg = Tables.region(spark, TestSpark.sf0001)
    assert(rows(TextAnalysis.tfidfIndexed(
      TextAnalysis.postings(docs0), TextAnalysis.docLengths(docs0),
      Seq("transfer"))) == 0)
    assert(rows(Joins.minCostSupplier(li0, part0, supp0, nat, reg)) == 0)
    assert(rows(Joins.excessShippers(li0, part0, supp0, nat, reg)) == 0)
    assert(rows(Joins.shipmodePriorityCounts(ord0, li0)) == 0)
    assert(rows(TableStats.mutualInformation(docs0, "source", "lang")) == 0)
    assert(rows(TextAnalysis.langIdConfusion(docs0)) == 0)
    assert(rows(Sampling.trainOrder(docs0)) == 0)
    assert(rows(TextAnalysis.groupTermCounts(docs0)) == 0)
    assert(rows(TextAnalysis.sourceEntropyFromCounts(
      TextAnalysis.groupTermCounts(docs0))) == 0)
    assert(rows(TextAnalysis.jsdSourcesFromCounts(
      TextAnalysis.groupTermCounts(docs0))) == 0)
  }

  test("search surface: empty index answers empty, does not throw") {
    val index = Engine.ingest(docs0.select("doc_id", "text", "source"))
    assert(rows(index) == 0)
    assert(rows(Engine.search(index, "transfer credits", 5)) == 0)
  }
}
