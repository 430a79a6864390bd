package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ranks
import graft.tools.PlanAudit

/** The global-window detector exists because round 10 shipped three
  * oracled queries whose green sf0.1 plans hid a SinglePartition
  * WindowExec over a corpus-proportional frame — nothing flagged the
  * class. The contract under test: a planted global ntile/rank IS
  * flagged, the distributed-rank replacement is NOT, and the `__pid`
  * offsets shape (the one bounded global window the rank machinery
  * itself needs) is exempt by construction. */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def findings(df: org.apache.spark.sql.DataFrame): Seq[String] =
    PlanAudit.globalWindowFindings(df.queryExecution.optimizedPlan)

  private lazy val base = spark.range(0, 100).toDF("id")
    .withColumn("v", expr("id * id % 17"))

  test("planted global ntile and row_number are flagged") {
    val ntiled = base.withColumn("t",
      ntile(4).over(Window.orderBy(col("v").asc, col("id").asc)))
    assert(findings(ntiled).nonEmpty)
    val ranked = base.withColumn("rn",
      row_number().over(Window.orderBy(col("id").asc)))
    assert(findings(ranked).nonEmpty)
  }

  test("a literal partition key does not hide a global window from the audit") {
    // partitionBy(lit(1)) suppresses WindowExec's runtime warning but IS
    // a single-partition plan; the optimizer folds the constant away and
    // the detector must still see an empty partition spec
    val hidden = base.withColumn("s",
      sum("v").over(Window.partitionBy(lit(1)).orderBy("id")))
    assert(findings(hidden).nonEmpty)
  }

  test("the distributed-rank forms pass: their only global window orders by __pid") {
    assert(findings(Ranks.distributedRank(
      base, Seq.empty, Seq(col("v").asc, col("id").asc), "rk")).isEmpty)
    assert(findings(Ranks.globalNtile(
      base, Seq(col("v").asc, col("id").asc), 4, "t")).isEmpty)
    assert(findings(Ranks.exclusivePrefixSum(
      base, Seq.empty, Seq(col("id").asc), col("v"), "p")).isEmpty)
  }

  test("partitioned windows are not flagged") {
    val part = base.withColumn("g", col("id") % 3)
      .withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("id").asc)))
    assert(findings(part).isEmpty)
  }

  test("a corpus-proportional frame sorted by a column named __pid is still flagged") {
    // the __pid exemption is for the OFFSETS shape (an aggregate grouped
    // on __pid below the window); a raw sort by a column that merely
    // shares the name must not ride it
    val disguised = base.withColumn("__pid", col("id"))
      .withColumn("rn", row_number().over(Window.orderBy(col("__pid").asc)))
    assert(findings(disguised).nonEmpty)
  }

  private def bcastFindings(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val qe = df.queryExecution
    qe.toRdd.count() // audit judges the FINAL (post-AQE) plan
    PlanAudit.broadcastFindings(qe.executedPlan)
  }

  test("a planted full-dim broadcast over part is flagged") {
    val li = Tables.lineitem(spark, TestSpark.sf0001)
    val part = Tables.part(spark, TestSpark.sf0001)
    val planted = li.select("l_partkey", "l_quantity")
      .join(broadcast(part.select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_type").agg(sum("l_quantity").as("q"))
    assert(bcastFindings(planted).exists(_.contains("part")))
  }

  test("the fixed TPC-H trees carry no broadcast over an SF-proportional frame") {
    val li = Tables.lineitem(spark, TestSpark.sf0001)
    val part = Tables.part(spark, TestSpark.sf0001)
    val supplier = Tables.supplier(spark, TestSpark.sf0001)
    val orders = Tables.orders(spark, TestSpark.sf0001)
    val customer = Tables.customer(spark, TestSpark.sf0001)
    val nation = Tables.nation(spark, TestSpark.sf0001)
    val region = Tables.region(spark, TestSpark.sf0001)
    assert(bcastFindings(operators.Joins.promoRevenueShare(li, part)).isEmpty)
    assert(bcastFindings(operators.Joins.topRevenueSupplier(li, supplier)).isEmpty)
    assert(bcastFindings(operators.Joins.soleBlockerSuppliers(
      orders, li, supplier)).isEmpty)
    assert(bcastFindings(operators.Joins.minCostSupplier(
      li, part, supplier, nation, region)).isEmpty)
    assert(bcastFindings(operators.Joins.nationMarketShare(
      li, orders, customer, supplier, nation, region, part)).isEmpty)
  }

  test("a planted corpus-table broadcast (documents) is flagged") {
    // the round-12 gap: only TPC-H tables were priced, so the tables the
    // actual 100 TB workload scans were unenforced
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val planted = Tables.events(spark, TestSpark.sf0001)
      .select(col("user_id") % 500 as "doc_id", col("value"))
      .join(broadcast(docs.select("doc_id", "lang")), Seq("doc_id"))
      .groupBy("lang").agg(sum("value").as("v"))
    assert(bcastFindings(planted).exists(_.contains("documents")))
  }

  test("a 1-row aggregate BRANCH does not exempt a fact-sized broadcast (dominance, not existence)") {
    // round-12 advisor defect: fact JOIN (1-row agg) is fact-sized, but
    // the old any-node-in-subtree check exempted it because the agg
    // branch satisfied the existence test
    val li = Tables.lineitem(spark, TestSpark.sf0001)
      .select("l_orderkey", "l_quantity")
    val oneRow = Tables.lineitem(spark, TestSpark.sf0001)
      .agg(avg("l_quantity").as("avg_q"))
    val factSized = li.crossJoin(oneRow)
      .filter(col("l_quantity") > col("avg_q") * 0)
    val planted = Tables.orders(spark, TestSpark.sf0001)
      .select("o_orderkey")
      .join(broadcast(factSized), col("o_orderkey") === col("l_orderkey"))
      .groupBy().agg(count(lit(1)).as("n"))
    assert(bcastFindings(planted).exists(_.contains("lineitem")))
  }

  test("two distinct offending broadcasts over the same table both count") {
    // round-12 advisor defect: .distinct on finding STRINGS collapsed two
    // real offenders into one, so a count-1 allowlist would pass a second
    val li = Tables.lineitem(spark, TestSpark.sf0001)
    val o = Tables.orders(spark, TestSpark.sf0001)
    val sliceA = li.filter(col("l_quantity") > 10)
      .select(col("l_orderkey").as("k1"), col("l_quantity").as("q1"))
    val sliceB = li.filter(col("l_quantity") <= 10)
      .select(col("l_orderkey").as("k2"), col("l_quantity").as("q2"))
    val planted = o.select("o_orderkey")
      .join(broadcast(sliceA), col("o_orderkey") === col("k1"))
      .join(broadcast(sliceB), col("o_orderkey") === col("k2"))
      .groupBy().agg(sum("q1").as("s1"), sum("q2").as("s2"))
    assert(bcastFindings(planted).count(_.contains("lineitem")) == 2)
  }

  test("a query-grouped GroupedTopK bounds its broadcast; a corpus-grouped one does not") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
      .select("vec_id", "embedding", "label")
    // query side from a literal range so the ONLY corpus-scanning
    // exchange under test is the shortlist broadcast itself
    val q = spark.range(0, 3).toDF("query_id")
    // per-query top-k — |queries| x k rows, broadcast by design
    val short = graft.plans.GroupedTopK(
      emb.crossJoin(broadcast(q))
        .select(col("query_id"), col("vec_id"),
          (col("vec_id") % 97 + col("query_id")).as("score")),
      Seq(col("query_id")), Seq(desc("score"), asc("vec_id")), 2)
    val reRank = emb.join(broadcast(short.select("query_id", "vec_id")),
        Seq("vec_id"))
      .groupBy("query_id").agg(count(lit(1)).as("n"))
    assert(bcastFindings(reRank).isEmpty)
    // per-LABEL top-k — group domain rides the corpus: not exempt
    val perLabel = graft.plans.GroupedTopK(
      emb.select(col("label"), col("vec_id"),
        (col("vec_id") % 97).as("score")),
      Seq(col("label")), Seq(desc("score"), asc("vec_id")), 2)
    val joined = emb.join(broadcast(perLabel.select("vec_id", "rank")),
        Seq("vec_id"))
      .groupBy("label").agg(count(lit(1)).as("n"))
    assert(bcastFindings(joined).exists(_.contains("embeddings")))
  }

  test("1-row global-aggregate broadcasts over big tables are structurally exempt") {
    // inactiveRichCustomers broadcasts avgRow — a global aggregate over
    // the customer slice: exactly 1 row at ANY scale factor, allowed
    val customer = Tables.customer(spark, TestSpark.sf0001)
    val orders = Tables.orders(spark, TestSpark.sf0001)
    assert(bcastFindings(operators.Joins.inactiveRichCustomers(
      customer, orders)).isEmpty)
  }

  test("every audit allowlist key names a declared query") {
    // a stale key (renamed/removed query) would silently allow nothing
    // while READING as if a bound were documented — keep the maps honest
    val declared = SparkEntry.queries.keySet
    for (k <- PlanAudit.boundedBroadcastPaths.keys)
      assert(declared.contains(k), s"boundedBroadcastPaths: $k")
    for (k <- PlanAudit.boundedGlobalWindowPaths.keys)
      assert(declared.contains(k), s"boundedGlobalWindowPaths: $k")
    for (k <- PlanAudit.annRankPaths)
      assert(declared.contains(k), s"annRankPaths: $k")
  }

  test("the fixed operators' plans carry no unbounded global window") {
    val ev = Tables.events(spark, TestSpark.sf0001)
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
      .select("vec_id", "embedding", "label")
    assert(findings(operators.EventAnalytics.rfmSegments(ev)).isEmpty)
    assert(findings(operators.EventAnalytics.bootstrapCi(ev)).isEmpty)
    assert(findings(operators.Similarity.separabilityAuc(emb)).isEmpty)
    // liftTable's one remaining global window is the buckets-row
    // cumulative gain — parameter-bounded, allowlisted by name
    assert(PlanAudit.boundedGlobalWindowPaths.contains("q216_lift"))
  }
}
