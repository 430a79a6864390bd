package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GroupedTopK

class GroupedTopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("matches window row_number on customer per-segment top-3") {
    val cust = Tables.customer(spark, TestSpark.sf0001)
    val viaWindow = cust
      .withColumn("rank", row_number().over(
        Window.partitionBy("c_mktsegment").orderBy(desc("c_acctbal"), asc("c_custkey"))))
      .filter(col("rank") <= 3)
      .select($"c_mktsegment", $"c_custkey", $"rank")
      .as[(String, Long, Int)].collect().toSet
    val viaTopK = GroupedTopK(cust,
        Seq(col("c_mktsegment")), Seq(desc("c_acctbal"), asc("c_custkey")), 3)
      .select($"c_mktsegment", $"c_custkey", $"rank")
      .as[(String, Long, Int)].collect().toSet
    assert(viaTopK == viaWindow)
  }

  test("per-query ANN ranking equals bruteForceTopK") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001).select("vec_id", "embedding")
    val q = Tables.embeddings(spark, TestSpark.sf0001).filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("query_embedding"))
    val scored = graft.operators.Similarity.cosineScores(emb, q)
      .select("query_id", "vec_id", "score")
    val viaTopK = GroupedTopK(scored,
        Seq(col("query_id")), Seq(desc("score"), asc("vec_id")), 3)
      .select($"query_id", $"vec_id", $"rank").as[(Long, Long, Int)].collect().toSet
    val brute = graft.operators.Similarity.bruteForceTopK(emb, q, 3)
      .select($"query_id", $"vec_id", $"rnk").as[(Long, Long, Int)].collect().toSet
    assert(viaTopK == brute)
  }

  test("k larger than group size returns whole group ranked") {
    val df = Seq(("a", 3), ("a", 1), ("b", 2)).toDF("g", "v")
    val out = GroupedTopK(df, Seq(col("g")), Seq(asc("v")), 10)
      .as[(String, Int, Int)].collect().toSet
    assert(out == Set(("a", 1, 1), ("a", 3, 2), ("b", 2, 1)))
  }

  test("plan contains the custom exec and an exchange between phases") {
    val df = Seq(("a", 3), ("a", 1), ("b", 2)).toDF("g", "v")
    val plan = GroupedTopK(df, Seq(col("g")), Seq(asc("v")), 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GroupedTopK"), plan)
    assert(plan.contains("Exchange"), plan)
    // partial phase below the exchange, final (rank-assigning) phase above
    val lines = plan.linesIterator.toSeq
    val exchangeIdx = lines.indexWhere(_.contains("Exchange"))
    assert(lines.take(exchangeIdx).exists(_.contains("GroupedTopK")))
    assert(lines.drop(exchangeIdx).exists(_.contains("GroupedTopK")))
  }

  test("group-cardinality ~ row-count: partial phase flushes at the cap, result exact") {
    spark.conf.set(graft.plans.GroupedTopKExec.MaxPartialRowsKey, "100")
    // AQE wraps the partial exec in a query-stage leaf, hiding its metrics
    // from plan.collect — disable it so the flush counter is inspectable.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // 5000 rows, 2500 groups — per-partition group count far exceeds the
      // 100-row cap, so the bounded partial phase MUST flush to finish.
      val df = spark.range(0, 5000).selectExpr("id % 2500 AS g", "id AS v").toDF()
      val out = GroupedTopK(df, Seq(col("g")), Seq(asc("v")), 2)
        .select(col("g"), col("v"), col("rank"))
      // collect() on `out` itself: .as[T] would wrap a fresh QueryExecution,
      // and the flush metric below must be read from the plan that ran.
      val got = out.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val viaWindow = df
        .withColumn("rank", row_number().over(Window.partitionBy("g").orderBy(asc("v"))))
        .filter(col("rank") <= 2)
        .select($"g", $"v", $"rank").as[(Long, Long, Int)].collect().toSet
      assert(got == viaWindow)
      val plan = out.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val flushes = plan.collect {
        case g: graft.plans.GroupedTopKExec if !g.assignRank =>
          g.metrics("partialFlushes").value
      }.sum
      assert(flushes > 0, "expected the held-row cap to trigger partial flushes")
    } finally {
      spark.conf.unset(graft.plans.GroupedTopKExec.MaxPartialRowsKey)
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("duplicate order values tie-break stably via secondary key") {
    val df = Seq(("a", 1, "x"), ("a", 1, "y"), ("a", 1, "z")).toDF("g", "v", "id")
    val out = GroupedTopK(df, Seq(col("g")), Seq(asc("v"), asc("id")), 2)
      .select($"id", $"rank").as[(String, Int)].collect().toSet
    assert(out == Set(("x", 1), ("y", 2)))
  }
}
