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

  test("duplicate order values tie-break stably via secondary key") {
    val df = Seq(("a", 1, "x"), ("a", 1, "y"), ("a", 1, "z")).toDF("g", "v", "id")
    val out = GroupedTopK(df, Seq(col("g")), Seq(asc("v"), asc("id")), 2)
      .select($"id", $"rank").as[(String, Int)].collect().toSet
    assert(out == Set(("x", 1), ("y", 2)))
  }
}
