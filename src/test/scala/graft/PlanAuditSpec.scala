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
