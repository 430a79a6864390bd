package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TableStats

class TableStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("profileTable: nulls, exact distincts, min/max per column; one row per column") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), Some("b")),
      (Some(2L), None), (None, Some("a"))
    ).toDF("k", "s")
    val got = TableStats.profileTable(df, Seq("k", "s"))
      .as[(String, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == Set("k", "s"))
    assert(got("k") == (("k", 1L, 2L, "1", "2")))
    assert(got("s") == (("s", 1L, 2L, "a", "b")))
  }

  test("profileTable: no Expand — distincts are per-column narrow scans") {
    val df = Tables.lineitem(spark, TestSpark.sf0001)
    val prof = TableStats.profileTable(df, Seq("l_orderkey", "l_returnflag"))
    // base pass + one narrow scan per profiled column; crucially NO Expand
    // (the rows x (cols+1) shuffle the multi-distinct rewrite would plan)
    val plan = prof.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"profile must not Expand:\n$plan")
    val scans = prof.queryExecution.optimizedPlan.collectLeaves().size
    assert(scans == 3, s"expected base + 2 distinct scans, got $scans")
    assert(prof.count() == 2)
  }

  test("dqAudit: crafted violations counted per rule; clean rules report zero") {
    val parent = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    val child = Seq((10L, 1L), (11L, 1L), (12L, 3L), (13L, 99L))
      .toDF("cid", "parent_id") // 3 and 99 are orphans
    val dups = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "v")
    val report = TableStats.dqAudit(Seq(
      "child_orphans" -> TableStats.orphans(child, "parent_id", parent, "id"),
      "dup_keys" -> TableStats.duplicateKeys(dups, "k"),
      "clean_rule" -> parent.filter($"id" < 0)))
      .as[(String, Long)].collect().toMap
    assert(report == Map(
      "child_orphans" -> 2L, "dup_keys" -> 1L, "clean_rule" -> 0L))
  }
}
