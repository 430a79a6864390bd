package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Joins

class JoinsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedEquiJoin equals the plain join on pathologically skewed data") {
    // 10k rows, 95% share one hot key — the single-key skew AQE's
    // partition splitter cannot spread for a broadcast-ineligible side
    val big = spark.range(0, 10000)
      .selectExpr("id", "IF(id % 20 = 0, CAST(id % 7 AS STRING), 'HOT') AS k")
    val small = Seq(("HOT", "hotv"), ("1", "v1"), ("3", "v3"))
      .toDF("k", "v")
    val plain = big.join(small, Seq("k")).select($"id", $"v")
      .as[(Long, String)].collect().toSet
    val salted = Joins.saltedEquiJoin(big, small, "k", salt = 8)
      .select($"id", $"v").as[(Long, String)].collect().toSet
    assert(salted == plain)
    // left joins preserve unmatched rows too
    val plainLeft = big.join(small, Seq("k"), "left").select($"id", $"v")
      .as[(Long, Option[String])].collect().toSet
    val saltedLeft = Joins.saltedEquiJoin(big, small, "k", salt = 8, joinType = "left")
      .select($"id", $"v").as[(Long, Option[String])].collect().toSet
    assert(saltedLeft == plainLeft)
  }

  test("salting spreads the hot key across sub-keys") {
    val big = spark.range(0, 1000).selectExpr("id", "'HOT' AS k")
    val salted = big.withColumn("__salt",
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(8)))
    val counts = salted.groupBy("__salt").count().as[(Int, Long)].collect()
    assert(counts.length == 8) // every sub-key used
    assert(counts.map(_._2).max < 1000 * 0.3) // no sub-key dominates
  }
}
