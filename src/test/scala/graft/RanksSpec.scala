package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ranks

/** The distributed rank / prefix-sum / ntile primitives must be
  * BIT-IDENTICAL to the single-partition window functions they replace —
  * that is the whole contract: same oracle hashes, different plan shape.
  * Each test compares against the plain window form on a frame small
  * enough that the SinglePartition plan is harmless, across skewed
  * layouts and pathological sizes (n < buckets, one row, duplicates of
  * everything except the tie-break id). */
class RanksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 997 rows, deliberately collision-heavy value space so ties are common
  // and only the id tie-break makes the order total
  private lazy val base = spark.range(0, 997).toDF("id")
    .withColumn("v", expr("CAST(id * id % 37 AS BIGINT)"))
    .withColumn("g", expr("CAST(id % 5 AS STRING)"))
    .withColumn("w", expr("CAST(id % 11 + 1 AS BIGINT)"))
    .repartition(13)

  test("distributedRank (global) == row_number over the unpartitioned window") {
    val got = Ranks.distributedRank(base, Seq.empty,
        Seq(col("v").asc, col("id").asc), "rk", nPartitions = 7)
      .select("id", "rk")
    val want = base.withColumn("rk",
        row_number().over(Window.orderBy(col("v").asc, col("id").asc)).cast("long"))
      .select("id", "rk")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("distributedRank (grouped) == row_number over the partitioned window") {
    val got = Ranks.distributedRank(base, Seq("g"),
        Seq(col("v").desc, col("id").asc), "rk", nPartitions = 7)
      .select("id", "rk")
    val want = base.withColumn("rk",
        row_number().over(Window.partitionBy("g")
          .orderBy(col("v").desc, col("id").asc)).cast("long"))
      .select("id", "rk")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("exclusivePrefixSum (global and grouped) == exclusive running sum windows") {
    val gotG = Ranks.exclusivePrefixSum(base, Seq.empty,
        Seq(col("v").asc, col("id").asc), col("w"), "p", nPartitions = 7)
      .select("id", "p")
    val wantG = base.withColumn("p", coalesce(
        sum("w").over(Window.orderBy(col("v").asc, col("id").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("id", "p")
    assert(gotG.except(wantG).isEmpty && wantG.except(gotG).isEmpty)

    val gotP = Ranks.exclusivePrefixSum(base, Seq("g"),
        Seq(col("v").asc, col("id").asc), col("w"), "p", nPartitions = 7)
      .select("id", "p")
    val wantP = base.withColumn("p", coalesce(
        sum("w").over(Window.partitionBy("g")
          .orderBy(col("v").asc, col("id").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("id", "p")
    assert(gotP.except(wantP).isEmpty && wantP.except(gotP).isEmpty)
  }

  test("globalNtile == ntile for sizes around the floor-distribution edges") {
    for (n <- Seq(1L, 3L, 4L, 5L, 997L); b <- Seq(4, 10)) {
      val df = base.filter(col("id") < n)
      val got = Ranks.globalNtile(df,
          Seq(col("v").desc, col("id").asc), b, "t", nPartitions = 7)
        .select("id", "t")
      val want = df.withColumn("t",
          ntile(b).over(Window.orderBy(col("v").desc, col("id").asc)))
        .select("id", "t")
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"ntile mismatch at n=$n b=$b")
    }
  }

  test("seeded random frames: every primitive equals its window form") {
    for (seed <- Seq(3, 11)) {
      val rnd = new scala.util.Random(seed)
      val n = 50 + rnd.nextInt(400)
      val parts = 2 + rnd.nextInt(9)
      val data = Seq.tabulate(n)(i =>
        (i.toLong, rnd.nextInt(13).toLong, rnd.nextInt(4).toString,
          rnd.nextInt(9).toLong + 1))
      val df = data.toDF("id", "v", "g", "w").repartition(5)
      val got = Ranks.distributedRank(df, Seq("g"),
          Seq(col("v").desc, col("id").asc), "rk", parts)
        .select("id", "rk")
      val want = df.withColumn("rk", row_number().over(
          Window.partitionBy("g").orderBy(col("v").desc, col("id").asc))
        .cast("long")).select("id", "rk")
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"rank mismatch at seed=$seed n=$n parts=$parts")
      val buckets = 1 + rnd.nextInt(12)
      val gotNt = Ranks.globalNtile(df, Seq(col("v").asc, col("id").asc),
          buckets, "t", parts).select("id", "t")
      val wantNt = df.withColumn("t", ntile(buckets).over(
          Window.orderBy(col("v").asc, col("id").asc))).select("id", "t")
      assert(gotNt.except(wantNt).isEmpty && wantNt.except(gotNt).isEmpty,
        s"ntile mismatch at seed=$seed buckets=$buckets")
    }
  }

  test("empty input yields empty output, not a crash") {
    val e = base.limit(0)
    assert(Ranks.distributedRank(e, Seq("g"), Seq(col("id").asc), "rk").count() == 0)
    assert(Ranks.globalNtile(e, Seq(col("id").asc), 4, "t").count() == 0)
  }
}
