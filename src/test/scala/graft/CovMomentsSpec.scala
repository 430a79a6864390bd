package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CovMomentsAgg

/** The flat covariance buffer must equal the brute-force moments for any
  * input and any partitioning — the whole point of an imperative
  * Aggregator is that the merge algebra is invisible to the result.
  * Seeded pseudo-random frames keep the check deterministic. */
class CovMomentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("aggregated moments equal brute force across seeds and partitionings") {
    val agg = udaf(CovMomentsAgg)
    for (seed <- Seq(1, 7, 42); parts <- Seq(1, 5)) {
      val rnd = new scala.util.Random(seed)
      val d = 2 + rnd.nextInt(6)
      val n = 1 + rnd.nextInt(40)
      val data = Seq.fill(n)(Seq.fill(d)(rnd.nextInt(2001).toLong - 1000))
      val got = data.toDF("q").repartition(parts)
        .agg(agg(col("q")).as("m"))
        .select(col("m.n"), col("m.sums"), col("m.prods"))
        .as[(Long, Seq[Long], Seq[Long])].head()
      val sums = (0 until d).map(i => data.map(_(i)).sum)
      val prods = for (i <- 0 until d; j <- i until d)
        yield data.map(r => r(i) * r(j)).sum
      assert(got == ((n.toLong, sums, prods)),
        s"moment mismatch at seed=$seed parts=$parts d=$d n=$n")
    }
  }

  test("ragged dimensionality fails fast; empty input folds to the zero state") {
    val agg = udaf(CovMomentsAgg)
    val e = intercept[org.apache.spark.SparkException] {
      Seq(Seq(1L, 2L), Seq(1L, 2L, 3L)).toDF("q").coalesce(1)
        .agg(agg(col("q"))).collect()
    }
    assert(e.getMessage.contains("ragged") ||
      Option(e.getCause).exists(_.getMessage.contains("ragged")))
    val z = Seq.empty[Seq[Long]].toDF("q")
      .agg(agg(col("q")).as("m"))
      .select(col("m.n"), col("m.sums"), col("m.prods"))
      .as[(Long, Seq[Long], Seq[Long])].head()
    assert(z == ((0L, Seq.empty, Seq.empty)))
  }
}
