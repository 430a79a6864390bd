package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JaroWinkler

class JaroWinklerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // reference values from DuckDB's jaro_winkler_similarity (the oracle
  // engine), captured verbatim — the expression must agree bit-for-bit
  val duckProbes = Seq(
    ("martha", "marhta", 0.9611111111111111),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("jellyfish", "smellyfish", 0.8962962962962964),
    ("abc", "abc", 1.0),
    ("", "abc", 0.0),
    ("a", "", 0.0),
    ("DWAYNE", "DUANE", 0.8400000000000001),
    ("crate", "trace", 0.7333333333333334),
    ("ab", "ba", 0.0), // window 0: no matches
    ("abcdef", "abzzzz", 0.5555555555555555), // jaro <= 0.7: NO prefix boost
    ("abcdxxxx", "abcdyyyy", 0.6666666666666666), // ditto, 4-char prefix
    ("ax", "ab", 0.6666666666666666), // boost threshold is strict (> 0.7)
    ("abcd", "abdc", 0.9333333333333333)) // one transposition, boosted

  test("compute: bit-for-bit parity with DuckDB's jaro_winkler_similarity") {
    for ((a, b, want) <- duckProbes)
      assert(JaroWinkler.compute(a, b) == want, s"$a / $b")
  }

  test("expression: SQL registration, codegen path, null handling, symmetry") {
    val df = duckProbes.toDF("a", "b", "want")
    val got = df.selectExpr("jaro_winkler(a, b) AS jw", "want")
      .as[(Double, Double)].collect()
    assert(got.forall { case (jw, want) => jw == want })
    // symmetric in its arguments
    val sym = df.selectExpr("jaro_winkler(b, a) AS jw", "want")
      .as[(Double, Double)].collect()
    assert(sym.forall { case (jw, want) => jw == want })
    val n = Seq((Some("x"), Option.empty[String])).toDF("a", "b")
      .selectExpr("jaro_winkler(a, b)").collect()(0)
    assert(n.isNullAt(0))
  }

  test("fuzzyLookup: blocked candidates only, threshold cut, rounded-score rank, self excluded") {
    val catalog = Seq(
      (1L, "alpha beta gamma one"), (2L, "alpha beta gamma two"),
      (3L, "alpha beta delta one"), (4L, "omega psi chi one"),
      (5L, "alpha zeta gamma one")) // different 2nd token: other block
      .toDF("id", "name")
    val probes = catalog.filter($"id" === 1L)
    val got = graft.operators.Joins.fuzzyLookup(probes, catalog, "id", "name",
        threshold = 0.8, k = 2)
      .as[(Long, Long, String, Double)].collect().sortBy(_._2)
    // block "alpha beta" + len band excludes 4 (block) and 5 (block); 1 is self
    assert(got.map(_._2).toSeq == Seq(2L, 3L))
    assert(got.forall(r => r._4 >= 0.8 && r._4 <= 1.0))
    // scores round at 6 dp before ranking
    assert(got.forall(r => BigDecimal(r._4).scale <= 6))
  }
}
