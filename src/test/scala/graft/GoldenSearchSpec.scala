package graft

import org.scalatest.funsuite.AnyFunSuite

/** FIXTURES.md §C3 golden top-5 for the smoke-script queries on sf0.001,
  * computed by an independent pure-Python replication of the reference
  * algorithm (chunk 1000/200 -> sha256 embed -> cosine -> (score desc, id
  * asc)). Guards the whole pipeline against regressions across rounds.
  * Scores compared at 1e-5 (python computes f64 on unrounded values; the
  * engine stores f32 embedding values). */
class GoldenSearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val index = Engine.ingest(Tables.documents(spark, TestSpark.sf0001)).cache()

  val goldens: Map[String, Seq[(String, String, Double)]] = Map(
    "transfer credits" -> Seq(
      ("src10_410_0", "src10", 0.512739),
      ("src2_382_0", "src2", 0.455147),
      ("src1_461_0", "src1", 0.454426),
      ("src2_62_0", "src2", 0.445673),
      ("src5_405_0", "src5", 0.416503)),
    "What are the articulation agreements for University of Florida?" -> Seq(
      ("src5_145_0", "src5", 0.513754),
      ("src10_10_0", "src10", 0.484361),
      ("src4_344_0", "src4", 0.438569),
      ("src10_450_0", "src10", 0.437818),
      ("src9_9_0", "src9", 0.436972)))

  test("top-5 ids, sources and scores match the independent replication") {
    for ((q, expected) <- goldens) {
      val got = Engine.search(index, q, 5).collect().map(r =>
        (r.getAs[String]("id"), r.getAs[String]("source"), r.getAs[Double]("score")))
      assert(got.map(_._1).toSeq == expected.map(_._1), s"ids for '$q'")
      assert(got.map(_._2).toSeq == expected.map(_._2), s"sources for '$q'")
      for (((_, _, g), (_, _, e)) <- got.zip(expected))
        assert(math.abs(g - e) < 1e-5, s"score drift for '$q'")
    }
  }
}
