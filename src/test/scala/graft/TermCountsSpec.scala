package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftFunctions.term_counts

/** `TermCounts` — the one-pass codegen'd twin of the per-term
  * `size(filter(toks, x -> x = 't'))` fold the BM25/TF-IDF operators used
  * to run once per term. Parity with the fold IS the contract. */
class TermCountsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val terms = Seq("the", "transfer", "credit", "zzz_absent")

  test("matches the per-term filter() fold on the real corpus") {
    val toksed = Tables.documents(spark, TestSpark.sf0001)
      .withColumn("toks", expr(graft.operators.TextAnalysis.tokensExpr))
    val both = toksed
      .withColumn("tc", term_counts(col("toks"), terms))
      .select(col("doc_id") +: terms.zipWithIndex.flatMap { case (t, i) => Seq(
        expr(s"element_at(tc, ${i + 1})").as(s"new_$i"),
        expr(s"size(filter(toks, x -> x = '$t'))").cast("long").as(s"old_$i"))
      }: _*)
    val bad = both.filter(
      terms.indices.map(i => col(s"new_$i") =!= col(s"old_$i")).reduce(_ || _))
    assert(bad.count() == 0)
    // and the terms actually occur, so the test is not vacuous
    val totals = both.agg(
      terms.indices.map(i => sum(col(s"new_$i")).as(s"t_$i")).head,
      terms.indices.tail.map(i => sum(col(s"new_$i")).as(s"t_$i")): _*).collect()(0)
    assert(totals.getLong(0) > 0, "expected 'the' to occur in the corpus")
    assert(totals.getLong(3) == 0, "sentinel absent term must count 0")
  }

  test("null tokens are skipped; duplicate terms keep the first slot") {
    val df = Seq(Tuple1(Seq("a", "b", "a"))).toDF("toks")
      .select(term_counts(
        expr("array('a', NULL, 'b', 'a')"), Seq("a", "b", "a")).as("tc"))
    assert(df.collect()(0).getSeq[Long](0) == Seq(2L, 1L, 0L))
  }

  test("SQL registration: term_counts(toks, array(...))") {
    val row = spark.sql(
      "SELECT term_counts(array('x', 'y', 'x'), array('x', 'q')) AS tc")
      .collect()(0)
    assert(row.getSeq[Long](0) == Seq(2L, 0L))
  }

  test("empty token array yields all-zero counts") {
    val row = spark.sql(
      "SELECT term_counts(filter(split('', ' '), t -> t <> ''), array('x')) AS tc")
      .collect()(0)
    assert(row.getSeq[Long](0) == Seq(0L))
  }
}
