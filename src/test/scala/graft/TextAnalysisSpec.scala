package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = Tables.documents(spark, TestSpark.sf0001).cache()

  test("tokenStats: counts match a driver-side split") {
    val got = TextAnalysis.tokenStats(docs)
      .as[(Long, Int, Int, Int, Int)].collect().map(r => r._1 -> r).toMap
    val local = docs.select($"doc_id", $"text").as[(Long, String)].collect()
    val subRe = TextAnalysis.subtokenRegex.r
    for ((id, text) <- local) {
      val toks = text.split(" ").filter(_.nonEmpty)
      val (_, n, uniq, sumLen, nSub) = got(id)
      assert(n == toks.length, s"doc $id n_tokens")
      assert(uniq == toks.distinct.length, s"doc $id uniq")
      assert(sumLen == toks.map(_.length).sum, s"doc $id sumlen")
      assert(nSub == subRe.findAllIn(text).length, s"doc $id subtokens")
    }
    // BPE-ish split: mixed content
    val crafted = Seq((1L, "abc123 de-f 9")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenStats(crafted).as[(Long, Int, Int, Int, Int)].head()
    assert(r._5 == 6) // abc,123,de,-,f,9
  }

  test("quality: ratios bounded, zero-token docs score without NaN") {
    val rows = TextAnalysis.qualityScore(docs).collect()
    assert(rows.length == docs.count())
    for (r <- rows) {
      val q = r.getAs[Double]("quality")
      val sr = r.getAs[Double]("stop_ratio")
      assert(!q.isNaN && q >= 0.0 && q <= 1.0)
      assert(sr >= 0.0 && sr <= 1.0)
    }
    // synthetic check on a crafted frame incl. empty text
    val crafted = Seq((1L, "the the xx"), (2L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.qualityScore(crafted).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Int]("n_tokens") == 3)
    assert(out(1L).getAs[Int]("stop_hits") == 2)
    assert(out(2L).getAs[Double]("stop_ratio") == 0.0)
  }

  test("langId: deterministic, word-salad docs classify as en") {
    val out = TextAnalysis.langId(docs)
    val langs = out.groupBy("predicted_lang").count().as[(String, Long)].collect().toMap
    // the corpus vocabulary contains 'the'/'a' -> en dominates
    assert(langs.keySet.contains("en"))
    assert(langs("en") > docs.count() / 2)
    // crafted per-language fixtures
    val crafted = Seq(
      (1L, "der hund und die katze ist ein tier"),
      (2L, "el perro y la casa de que un por"),
      (3L, "le chien et la maison pour que dans"),
      (4L, "的 是 在 了 和")).toDF("doc_id", "text")
    val got = TextAnalysis.langId(crafted).select($"doc_id", $"predicted_lang")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "de", 2L -> "es", 3L -> "fr", 4L -> "zh"))
  }

  test("corpusSketch: HLL distinct within 5% of exact; quantiles within rank error") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val row = TextAnalysis.corpusSketch(docs).collect()(0)
    val toks = docs.selectExpr(s"explode(${TextAnalysis.tokensExpr}) AS t")
    val exactDistinct = toks.select("t").distinct().count()
    val approx = row.getAs[Long]("approx_distinct_tokens")
    assert(math.abs(approx - exactDistinct).toDouble / exactDistinct < 0.05,
      s"approx=$approx exact=$exactDistinct")
    // exact token-length quantiles from a full sort
    val lens = toks.selectExpr("length(t) AS l").orderBy("l")
      .as[Int].collect()
    def exactQ(q: Double) = lens(((lens.length - 1) * q).toInt)
    assert(math.abs(row.getAs[Int]("p50_token_len") - exactQ(0.5)) <= 1)
    assert(math.abs(row.getAs[Int]("p99_token_len") - exactQ(0.99)) <= 1)
  }

  test("normalizeText: lowercases, collapses whitespace runs, trims") {
    val crafted = Seq(
      (1L, "  Hello\t\tWorld \n NEXT  line  "),
      (2L, "already clean")).toDF("doc_id", "text")
    val got = TextAnalysis.normalizeText(crafted)
      .select($"doc_id", $"norm_text", $"n_chars")
      .as[(Long, String, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == ("hello world next line", 21))
    assert(got(2L) == ("already clean", 13))
  }

  test("redactPii: emails and phones replaced with typed placeholders, counted") {
    val crafted = Seq(
      (1L, "contact bob.smith+x@example.co.uk or call +1 (555) 123-4567 now"),
      (2L, "no pii here at all")).toDF("doc_id", "text")
    val got = TextAnalysis.redactPii(crafted)
      .select($"doc_id", $"n_emails", $"n_phones", $"redacted")
      .as[(Long, Int, Int, String)].collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got(1L)._1 == 1 && got(1L)._2 == 1)
    assert(got(1L)._3.contains("<EMAIL>") && got(1L)._3.contains("<PHONE>"))
    assert(!got(1L)._3.contains("example.co.uk") && !got(1L)._3.contains("555"))
    assert(got(2L) == (0, 0, "no pii here at all"))
  }

  test("fingerprint: equal for identical text, stable under prefix padding semantics") {
    val crafted = Seq(
      (1L, "abcdefgh12345678"), (2L, "abcdefgh12345678"), (3L, "completely other")
    ).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprint(crafted).as[(Long, String)].collect().toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
    // empty text still yields a fingerprint (sha of empty substring)
    val e = TextAnalysis.fingerprint(Seq((9L, "")).toDF("doc_id", "text"))
      .as[(Long, String)].collect().toMap
    assert(e(9L).nonEmpty)
  }
}
