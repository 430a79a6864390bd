package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pipeline

class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("prepareCorpus: normalizes, drops low-quality and duplicate docs, assigns splits") {
    val docs = Seq(
      (1L, "The  quick brown fox is in the yard and it is a good day for all of us"),
      (2L, "the quick brown fox is in the yard and it is a good day for all of us"),
      (3L, "!!!! ????"), // punctuation-only: quality below the floor
      (4L, "A different document about the training of models and the data it needs")
    ).toDF("doc_id", "text")
    val out = Pipeline.prepareCorpus(docs)
      .as[(Long, String, Double, String)].collect().map(r => r._1 -> r).toMap
    // 1 and 2 normalize to identical text -> exact dedup keeps canonical 1
    assert(out.contains(1L) && !out.contains(2L))
    assert(!out.contains(3L)) // filtered by quality floor
    assert(out.contains(4L))
    // normalized: lowercased, collapsed whitespace
    assert(out(1L)._2.startsWith("the quick brown fox"))
    assert(!out(1L)._2.contains("  "))
    assert(out.values.forall(r => Set("train", "val", "test").contains(r._4)))
    assert(out.values.forall(_._3 >= 0.3))
  }

  test("docEmbeddingProbe: pooled dims equal the integer-mean of per-chunk digest bytes") {
    val one = "short doc" // single chunk at size 200
    val long = "x" * 300 // chunks at 0 and 150 (stride = size - overlap)
    val docs = Seq((1L, one), (2L, long)).toDF("doc_id", "text")
    val got = Pipeline.docEmbeddingProbe(docs)
      .as[(Long, Long, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
    def byteAt(s: String, j: Int): Long = {
      val d = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8"))
      d(j) & 0xffL
    }
    def pooled(chunks: Seq[String], j: Int): Double =
      BigDecimal(chunks.map(byteAt(_, j)).sum.toDouble / chunks.size / 255.0 * 2.0 - 1.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L)._2 == 1L)
    assert((got(1L)._3, got(1L)._4, got(1L)._5) ==
      ((pooled(Seq(one), 0), pooled(Seq(one), 13), pooled(Seq(one), 31))))
    val chunks2 = Seq(long.substring(0, 200), long.substring(150, 300))
    assert(got(2L)._2 == 2L)
    assert((got(2L)._3, got(2L)._4, got(2L)._5) ==
      ((pooled(chunks2, 0), pooled(chunks2, 13), pooled(chunks2, 31))))
  }

  test("dataCard: exact counts on a crafted corpus; fixture rollup consistent with raw aggregates") {
    val crafted = Seq(
      (1L, "one two three", "en", "s1"),
      (2L, "one two three", "en", "s1"),   // exact dup of doc 1
      (3L, "vier funf", "de", "s1"),
      (4L, "uno dos tres cuatro", "es", "s2"))
      .toDF("doc_id", "text", "lang", "source")
    val got = Pipeline.dataCard(crafted)
      .as[(String, Long, Long, Long, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    val s1 = got("s1")
    assert(s1._2 == 3 && s1._3 == 8 && s1._4 == 13 + 13 + 9)
    assert(s1._5 == math.rint(8.0 / 3 * 1e6) / 1e6)  // mean tokens
    assert(s1._6 == math.rint(2.0 / 3 * 1e6) / 1e6)  // en share
    assert(s1._7 == math.rint(2.0 / 3 * 1e6) / 1e6)  // both dup copies flagged
    val s2 = got("s2")
    assert(s2._2 == 1 && s2._3 == 4 && s2._6 == 0.0 && s2._7 == 0.0)
    // fixture: card totals equal independent raw aggregates
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val card = Pipeline.dataCard(docs)
      .as[(String, Long, Long, Long, Double, Double, Double)].collect()
    assert(card.map(_._2).sum == docs.count())
    val rawTokens = docs.selectExpr(
      s"sum(size(${graft.operators.TextAnalysis.tokensExpr}))").head().getLong(0)
    assert(card.map(_._3).sum == rawTokens)
  }

  test("sourceOverlap: crafted cross-source duplicates counted once per pair; fixture parity with a driver recompute") {
    val crafted = Seq(
      (1L, "shared one", "s1"), (2L, "shared one", "s2"),   // s1-s2 share
      (3L, "shared one", "s2"),                             // same content twice in s2: still 1
      (4L, "shared two", "s1"), (5L, "shared two", "s3"),
      (6L, "only here", "s1"))
      .toDF("doc_id", "text", "source")
    val got = Pipeline.sourceOverlap(crafted)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("s1", "s2", 1L), ("s1", "s3", 1L)))
    // fixture: the prefix-key form (the q180 shape) matches a driver-side
    // recompute over (source, 200-char prefix) sets
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val fx = Pipeline.sourceOverlap(docs, "sha2(substring(text, 1, 200), 256)")
      .as[(String, String, Long)].collect().toSet
    val rows: Array[(String, String)] =
      docs.selectExpr("source", "substring(text, 1, 200) AS p")
        .as[(String, String)].collect()
    val sets = rows.toSet.groupBy((t: (String, String)) => t._1)
      .view.mapValues(_.map(_._2)).toMap
    val want = (for {
      a <- sets.keys; b <- sets.keys if a < b
      n = (sets(a) & sets(b)).size if n > 0
    } yield (a, b, n.toLong)).toSet
    assert(fx == want)
  }

  test("splitLeakage: matrix totals equal the pair count; labels match recomputing split-by-pair") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val got = Pipeline.splitLeakage(docs)
      .as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // order-normalized keys only
    assert(got.keys.forall { case (a, b) => a <= b })
    // totals: every verified pair lands in exactly one matrix cell
    val pairs = graft.operators.Dedup.jaccardPairs(docs, 0.5)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    assert(got.values.sum == pairs.length)
    // recompute each pair's cell from the split operator directly
    val split = graft.operators.Sampling.splitByHash(docs)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val expect = pairs.groupBy { case (a, b) =>
      val (sa, sb) = (split(a), split(b))
      (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
    }.view.mapValues(_.length.toLong).toMap
    assert(got == expect)
  }

  test("kAnonymityAudit: hand-checked group sizes, risk and homogeneity fractions") {
    // QI = region: A has 3 rows (sensitive all 1 -> homogeneous),
    // B has 1 row (small AND homogeneous), C has 2 rows (sensitive 1,2)
    val df = Seq(
      ("A", 1L), ("A", 1L), ("A", 1L), ("B", 2L), ("C", 1L), ("C", 2L))
      .toDF("region", "sens")
    val got = graft.operators.Pipeline.kAnonymityAudit(
        df, Seq("region"), "sens", k = 2)
      .as[(Int, Long, Long, Long, Long, Double, Long, Double)]
      .collect().toSeq
    assert(got == Seq((2, 6L, 3L, 1L, 1L, 0.166667, 2L, 0.666667)))
    // fixture: audit runs over real events, fractions bounded, 1 row
    val ev = Tables.events(spark, TestSpark.sf0001)
    val fxr = graft.operators.Pipeline.kAnonymityAudit(ev,
        Seq("event_type", "dayofweek(ts)"),
        "CAST(round(value * 100) AS BIGINT) DIV 1000")
      .as[(Int, Long, Long, Long, Long, Double, Long, Double)]
      .collect().toSeq
    assert(fxr.length == 1 && fxr.head._2 == ev.count())
    assert(fxr.head._6 >= 0.0 && fxr.head._6 <= 1.0)
    assert(graft.operators.Pipeline.kAnonymityAudit(ev.repartition(7),
        Seq("event_type", "dayofweek(ts)"),
        "CAST(round(value * 100) AS BIGINT) DIV 1000")
      .as[(Int, Long, Long, Long, Long, Double, Long, Double)]
      .collect().toSeq == fxr)
  }
}
