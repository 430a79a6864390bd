package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CosineSimilarity
import graft.operators.Rerank

class RerankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val index = Engine.ingest(Tables.documents(spark, TestSpark.sf0001)).cache()
  val Q = "transfer credits"

  /** Driver-side reference MMR over a collected shortlist — the operator's
    * greedy, re-implemented independently on plain arrays. */
  private def refMmr(cands: Array[(String, String, Double, Array[Float])],
                     k: Int, lambda: Double): Seq[(Int, String, Double)] = {
    val sorted = cands.sortBy(c => (-c._3, c._1))
    val selected = scala.collection.mutable.ArrayBuffer.empty[(String, String, Double, Array[Float])]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Double)]
    while (selected.length < math.min(k, sorted.length)) {
      var best: (String, String, Double, Array[Float]) = null
      var bestMmr = 0.0
      for (c <- sorted if !selected.exists(_._1 == c._1)) {
        var pen = 0.0
        for (s <- selected) {
          val sim = CosineSimilarity.cosine(c._4, s._4)
          if (sim > pen) pen = sim
        }
        val mmr = lambda * c._3 - (1.0 - lambda) * pen
        if (best == null || mmr > bestMmr || (mmr == bestMmr && c._1 < best._1)) {
          best = c; bestMmr = mmr
        }
      }
      selected += best
      out += ((selected.length, best._1, bestMmr))
    }
    out.toSeq
  }

  test("mmrRerank matches an independent driver-side greedy on the same shortlist") {
    val got = Rerank.mmrRerank(index, Q, k = 5, m = 20, lambda = 0.7)
      .select($"rank", $"id", $"mmr").as[(Int, String, Double)].collect().sortBy(_._1)
    // rebuild the same shortlist: top-20 by (score desc, id asc)
    val scored = Engine.score(index, GraftFunctions.hash_embed(lit(Q), 1024))
      .filter(length($"text") > 0)
      .select($"id", $"source", $"score", $"embedding")
      .as[(String, String, Double, Array[Float])].collect()
    val shortlist = scored.sortBy(c => (-c._3, c._1)).take(20)
    val ref = refMmr(shortlist, 5, 0.7)
    assert(got.map(r => (r._1, r._2)).toSeq == ref.map(r => (r._1, r._2)))
    for ((g, r) <- got.zip(ref))
      assert(math.abs(g._3 - r._3) < 1e-6, s"rank ${g._1}: mmr ${g._3} vs ${r._3}")
  }

  test("mmr: rank 1 is the plain relevance top-1; mmr scores non-increasing; ids distinct") {
    val got = Rerank.mmrRerank(index, Q, k = 5, m = 20, lambda = 0.7)
      .select($"rank", $"id", $"relevance", $"mmr")
      .as[(Int, String, Double, Double)].collect().sortBy(_._1)
    assert(got.length == 5)
    assert(got.map(_._2).distinct.length == 5)
    val top1 = Engine.search(index, Q, 1).collect()(0).getAs[String]("id")
    assert(got(0)._2 == top1, "rank 1 must be the relevance argmax")
    // penalties only grow as the selected set grows, so the greedy's chosen
    // mmr sequence is non-increasing
    for (i <- 1 until got.length)
      assert(got(i)._4 <= got(i - 1)._4 + 1e-12,
        s"mmr increased at rank ${got(i)._1}")
  }

  test("mmr prefers diversity: an exact duplicate of rank-1 is passed over") {
    // The hash-embedding scheme gives cosine 1.0 ONLY for byte-identical
    // text (anything else is near-orthogonal), so: query == the duplicated
    // text -> both copies have relevance exactly 1.0 and pairwise sim 1.0.
    // At lambda=0.3 the duplicate's step-2 mmr is 2*0.3 - 1 = -0.4, which
    // the third doc beats unless its relevance were <= -0.63 — far outside
    // what 1024-dim hash embeddings can produce. Plain top-2 would return
    // both duplicates; MMR must pick the third doc second.
    val dup = "transfer credits apply toward the degree"
    val docs = Seq(
      (0L, dup, "aaa"),
      (1L, dup, "zzz"),
      (2L, "orbital mechanics of small moons", "bbb")).toDF("doc_id", "text", "source")
    val idx = Engine.ingest(docs)
    val got = Rerank.mmrRerank(idx, dup, k = 2, m = 3, lambda = 0.3)
      .select($"rank", $"source").as[(Int, String)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq == Seq("aaa", "bbb"),
      s"expected diversity pick (aaa, bbb), got ${got.toSeq}")
  }

  test("batch equals single-query; duplicate queries are deduped") {
    val qs = Seq(Q, "spark window agg")
    val many = Rerank.mmrRerankMany(index, qs ++ qs, k = 3, m = 10)
      .collect().map(_.toString).sorted
    val singles = qs.flatMap { q =>
      Rerank.mmrRerankMany(index, Seq(q), k = 3, m = 10).collect().map(_.toString)
    }.sorted
    assert(many.sameElements(singles))
  }

  test("plan shape: shortlist ranks through GroupedTopK, no global window") {
    val plan = Rerank.mmrRerankMany(index, Seq(Q), 5, 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GroupedTopK"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("lateInteractionTopK: exact-match doc scores |q| tokens; partial beats none; dup tokens don't inflate") {
    val docs = Seq(
      (1L, "alpha beta gamma"), // all three query tokens: score 3.0
      (2L, "alpha alpha alpha noise"), // one matching token (dedup'd): max 1 + two partials
      (3L, "zzz yyy xxx")) // no exact matches: all partial cosines
      .toDF("doc_id", "text")
    val got = Rerank.lateInteractionTopK(docs, Seq("alpha beta gamma"), 3)
      .as[(String, Int, Long, Double)].collect().sortBy(_._2)
    assert(got.map(_._3).toSeq == Seq(1L, 2L, 3L).take(got.size))
    assert(got.head._4 == 3.0) // cos(t, t) = 1 per query token
    assert(got(1)._4 > got(2)._4 && got(1)._4 < 3.0)
    // ranking path stays on GroupedTopK, no window rank
    val plan = Rerank.lateInteractionTopK(docs, Seq("alpha beta gamma"), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GroupedTopK") && !plan.contains("Window"), plan)
  }
}
