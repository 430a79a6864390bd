package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = Tables.documents(spark, TestSpark.sf0001)

  test("splitByHash: deterministic, complete, proportions near weights") {
    val s1 = Sampling.splitByHash(docs).as[(Long, Long, String)].collect()
    val s2 = Sampling.splitByHash(docs).as[(Long, Long, String)].collect()
    assert(s1.sortBy(_._1).sameElements(s2.sortBy(_._1))) // stable across runs
    assert(s1.length == docs.count())
    val byClass = s1.groupBy(_._3).view.mapValues(_.length).toMap
    assert(byClass.keySet.subsetOf(Set("train", "val", "test")))
    // 98% +- sampling noise on 500 docs
    assert(byClass("train") > 450)
    assert(byClass.getOrElse("val", 0) + byClass.getOrElse("test", 0) < 50)
    // growing the corpus never reassigns an existing doc (hash is per-key)
    val subset = Sampling.splitByHash(docs.filter($"doc_id" < 100))
      .as[(Long, Long, String)].collect().map(r => r._1 -> r._3).toMap
    val full = s1.map(r => r._1 -> r._3).toMap
    assert(subset.forall { case (id, sp) => full(id) == sp })
  }

  test("splitByHash: custom weights respect cumulative thresholds") {
    val s = Sampling.splitByHash(docs, Seq("a" -> 0.5, "b" -> 0.5))
      .as[(Long, Long, String)].collect()
    assert(s.forall(r => if (r._2 < 5000) r._3 == "a" else r._3 == "b"))
  }

  test("stratifiedSampleByHash: per-stratum rates near fractions, decisions growth-stable") {
    val fr = Map("en" -> 0.2, "de" -> 0.9)
    val sampled = Sampling.stratifiedSampleByHash(docs, "lang", fr, default = 0.5)
      .select($"doc_id", $"lang").as[(Long, String)].collect()
    val total = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val kept = sampled.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    for ((lang, n) <- total if n >= 50) {
      val f = fr.getOrElse(lang, 0.5)
      val rate = kept.getOrElse(lang, 0L).toDouble / n
      assert(math.abs(rate - f) < 0.15, s"$lang rate $rate vs fraction $f")
    }
    // growth-stable: sampling a SUBSET keeps exactly the intersection
    val half = docs.filter($"doc_id" % 2 === 0)
    val halfKept = Sampling.stratifiedSampleByHash(half, "lang", fr, default = 0.5)
      .select($"doc_id").as[Long].collect().toSet
    assert(halfKept == sampled.map(_._1).filter(_ % 2 == 0).toSet)
  }

  test("selectByTokenBudget: equals the driver-side global prefix sum; budget respected") {
    val got = Sampling.selectByTokenBudget(docs, budgetTokens = 5000L, nPartitions = 7)
      .select($"doc_id", $"n_tokens", $"start_offset")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val all = graft.operators.TextAnalysis.qualityScore(docs)
      .select($"doc_id", $"quality", $"n_tokens")
      .as[(Long, Double, Int)].collect()
      .sortBy { case (id, q, _) => (-q, id) }
    var off = 0L
    val expect = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    for ((id, _, n) <- all) {
      if (off < 5000L) expect += ((id, n.toLong, off))
      off += n
    }
    assert(got.sameElements(expect.sortBy(_._1)))
    assert(got.nonEmpty && got.length < all.length, "budget must actually select")
  }

  test("sampleToMixture: deterministic, unlisted strata dropped, caps at the full stratum, thins toward target") {
    val big = Tables.documents(spark, TestSpark.sf001) // 25 docs per source
    val weights = Seq("src0" -> 3.0, "src1" -> 1.0, "src2" -> 1.0)
    val got = Sampling.sampleToMixture(big, "source", weights, 30)
      .select("doc_id", "source").as[(Long, String)].collect()
    // only listed strata survive
    assert(got.map(_._2).toSet.subsetOf(weights.map(_._1).toSet))
    // deterministic: a second run is identical
    val again = Sampling.sampleToMixture(big, "source", weights, 30)
      .select("doc_id", "source").as[(Long, String)].collect()
    assert(got.sortBy(_._1).sameElements(again.sortBy(_._1)))
    // per-stratum counts near their targets (src0: 18 of 25, src1/2: 6 of
    // 25); the hash rule is binomial, so allow generous slack
    val bySrc = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(math.abs(bySrc("src0") - 18) <= 8, s"src0 kept ${bySrc.get("src0")}")
    assert(math.abs(bySrc.getOrElse("src1", 0) - 6) <= 6)
    assert(math.abs(bySrc.getOrElse("src2", 0) - 6) <= 6)
    // a stratum under its target share keeps EVERYTHING (the cap)
    val capped = Sampling.sampleToMixture(big, "source", Seq("src0" -> 1.0), 1000)
      .filter($"source" === "src0").count()
    assert(capped == 25L)
  }

  test("topQualityByStratum: equals the naive per-stratum window ranking; per-stratum keep counts exact") {
    val big = Tables.documents(spark, TestSpark.sf001)
    val frac = 0.4
    val got = Sampling.topQualityByStratum(big, "source", frac)
      .as[(Long, String, Double, Long)].collect()
    // naive reference: full window rank per source, driver-side
    val scored = graft.operators.TextAnalysis
      .qualityScore(big, passthrough = Seq("source"))
      .select($"doc_id", $"source", $"quality")
      .as[(Long, String, Double)].collect()
    val expected = scored.toSeq.groupBy(_._2).flatMap { case (src, rows) =>
      val keep = math.floor(rows.length.toDouble * frac + 0.5).toLong
      rows.sortBy(r => (-r._3, r._1)).zipWithIndex
        .filter(_._2 < keep)
        .map { case ((id, s, q), i) => (id, s, q, i + 1L) }
    }.toSet
    assert(got.toSet == expected)
    // distributed ranks match the dense 1..keep range per stratum
    for ((src, rows) <- got.groupBy(_._2))
      assert(rows.map(_._4).sorted.toSeq == (1L to rows.length).toSeq, s"ranks not dense for $src")
  }

  test("packSequences: offsets are per-shard running sums; bins cover budget windows") {
    val packed = Sampling.packSequences(docs, budget = 100, nShards = 4)
      .as[(Long, Long, Int, Long, Long)].collect()
    assert(packed.length == docs.count())
    for ((_, rows) <- packed.groupBy(_._2)) {
      val inOrder = rows.sortBy(_._1)
      var offset = 0L
      for ((_, _, n, start, bin) <- inOrder) {
        assert(start == offset, "running offset must equal sum of prior docs' tokens")
        assert(bin == start / 100)
        offset += n
      }
    }
  }

  test("samplePerGroup: n per group (or all of a small group), matches driver-side hash order, partition-invariant") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val got = operators.Sampling.samplePerGroup(docs, "source", 3)
      .as[(String, Long, Int)].collect().toSeq
    // driver-side: same sha256 permutation per group
    val local = docs.select($"source", $"doc_id").as[(String, Long)].collect()
    val sha = java.security.MessageDigest.getInstance("SHA-256")
    def hex(s: String) = sha.digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    val want = local.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      rows.map(_._2).sortBy(id => hex(s"grp:$id")).take(3).zipWithIndex
        .map { case (id, i) => (src, id, i + 1) }
    }.toSet
    assert(got.toSet == want)
    // every group contributes min(3, group size) rows
    val sizes = local.groupBy(_._1).view.mapValues(_.length).toMap
    val per = got.groupBy(_._1).view.mapValues(_.length).toMap
    assert(sizes.forall { case (src, n) => per.getOrElse(src, 0) == math.min(3, n) })
    // identical result whatever the input partitioning
    val got2 = operators.Sampling.samplePerGroup(docs.repartition(13), "source", 3)
      .as[(String, Long, Int)].collect().toSet
    assert(got2 == got.toSet)
  }

  test("dsirSelect: driver-side recompute parity; target-like docs win; partition-invariant") {
    val sha = java.security.MessageDigest.getInstance("SHA-256")
    def bucket(tok: String, dims: Int): Long = {
      val h = sha.digest(tok.getBytes("UTF-8"))
      ((h(0) & 0xffL) * 256 + (h(1) & 0xffL)) % dims
    }
    // crafted pools: target speaks {alpha beta gamma}; raw has two docs in
    // target vocabulary and two in an alien one
    val target = Seq(
      (100L, "alpha beta gamma alpha beta"),
      (101L, "alpha gamma gamma beta alpha")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "alpha beta alpha gamma"),
      (2L, "beta beta gamma alpha"),
      (3L, "zzq xxv qqw zzq"),
      (4L, "xxv xxv zzq qqw")).toDF("doc_id", "text")
    val dims = 64
    val got = Sampling.dsirSelect(raw, target, 2, dims)
      .select($"doc_id", $"n_tokens", $"logw", $"gkey")
      .as[(Long, Long, Double, Double)].collect()
    // the two target-vocabulary docs must be selected: their buckets carry
    // large positive log ratios, the alien docs large negative ones, and
    // the Gumbel perturbation is O(1)
    assert(got.map(_._1).toSet == Set(1L, 2L), s"selected ${got.toSeq}")
    // driver-side recompute of the full formula for one doc
    val rawToks = Seq(1L -> "alpha beta alpha gamma", 2L -> "beta beta gamma alpha",
      3L -> "zzq xxv qqw zzq", 4L -> "xxv xxv zzq qqw")
      .flatMap { case (id, t) => t.split(" ").map(id -> _) }
    val tgtToks = Seq("alpha beta gamma alpha beta", "alpha gamma gamma beta alpha")
      .flatMap(_.split(" "))
    val cntR = rawToks.groupBy(p => bucket(p._2, dims)).view.mapValues(_.size.toLong).toMap
    val cntT = tgtToks.groupBy(bucket(_, dims)).view.mapValues(_.size.toLong).toMap
    val (totR, totT) = (rawToks.size.toLong, tgtToks.size.toLong)
    def sfx(f: Long): Long = math.floor(math.log(
      ((cntT.getOrElse(f, 0L) + 1).toDouble * (totR + dims)) /
        ((cntR(f) + 1).toDouble * (totT + dims))) * 1073741824.0 + 0.5).toLong
    val byDoc = rawToks.groupBy(_._1).view.mapValues { toks =>
      val ssfx = toks.map(p => sfx(bucket(p._2, dims))).sum
      val h = sha.digest(s"dsir:${toks.head._1}".getBytes("UTF-8"))
      val v = ((h(0) & 0xffL) * 256 + (h(1) & 0xffL)) * 256 + (h(2) & 0xffL)
      val u = (v + 0.5) / 16777216.0
      (toks.size.toLong, ssfx / 1073741824.0,
        ssfx / 1073741824.0 + (-math.log(-math.log(u))))
    }.toMap
    val want = byDoc.toSeq.sortBy { case (id, (_, _, gk)) => (-gk, id) }.take(2)
      .map { case (id, (n, lw, gk)) =>
        (id, n, math.rint(lw * 1e6) / 1e6, math.rint(gk * 1e6) / 1e6) }.toSet
    assert(got.toSet == want, s"got ${got.toSeq}, want $want")
    // partition invariance: integer fixed-point sums commute
    val got2 = Sampling.dsirSelect(raw.repartition(7), target.repartition(3), 2, dims)
      .select($"doc_id", $"n_tokens", $"logw", $"gkey")
      .as[(Long, Long, Double, Double)].collect().toSet
    assert(got2 == got.toSet)
  }

  test("weightedSample: matches a driver-side A-ES computation; stable across runs") {
    val n = 5
    val got = Sampling.weightedSample(docs, "n_chars", n)
      .select($"source", $"doc_id", $"rank").as[(String, Long, Int)].collect().toSet
    val sha = java.security.MessageDigest.getInstance("SHA-256")
    val local = docs.select($"source", $"doc_id", $"n_chars")
      .as[(String, Long, Long)].collect()
      .filter(_._3 > 0)
      .map { case (src, id, w) =>
        val h = sha.digest(s"ws:$id".getBytes("UTF-8"))
        val v = ((h(0) & 0xffL) * 256 + (h(1) & 0xffL)) * 256 + (h(2) & 0xffL)
        val u = (v + 0.5) / 16777216.0
        (src, id, -math.log(u) / w.toDouble)
      }
    val want = local.groupBy(_._1).flatMap { case (src, rows) =>
      rows.sortBy(r => (r._3, r._2)).take(n).zipWithIndex
        .map { case ((_, id, _), i) => (src, id, i + 1) }.toSeq
    }.toSet
    assert(got == want)
    val again = Sampling.weightedSample(docs, "n_chars", n)
      .select($"source", $"doc_id", $"rank").as[(String, Long, Int)].collect().toSet
    assert(again == got)
  }

  test("unimaxSample: crafted corpus matches driver-side water-filling; fixture partition-invariant") {
    // langs: tiny (10 chars), mid (30), big (200) -> capacities 20/60/400.
    // budget = 240*2 DIV 5 = 96: tiny saturates (20*3+0=60<=96), mid does
    // not (60*2+20=140>96) -> tiny gets 20, mid/big get (96-20) DIV 2 = 38
    val crafted = Seq(
      (1L, "a" * 10, "tiny"),
      (2L, "b" * 15, "mid"), (3L, "c" * 15, "mid"),
      (4L, "d" * 100, "big"), (5L, "e" * 100, "big"))
      .toDF("doc_id", "text", "lang")
    val got = Sampling.unimaxSample(crafted)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("tiny") == (("tiny", 1L, 10L, 20L, 20L, 2L, 0L, 0L, 0L, TestSpark.sha256Hex(""))))
    // mid: alloc 38 = 1 full epoch (30) + 8 rem -> no 15-char doc fits
    assert(got("mid")._5 == 38L && got("mid")._6 == 1L && got("mid")._7 == 8L
      && got("mid")._8 == 0L)
    // big: alloc 38 = 0 full epochs + 38 rem -> no 100-char doc fits
    assert(got("big")._5 == 38L && got("big")._6 == 0L && got("big")._7 == 38L
      && got("big")._8 == 0L)
    // a roomier budget fills partial epochs: budget = 240*4 DIV 5 = 192 ->
    // tiny 20, mid 60 saturate; big (chars_l 200) gets 112 = 0 full epochs
    // + 112 rem -> exactly one 100-char doc fits the partial pass
    val roomy = Sampling.unimaxSample(crafted, budgetNum = 4, budgetDen = 5)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(roomy("mid") == (("mid", 2L, 30L, 60L, 60L, 2L, 0L, 0L, 0L, TestSpark.sha256Hex(""))))
    assert(roomy("big")._5 == 112L && roomy("big")._6 == 0L && roomy("big")._7 == 112L)
    assert(roomy("big")._8 == 1L && roomy("big")._9 == 100L)
    // fixture: allocations never exceed capacity, partial fill never
    // exceeds the remainder, partition-invariant
    val fxr = Sampling.unimaxSample(docs)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, String)]
      .collect().toSet
    assert(fxr.size == 5)
    assert(fxr.forall(r => r._5 <= r._4 && r._9 <= r._7))
    assert(Sampling.unimaxSample(docs.repartition(7))
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, String)]
      .collect().toSet == fxr)
  }

  test("temperatureMixture: exact sqrt weights on a crafted 1:4 corpus; fixture sums to 1") {
    // 100 vs 400 chars -> sqrt ratio exactly 1:2 (both squares, so the
    // fixed-point sqrt is exact)
    val crafted = Seq(
      (0L, "a" * 100, "aa", "s0"), (1L, "b" * 400, "bb", "s0"))
      .toDF("doc_id", "text", "lang", "source")
    val got = Sampling.temperatureMixture(crafted)
      .as[(String, Long, Long, Double, Long, Double)].collect().toSeq
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (fx1, fx2) = (10L * 1048576, 20L * 1048576)
    val sfx = fx1 + fx2
    assert(got == Seq(
      ("aa", 1L, 100L, r6(fx1.toDouble / sfx), 1000000L * fx1 / sfx,
        r6(1000000.0 * fx1 / sfx / 100)),
      ("bb", 1L, 400L, r6(fx2.toDouble / sfx), 1000000L * fx2 / sfx,
        r6(1000000.0 * fx2 / sfx / 400))))
    // fixture: weights a partition over languages, allocation never exceeds
    // the budget, partition-invariant
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val fxr = Sampling.temperatureMixture(docs)
      .as[(String, Long, Long, Double, Long, Double)].collect().toSeq
    assert(math.abs(fxr.map(_._4).sum - 1.0) < 1e-5)
    assert(fxr.map(_._5).sum <= 1000000L)
    assert(Sampling.temperatureMixture(docs.repartition(7))
      .as[(String, Long, Long, Double, Long, Double)].collect().toSeq == fxr)
  }

  test("importanceReweight: crafted weights/ESS exact; fixture ESS bounded by corpus") {
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // two langs, 100 vs 300 chars, 1 vs 3 docs: target uniform ->
    // w_aa = 400/(2*100) = 2, w_bb = 400/(2*300) = 2/3
    val crafted = Seq(
      (0L, "a" * 100, "aa", "s0"), (1L, "b" * 100, "bb", "s0"),
      (2L, "b" * 100, "bb", "s0"), (3L, "b" * 100, "bb", "s0"))
      .toDF("doc_id", "text", "lang", "source")
    val got = Sampling.importanceReweight(crafted)
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    val (wa, wb) = (2L * 16384, 400L * 16384 / 600) // floor fixed point
    val (s1, s2) = (1 * wa + 3 * wb, 1 * wa * wa + 3 * wb * wb)
    val ess = r6(s1.toDouble * s1 / s2)
    assert(got == Seq(
      ("aa", 1L, 100L, 0.25, r6(wa.toDouble / 16384), ess),
      ("bb", 3L, 300L, 0.75, r6(wb.toDouble / 16384), ess)))
    // fixture: ESS never exceeds the doc count, weights positive,
    // partition-invariant
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val fxr = Sampling.importanceReweight(docs)
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    val n = docs.count()
    assert(fxr.nonEmpty && fxr.forall(r =>
      r._5 > 0.0 && r._6 > 0.0 && r._6 <= n + 1e-6))
    assert(Sampling.importanceReweight(docs.repartition(7))
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq == fxr)
  }

  test("groupHoldoutSplit: groups never straddle; summary partitions the rows") {
    val ev = Tables.events(spark, TestSpark.sf0001)
    val got = Sampling.groupHoldoutSplit(ev)
      .as[(String, Long, Long, Double, Long)].collect().toSeq
    assert(got.map(_._1).sorted == Seq("test", "train", "val"))
    assert(got.map(_._2).sum == ev.count())
    assert(got.forall(_._5 == 0L)) // zero straddle by construction
    // group-awareness recomputed independently: every user's rows land in
    // exactly one split
    val users = ev.select("user_id").distinct().count()
    assert(got.map(_._3).sum == users)
    // shares divide exactly and are partition-invariant
    val total = got.map(_._2).sum.toDouble
    got.foreach(r => assert(math.abs(r._4 - r._2 / total) < 2e-6))
    assert(Sampling.groupHoldoutSplit(ev.repartition(7))
      .as[(String, Long, Long, Double, Long)].collect().toSeq == got)
  }

  test("trainOrder: matches a driver-side windowed rank; permutation is seed-keyed and partition-invariant") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val got = Sampling.trainOrder(docs)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val keyed = docs.selectExpr("doc_id",
        "sha2(concat('epoch0:', CAST(doc_id AS STRING)), 256) AS hx")
      .as[(Long, String)].collect()
    val want = keyed
      .map { case (id, hx) => (id, java.lang.Long.parseLong(hx.take(2), 16) % 8, hx) }
      .groupBy(_._2).toSeq.flatMap { case (shard, rs) =>
        rs.sortBy(r => (r._3, r._1)).zipWithIndex
          .map { case (r, i) => (r._1, shard, i + 1L) }
      }.sorted
    assert(got == want && got.nonEmpty)
    // every doc appears exactly once; positions are 1..n per shard
    assert(got.map(_._1).distinct.length == docs.count())
    got.groupBy(_._2).values.foreach { rs =>
      assert(rs.map(_._3).sorted == (1L to rs.length.toLong).toSeq) }
    // partition-invariant, and a different seed is a different permutation
    assert(Sampling.trainOrder(docs.repartition(7))
      .as[(Long, Long, Long)].collect().toSeq.sorted == got)
    val other = Sampling.trainOrder(docs, seed = "epoch1")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(other != got)
  }
}
