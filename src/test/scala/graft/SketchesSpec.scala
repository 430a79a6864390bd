package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference rho: 1 + leading zeros of the 48 bits in digest bytes 1..6
    * of sha256("hll:" || key), capped at 49. */
  private def refBucketRho(key: String, m: Int): (Int, Int) = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"hll:$key".getBytes("UTF-8")).map(_ & 0xff)
    val bits = (1 to 6).flatMap(j => (7 to 0 by -1).map(b => (d(j) >> b) & 1))
    val rho = bits.indexOf(1) match { case -1 => 49; case i => i + 1 }
    (d(0) % m, rho)
  }

  test("hll: SQL register logic matches the byte-level reference") {
    val df = (0 until 50).map(i => ("g", i.toString)).toDF("g", "k")
      .withColumn("__h", expr("sha2(concat('hll:', cast(k AS STRING)), 256)"))
      .withColumn("bucket", expr(s"${Sketches.sparkByteAt("__h", 0)} % 64"))
      .withColumn("rho", expr(Sketches.rhoExpr(Sketches.sparkByteAt, "__h")))
    val got = df.select("k", "bucket", "rho").as[(String, Int, Int)]
      .collect().map { case (k, b, r) => k -> (b, r) }.toMap
    for (i <- 0 until 50; k = i.toString)
      assert(got(k) === refBucketRho(k, 64), s"key $k")
  }

  test("hll: estimate lands within 3 standard errors and is partition-invariant") {
    val n = 2000
    val base = (0 until n).map(i => ("g", i.toLong)).toDF("g", "user_id")
    val est1 = Sketches.hllDistinct(base.repartition(1), "g", "user_id")
      .select("est", "exact").as[(Double, Long)].head()
    val est7 = Sketches.hllDistinct(base.repartition(7, col("user_id")), "g", "user_id")
      .select("est", "exact").as[(Double, Long)].head()
    assert(est1 === est7, "registers must be partition-invariant")
    assert(est1._2 === n)
    // rse of HLL at m=64 is 1.04/sqrt(64) = 13%; 3 sigma = 39%
    assert(math.abs(est1._1 - n) / n < 0.39, s"estimate ${est1._1} vs $n")
  }

  test("hll: distinct-only dependence — duplicated keys do not move registers") {
    val a = (0 until 300).map(i => ("g", i.toLong))
    val dup = a ++ a ++ a
    val e1 = Sketches.hllDistinct(a.toDF("g", "user_id"), "g", "user_id")
      .select("est").as[Double].head()
    val e3 = Sketches.hllDistinct(dup.toDF("g", "user_id"), "g", "user_id")
      .select("est").as[Double].head()
    assert(e1 === e3)
  }

  test("cms: never underestimates, exact column is true count, top-k ordered") {
    val docs = Seq(
      (1L, "a a a a b b c"), (2L, "a b c d e"), (3L, "a c c f g h"))
      .toDF("doc_id", "text")
    val r = Sketches.cmsTopK(docs, d = 4, w = 1024, k = 10)
      .select("token", "est", "exact", "overestimate")
      .as[(String, Long, Long, Long)].collect()
    val exact = Map("a" -> 6L, "b" -> 3L, "c" -> 4L, "d" -> 1L, "e" -> 1L,
      "f" -> 1L, "g" -> 1L, "h" -> 1L)
    assert(r.length === 8)
    r.foreach { case (t, est, ex, over) =>
      assert(ex === exact(t), t)
      assert(est >= ex, s"CMS underestimated $t")
      assert(over === est - ex)
    }
    // ordered by (est desc, token asc)
    val keys = r.map { case (t, est, _, _) => (-est, t) }
    assert(keys.sameElements(keys.sorted), "output must be rank-ordered")
  }

  test("kmvOverlap: small groups degrade to exact; fixture estimates sane; partition-invariant") {
    // crafted: |A| = 30, |B| = 25, |A ∩ B| = 10 — all below k, so the union
    // sketch holds every value and the estimator must be EXACT
    val ev = ((1 to 30).map(u => ("A", u.toLong)) ++
      (21 to 45).map(u => ("B", u.toLong)))
      .toDF("event_type", "user_id")
    val got = Sketches.kmvOverlap(ev, k = 64, exactAudit = true)
      .select($"g_a", $"g_b", $"k_used", $"union_est", $"inter_est", $"exact_inter")
      .as[(String, String, Long, Double, Double, Long)].collect()
    assert(got.length == 1)
    val (ga, gb, kUsed, unionEst, interEst, exact) = got(0)
    assert((ga, gb) == ("A", "B"))
    assert(kUsed == 45 && unionEst == 45.0, s"union $unionEst k_used $kUsed")
    assert(exact == 10 && interEst == 10.0, s"inter $interEst vs exact $exact")
    // fixture: every pair's estimate lands within a loose KMV error budget
    // (SE ~ 1/sqrt(k) on Jaccard, compounded through the union estimate)
    val events = Tables.events(spark, TestSpark.sf0001).cache()
    val fx = Sketches.kmvOverlap(events, exactAudit = true)
      .select($"g_a", $"g_b", $"inter_est", $"exact_inter", $"rel_err")
      .as[(String, String, Double, Long, Option[Double])].collect()
    assert(fx.nonEmpty)
    for ((a, b, est, exact, rel) <- fx if exact >= 20)
      assert(rel.exists(r => math.abs(r) <= 0.5),
        s"($a, $b): est $est exact $exact rel $rel")
    // determinism under repartitioning
    val fx2 = Sketches.kmvOverlap(events.repartition(13), exactAudit = true)
      .select($"g_a", $"g_b", $"inter_est", $"exact_inter", $"rel_err")
      .as[(String, String, Double, Long, Option[Double])].collect()
    assert(fx2.toSet == fx.toSet)
    // production default: sketch-only — no exact arm, placeholder columns
    val prod = Sketches.kmvOverlap(events)
      .select($"inter_est", $"exact_inter", $"rel_err")
      .as[(Double, Long, Option[Double])].collect()
    assert(prod.nonEmpty && prod.forall { case (_, ex, rel) => ex == 0L && rel.isEmpty })
    assert(prod.map(_._1).sorted.sameElements(fx.map(_._3).sorted),
      "sketch estimates must not depend on the audit arm")
    events.unpersist()
  }

  test("hllDailyRolling: merged daily registers equal the window's one-shot sketch") {
    val ev = Tables.events(spark, TestSpark.sf0001).cache()
    val got = Sketches.hllDailyRolling(ev)
      .as[(java.sql.Date, Long, Double)].collect()
      .map(r => r._1.toString -> (r._2, r._3)).toMap
    assert(got.size >= 7, s"expected a multi-week day span, got ${got.size}")
    // identity: for sampled days D, the rolling estimate equals
    // hllDistinct run one-shot over the events of [D-6, D] — merging
    // stored daily registers must lose nothing vs recomputation
    val days = got.keys.toSeq.sorted
    for (d <- Seq(days.head, days(days.size / 2), days.last)) {
      val windowEvents = ev.filter(
        expr(s"CAST(date_trunc('DAY', ts) AS DATE) BETWEEN date_sub('$d', 6) AND '$d'"))
        .withColumn("g", lit("w"))
      val oneShot = Sketches.hllDistinct(windowEvents, "g", "user_id")
        .select($"n_zero", $"est").as[(Long, Double)].head()
      assert(got(d) == oneShot, s"day $d: rolling ${got(d)} vs one-shot $oneShot")
    }
    // accuracy sanity on the last day: within 3 standard errors of exact,
    // after the standard small-range linear-counting correction the
    // operator's emitted n_zero exists for (n_distinct << m inflates raw
    // HLL; LC = m * ln(m / n_zero) is the published fix)
    val lastDay = days.last
    val exact = ev.filter(
        expr(s"CAST(date_trunc('DAY', ts) AS DATE) BETWEEN date_sub('$lastDay', 6) AND '$lastDay'"))
      .select($"user_id").distinct().count()
    val (nZero, rawEst) = got(lastDay)
    val corrected =
      if (rawEst <= 2.5 * 64 && nZero > 0) 64.0 * math.log(64.0 / nZero)
      else rawEst
    val se = 1.04 / math.sqrt(64)
    assert(math.abs(corrected - exact) / exact <= 3 * se,
      s"corrected $corrected (raw $rawEst, n_zero $nZero) vs exact $exact")
    ev.unpersist()
  }

  test("ddsketch: estimates within alpha of exact quantiles; mergeable; partition-invariant") {
    val li = Tables.lineitem(spark, TestSpark.sf0001).cache()
    val alpha = 0.01
    val got = Sketches.ddSketchQuantiles(li, "l_returnflag", "l_extendedprice",
        Seq(0.5, 0.95, 0.99), alpha)
      .as[(String, Double, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    // the DDSketch contract: relative error <= alpha vs the exact quantile
    // (same rank convention: value at rank floor(q*(n-1))+1 ascending)
    val vals = li.filter($"l_extendedprice" > 0)
      .select($"l_returnflag", $"l_extendedprice").as[(String, Double)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((flag, q, _, n, est) <- got) {
      val xs = vals(flag)
      assert(n == xs.length)
      val exact = xs(math.floor(q * (n - 1)).toInt)
      val rel = math.abs(est - exact) / exact
      assert(rel <= alpha + 1e-9, s"($flag, $q): est $est vs exact $exact rel $rel")
    }
    // partition invariance: integer bucket counts commute
    val got2 = Sketches.ddSketchQuantiles(li.repartition(17), "l_returnflag",
        "l_extendedprice", Seq(0.5, 0.95, 0.99), alpha)
      .as[(String, Double, Long, Long, Double)].collect()
    assert(got2.toSet == got.toSet)
    // mergeability: bucket counts of two halves sum to the full sketch's
    // counts (the additive-state property the streaming twins rely on)
    def buckets(df: org.apache.spark.sql.DataFrame) = df
      .filter($"l_extendedprice" > 0)
      .selectExpr("l_returnflag",
        s"CAST(ceil(ln(CAST(l_extendedprice AS DOUBLE)) / ${math.log((1 + alpha) / (1 - alpha))}) AS BIGINT) AS bucket")
      .groupBy("l_returnflag", "bucket").count()
      .as[(String, Long, Long)].collect()
      .map { case (g, b, c) => (g, b) -> c }.toMap
    val full = buckets(li)
    val h1 = buckets(li.filter($"l_orderkey" % 2 === 0))
    val h2 = buckets(li.filter($"l_orderkey" % 2 === 1))
    val merged = (h1.keySet ++ h2.keySet).map(k =>
      k -> (h1.getOrElse(k, 0L) + h2.getOrElse(k, 0L))).toMap
    assert(merged == full)
    li.unpersist()
  }

  test("merkle: digests are partition- and order-invariant") {
    val docs = (0 until 200).map(i => (i.toLong, s"doc text $i")).toDF("doc_id", "text")
    val m1 = Sketches.merkleManifest(docs.repartition(1), 16)
      .orderBy("bucket").collect().map(_.toSeq)
    val m2 = Sketches.merkleManifest(
        docs.orderBy(desc("doc_id")).repartition(7, col("text")), 16)
      .orderBy("bucket").collect().map(_.toSeq)
    assert(m1.toSeq === m2.toSeq)
  }

  test("merkle: a single-row edit moves exactly its bucket digest and the root") {
    val docs = (0 until 200).map(i => (i.toLong, s"doc text $i")).toDF("doc_id", "text")
    val edited = (0 until 200)
      .map(i => (i.toLong, if (i == 37) "TAMPERED" else s"doc text $i"))
      .toDF("doc_id", "text")
    val a = Sketches.merkleManifest(docs, 16).collect()
      .map(r => r.getInt(0) -> (r.getString(2), r.getString(3))).toMap
    val b = Sketches.merkleManifest(edited, 16).collect()
      .map(r => r.getInt(0) -> (r.getString(2), r.getString(3))).toMap
    val moved = (0 until 16).filter(k => a(k)._1 != b(k)._1)
    assert(moved === Seq(37 % 16), "only the edited bucket's digest may change")
    assert(a(0)._2 != b(0)._2, "the root must change")
  }

  test("cmsJoinSizeEstimate: exact inner product, overestimate-only error, partition-invariant") {
    // left: key k appears k times (k=1..20); right: every key once plus an
    // unmatched tail -> exact join size = sum(1..20) = 210
    val left = (1 to 20).flatMap(k => Seq.fill(k)(k.toLong)).toDF("lk")
    val right = ((1 to 20) ++ (100 to 109)).map(_.toLong).toDF("rk")
    val got = Sketches.cmsJoinSizeEstimate(left, right, "lk", "rk")
      .as[(Int, Int, Long, Long, Double)].collect().toSeq
    assert(got.length == 1)
    val (d, w, est, exact, relErr) = got.head
    assert((d, w, exact) == ((4, 65536, 210L)))
    // CMS counters only ADD colliding mass: the estimate can never
    // undershoot the true inner product
    assert(est >= exact)
    assert(math.abs(relErr - (est - exact).toDouble / exact) < 1e-6)
    // disjoint key spaces -> exact 0, NULL rel_err
    val miss = Sketches.cmsJoinSizeEstimate(
        left, Seq(900L, 901L).toDF("rk"), "lk", "rk")
      .selectExpr("exact_pairs", "rel_err IS NULL").as[(Long, Boolean)].collect()
    assert(miss.toSeq == Seq((0L, true)))
    // partition-invariant (counter sums are order-free)
    assert(Sketches.cmsJoinSizeEstimate(
        left.repartition(7), right.repartition(5), "lk", "rk")
      .as[(Int, Int, Long, Long, Double)].collect().toSeq == got)
    // sketch-only arm drops the audit columns
    assert(Sketches.cmsJoinSizeEstimate(left, right, "lk", "rk",
      exactAudit = false).columns.toSeq == Seq("d", "w", "est_pairs"))
    // string keys survive the normalization (a numeric cast would null
    // them out and report an empty join)
    val sl = Seq("a", "a", "b").toDF("sk")
    val sr = Seq("a", "c").toDF("sk")
    assert(Sketches.cmsJoinSizeEstimate(sl, sr, "sk", "sk")
      .selectExpr("exact_pairs").as[Long].collect().toSeq == Seq(2L))
  }
}
