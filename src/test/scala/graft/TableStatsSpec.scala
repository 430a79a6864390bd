package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TableStats

class TableStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("profileTable: nulls, exact distincts, min/max per column; one row per column") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), Some("b")),
      (Some(2L), None), (None, Some("a"))
    ).toDF("k", "s")
    val got = TableStats.profileTable(df, Seq("k", "s"))
      .as[(String, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == Set("k", "s"))
    assert(got("k") == (("k", 1L, 2L, "1", "2")))
    assert(got("s") == (("s", 1L, 2L, "a", "b")))
  }

  test("profileTable: no Expand — distincts are per-column narrow scans") {
    val df = Tables.lineitem(spark, TestSpark.sf0001)
    val prof = TableStats.profileTable(df, Seq("l_orderkey", "l_returnflag"))
    // base pass + one narrow scan per profiled column; crucially NO Expand
    // (the rows x (cols+1) shuffle the multi-distinct rewrite would plan)
    val plan = prof.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"profile must not Expand:\n$plan")
    val scans = prof.queryExecution.optimizedPlan.collectLeaves().size
    assert(scans == 3, s"expected base + 2 distinct scans, got $scans")
    assert(prof.count() == 2)
  }

  test("dqAudit: crafted violations counted per rule; clean rules report zero") {
    val parent = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    val child = Seq((10L, 1L), (11L, 1L), (12L, 3L), (13L, 99L))
      .toDF("cid", "parent_id") // 3 and 99 are orphans
    val dups = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "v")
    val report = TableStats.dqAudit(Seq(
      "child_orphans" -> TableStats.orphans(child, "parent_id", parent, "id"),
      "dup_keys" -> TableStats.duplicateKeys(dups, "k"),
      "clean_rule" -> parent.filter($"id" < 0)))
      .as[(String, Long)].collect().toMap
    assert(report == Map(
      "child_orphans" -> 2L, "dup_keys" -> 1L, "clean_rule" -> 0L))
  }

  test("histogram: bins partition the rows; matches a driver-side bucketing") {
    val ev = Tables.events(spark, TestSpark.sf0001)
    val got = TableStats.histogram(ev, "value", 0.0, 25.0)
      .as[(Long, Long)].collect().toMap
    val local = ev.select($"value").as[Double].collect()
      .groupBy(v => math.floor((v - 0.0) / 25.0).toLong).view.mapValues(_.length.toLong)
    assert(got == local.toMap)
    assert(got.values.sum == ev.count())
  }

  test("percentilesBy: exact interpolated quantiles match a driver-side sort") {
    val li = Tables.lineitem(spark, TestSpark.sf0001)
    val got = TableStats.percentilesBy(li, "l_returnflag",
        "CAST(round(l_extendedprice * 100) AS BIGINT)", Seq(0.5, 0.9))
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val local = li
      .selectExpr("l_returnflag", "CAST(round(l_extendedprice * 100) AS BIGINT) AS c")
      .as[(String, Long)].collect().groupBy(_._1)
    def q(xs: Seq[Long], p: Double): Double = {
      val s = xs.sorted; val r = p * (s.length - 1)
      val lo = s(r.toInt); val hi = s(math.ceil(r).toInt)
      lo + (hi - lo) * (r - r.toInt)
    }
    for ((flag, rows) <- local) {
      val xs = rows.map(_._2).toSeq
      assert(got(flag) == ((q(xs, 0.5), q(xs, 0.9))), flag)
    }
  }

  test("percentilesByApprox: sketch tracks the exact form within rank tolerance") {
    // sf0.001 lineitem: per-flag groups of a few hundred rows; with
    // accuracy=10000 the GK rank error bound (n/10000 < 1 rank) makes the
    // sketch exact-or-adjacent — gate each approx value to lie within the
    // exact [p-0.02, p+0.02] quantile band of its group
    val li = Tables.lineitem(spark, TestSpark.sf0001)
    val vexpr = "CAST(round(l_extendedprice * 100) AS BIGINT)"
    val ps = Seq(0.25, 0.5, 0.9)
    val approx = TableStats.percentilesByApprox(li, "l_returnflag", vexpr, ps)
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> Seq(r._2, r._3, r._4)).toMap
    val local = li.selectExpr("l_returnflag", s"$vexpr AS c")
      .as[(String, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted)
    for ((flag, xs) <- local; (p, i) <- ps.zipWithIndex) {
      val n = xs.length
      def rank(q: Double) = math.max(0, math.min(n - 1, (q * (n - 1)).round.toInt))
      val (lo, hi) = (xs(rank(p - 0.02)), xs(rank(p + 0.02)))
      val a = approx(flag)(i)
      assert(a >= lo && a <= hi, s"$flag p$p: $a outside [$lo, $hi]")
    }
    // schema parity with the exact twin
    assert(TableStats.percentilesByApprox(li, "l_returnflag", vexpr, ps).columns.toSeq ==
      TableStats.percentilesBy(li, "l_returnflag", vexpr, ps).columns.toSeq)
  }

  test("mergeRollup: delta merge equals full recompute; disjoint and overlapping keys") {
    val base = Seq(("a", 1L, 10L), ("b", 2L, 20L)).toDF("k", "n", "s")
    val delta = Seq(("a", 3L, 30L), ("c", 4L, 40L)).toDF("k", "n", "s")
    val merged = TableStats.mergeRollup(base, delta, Seq("k"), Seq("n", "s"))
      .as[(String, Long, Long)].collect().toSet
    assert(merged == Set(("a", 4L, 40L), ("b", 2L, 20L), ("c", 4L, 40L)))
  }

  test("keySkew: counts exact, top key deterministic on ties, skew = max/avg") {
    // keys: a x4, b x4, c x2 — a/b tie on count, 'a' wins the asc tie-break
    val df = (Seq.fill(4)("a") ++ Seq.fill(4)("b") ++ Seq.fill(2)("c")).toDF("k")
    val r = TableStats.keySkew(df, "k")
      .as[(Long, Long, Long, String, Double)].collect().head
    assert(r == ((10L, 3L, 4L, "a", math.rint(4.0 / (10.0 / 3) * 1e6) / 1e6)))
  }

  test("snapshotDiff: added/removed/changed classified; unchanged absent; no full-outer join") {
    val base = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("doc_id", "text")
    val cur = Seq((1L, "x"), (2L, "Y2"), (4L, "w")).toDF("doc_id", "text")
    val d = TableStats.snapshotDiff(base, cur, "doc_id", "sha2(text, 256)")
    val got = d.as[(Long, String, String, String)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(got == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
    val plan = d.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Join"), plan)
  }

  test("equiDepthHistogram: counts near-equal, complete, boundaries match driver percentiles") {
    val li = Tables.lineitem(spark, TestSpark.sf0001)
    val v = "CAST(round(l_extendedprice * 100) AS BIGINT)"
    val got = TableStats.equiDepthHistogram(li, v, 8)
      .as[(Long, Long)].collect().toMap
    val xs = li.selectExpr(s"$v AS x").as[Long].collect().sorted
    assert(got.values.sum == xs.length)
    assert(got.keySet == (0L until 8L).toSet)
    // driver-side: same interpolated boundaries, same strict-> bucketing
    def q(p: Double): Double = {
      val r = p * (xs.length - 1)
      val lo = xs(r.toInt); val hi = xs(math.ceil(r).toInt)
      lo + (hi - lo) * (r - r.toInt)
    }
    val bs = (1 until 8).map(i => q(i / 8.0))
    val local = xs.groupBy(x => bs.count(b => x.toDouble > b).toLong)
      .view.mapValues(_.length.toLong).toMap
    assert(got == local)
    // equi-depth: each bucket within 2% of n/8 on this near-continuous column
    assert(got.values.forall(n => math.abs(n - xs.length / 8.0) <= xs.length * 0.02))
  }

  test("groupRegression: exact fit recovered; constant-x group yields nulls") {
    val d = (Seq((0L, 2L), (1L, 5L), (2L, 8L), (3L, 11L)).map(p => ("lin", p._1, p._2))
      ++ Seq(("flat", 7L, 1L), ("flat", 7L, 9L)))
      .toDF("k", "x", "y")
    val got = TableStats.groupRegression(d, "k", "x", "y")
      .as[(String, Long, Option[Double], Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(got("lin") == (("lin", 4L, Some(3.0), Some(2.0)))) // y = 3x + 2
    assert(got("flat") == (("flat", 2L, None, None)))         // zero variance in x
  }

  test("chiSquare: independent table has zero cells; marginals reproduce expectations") {
    // perfectly independent 2x2: every cell o == expected -> chi2 0
    val indep = Seq(("a", 0L), ("a", 1L), ("b", 0L), ("b", 1L))
      .toDF("x", "y")
    val z = TableStats.chiSquare(indep, "x", "y")
      .as[(String, Long, Long, Double, Double)].collect()
    assert(z.length == 4 && z.forall(c => c._4 == 1.0 && c._5 == 0.0))
    // skewed cell: o=2, row=3, col=3, n=4 -> e=2.25, chi2=(0.25)^2/2.25
    val skew = Seq(("a", 0L), ("a", 0L), ("a", 1L), ("b", 0L)).toDF("x", "y")
    val cells = TableStats.chiSquare(skew, "x", "y")
      .as[(String, Long, Long, Double, Double)].collect()
      .map(c => (c._1, c._2) -> (c._3, c._4, c._5)).toMap
    assert(cells(("a", 0L)) == ((2L, 2.25, 0.027778)))
  }

  test("mutualInformation: independent table sums to zero; determined pair sums to H") {
    // perfectly independent 2x2 -> every cell's ln argument is 1 -> 0
    val indep = Seq(("a", 0L), ("a", 1L), ("b", 0L), ("b", 1L))
      .toDF("x", "y")
    val z = TableStats.mutualInformation(indep, "x", "y")
      .as[(String, Long, Long, Double)].collect()
    assert(z.length == 4 && z.forall(_._4 == 0.0))
    // y fully determined by x, uniform marginals -> I = H(X) = ln 2
    val det = Seq(("a", 0L), ("a", 0L), ("b", 1L), ("b", 1L)).toDF("x", "y")
    val i = TableStats.mutualInformation(det, "x", "y")
      .as[(String, Long, Long, Double)].collect()
    assert(i.length == 2)
    assert(math.abs(i.map(_._4).sum - math.log(2.0)) < 1e-5)
    // driver-side recompute on a skewed table, per cell
    val skew = Seq(("a", 0L), ("a", 0L), ("a", 1L), ("b", 0L)).toDF("x", "y")
    val got = TableStats.mutualInformation(skew, "x", "y")
      .as[(String, Long, Long, Double)].collect()
      .map(c => (c._1, c._2) -> (c._3, c._4)).toMap
    def mi(o: Long, ra: Long, cb: Long, n: Long) =
      math.rint(o.toDouble / n * math.log(o.toDouble * n / (ra.toDouble * cb)) * 1e6) / 1e6
    assert(got(("a", 0L)) == ((2L, mi(2, 3, 3, 4))))
    assert(got(("a", 1L)) == ((1L, mi(1, 3, 1, 4))))
    assert(got(("b", 0L)) == ((1L, mi(1, 1, 3, 4))))
  }

  test("corrMatrix: matches driver-side Pearson on exact moments; constant var is NULL") {
    val df = Seq((1L, 2L, 5L), (2L, 4L, 5L), (3L, 7L, 5L), (4L, 8L, 5L))
      .toDF("x", "y", "c")
    val got = TableStats.corrMatrix(df, Seq("x" -> "x", "y" -> "y", "c" -> "c"))
      .as[(String, String, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("x", "c")).isEmpty && got(("y", "c")).isEmpty)
    val xs = Seq(1.0, 2.0, 3.0, 4.0); val ys = Seq(2.0, 4.0, 7.0, 8.0)
    val n = 4.0
    val r = (n * xs.zip(ys).map { case (a, b) => a * b }.sum - xs.sum * ys.sum) /
      math.sqrt((n * xs.map(a => a * a).sum - xs.sum * xs.sum) *
        (n * ys.map(a => a * a).sum - ys.sum * ys.sum))
    assert(math.abs(got(("x", "y")).get - r) < 1e-6)
  }

  test("winsorizedMean: fences interpolate exactly, outlier influence bounded, raw mean unchanged") {
    import spark.implicits._
    // [1..9, 1000]: lo = 1 + 0.45*(2-1) = 1.45; hi = 9 + 0.55*(1000-9) = 554.05
    // winsorized sum = 1.45 + (2..9) + 554.05 = 599.5 -> mean 59.95
    val df = ((1L to 9L) :+ 1000L).map("g" -> _).toDF("grp", "v")
    val got = TableStats.winsorizedMean(df, "grp", "v")
      .as[(String, Long, Double, Double, Double, Double)].head()
    assert(got == (("g", 10L, 1.45, 554.05, 104.5, 59.95)))
  }

  test("quantileNormalize: group extremes map to global extremes; interior points interpolate; no sort-merge join") {
    import spark.implicits._
    // global sorted values: 1,2,3,10,20,30 (N=6)
    val df = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L),
      ("b", 4L, 10L), ("b", 5L, 20L), ("b", 6L, 30L)).toDF("src", "id", "v")
    val out = TableStats.quantileNormalize(df, "id", "src", "v")
    val got = out.as[(Long, String, Long, Double)].collect().map(r => r._1 -> r._4).toMap
    // each group's ranks are a/b = 0, 1/2, 1 -> h = 0, 2.5, 5 over N-1=5
    // h=2.5 interpolates midway between x_2=3 and x_3=10 -> 6.5
    assert(got(1L) == 1.0 && got(4L) == 1.0) // both group minima -> global min
    assert(got(3L) == 30.0 && got(6L) == 30.0) // both group maxima -> global max
    assert(got(2L) == 6.5 && got(5L) == 6.5) // aligned distributions agree
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), s"rank joins must hash:\n$plan")
  }

  test("quantileNormalize: normalized ranks are order-preserving within each group") {
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val got = TableStats.quantileNormalize(docs, "doc_id", "source", "n_chars")
      .as[(Long, String, Long, Double)].collect()
    for ((_, g) <- got.groupBy(_._2)) {
      val byV = g.sortBy(r => (r._3, r._1))
      assert(byV.map(_._4).sliding(2).forall(p => p.head <= p.last), s"monotone in $g")
    }
    // normalized values live inside the global value range
    val (lo, hi) = (got.map(_._3).min.toDouble, got.map(_._3).max.toDouble)
    assert(got.forall(r => r._4 >= lo && r._4 <= hi))
  }

  test("madOutliers: a wild value trips the MAD fence; a degenerate group flags none") {
    import spark.implicits._
    // g=a: med(10,12,14,16,1000)=14, adev=(4,2,0,2,986), mad=2, fence=6 -> 1000 only
    // g=b: all equal -> mad=0 -> no outliers by contract
    val df = (Seq(10L, 12L, 14L, 16L, 1000L).map("a" -> _) ++
      Seq(5L, 5L, 5L).map("b" -> _)).toDF("lang", "v")
    val got = TableStats.madOutliers(df, "lang", "v")
      .as[(String, Long, Double, Double, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 5L, 14.0, 2.0, 1L)))
    assert(got("b") == (("b", 3L, 5.0, 0.0, 0L)))
  }

  test("madOutliers: mean+stddev would blow the fence where median/MAD holds") {
    import spark.implicits._
    // the robustness claim itself: with one wild value the z-fence flags
    // nothing (the outlier drags sigma), the MAD fence still catches it
    val vals = Seq(10L, 11L, 12L, 13L, 14L, 1000000L)
    val df = vals.map("g" -> _).toDF("lang", "v")
    val mad = TableStats.madOutliers(df, "lang", "v")
      .as[(String, Long, Double, Double, Long)].head()
    assert(mad._5 == 1L)
    val mean = vals.sum.toDouble / vals.size
    val sd = math.sqrt(vals.map(v => (v - mean) * (v - mean)).sum / vals.size)
    assert(vals.count(v => math.abs(v - mean) > 3 * sd) == 0)
  }
}
