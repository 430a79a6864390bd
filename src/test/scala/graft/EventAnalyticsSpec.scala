package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventAnalytics

class EventAnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1704067200000L + min * 60000L) // 2024-01-01 + min

  /** (event_id, ts, user_id, event_type, value) rows as an events-shaped DF. */
  private def ev(rows: (Long, Int, Long, String, Double)*) =
    rows.map { case (id, m, u, t, v) => (id, ts(m), u, t, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")

  test("funnel: strictly-after semantics — same-timestamp next step does not count") {
    val e = ev(
      (1, 0, 1, "view", 0), (2, 0, 1, "click", 0),  // click NOT after view
      (3, 5, 1, "click", 0),                         // this one is
      (4, 0, 2, "click", 0), (5, 5, 2, "view", 0))   // wrong order: no step 2
    val f = EventAnalytics.funnel(e, Seq("view", "click"))
      .select("user_id", "step").as[(Long, Int)].collect().toSet
    assert(f == Set((1L, 1), (1L, 2), (2L, 1)))
  }

  test("funnel: min times chain — earliest completion after previous step") {
    val e = ev(
      (1, 10, 1, "view", 0), (2, 2, 1, "view", 0),     // first view at t=2
      (3, 5, 1, "click", 0), (4, 20, 1, "click", 0),   // first click after 2 is 5
      (5, 3, 1, "purchase", 0), (6, 30, 1, "purchase", 0)) // purchase at 3 is before click: use 30
    val f = EventAnalytics.funnel(e, Seq("view", "click", "purchase"))
      .select($"step", $"step_ts").as[(Int, Timestamp)].collect().toMap
    assert(f(1) == ts(2) && f(2) == ts(5) && f(3) == ts(30))
  }

  test("windowedFunnel: transitions outside the gap are dropped; conversions divide exactly") {
    // gap = 60 s. user 1 converts fully inside the gap; user 2's click
    // lands 61 s after the view (outside); user 3 stops at view
    val e = ev(
      (1, 0, 1, "view", 0), (2, 1, 1, "click", 0), (3, 2, 1, "purchase", 0),
      (4, 0, 2, "view", 0), (5, 61, 2, "click", 0),
      (6, 0, 3, "view", 0))
    // fixture timestamps step in MINUTES: user 2's click is +61 min =
    // 3660 s, outside the 3600 s gap — only user 1 reaches step 2
    val got = EventAnalytics.windowedFunnel(
        e, Seq("view", "click", "purchase"), maxGapSeconds = 3600)
      .as[(Int, Long, Double, Double)].collect().toSeq
    assert(got == Seq((1, 3L, 1.0, 1.0), (2, 1L, 0.333333, 0.333333),
      (3, 1L, 1.0, 0.333333)))
    // a wide-enough gap re-admits user 2's click (plain-funnel reach)
    val wide = EventAnalytics.windowedFunnel(
        e, Seq("view", "click", "purchase"), maxGapSeconds = 10000000L)
      .as[(Int, Long, Double, Double)].collect().toSeq
    assert(wide.map(r => r._1 -> r._2).toMap == Map(1 -> 3L, 2 -> 2L, 3 -> 1L))
  }

  test("cohortLtv: hand-checked triangle — cumulative cents and per-user LTV") {
    // user 1 joins week 0, buys 100c in week 0 and 200c in week 1;
    // user 2 joins week 0, never buys; user 3 joins week 1, buys 50c then
    val wk = 60 * 24 * 7
    val e = ev(
      (1, 0, 1, "view", 0), (2, 10, 1, "purchase", 1.0),
      (3, wk + 5, 1, "purchase", 2.0),
      (4, 0, 2, "view", 0),
      (5, wk, 3, "view", 0), (6, wk + 1, 3, "purchase", 0.5))
    val got = EventAnalytics.cohortLtv(e)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (0L, 0L, 100L, 1L, 100L, 2L, 50.0),
      (0L, 1L, 200L, 1L, 300L, 2L, 150.0),
      (1L, 0L, 50L, 1L, 50L, 1L, 50.0)))
  }

  test("markovStationary: hand-traced fixed-point power iteration on a 2-state chain") {
    // user 1: view->click->click->view gives t(view->click)=1,
    // t(click->click)=t(click->view)=1/2; three floored iterations from
    // uniform land at view=327680/2^20, click=720896/2^20
    val e = ev((1, 0, 1, "view", 0), (2, 1, 1, "click", 0),
      (3, 2, 1, "click", 0), (4, 3, 1, "view", 0))
    val got = EventAnalytics.markovStationary(e)
      .as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("click", 720896L, 0.6875), ("view", 327680L, 0.3125)))
    // fixture: mass stays within (0, 1], partition-invariant
    val fx = Tables.events(spark, TestSpark.sf0001)
    val fxr = EventAnalytics.markovStationary(fx)
      .as[(String, Long, Double)].collect().toSeq
    assert(fxr.nonEmpty && fxr.map(_._2).sum <= 1048576L)
    assert(fxr.forall(_._2 > 0L))
    assert(EventAnalytics.markovStationary(fx.repartition(7))
      .as[(String, Long, Double)].collect().toSeq == fxr)
  }

  test("psiDrift: identical halves score exactly zero; a shifted half scores positive") {
    // split at 2024-01-16 = minute 15*1440 in the ts() fixture
    val cut = 15 * 1440
    // stable type: same value profile both halves -> every band term is
    // ln(1) = 0 exactly (c1 = c2, n1 = n2)
    val stable = Seq.tabulate(8)(i =>
      (i + 1L, if (i < 4) i * 10 else cut + (i - 4) * 10, 1L, "view", (i % 4) * 10.0))
    // drifted type: second half jumps an order of magnitude
    val drifted = Seq.tabulate(8)(i =>
      (100 + i.toLong, if (i < 4) i * 10 else cut + (i - 4) * 10, 2L, "click",
        if (i < 4) 1.0 else 100.0))
    val e = ev(stable ++ drifted: _*)
    val got = EventAnalytics.psiDrift(e)
      .as[(String, Long, Long, Long, Double)].collect()
      .map { case (t, n1, n2, nb, psi) => t -> ((n1, n2, nb, psi)) }.toMap
    assert(got("view") == ((4L, 4L, 4L, 0.0)))
    val (cn1, cn2, cnb, cpsi) = got("click")
    assert((cn1, cn2, cnb) == ((4L, 4L, 2L)) && cpsi > 0.5)
  }

  test("welchTTest: hand-computed t and Satterthwaite df from exact moments") {
    // purchase cents [100, 200, 300]: mean 200, var 10000
    // click cents [100, 100]: mean 100, var 0
    // se2 = 10000/3; t = 100/sqrt(10000/3); df = 2 (b-variance term vanishes)
    val e = ev(
      (1, 0, 1, "purchase", 1.0), (2, 1, 1, "purchase", 2.0),
      (3, 2, 1, "purchase", 3.0),
      (4, 0, 2, "click", 1.0), (5, 1, 2, "click", 1.0))
    val got = EventAnalytics.welchTTest(e)
      .as[(String, String, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq
    assert(got == Seq(("purchase", "click", 3L, 2L, 200.0, 100.0,
      1.732051, 2.0)))
    // degenerate inputs yield NULL statistics, never an ANSI divide
    // error: single-sample side (no sample variance) and identical
    // constants on both sides (se2 = 0)
    val single = ev((1, 0, 1, "purchase", 1.0),
      (2, 0, 2, "click", 1.0), (3, 1, 2, "click", 2.0))
    val s1 = EventAnalytics.welchTTest(single)
      .selectExpr("t_stat IS NULL", "df IS NULL")
      .as[(Boolean, Boolean)].collect().toSeq
    assert(s1 == Seq((true, true)))
    val const = ev((1, 0, 1, "purchase", 1.0), (2, 1, 1, "purchase", 1.0),
      (3, 0, 2, "click", 1.0), (4, 1, 2, "click", 1.0))
    val s2 = EventAnalytics.welchTTest(const)
      .selectExpr("t_stat IS NULL", "df IS NULL")
      .as[(Boolean, Boolean)].collect().toSeq
    assert(s2 == Seq((true, true)))
  }

  test("seasonalNaiveBacktest: hand-checked MAPE and bias at season=1") {
    // view daily cents: day0=100, day1=150, day2=150. season 1:
    // day1 scored vs 100 (ape 50/150), day2 vs 150 (ape 0)
    val day = 60 * 24
    val e = ev(
      (1, 0, 1, "view", 1.0),
      (2, day, 1, "view", 1.0), (3, day + 1, 2, "view", 0.5),
      (4, 2 * day, 1, "view", 1.5))
    val got = EventAnalytics.seasonalNaiveBacktest(e, season = 1)
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(("view", 2L, 2L, 0.166667, -25.0)))
    // all-zero actuals leave no scorable day: NULL MAPE, not a divide
    val zeros = ev((1, 0, 1, "view", 0.0), (2, day, 1, "view", 0.0))
    val z = EventAnalytics.seasonalNaiveBacktest(zeros, season = 1)
      .selectExpr("n_scored", "mape IS NULL").as[(Long, Boolean)]
      .collect().toSeq
    assert(z == Seq((0L, true)))
  }

  test("retentionCohorts: offset-0 row counts every cohort user once") {
    val e = ev(
      (1, 0, 1, "view", 0), (2, 60 * 24 * 8, 1, "view", 0),  // week 0, active week 1
      (3, 0, 2, "view", 0),                                    // week 0 only
      (4, 60 * 24 * 8, 3, "view", 0))                          // joins in week 1
    val r = EventAnalytics.retentionCohorts(e)
      .as[(Long, Long, Long)].collect().toSet
    assert(r == Set((0L, 0L, 2L), (0L, 1L, 1L), (1L, 0L, 1L)))
  }

  test("gapFillDaily: silent days appear as zero rows, span is first..last day") {
    val e = ev((1, 0, 1, "view", 0), (2, 60 * 24 * 3, 1, "view", 0),
      (3, 60 * 24 * 3 + 5, 1, "click", 0))
    val g = EventAnalytics.gapFillDaily(e)
      .as[(Long, Long, Long)].collect().sortBy(_._2)
    assert(g.toSeq == Seq((1L, 0L, 1L), (1L, 1L, 0L), (1L, 2L, 0L), (1L, 3L, 2L)))
  }

  test("stateHistory: consecutive same-type runs collapse; intervals chain; last is open") {
    val e = ev(
      (1, 0, 1, "a", 0), (2, 1, 1, "a", 0),   // run a [0, 2)
      (3, 2, 1, "b", 0),                       // run b [2, 4)
      (4, 4, 1, "a", 0))                       // run a [4, null)
    val h = EventAnalytics.stateHistory(e)
      .select($"event_type", $"valid_from", $"valid_to")
      .as[(String, Timestamp, Option[Timestamp])].collect().sortBy(_._2.getTime)
    assert(h.toSeq == Seq(
      ("a", ts(0), Some(ts(2))), ("b", ts(2), Some(ts(4))), ("a", ts(4), None)))
  }

  test("stateHistory: same-ts collisions — zero-width runs dropped, max-eid0 run wins") {
    val e = ev(
      (1, 0, 1, "b", 0), (2, 0, 1, "a", 0), // collision at t=0: run b{1} is [0,0) — dropped
      (3, 5, 1, "b", 0))
    val h = EventAnalytics.stateHistory(e)
      .select($"event_type", $"valid_from", $"valid_to")
      .as[(String, Timestamp, Option[Timestamp])].collect().sortBy(_._2.getTime)
    assert(h.toSeq == Seq(("a", ts(0), Some(ts(5))), ("b", ts(5), None)))
    // the uniqueness pointInTimeJoin relies on is real, not just documented
    val dups = EventAnalytics.stateHistory(e)
      .groupBy("user_id", "valid_from").count().filter($"count" > 1).count()
    assert(dups == 0)
  }

  test("zscoreOutliers: constant group yields none; a clear outlier is flagged") {
    val e = ev(
      (1, 0, 1, "flat", 5), (2, 1, 1, "flat", 5), (3, 2, 1, "flat", 5),
      (4, 0, 1, "spiky", 0), (5, 1, 1, "spiky", 0), (6, 2, 1, "spiky", 0),
      (7, 3, 1, "spiky", 0), (8, 4, 1, "spiky", 0), (9, 5, 1, "spiky", 0),
      (10, 6, 1, "spiky", 0), (11, 7, 1, "spiky", 0), (12, 8, 1, "spiky", 0),
      (13, 9, 1, "spiky", 100))
    val z = EventAnalytics.zscoreOutliers(e, 2.0)
      .select("event_id", "event_type").as[(Long, String)].collect()
    assert(z.toSeq == Seq((13L, "spiky"))) // flat: variance 0 -> NaN filtered
  }

  test("dedupBursts: chains collapse to the burst head; gap is strict; keys independent") {
    val gap = 600L // 10 minutes
    val e = ev(
      (1, 0, 1, "click", 0),  // burst head
      (2, 5, 1, "click", 0),  // within 10 min of #1 -> dropped
      (3, 9, 1, "click", 0),  // within 10 min of #2 (chain!) -> dropped
      (4, 25, 1, "click", 0), // 16 min after #3 -> new burst head
      (5, 10, 1, "view", 0),  // different type: independent key
      (6, 0, 2, "click", 0))  // different user: independent key
    val got = EventAnalytics.dedupBursts(e, gap)
      .select("event_id").as[Long].collect().toSet
    assert(got == Set(1L, 4L, 5L, 6L))
    // boundary: a gap of EXACTLY gapSeconds is still a duplicate (strict >)
    val b = ev((1, 0, 1, "click", 0), (2, 10, 1, "click", 0))
    assert(EventAnalytics.dedupBursts(b, 600)
      .select("event_id").as[Long].collect().toSet == Set(1L))
    assert(EventAnalytics.dedupBursts(b, 599)
      .select("event_id").as[Long].collect().toSet == Set(1L, 2L))
    // equal-timestamp duplicates: lowest event_id survives
    val t = ev((7, 0, 1, "click", 0), (5, 0, 1, "click", 0))
    assert(EventAnalytics.dedupBursts(t, 600)
      .select("event_id").as[Long].collect().toSet == Set(5L))
  }

  test("lastTouchAttribution: strictly-earlier touch, total-order ties, first-conversion nulls") {
    val e = ev(
      (1, 0, 1, "view", 0),
      (2, 5, 1, "click", 0),
      (3, 10, 1, "purchase", 0),  // touch = click #2
      (4, 20, 1, "purchase", 0),  // still click #2 (purchases never touch)
      (5, 0, 2, "purchase", 0),   // no prior touch -> nulls
      (6, 30, 2, "view", 0),
      (7, 30, 2, "purchase", 0))  // same ts, view has lower event_id -> earlier in total order
    val got = EventAnalytics.lastTouchAttribution(e)
      .as[(Long, Long, Option[Long], Option[String], Option[Long])].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5))).toMap
    assert(got(3L) == ((Some(2L), Some("click"), Some(5L * 60000000L))))
    assert(got(4L) == ((Some(2L), Some("click"), Some(15L * 60000000L))))
    assert(got(5L) == ((None, None, None)))
    assert(got(7L) == ((Some(6L), Some("view"), Some(0L))))
  }

  test("ohlcResample: open/close by (ts, event_id) order; high/low exact; bucket split") {
    val e = ev(
      (2, 0, 1, "m", 1.00),   // bucket 0: open (ts tie with #1, lower id wins? no — ids: 2 vs 1)
      (1, 0, 1, "m", 2.00),   // same ts, event_id 1 < 2 -> OPEN is 2.00
      (3, 30, 1, "m", 9.00),  // high
      (4, 59, 1, "m", 0.50),  // close + low
      (5, 60, 1, "m", 7.00))  // next bucket (60-min buckets)
    val got = EventAnalytics.ohlcResample(e, 3600)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._2 -> ((r._3, r._4, r._5, r._6, r._7))).toMap
    // bucket of 2024-01-01T00:00 epoch hours
    val b0 = 1704067200000000L / 3600000000L
    assert(got(b0) == ((200L, 900L, 50L, 50L, 4L)))
    assert(got(b0 + 1) == ((700L, 700L, 700L, 700L, 1L)))
  }

  test("dailyActiveUsers: new/active/cumulative counts on a crafted timeline") {
    val e = ev(
      (1, 0, 1, "view", 0), (2, 5, 2, "view", 0),            // day 0: users 1,2 new
      (3, 60 * 24, 1, "view", 0), (4, 60 * 24 + 1, 1, "click", 0), // day 1: user 1 only
      (5, 60 * 24 * 2, 3, "view", 0))                         // day 2: user 3 new
    val r = EventAnalytics.dailyActiveUsers(e)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(r.toSeq == Seq(
      (0L, 2L, 2L, 2L, 2L), (1L, 2L, 1L, 0L, 2L), (2L, 1L, 1L, 1L, 3L)))
  }

  test("transitionMatrix: per-source probabilities sum to 1; counts match a crafted chain") {
    val e = ev((1, 0, 1, "a", 0), (2, 1, 1, "b", 0), (3, 2, 1, "a", 0),
      (4, 3, 1, "b", 0), (5, 0, 2, "a", 0), (6, 1, 2, "a", 0))
    val m = EventAnalytics.transitionMatrix(e)
      .as[(String, String, Long, Double)].collect()
    val byPair = m.map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(byPair(("a", "b")) == ((2L, 0.666667))) // a->b twice of a's 3 exits
    assert(byPair(("a", "a")) == ((1L, 0.333333)))
    assert(byPair(("b", "a")) == ((1L, 1.0)))
    for ((_, rows) <- m.groupBy(_._1))
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-5)
  }

  test("topPaths: counts consecutive triples, deterministic cut") {
    val e = ev((1, 0, 1, "a", 0), (2, 1, 1, "b", 0), (3, 2, 1, "c", 0),
      (4, 3, 1, "a", 0), (5, 0, 2, "a", 0), (6, 1, 2, "b", 0), (7, 2, 2, "c", 0))
    val p = EventAnalytics.topPaths(e, 5)
      .as[(String, String, String, Long)].collect().toSeq
    assert(p.head == (("a", "b", "c", 2L)))
    assert(p.toSet == Set(("a", "b", "c", 2L), ("b", "c", "a", 1L)))
  }

  test("timeWeightedAvg: weights are hold durations; last observation excluded") {
    val e = ev(
      (1, 0, 1, "view", 10.0),  // holds 10 min at 10.00
      (2, 10, 1, "view", 20.0), // holds 30 min at 20.00
      (3, 40, 1, "view", 99.0)) // last: excluded
    val r = EventAnalytics.timeWeightedAvg(e)
      .as[(Long, Long, Double)].collect()
    assert(r.length == 1)
    val (u, n, twap) = r(0)
    assert(u == 1L && n == 2L)
    // (1000*10 + 2000*30) / 40 = 1750 cents = 17.50
    assert(twap == 17.5)
  }

  test("zscoreOutliers parity with the full fixture at sf0.001") {
    // cross-check the distributed moments against a driver-side computation
    val events = Tables.events(spark, TestSpark.sf0001)
    val got = EventAnalytics.zscoreOutliers(events, 2.0)
      .select("event_id").as[Long].collect().toSet
    val rows = events.select($"event_id", $"event_type",
        expr("CAST(floor(value * 1024.0 + 0.5) AS BIGINT)").as("fx"))
      .as[(Long, String, Long)].collect()
    val expect = rows.groupBy(_._2).flatMap { case (_, g) =>
      val n = g.length.toDouble
      val s = g.map(_._3).sum.toDouble
      val ssq = g.map(r => r._3 * r._3).sum.toDouble
      g.filter { r =>
        val z = BigDecimal((r._3 - s / n) / math.sqrt((ssq - s * s / n) / n))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        !z.isNaN && math.abs(z) > 2.0
      }.map(_._1).toSeq
    }.toSet
    assert(got == expect)
  }

  test("ewmaDailySpend: half-life weighting on a crafted 3-day user; single-day user is its own ewma") {
    // user 1: day0=100c, day1=200c, day2=400c -> ewma = 400 + 200/2 + 100/4
    val e = ev(
      (1, 0, 1, "purchase", 0.60), (2, 10, 1, "purchase", 0.40), // day0: 100c
      (3, 1440, 1, "purchase", 2.00), // day1: 200c
      (4, 2880, 1, "purchase", 4.00), // day2: 400c
      (5, 0, 2, "purchase", 1.23)) // single day
    val got = EventAnalytics.ewmaDailySpend(e)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 3L, 5.25))) // (400 + 100 + 25) cents / 100
    assert(got(2L) == ((2L, 1L, 1.23)))
  }

  test("ewmaDailySpend: truncates to the most recent maxDays observations") {
    // 40 active days of 100c each at maxDays=32: sum_{j=0..31} 0.5^j = 2 - 2^-31
    val rows = (0 until 40).map(d => (d.toLong, d * 1440, 7L, "purchase", 1.00))
    val got = EventAnalytics.ewmaDailySpend(ev(rows: _*), 32)
      .as[(Long, Long, Double)].head()
    assert(got._2 == 32L)
    val expect = BigDecimal((2.0 - math.pow(2, -31)) * 1.00)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got._3 == expect)
  }

  test("dowAnomalies: a spiked weekday flags against same-dow baseline only; z = sqrt(3) shape") {
    // 4 weeks, one event per day of 1.00 except day 21 (a Monday-slot, dow 0)
    // at 5.00: within dow 0 the samples are (100,100,100,500) cents ->
    // z(spike) = +sqrt(3) (the 1-of-4 outlier shape, value-independent),
    // z(others) = -1/sqrt(3) ~ -0.577 -> below the 1.5 fence
    val rows = (0 until 28).map { d =>
      (d.toLong, d * 1440, 1L, "view", if (d == 21) 5.00 else 1.00)
    }
    val got = EventAnalytics.dowAnomalies(ev(rows: _*))
      .as[(String, Long, Long, Long, Double)].collect()
    val sqrt3 = BigDecimal(math.sqrt(3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq == Seq(("view", 21L, 0L, 500L, sqrt3)))
    // constant weekdays (sd = 0) flag nothing even at threshold ~0
    val flat = (0 until 28).map(d => (d.toLong, d * 1440, 1L, "view", 1.00))
    assert(EventAnalytics.dowAnomalies(ev(flat: _*), 0.001).isEmpty)
  }

  test("jsonPropsRollup: missing fields count as null, sums and distincts exact") {
    val e = Seq(
      (1L, ts(0), 1L, "click", 1.0, """{"k": 5}"""),
      (2L, ts(1), 1L, "click", 1.0, """{"k": 7}"""),
      (3L, ts(2), 1L, "click", 1.0, """{"other": 1}"""),
      (4L, ts(3), 2L, "view", 1.0, """{"k": 5}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventAnalytics.jsonPropsRollup(e)
      .as[(String, Long, Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(got("click") == (("click", 3L, 2L, 12L, 2L, Some(6.0))))
    assert(got("view") == (("view", 1L, 1L, 5L, 1L, Some(5.0))))
  }

  test("ksDrift: identical halves score 0, disjoint halves score 1; fixture partition-invariant") {
    // split date 2024-01-16 = minute 21600 after the ts() anchor
    val before = 0
    val after = 30000
    val e = ev(
      // type a: same values both eras -> every ECDF gap is 0
      (1, before, 1, "a", 1.0), (2, before, 1, "a", 2.0),
      (3, after, 1, "a", 1.0), (4, after, 1, "a", 2.0),
      // type b: value ranges don't overlap -> gap hits n1*n2
      (5, before, 1, "b", 1.0), (6, before, 1, "b", 2.0),
      (7, after, 1, "b", 11.0), (8, after, 1, "b", 12.0))
    val got = EventAnalytics.ksDrift(e)
      .as[(String, Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 2L, 2L, 0L, 0.0)))
    assert(got("b") == (("b", 2L, 2L, 4L, 1.0)))
    // real fixture: every type present, ks in [0, 1], partition-invariant
    val events = Tables.events(spark, TestSpark.sf0001)
    val fxr = EventAnalytics.ksDrift(events)
      .as[(String, Long, Long, Long, Double)].collect().toSet
    assert(fxr.size == 5 && fxr.forall(r => r._5 >= 0.0 && r._5 <= 1.0))
    assert(fxr.forall(r => r._2 > 0 && r._3 > 0))
    assert(EventAnalytics.ksDrift(events.repartition(7))
      .as[(String, Long, Long, Long, Double)].collect().toSet == fxr)
  }

  test("benfordAudit: crafted digit counts match the fixed-point formula; chi2 >= 0") {
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // ten values 1.00..10.00 dollars: cents 100..1000 -> first digits
    // 1..9 once each, plus 1000 -> digit 1 again: o = [2,1,1,1,1,1,1,1,1]
    val e = ev((1 to 10).map(i => (i.toLong, i, 1L, "click", i * 1.0)): _*)
    val got = EventAnalytics.benfordAudit(e)
      .as[(String, Long, Double)].collect().toSeq
    val os = Array(2L, 1L, 1L, 1L, 1L, 1L, 1L, 1L, 1L)
    val n = 10L
    val chi = (1 to 9).map { d =>
      val pfx = math.floor(math.log(1.0 + 1.0 / d) / math.log(10.0) * 1024.0 + 0.5).toLong
      val diff = os(d - 1) * 1024 - n * pfx
      math.floor(diff.toDouble * diff / (n.toDouble * pfx * 1024.0) * 1048576.0 + 0.5).toLong
    }.sum
    assert(got == Seq(("click", 10L, r6(chi.toDouble / 1048576.0))))
    // fixture: chi2 finite and non-negative, partition-invariant
    val events = Tables.events(spark, TestSpark.sf0001)
    val fxr = EventAnalytics.benfordAudit(events)
      .as[(String, Long, Double)].collect().toSeq
    assert(fxr.nonEmpty && fxr.forall(r => r._3 >= 0.0 && !r._3.isNaN))
    assert(EventAnalytics.benfordAudit(events.repartition(7))
      .as[(String, Long, Double)].collect().toSeq == fxr)
  }

  test("dailyPercentileBands: nearest-rank selections exact on a crafted day") {
    // one day, one type, values 1..10 dollars -> cents 100..1000:
    // p50 = rank ceil(10/2)=5 -> 500; p90 = rank 9 -> 900; p99 = rank 10
    val e = ev((1 to 10).map(i => (i.toLong, i, 1L, "click", i * 1.0)): _*)
    val got = EventAnalytics.dailyPercentileBands(e)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("2024-01-01", "click", 10L, 500L, 900L, 1000L)))
    // fixture: bands ordered p50 <= p90 <= p99, partition-invariant
    val events = Tables.events(spark, TestSpark.sf0001)
    val fxr = EventAnalytics.dailyPercentileBands(events)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(fxr.nonEmpty && fxr.forall(r => r._4 <= r._5 && r._5 <= r._6))
    assert(EventAnalytics.dailyPercentileBands(events.repartition(7))
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq == fxr)
  }

  test("bootstrapCi: degenerate groups collapse to the mean; bounds ordered and deterministic") {
    // constant-value group: every resample sums identically -> CI = mean
    val const = ev((1 to 50).map(i => (i.toLong, i, 1L, "click", 7.00)): _*)
    val gc = EventAnalytics.bootstrapCi(const)
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(gc == Seq(("click", 50L, 700.0, 700.0, 700.0)))
    // mixed-value group: bounds bracket the replica spread, never escape
    // [min, max] of the values, and the result is partition-invariant
    val events = Tables.events(spark, TestSpark.sf0001)
    val fxr = EventAnalytics.bootstrapCi(events)
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(fxr.nonEmpty && fxr.forall(r => r._4 <= r._5))
    val bounds = events.groupBy("event_type")
      .agg(min(expr("round(value * 100)")).as("mn"),
        max(expr("round(value * 100)")).as("mx"))
      .as[(String, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(fxr.forall { r =>
      val (mn, mx) = bounds(r._1); r._4 >= mn && r._5 <= mx })
    assert(EventAnalytics.bootstrapCi(events.repartition(7))
      .as[(String, Long, Double, Double, Double)].collect().toSeq == fxr)
  }

  test("bootstrapCi: golden draw weights pin the engine/oracle scheme") {
    // Hand-computed (sha256 in Python) under the DOCUMENTED scheme:
    // dg = sha256('pb:{g}:0:{id}') || ':1:' || ':2:' (hex), replica r's
    // uniform u = int(dg[(r-1)*4 : (r-1)*4+4], 16), weight = inverse-CDF
    // Poisson(1) on 16-bit thresholds. One triple per weight bucket 0..7.
    // If this test breaks, the ORACLE SQL for q211_bootstrap_ci must be
    // rewritten in lockstep — the r13 regression was exactly this drift.
    val golden = Seq(
      ("click", -50L, 2, 20169L, 0L),
      ("click", -50L, 3, 41280L, 1L),
      ("click", -50L, 9, 49132L, 2L),
      ("click", -50L, 5, 64074L, 3L),
      ("click", -50L, 1, 64389L, 4L),
      ("click", -33L, 40, 65466L, 5L),
      ("click", 60L, 5, 65502L, 6L),
      ("view", -5L, 15, 65534L, 7L))
    val items = golden.map { case (g, id, _, _, _) => (g, id, 100L) }
      .distinct.toDF("g", "event_id", "cents")
    val draws = EventAnalytics.poissonDraws(items, 40)
      .select("g", "event_id", "r", "u", "w")
      .as[(String, Long, Int, Long, Long)].collect()
      .map(t => (t._1, t._2, t._3) -> ((t._4, t._5))).toMap
    golden.foreach { case (g, id, r, u, w) =>
      assert(draws((g, id, r)) == ((u, w)),
        s"draw ($g,$id,$r): got ${draws((g, id, r))}, want ($u,$w)")
    }
  }

  test("rfmSegments: crafted quartiles exact; non-purchase events ignored") {
    val day = 1440 // minutes
    val e = ev(
      (1, 1 * day, 1, "purchase", 10.00),
      (2, 2 * day, 2, "purchase", 20.00), (3, 3 * day, 2, "purchase", 30.00),
      (4, 4 * day, 3, "purchase", 1.00), (5, 4 * day, 3, "purchase", 1.00),
      (6, 4 * day, 3, "purchase", 1.00),
      (7, 10 * day, 4, "purchase", 100.00),
      (8, 10 * day, 1, "click", 99999.0)) // must not count
    val got = EventAnalytics.rfmSegments(e)
      .as[(Long, Long, Long, Long, Int, Int, Int, String)].collect().toSeq
    // anchor = day 10; recency 9/7/6/0, freq 1/2/3/1, cents 1000/5000/300/10000
    assert(got == Seq(
      (1L, 9L, 1L, 1000L, 1, 1, 2, "112"),
      (2L, 7L, 2L, 5000L, 2, 3, 3, "233"),
      (3L, 6L, 3L, 300L, 3, 4, 1, "341"),
      (4L, 0L, 1L, 10000L, 4, 2, 4, "424")))
    // fixture: quartile codes 1-4, segment = concatenation,
    // partition-invariant
    val events = Tables.events(spark, TestSpark.sf0001)
    val fxr = EventAnalytics.rfmSegments(events)
      .as[(Long, Long, Long, Long, Int, Int, Int, String)].collect().toSeq
    assert(fxr.nonEmpty && fxr.forall(r =>
      Seq(r._5, r._6, r._7).forall(q => q >= 1 && q <= 4) &&
        r._8 == s"${r._5}${r._6}${r._7}"))
    assert(EventAnalytics.rfmSegments(events.repartition(7))
      .as[(Long, Long, Long, Long, Int, Int, Int, String)].collect().toSeq == fxr)
  }

  test("madOutliers: hand-checked median/MAD/outlier rule; partition-invariant") {
    // type a cents [100,200,300,10000]: n=4, rank (4+1) DIV 2 = 2 ->
    // med=200; adev [100,0,100,9800] sorted [0,100,100,9800] rank 2 ->
    // mad=100; |adev| > 300 only for the planted 10000 -> 1 outlier
    val df = Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0), (4L, "a", 100.0),
      (5L, "b", 5.0), (6L, "b", 5.0), (7L, "b", 5.0))
      .toDF("event_id", "event_type", "value")
    val got = EventAnalytics.madOutliers(df)
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    // type b: med=500, mad=0 -> any nonzero deviation would be an
    // outlier; there are none
    assert(got == Seq(("a", 4L, 200L, 100L, 1L, 0.25),
      ("b", 3L, 500L, 0L, 0L, 0.0)))
    // fixture: fracs in [0,1], med/mad nonnegative, partition-invariant
    val events = Tables.events(spark, TestSpark.sf0001)
    val fxr = EventAnalytics.madOutliers(events)
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    assert(fxr.nonEmpty && fxr.forall(r =>
      r._6 >= 0 && r._6 <= 1 && r._4 >= 0))
    assert(EventAnalytics.madOutliers(events.repartition(7))
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq == fxr)
  }

  test("trimmedMean: hand-checked rank cuts; partition-invariant") {
    // cents 100..1000: n=10, cut = 10 DIV 10 = 1 -> keep ranks 2..9 =
    // values 200..900, mean 550
    val df = (1 to 10).map(i => (i.toLong, "a", i.toDouble))
      .toDF("event_id", "event_type", "value")
    val got = EventAnalytics.trimmedMean(df)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("a", 10L, 8L, 550.0)))
    val events = Tables.events(spark, TestSpark.sf0001)
    val fxr = EventAnalytics.trimmedMean(events)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(fxr.nonEmpty && fxr.forall(r => r._3 <= r._2 && r._4 > 0))
    assert(EventAnalytics.trimmedMean(events.repartition(7))
      .as[(String, Long, Long, Double)].collect().toSeq == fxr)
  }

  test("giniConcentration: hand-checked rank-moment form; zero-total NULL; partition-invariant") {
    // type a: user totals 100 and 300 cents ->
    // G = (2*(1*100 + 2*300) - 3*400) / (2*400) = 0.25
    // type b: all zero value -> no defined concentration (NULL)
    val df = Seq(
      (1L, "a", 1L, 1.0), (2L, "a", 2L, 3.0), (3L, "b", 3L, 0.0))
      .toDF("event_id", "event_type", "user_id", "value")
    val got = EventAnalytics.giniConcentration(df)
      .as[(String, Long, Long, Option[Double])].collect().toSeq
    assert(got == Seq(("a", 2L, 400L, Some(0.25)), ("b", 1L, 0L, None)))
    // fixture: gini in [0, 1), partition-invariant
    val events = Tables.events(spark, TestSpark.sf0001)
    val fxr = EventAnalytics.giniConcentration(events)
      .as[(String, Long, Long, Option[Double])].collect().toSeq
    assert(fxr.nonEmpty && fxr.forall(_._4.exists(g => g >= 0 && g < 1)))
    assert(EventAnalytics.giniConcentration(events.repartition(7))
      .as[(String, Long, Long, Option[Double])].collect().toSeq == fxr)
  }
}
