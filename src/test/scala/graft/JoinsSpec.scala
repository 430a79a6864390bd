package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Joins

class JoinsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedEquiJoin equals the plain join on pathologically skewed data") {
    // 10k rows, 95% share one hot key — the single-key skew AQE's
    // partition splitter cannot spread for a broadcast-ineligible side
    val big = spark.range(0, 10000)
      .selectExpr("id", "IF(id % 20 = 0, CAST(id % 7 AS STRING), 'HOT') AS k")
    val small = Seq(("HOT", "hotv"), ("1", "v1"), ("3", "v3"))
      .toDF("k", "v")
    val plain = big.join(small, Seq("k")).select($"id", $"v")
      .as[(Long, String)].collect().toSet
    val salted = Joins.saltedEquiJoin(big, small, "k", salt = 8)
      .select($"id", $"v").as[(Long, String)].collect().toSet
    assert(salted == plain)
    // left joins preserve unmatched rows too
    val plainLeft = big.join(small, Seq("k"), "left").select($"id", $"v")
      .as[(Long, Option[String])].collect().toSet
    val saltedLeft = Joins.saltedEquiJoin(big, small, "k", salt = 8, joinType = "left")
      .select($"id", $"v").as[(Long, Option[String])].collect().toSet
    assert(saltedLeft == plainLeft)
  }

  test("salting spreads the hot key across sub-keys") {
    val big = spark.range(0, 1000).selectExpr("id", "'HOT' AS k")
    val salted = big.withColumn("__salt",
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(8)))
    val counts = salted.groupBy("__salt").count().as[(Int, Long)].collect()
    assert(counts.length == 8) // every sub-key used
    assert(counts.map(_._2).max < 1000 * 0.3) // no sub-key dominates
  }

  test("pointInTimeJoin: facts see the state valid at their ts; pre-history facts null out") {
    def t(min: Int) = new java.sql.Timestamp(1704067200000L + min * 60000L)
    // SCD-2 runs for one user: A [0, 5), B [5, 10), A [10, null)
    val dim = Seq(
      (1L, "A", t(0)), (1L, "B", t(5)), (1L, "A", t(10)),
      (2L, "X", t(3)))
      .toDF("user_id", "state0", "valid_from")
    val facts = Seq(
      (1L, t(0), 100L),  // boundary: run starting AT ts is valid
      (1L, t(3), 101L),
      (1L, t(5), 102L),  // boundary: new run takes over at its start
      (1L, t(7), 103L),
      (1L, t(12), 104L),
      (2L, t(1), 200L),  // before user 2's first run -> null state
      (2L, t(4), 201L))
      .toDF("user_id", "ts", "event_id")
    val got = Joins.pointInTimeJoin(facts, dim,
        "user_id", "ts", "event_id", "valid_from", "state0")
      .select($"event_id", $"state").as[(Long, Option[String])]
      .collect().toMap
    assert(got == Map(100L -> Some("A"), 101L -> Some("A"), 102L -> Some("B"),
      103L -> Some("B"), 104L -> Some("A"), 200L -> None, 201L -> Some("X")))
    // interval-containment recompute on the fixture (the oracle's
    // formulation) agrees with the as-of machinery
    val ev = Tables.events(spark, TestSpark.sf0001).cache()
    val hist = graft.operators.EventAnalytics.stateHistory(ev)
    val sampled = ev.filter($"event_id" % 10 === 0)
      .select("user_id", "ts", "event_id")
    val viaAsof = Joins.pointInTimeJoin(sampled, hist,
        "user_id", "ts", "event_id", "valid_from", "event_type")
      .select($"event_id", $"state").as[(Long, String)].collect().toMap
    val viaContain = sampled.as("f").join(hist.as("h"),
        $"f.user_id" === $"h.user_id" && $"h.valid_from" <= $"f.ts" &&
          ($"h.valid_to".isNull || $"f.ts" < $"h.valid_to"))
      .select($"f.event_id", $"h.event_type").as[(Long, String)].collect().toMap
    assert(viaAsof == viaContain && viaAsof.nonEmpty)
    ev.unpersist()
  }

  test("pointInTimeJoin: same-ts state collisions — as-of and containment agree") {
    def t(min: Int) = new java.sql.Timestamp(1704067200000L + min * 60000L)
    // user 1 at t=0 has runs b{eid 1} and a{eid 2}: b's interval is [0,0) —
    // dropped by stateHistory, so "a" (max-eid0) is the state at t=0. Before
    // the zero-width-run removal the as-of side would have picked "b" (max
    // state string at the tied ts) while containment picked "a".
    val events = Seq(
      (1L, t(0), 1L, "b"), (2L, t(0), 1L, "a"), (3L, t(5), 1L, "b"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val hist = graft.operators.EventAnalytics.stateHistory(events)
    val facts = Seq((1L, t(0), 10L), (1L, t(3), 11L), (1L, t(7), 12L))
      .toDF("user_id", "ts", "event_id")
    val viaAsof = Joins.pointInTimeJoin(facts, hist,
        "user_id", "ts", "event_id", "valid_from", "event_type")
      .select($"event_id", $"state").as[(Long, String)].collect().toMap
    val viaContain = facts.as("f").join(hist.as("h"),
        $"f.user_id" === $"h.user_id" && $"h.valid_from" <= $"f.ts" &&
          ($"h.valid_to".isNull || $"f.ts" < $"h.valid_to"))
      .select($"f.event_id", $"h.event_type").as[(Long, String)].collect().toMap
    assert(viaAsof == Map(10L -> "a", 11L -> "a", 12L -> "b"))
    assert(viaAsof == viaContain)
  }

  test("asOfJoin matches a driver-side naive as-of on random data") {
    val rnd = new scala.util.Random(7)
    val left = (0 until 300).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val right = (0 until 200).map { i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, rnd.nextInt(100) * 1.0)
    }.groupBy(r => (r._1, r._2)) // unique per (key, ts): max value wins
      .map { case ((k, t), rs) => (k, t, rs.map(_._3).max) }.toSeq
    val l = left.toDF("k", "t", "id")
    val r = right.toDF("k", "t", "v")
    val got = Joins.asOfJoin(l, r, "k", "t", "id", "v")
      .select($"id", $"asof_ts", $"asof_value")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(x => x._1 -> ((x._2, x._3))).toMap
    for ((k, t, id) <- left) {
      val prior = right.filter(q => q._1 == k && q._2 <= t)
      val expect =
        if (prior.isEmpty) (None, None)
        else { val b = prior.maxBy(_._2); (Some(b._2), Some(b._3)) }
      assert(got(id) == expect, s"left row id=$id key=$k ts=$t")
    }
  }

  test("asOfJoin: null right values stay paired with their row; null keys never match") {
    // right rows: (k=1, ts=1, v=2.0), (k=1, ts=5, v=null) — the as-of at
    // ts=10 is the ts=5 ROW, whose value is null (not ts=5 paired with 2.0)
    val l = Seq((1L, 10L, 100L), (2L, 10L, 200L)).toDF("k", "t", "id")
    val r = Seq((Some(1L), 1L, Some(2.0)), (Some(1L), 5L, None),
        (None: Option[Long], 3L, Some(9.0))) // null key: must match nothing
      .toDF("k", "t", "v")
    val lNullKey = Seq((Option.empty[Long], 10L, 300L)).toDF("k", "t", "id")
    val got = Joins.asOfJoin(l.unionByName(lNullKey), r, "k", "t", "id", "v")
      .select($"id", $"asof_ts", $"asof_value")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(x => x._1 -> ((x._2, x._3))).toMap
    assert(got(100L) == ((Some(5L), None)), "latest prior ROW wins, value null")
    assert(got(200L) == ((None, None)), "no right rows for key 2")
    assert(got(300L) == ((None, None)), "null left key matches no right row")
  }

  test("asOfJoin plan: one hash exchange, no join operator") {
    val l = spark.range(100).selectExpr("id % 5 AS k", "id AS t", "id")
    val r = spark.range(50).selectExpr("id % 5 AS k", "id * 2 AS t", "id * 1.0 AS v")
    val p = Joins.asOfJoin(l, r, "k", "t", "id", "v")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Join"), s"as-of should be a window scan, not a join:\n$p")
  }

  test("intervalSelfJoin matches the naive quadratic range join") {
    val rnd = new scala.util.Random(11)
    val ev = (0 until 400).map(i =>
      (rnd.nextInt(4).toLong, new java.sql.Timestamp(1700000000000L + rnd.nextInt(7200) * 1000L), i.toLong))
    val df = ev.toDF("u", "ts", "eid")
    val got = Joins.intervalSelfJoin(df, "u", "ts", "eid", 300)
      .select($"id_a", $"id_b", $"gap_us").as[(Long, Long, Long)].collect().toSet
    val naive = (for {
      (ua, ta, ia) <- ev; (ub, tb, ib) <- ev
      if ua == ub
      gap = (tb.getTime - ta.getTime) * 1000L
      if gap >= 0 && gap < 300000000L && (gap > 0 || ib > ia)
    } yield (ia, ib, gap)).toSet
    assert(got == naive)
    assert(naive.nonEmpty, "fixture should generate in-window pairs")
  }

  test("intervalSelfJoin plan: banded equi-joins only, no cartesian/range join") {
    val df = spark.range(1000).selectExpr("id % 7 AS u",
      "timestamp_micros(cast(id * 1e7 AS long)) AS ts", "id AS eid")
    val p = Joins.intervalSelfJoin(df, "u", "ts", "eid", 300)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("bucketedRevenueJoin equals the plain unbucketed join") {
    val dir = TestSpark.sf0001
    val got = Joins.bucketedRevenueJoin(
        Tables.orders(spark, dir), Tables.lineitem(spark, dir))
      .orderBy("o_orderpriority", "l_returnflag")
      .collect().map(_.toSeq)
    val want = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      .groupBy("o_orderpriority", "l_returnflag")
      .agg(
        org.apache.spark.sql.functions.expr(
          "sum(cast(round(l_extendedprice * 100) AS BIGINT) * " +
            "(100 - cast(round(l_discount * 100) AS BIGINT)))").as("revenue_e4"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_items"))
      .orderBy("o_orderpriority", "l_returnflag")
      .collect().map(_.toSeq)
    assert(got.toSeq === want.toSeq)
  }

  test("largeVolumeCustomers: matches a driver-side naive recompute on the fixture") {
    import spark.implicits._
    val dir = TestSpark.sf0001
    val (cust, ords, li) = (Tables.customer(spark, dir),
      Tables.orders(spark, dir), Tables.lineitem(spark, dir))
    val minQty = 150L // sf0.001 is small; a lower bar keeps the result non-trivial
    val got = graft.operators.Joins
      .largeVolumeCustomers(cust, ords, li, minQty, 20)
      .as[(String, Long, Long, java.sql.Timestamp, Long, Long)].collect().toSeq
    val qty = li.select($"l_orderkey", $"l_quantity".cast("long"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .filter(_._2 > minQty).toMap
    val custName = cust.select($"c_custkey", $"c_name").as[(Long, String)]
      .collect().toMap
    val want = ords
      .select($"o_orderkey", $"o_custkey", $"o_orderdate",
        expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .as[(Long, Long, java.sql.Timestamp, Long)].collect()
      .filter(o => qty.contains(o._1))
      .map(o => (custName(o._2), o._2, o._1, o._3, o._4, qty(o._1)))
      .sortBy(r => (-r._5, r._3)).take(20).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("smallQuantityRevenue: crafted parts match the naive correlated form; fixture partition-invariant") {
    import spark.implicits._
    // part 1 (BrandX): quantities 10,10,10,2 -> avg 8, 20% = 1.6 -> none kept
    // part 2 (BrandX): quantities 50,1,1 -> avg 17.33, 20% = 3.466 -> two 1s kept
    // part 3 (BrandY): excluded brand
    val part = Seq((1L, "BrandX"), (2L, "BrandX"), (3L, "BrandY"))
      .toDF("p_partkey", "p_brand")
    val li = Seq(
      (1L, 10.0, 11.00), (1L, 10.0, 12.00), (1L, 10.0, 13.00), (1L, 2.0, 14.00),
      (2L, 50.0, 20.00), (2L, 1.0, 3.50), (2L, 1.0, 4.50),
      (3L, 1.0, 99.00))
      .toDF("l_partkey", "l_quantity", "l_extendedprice")
    val got = graft.operators.Joins.smallQuantityRevenue(li, part, Seq("BrandX"))
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("BrandX", 800L, 2L, math.rint(800.0 / 7.0) / 100.0)))
    val dir = TestSpark.sf0001
    val fxr = graft.operators.Joins.smallQuantityRevenue(
        Tables.lineitem(spark, dir), Tables.part(spark, dir))
      .as[(String, Long, Long, Double)].collect().toSet
    assert(graft.operators.Joins.smallQuantityRevenue(
        Tables.lineitem(spark, dir).repartition(7), Tables.part(spark, dir))
      .as[(String, Long, Long, Double)].collect().toSet == fxr)
  }

  test("customerOrderDistribution: matches a driver-side outer-join histogram") {
    val dir = TestSpark.sf0001
    val cust = Tables.customer(spark, dir)
    val ords = Tables.orders(spark, dir)
    val got = Joins.customerOrderDistribution(cust, ords)
      .as[(Long, Long)].collect().toSeq
    val perCust = ords.filter($"o_orderpriority" =!= "4-NOT SPECIFIED")
      .select("o_custkey").as[Long].collect()
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val want = cust.select("c_custkey").as[Long].collect()
      .map(c => perCust.getOrElse(c, 0L))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (c, d) => (-d, -c) }
    assert(got == want)
    // the outer join preserves zero-order customers (the bucket the spec's
    // LEFT JOIN exists for) — the fixture has some
    assert(got.exists(_._1 == 0L) == want.exists(_._1 == 0L))
  }

  test("promoRevenueShare: months match a driver-side recompute, shares in [0,100]") {
    val dir = TestSpark.sf0001
    val li = Tables.lineitem(spark, dir)
    val part = Tables.part(spark, dir)
    val got = Joins.promoRevenueShare(li, part)
      .as[(String, Long, Long, Double)].collect().toSeq
    val types = part.select("p_partkey", "p_type").as[(Long, String)].collect().toMap
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = li.select(date_format($"l_shipdate", "yyyy-MM"), $"l_partkey",
        $"l_extendedprice", $"l_discount")
      .as[(String, Long, Double, Double)].collect()
      .groupBy(_._1).view.mapValues { rs =>
        val e4s = rs.map { case (_, pk, ep, d) =>
          val e4 = math.round(ep * 100) * (100 - math.round(d * 100))
          (if (types(pk) == "PROMO") e4 else 0L, e4)
        }
        (e4s.map(_._1).sum, e4s.map(_._2).sum)
      }.toSeq
      .map { case (m, (p, t)) => (m, p, t, r6(100.0 * p.toDouble / t.toDouble)) }
      .sortBy(_._1)
    assert(got == want)
    assert(got.forall(r => r._4 >= 0.0 && r._4 <= 100.0))
  }

  test("inactiveRichCustomers: matches a driver-side brute force") {
    val dir = TestSpark.sf0001
    val segs = Seq("BUILDING", "MACHINERY", "HOUSEHOLD")
    val cust = Tables.customer(spark, dir)
    val ords = Tables.orders(spark, dir)
    val got = Joins.inactiveRichCustomers(cust, ords)
      .as[(String, Long, Long)].collect().toSet
    val hasOrders = ords
      .filter($"o_orderdate" >= lit("2000-01-01").cast("timestamp"))
      .select("o_custkey").as[Long].collect().toSet
    val cs = cust.select("c_custkey", "c_mktsegment", "c_acctbal")
      .as[(Long, String, Double)].collect()
      .filter(c => segs.contains(c._2))
      .map { case (k, s, b) => (k, s, math.round(b * 100)) }
    val pos = cs.filter(_._3 > 0)
    val (posSum, posN) = (pos.map(_._3).sum, pos.length.toLong)
    val want = cs.filter(c => c._3 * posN > posSum && !hasOrders.contains(c._1))
      .groupBy(_._2).view
      .mapValues(rs => (rs.length.toLong, rs.map(_._3).sum)).toSeq
      .map { case (s, (n, t)) => (s, n, t) }.toSet
    assert(got == want && got.nonEmpty)
  }

  test("returnedItemRevenue: matches a driver-side brute force incl. tie order") {
    val dir = TestSpark.sf0001
    val cust = Tables.customer(spark, dir)
    val ords = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val got = Joins.returnedItemRevenue(cust, ords, li, k = 10)
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    val liAgg = li.filter($"l_returnflag" === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .as[(Long, Double, Double)].collect()
      .groupBy(_._1).view.mapValues { rs =>
        (rs.map(r => math.round(r._2 * 100) * (100 - math.round(r._3 * 100))).sum,
          rs.length.toLong)
      }.toMap
    val lo = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1996-04-01 00:00:00")
    val perCust = ords.select("o_orderkey", "o_custkey", "o_orderdate")
      .as[(Long, Long, java.sql.Timestamp)].collect()
      .filter(o => !o._3.before(lo) && o._3.before(hi))
      .flatMap(o => liAgg.get(o._1).map(a => (o._2, a._1, a._2)))
      .groupBy(_._1).view
      .mapValues(rs => (rs.map(_._2).sum, rs.map(_._3).sum)).toMap
    val names = cust.select("c_custkey", "c_name", "c_acctbal")
      .as[(Long, String, Double)].collect()
      .map { case (k, n, b) => k -> ((n, math.round(b * 100))) }.toMap
    val want = perCust.toSeq
      .map { case (c, (rev, n)) => (c, names(c)._1, names(c)._2, rev, n) }
      .sortBy { case (c, _, _, rev, _) => (-rev, c) }.take(10)
    assert(got == want && got.nonEmpty)
  }

  test("disjunctivePromoRevenue: matches a driver-side OR-of-ANDs scan") {
    val dir = TestSpark.sf0001
    val li = Tables.lineitem(spark, dir)
    val part = Tables.part(spark, dir)
    val got = Joins.disjunctivePromoRevenue(li, part)
      .as[(String, Long, Long)].collect().toSeq
    val pinfo = part.select("p_partkey", "p_brand", "p_size")
      .as[(Long, String, Int)].collect().map(p => p._1 -> ((p._2, p._3))).toMap
    val clauses = Seq(("Brand#1", 1, 10, 1L, 20L), ("Brand#2", 5, 20, 10L, 40L),
      ("Brand#3", 20, 40, 20L, 50L))
    val want = li.select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .as[(Long, Double, Double, Double)].collect()
      .flatMap { case (pk, qd, ep, d) =>
        val (brand, size) = pinfo(pk)
        val q = qd.toLong
        val hit = clauses.exists { case (b, sLo, sHi, qLo, qHi) =>
          brand == b && size >= sLo && size <= sHi && q >= qLo && q <= qHi }
        if (hit) Some((brand, math.round(ep * 100) * (100 - math.round(d * 100))))
        else None
      }
      .groupBy(_._1).view.mapValues(rs => (rs.map(_._2).sum, rs.length.toLong))
      .toSeq.map { case (b, (rev, n)) => (b, rev, n) }.sortBy(_._1)
    assert(got == want && got.nonEmpty)
  }

  test("volumeShipping: matches a driver-side recompute; pairs are cross-nation") {
    val dir = TestSpark.sf0001
    val got = Joins.volumeShipping(
        Tables.lineitem(spark, dir), Tables.orders(spark, dir),
        Tables.customer(spark, dir), Tables.supplier(spark, dir),
        Tables.nation(spark, dir), nationA = "NATION_12", nationB = "NATION_10")
      .as[(String, String, Int, Long, Long)].collect().toSeq
    val nat = Tables.nation(spark, dir)
      .filter($"n_name".isin("NATION_12", "NATION_10"))
      .select("n_nationkey", "n_name").as[(Int, String)].collect().toMap
    val sup = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
      .as[(Long, Int)].collect().flatMap(s => nat.get(s._2).map(s._1 -> _)).toMap
    val cus = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
      .as[(Long, Int)].collect().flatMap(c => nat.get(c._2).map(c._1 -> _)).toMap
    val ordNat = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
      .as[(Long, Long)].collect().flatMap(o => cus.get(o._2).map(o._1 -> _)).toMap
    val cal = java.util.Calendar.getInstance(
      java.util.TimeZone.getTimeZone("UTC"))
    val want = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
      .as[(Long, Long, java.sql.Timestamp, Double, Double)].collect()
      .flatMap { case (ok, sk, sd, ep, d) =>
        cal.setTime(sd)
        val yr = cal.get(java.util.Calendar.YEAR)
        for {
          sn <- sup.get(sk); cn <- ordNat.get(ok)
          if yr >= 1996 && yr <= 1997 && sn != cn
        } yield ((sn, cn, yr), math.round(ep * 100) * (100 - math.round(d * 100)))
      }
      .groupBy(_._1).view.mapValues(rs => (rs.map(_._2).sum, rs.length.toLong))
      .toSeq.map { case ((sn, cn, y), (rev, n)) => (sn, cn, y, rev, n) }
      .sortBy(r => (r._1, r._2, r._3))
    assert(got == want && got.nonEmpty)
    assert(got.forall(r => r._1 != r._2))
  }

  test("topRevenueSupplier: every returned supplier hits the brute-force max") {
    val dir = TestSpark.sf0001
    val li = Tables.lineitem(spark, dir)
    val got = Joins.topRevenueSupplier(li, Tables.supplier(spark, dir))
      .as[(Long, String, Long, Long)].collect().toSeq
    val lo = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1996-04-01 00:00:00")
    val perSupp = li.select("l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
      .as[(Long, java.sql.Timestamp, Double, Double)].collect()
      .filter(r => !r._2.before(lo) && r._2.before(hi))
      .groupBy(_._1).view.mapValues { rs =>
        (rs.map(r => math.round(r._3 * 100) * (100 - math.round(r._4 * 100))).sum,
          rs.length.toLong)
      }.toMap
    val mx = perSupp.values.map(_._1).max
    val want = perSupp.filter(_._2._1 == mx).keys.toSeq.sorted
    assert(got.map(_._1) == want && got.nonEmpty)
    assert(got.forall(r => r._3 == mx && perSupp(r._1)._2 == r._4))
  }

  test("latePriorityCounts: matches brute force; multi-late orders count once") {
    val dir = TestSpark.sf0001
    val got = Joins.latePriorityCounts(
        Tables.orders(spark, dir), Tables.lineitem(spark, dir))
      .as[(String, Long)].collect().toSeq
    val lo = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1996-07-01 00:00:00")
    val dayMs = 86400000L
    val shipsByOrder = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_shipdate")
      .as[(Long, java.sql.Timestamp)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    def dayOf(t: java.sql.Timestamp) = t.getTime / dayMs // fixture ts are UTC-midnight-aligned
    val want = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
      .as[(Long, java.sql.Timestamp, String)].collect()
      .filter(o => !o._2.before(lo) && o._2.before(hi))
      .filter(o => shipsByOrder.getOrElse(o._1, Seq.empty[java.sql.Timestamp])
        .exists(s => dayOf(s) - dayOf(o._2) > 90))
      .groupBy(_._3).view.mapValues(_.length.toLong).toSeq.sortBy(_._1)
    assert(got == want && got.nonEmpty)
  }

  test("shipLatencyBands: shares sum to 1 per priority; bands match brute force") {
    val dir = TestSpark.sf0001
    val got = Joins.shipLatencyBands(
        Tables.orders(spark, dir), Tables.lineitem(spark, dir))
      .as[(String, String, Long, Long, Double)].collect().toSeq
    val dayMs = 86400000L
    val ords = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
      .as[(Long, java.sql.Timestamp, String)].collect()
      .map(o => o._1 -> ((o._2.getTime / dayMs, o._3))).toMap
    val want = Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate")
      .as[(Long, java.sql.Timestamp)].collect()
      .map { case (ok, sd) =>
        val (od, prio) = ords(ok)
        val lat = sd.getTime / dayMs - od
        val band = if (lat <= 30) "00-30" else if (lat <= 60) "31-60"
          else if (lat <= 90) "61-90" else "90+"
        (prio, band)
      }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got.map(r => (r._1, r._2) -> r._3).toMap == want)
    // per-priority: totals agree and shares sum to ~1
    got.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.forall(_._4 == rs.map(_._3).sum))
      assert(math.abs(rs.map(_._5).sum - 1.0) < 1e-5)
    }
  }

  test("soleBlockerSuppliers: matches a driver-side EXISTS/NOT-EXISTS recompute") {
    val dir = TestSpark.sf0001
    val got = Joins.soleBlockerSuppliers(
        Tables.orders(spark, dir), Tables.lineitem(spark, dir),
        Tables.supplier(spark, dir), k = 10)
      .as[(Long, String, Long)].collect().toSeq
    val dayMs = 86400000L
    val orderDate = Tables.orders(spark, dir).select("o_orderkey", "o_orderdate")
      .as[(Long, java.sql.Timestamp)].collect()
      .map(o => o._1 -> o._2.getTime / dayMs).toMap
    val names = Tables.supplier(spark, dir).select("s_suppkey", "s_name")
      .as[(Long, String)].collect().toMap
    val byOrder = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .as[(Long, Long, java.sql.Timestamp)].collect()
      .groupBy(_._1)
    val waits = byOrder.toSeq.flatMap { case (ok, ls) =>
      val supps = ls.map(_._2).distinct
      val late = ls.filter(l => l._3.getTime / dayMs - orderDate(ok) > 90)
        .map(_._2).distinct
      if (late.length == 1 && supps.length > 1) Some(late.head) else None
    }
    val want = waits.groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .map { case (s, n) => (s, names(s), n) }
      .sortBy { case (s, _, n) => (-n, s) }.take(10)
    assert(got == want && got.nonEmpty)
  }

  test("forecastRevenueChange: matches a driver-side filtered scan") {
    val dir = TestSpark.sf0001
    val got = Joins.forecastRevenueChange(Tables.lineitem(spark, dir))
      .as[(Option[Long], Long)].collect().toSeq
    val lo = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1997-01-01 00:00:00")
    val rows = Tables.lineitem(spark, dir)
      .select("l_shipdate", "l_extendedprice", "l_discount", "l_quantity")
      .as[(java.sql.Timestamp, Double, Double, Double)].collect()
      .filter { case (sd, _, disc, q) =>
        !sd.before(lo) && sd.before(hi) &&
          (5L to 7L).contains(math.round(disc * 100)) && q.toLong < 24L
      }
    val want = rows.map(r => math.round(r._2 * 100) * math.round(r._3 * 100)).sum
    assert(got == Seq((Some(want), rows.length.toLong)) && rows.nonEmpty)
  }

  test("nationMarketShare: matches a driver-side recompute; share in [0,1]") {
    val dir = TestSpark.sf0001
    val got = Joins.nationMarketShare(
        Tables.lineitem(spark, dir), Tables.orders(spark, dir),
        Tables.customer(spark, dir), Tables.supplier(spark, dir),
        Tables.nation(spark, dir), Tables.region(spark, dir),
        Tables.part(spark, dir))
      .as[(Int, Long, Long, Long, Double)].collect().toSeq
    val natRegion = Tables.nation(spark, dir).select("n_nationkey", "n_regionkey")
      .as[(Long, Long)].collect().toMap
    val asiaKey = Tables.region(spark, dir).select("r_regionkey", "r_name")
      .as[(Long, String)].collect().find(_._2 == "ASIA").get._1
    val custs = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
      .as[(Long, Long)].collect()
      .filter(c => natRegion(c._2) == asiaKey).map(_._1).toSet
    val promo = Tables.part(spark, dir).select("p_partkey", "p_type")
      .as[(Long, String)].collect().filter(_._2 == "PROMO").map(_._1).toSet
    val targetSupp = {
      val natKey = Tables.nation(spark, dir).select("n_name", "n_nationkey")
        .as[(String, Long)].collect().find(_._1 == "NATION_2").get._2
      Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
        .as[(Long, Long)].collect().filter(_._2 == natKey).map(_._1).toSet
    }
    val ordYear = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_orderdate")
      .as[(Long, Long, java.sql.Timestamp)].collect()
      .filter(o => custs.contains(o._2))
      .map(o => o._1 -> o._3.toLocalDateTime.getYear).toMap
    val cells = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .as[(Long, Long, Long, Double, Double)].collect()
      .filter(l => promo.contains(l._2) && ordYear.contains(l._1))
      .map { l =>
        val rev = math.round(l._4 * 100) * (100 - math.round(l._5 * 100))
        (ordYear(l._1), if (targetSupp.contains(l._3)) rev else 0L, rev)
      }
    val want = cells.groupBy(_._1).view.mapValues { rs =>
      (rs.map(_._2).sum, rs.map(_._3).sum, rs.length.toLong)
    }.toSeq.sortBy(_._1)
      .map { case (y, (n8, t, c)) => (y, n8, t, c) }
    assert(got.map(r => (r._1, r._2, r._3, r._4)) == want && got.nonEmpty)
    got.foreach { r =>
      assert(r._5 >= 0.0 && r._5 <= 1.0)
      assert(math.abs(r._5 - r._2.toDouble / r._3) < 1e-5)
    }
  }

  test("topValueParts: exact threshold semantics vs a driver-side recompute") {
    val dir = TestSpark.sf0001
    val got = Joins.topValueParts(Tables.lineitem(spark, dir))
      .as[(Long, Long, Long, Double)].collect().toSeq
    val perPart = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_extendedprice", "l_discount")
      .as[(Long, Double, Double)].collect()
      .groupBy(_._1).view.mapValues { rs =>
        (rs.map(r => math.round(r._2 * 100) * (100 - math.round(r._3 * 100))).sum,
          rs.length.toLong)
      }.toMap
    val total = perPart.values.map(_._1).sum
    val nParts = perPart.size.toLong
    val want = perPart
      .filter { case (_, (v, _)) => v * nParts * 4L > total * 5L }
      .toSeq.map { case (p, (v, n)) => (p, v, n) }
      .sortBy { case (p, v, _) => (-v, p) }
    assert(got.map(r => (r._1, r._2, r._3)) == want && got.nonEmpty)
    // kept parts are a strict subset — the threshold actually bites
    assert(got.length < perPart.size)
  }

  test("productTypeProfit: matches a driver-side recompute of the profit arithmetic") {
    val dir = TestSpark.sf0001
    val got = Joins.productTypeProfit(
        Tables.lineitem(spark, dir), Tables.orders(spark, dir),
        Tables.supplier(spark, dir), Tables.nation(spark, dir),
        Tables.part(spark, dir))
      .as[(String, Int, Long, Long)].collect().toSeq
    val natName = Tables.nation(spark, dir).select("n_nationkey", "n_name")
      .as[(Long, String)].collect().toMap
    val supNat = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
      .as[(Long, Long)].collect().map(s => s._1 -> natName(s._2)).toMap
    val rodCost = Tables.part(spark, dir)
      .select("p_partkey", "p_name", "p_retailprice")
      .as[(Long, String, Double)].collect()
      .filter(_._2.contains("rod"))
      .map(p => p._1 -> math.round(p._3 * 100)).toMap
    val ordYear = Tables.orders(spark, dir).select("o_orderkey", "o_orderdate")
      .as[(Long, java.sql.Timestamp)].collect()
      .map(o => o._1 -> o._2.toLocalDateTime.getYear).toMap
    val want = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount")
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .filter(l => rodCost.contains(l._2))
      .map { l =>
        val profit = math.round(l._5 * 100) * (100 - math.round(l._6 * 100)) -
          rodCost(l._2) * l._4.toLong * 100
        ((supNat(l._3), ordYear(l._1)), profit)
      }
      .groupBy(_._1).view.mapValues(rs => (rs.map(_._2).sum, rs.length.toLong))
      .toSeq.map { case ((n, y), (p, c)) => (n, y, p, c) }
      .sortBy(r => (r._1, r._2))
    assert(got == want && got.nonEmpty)
  }

  test("supplierVariety: distinct counts and exclusions match brute force") {
    val dir = TestSpark.sf0001
    val got = Joins.supplierVariety(Tables.lineitem(spark, dir),
        Tables.part(spark, dir), Tables.supplier(spark, dir))
      .as[(String, String, Int, Long)].collect().toSeq
    val dims = Tables.part(spark, dir)
      .select("p_partkey", "p_brand", "p_type", "p_size")
      .as[(Long, String, String, Int)].collect()
      .filter(p => p._2 != "Brand#1" && !Set(3, 14, 23, 45).contains(p._4))
      .map(p => p._1 -> ((p._2, p._3, p._4))).toMap
    val bad = Tables.supplier(spark, dir).select("s_suppkey", "s_acctbal")
      .as[(Long, Double)].collect().filter(_._2 < 1000.0).map(_._1).toSet
    assert(bad.nonEmpty) // the anti-join arm is actually exercised
    val want = Tables.lineitem(spark, dir).select("l_partkey", "l_suppkey")
      .as[(Long, Long)].collect()
      .filter(l => dims.contains(l._1) && !bad.contains(l._2))
      .groupBy(l => dims(l._1)).view
      .mapValues(_.map(_._2).distinct.length.toLong).toSeq
      .map { case ((b, t, s), n) => (b, t, s, n) }
      .sortBy { case (b, t, s, n) => (-n, b, t, s) }
    assert(got == want && got.nonEmpty)
  }

  test("shipmodePriorityCounts: CASE-WHEN split matches brute force; partitions the year's lines") {
    val dir = TestSpark.sf0001
    val got = Joins.shipmodePriorityCounts(
        Tables.orders(spark, dir), Tables.lineitem(spark, dir))
      .as[(String, Long, Long)].collect().toSeq
    val prio = Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority")
      .as[(Long, String)].collect().toMap
    val li = Tables.lineitem(spark, dir)
      .selectExpr("l_orderkey", "l_returnflag", "year(l_shipdate)")
      .as[(Long, String, Int)].collect().filter(_._3 == 1996)
    val want = li.groupBy(_._2).view.mapValues { rs =>
      val high = rs.count(r => Set("1-URGENT", "2-HIGH")(prio(r._1)))
      (high.toLong, (rs.length - high).toLong)
    }.toSeq.map { case (f, (h, l)) => (f, h, l) }.sortBy(_._1)
    assert(got == want && got.nonEmpty)
    // the two counts partition each category's lines — nothing dropped
    assert(got.map(r => r._2 + r._3).sum == li.length)
  }

  test("minCostSupplier: per-part minimum and region filter match brute force") {
    val dir = TestSpark.sf0001
    val got = Joins.minCostSupplier(
        Tables.lineitem(spark, dir), Tables.part(spark, dir),
        Tables.supplier(spark, dir), Tables.nation(spark, dir),
        Tables.region(spark, dir))
      .as[(Double, String, String, Long, String, Long)].collect().toSeq
    val natOfReg = Tables.nation(spark, dir)
      .join(Tables.region(spark, dir).filter($"r_name" === "ASIA"),
        $"n_regionkey" === $"r_regionkey")
      .select("n_nationkey", "n_name").as[(Long, String)].collect().toMap
    val sup = Tables.supplier(spark, dir)
      .as[(Long, String, Long, Double)].collect()
      .filter(s => natOfReg.contains(s._3))
      .map(s => s._1 -> ((s._2, s._4, natOfReg(s._3)))).toMap
    val brandOf = Tables.part(spark, dir)
      .filter($"p_type" === "STANDARD" && $"p_size" <= 15)
      .select("p_partkey", "p_brand").as[(Long, String)].collect().toMap
    val cost = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey", "l_extendedprice")
      .as[(Long, Long, Double)].collect()
      .filter(r => brandOf.contains(r._1) && sup.contains(r._2))
      .groupBy(r => (r._1, r._2)).view
      .mapValues(_.map(r => math.round(r._3 * 100)).sum).toMap
    val minPerPart = cost.groupBy(_._1._1).view.mapValues(_.values.min).toMap
    val want = cost.toSeq
      .filter { case ((pk, _), c) => c == minPerPart(pk) }
      .map { case ((pk, sk), c) =>
        val (name, bal, nat) = sup(sk)
        (bal, name, nat, pk, brandOf(pk), c)
      }
      .sortBy { case (bal, name, nat, pk, _, _) => (-bal, nat, name, pk) }
      .take(100)
    assert(got == want && got.nonEmpty)
    // every returned row carries its part's true minimum cost
    assert(got.forall { case (_, _, _, pk, _, c) => c == minPerPart(pk) })
  }

  test("excessShippers: mean-relative threshold and region filter match brute force") {
    val dir = TestSpark.sf0001
    val got = Joins.excessShippers(
        Tables.lineitem(spark, dir), Tables.part(spark, dir),
        Tables.supplier(spark, dir), Tables.nation(spark, dir),
        Tables.region(spark, dir))
      .as[(Long, String, String, Long)].collect().toSeq
    val pp = Tables.part(spark, dir).filter($"p_name".like("small%"))
      .select("p_partkey").as[Long].collect().toSet
    val qty = Tables.lineitem(spark, dir)
      .selectExpr("l_partkey", "l_suppkey", "CAST(l_quantity AS BIGINT)",
        "year(l_shipdate)")
      .as[(Long, Long, Long, Int)].collect()
      .filter(r => r._4 == 1995 && pp.contains(r._1))
      .groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val (tot, n) = (qty.values.sum, qty.size.toLong)
    val natOfReg = Tables.nation(spark, dir)
      .join(Tables.region(spark, dir).filter($"r_name" === "ASIA"),
        $"n_regionkey" === $"r_regionkey")
      .select("n_nationkey", "n_name").as[(Long, String)].collect().toMap
    val want = Tables.supplier(spark, dir)
      .as[(Long, String, Long, Double)].collect().toSeq
      .filter(s => natOfReg.contains(s._3) && qty.contains(s._1) &&
        qty(s._1) * n * 5L > tot * 4L)
      .map(s => (s._1, s._2, natOfReg(s._3), qty(s._1)))
      .sortBy(_._2)
    assert(got == want && got.nonEmpty)
    // the mean-relative cut bites globally: not every shipper qualifies
    assert(qty.count { case (_, q) => q * n * 5L > tot * 4L } < qty.size)
  }
}
