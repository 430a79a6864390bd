package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-handling join utilities for the 100 TB regime.
  *
  * Spark's AQE skew-join split handles most skew at runtime (enabled by
  * default), but it only fires for sort-merge joins and only splits
  * oversized PARTITIONS. When one join key value alone is pathological
  * (a null-ish sentinel, an empty-text hash, a "unknown" source shared by
  * a large slice of the corpus), pre-salting is the deterministic fix:
  * spread the hot key's rows over `salt` sub-keys and replicate the small
  * side once per sub-key. The join result is exactly that of the unsalted
  * join — the salt only changes the key's hash distribution.
  */
object Joins {

  /** Equi-join `big` with `small` on `key`, salted: `big` rows get a
    * deterministic salt from a content hash (spreads any single hot key
    * over `salt` partitions), `small` rows replicate `salt` times. Use when
    * a specific key value dominates; cost = small side x salt. */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
                     salt: Int = 16, joinType: String = "inner",
                     bigSaltExpr: Option[Column] = None): DataFrame = {
    require(salt > 0, s"salt must be positive: $salt")
    // right/full outer would emit each unmatched SMALL row once per salt
    // replica — only big-side-preserving join types keep exact parity
    val allowed = Set("inner", "cross", "left", "leftouter", "left_outer",
      "leftsemi", "left_semi", "semi", "leftanti", "left_anti", "anti")
    require(allowed.contains(
      joinType.toLowerCase(java.util.Locale.ROOT).replace(" ", "")),
      s"saltedEquiJoin supports big-side-preserving join types only, got $joinType")
    // deterministic per-row salt: hash of the whole row unless given
    val saltCol = bigSaltExpr.getOrElse(
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(salt)))
    val b = big.withColumn("__salt", saltCol)
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    // pinned SHUFFLE_HASH: salting exists for the case where the small
    // side does NOT fit a broadcast (a broadcast join has no shuffle and
    // therefore no skew to treat) — letting the planner broadcast the
    // salt-exploded side at test SF would both hide the operator under
    // test and ship an SF-proportional frame through the driver at scale
    b.join(s.hint("SHUFFLE_HASH"), Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Distributed as-of join (the trades-to-quotes / event-to-latest-state
    * operator Spark has no built-in for): for every `left` row, attach the
    * `right` row with the greatest `right.ts <= left.ts` for the same `key`
    * (left-join semantics — no prior right row yields nulls).
    *
    * Not a join at all physically: both sides union into one stream tagged
    * 0 (right) / 1 (left), ONE exchange clusters it by `key`, one
    * partition-local sort orders it by (ts, tag), and a running
    * `last(value, ignoreNulls)` over the unbounded-preceding frame carries
    * the latest right value forward onto each left row. Cost = one shuffle
    * + sort of |L|+|R| — the MPP-standard as-of shape; a per-row range join
    * would be quadratic per key, and a naive `max(ts) <= ts` subquery is a
    * shuffle per probe. Ties: a right row AT the left ts matches (tag 0
    * sorts first); `right` must be unique per (key, ts) — pre-aggregate it
    * (the extra `valueCol` in the sort makes even that case deterministic
    * in-engine: max value wins).
    *
    * `left` needs (key, ts, idCol); output = (key, idCol, ts, asof_ts,
    * asof_value), types preserved. */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               idCol: String, valueCol: String): DataFrame = {
    val valueType = right.schema(valueCol).dataType
    val idType = left.schema(idCol).dataType
    // equi-join semantics: a NULL key never matches, so null-key right rows
    // are dropped (null-key left rows then see no right rows -> nulls out)
    val lU = left.select(col(key), col(ts).as("__ts"), lit(1).as("__tag"),
      col(idCol).as("__id"), lit(null).cast(valueType).as("__rv"))
    val rU = right.filter(col(key).isNotNull)
      .select(col(key), col(ts).as("__ts"), lit(0).as("__tag"),
        lit(null).cast(idType).as("__id"), col(valueCol).as("__rv"))
    val w = Window.partitionBy(key)
      .orderBy(col("__ts").asc, col("__tag").asc, col("__rv").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry the latest right ROW as one struct (non-null whenever the row is
    // a right row, even if its value is null) — pairing ts and value from
    // different right rows, as separate last(ignoreNulls) columns would when
    // a right value is null, is not as-of semantics
    lU.unionByName(rU)
      .withColumn("__asof",
        last(when(col("__tag") === 0,
          struct(col("__ts").as("ts"), col("__rv").as("value"))),
          ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(col(key), col("__id").as(idCol), col("__ts").as(ts),
        col("__asof.ts").as("asof_ts"), col("__asof.value").as("asof_value"))
  }

  /** Point-in-time (SCD-2) dimension lookup — the warehouse op that joins
    * each fact row to the dimension state VALID AT its timestamp. An SCD-2
    * table's validity is [valid_from, next valid_from), so the lookup IS an
    * as-of join against the interval starts: this delegates to [[asOfJoin]]
    * (one exchange + one sort, no range join, no per-probe subquery). The
    * oracle cross-checks through the OTHER formulation — an explicit
    * interval-containment join on (valid_from <= ts < valid_to) — so the
    * as-of machinery and the containment semantics verify each other.
    * `dim` needs (key, validFromCol, stateCol) and must be unique per
    * (key, validFromCol) — which stateHistory guarantees by construction.
    * Output: (key, idCol, ts, valid_from, state). */
  def pointInTimeJoin(facts: DataFrame, dim: DataFrame, key: String,
                      ts: String, idCol: String, validFromCol: String,
                      stateCol: String): DataFrame =
    asOfJoin(facts,
        dim.select(col(key), col(validFromCol).as(ts), col(stateCol)),
        key, ts, idCol, stateCol)
      .withColumnRenamed("asof_ts", "valid_from")
      .withColumnRenamed("asof_value", "state")

  /** Banded interval self-join: all ordered pairs of rows with the same
    * `key` whose timestamps are within `[0, windowSec)` of each other —
    * "events of one user within 5 minutes". The scale shape: band each row
    * into a `windowSec`-wide time bucket, equi-join on (key, bucket) and on
    * (key, bucket+1) — a half-open window never spans more than two buckets,
    * and the two branches are key-disjoint so each qualifying pair matches
    * EXACTLY once (no distinct) — then verify the exact time predicate.
    * Shuffle is keyed on (key, bucket), never the quadratic pair space;
    * per-bucket cost is bounded by per-key event rate x window. Pairs order
    * (a before b) with `id_b > id_a` breaking equal-timestamp ties. */
  def intervalSelfJoin(events: DataFrame, key: String, ts: String,
                       idCol: String, windowSec: Int): DataFrame = {
    require(windowSec > 0, s"windowSec must be positive: $windowSec")
    val micros = windowSec * 1000000L
    val e = events.select(col(key), col(idCol).as("__id"),
        unix_micros(col(ts).cast("timestamp")).as("__us"))
      .withColumn("__b", floor(col("__us") / micros))
    def bSide(off: Int) = e.select(col(key), col("__id").as("id_b"),
      col("__us").as("us_b"), (col("__b") - off).as("__b"))
    // both sides are the event stream itself — corpus-proportional, so the
    // bucket join is pinned SHUFFLE_HASH (AQE would broadcast one side at
    // test SF, a plan that cannot exist at 100 TB)
    val cand = e.join(bSide(0).hint("SHUFFLE_HASH"), Seq(key, "__b"))
      .unionByName(e.join(bSide(1).hint("SHUFFLE_HASH"), Seq(key, "__b")))
    cand
      .filter(col("us_b") >= col("__us") && col("us_b") - col("__us") < micros &&
        (col("us_b") > col("__us") || col("id_b") > col("__id")))
      .select(col(key), col("__id").as("id_a"), col("id_b"),
        (col("us_b") - col("__us")).as("gap_us"))
  }

  /** Fuzzy lookup (record linkage): match each PROBE name against a master
    * catalog by Jaro-Winkler similarity, top-`k` per probe — the
    * dedupe-incoming-records-against-the-catalog step. Candidates come
    * from BLOCKING (shared first-two-token key + length band), so each
    * probe scores one block, never the catalog; scoring is the codegen'd
    * `jaro_winkler` expression inside the join's generated loop. Ranking
    * happens on the 6-dp ROUNDED score (ties then probe/candidate id):
    * ranking on raw doubles would let a last-ulp disagreement with the
    * oracle engine reorder the cut. Per-probe top-k through GroupedTopK's
    * bounded heaps. Self-matches (same id) are excluded. Output:
    * (probe_id, match_id, match_name, score). */
  def fuzzyLookup(probes: DataFrame, catalog: DataFrame, idCol: String,
                  nameCol: String, threshold: Double = 0.8, k: Int = 2,
                  lengthBand: Int = 2): DataFrame = {
    require(threshold >= 0 && threshold <= 1 && k >= 1 && lengthBand >= 0)
    def keyed(df: DataFrame, tag: String) = df.select(
      col(idCol).as(s"${tag}_id"), col(nameCol).as(s"${tag}_name"),
      expr(s"""concat_ws(' ', slice(split($nameCol, ' '), 1, 2))""").as(s"${tag}_blk"),
      length(col(nameCol)).as(s"${tag}_len"))
    val p = keyed(probes, "probe")
    val c = keyed(catalog, "cand")
    val scored = p.join(c.hint("SHUFFLE_HASH"),
        col("probe_blk") === col("cand_blk") &&
          abs(col("probe_len") - col("cand_len")) <= lengthBand &&
          col("probe_id") =!= col("cand_id"))
      .withColumn("score",
        round(graft.GraftFunctions.jaro_winkler(col("probe_name"), col("cand_name")), 6))
      .filter(col("score") >= threshold)
    graft.plans.GroupedTopK(scored, Seq(col("probe_id")),
        Seq(desc("score"), asc("cand_id")), k)
      .select(col("probe_id"), col("cand_id").as("match_id"),
        col("cand_name").as("match_name"), col("score"))
  }

  /** Register `df` as a bucketed-at-rest parquet table (hash-bucketed AND
    * sorted by `key` into `buckets` files) and return the catalog-backed
    * read of it. Idempotent per JVM: the table name is derived from the
    * sorted input-file list, so re-invocations reuse the existing catalog
    * entry instead of rewriting (the bench's second rep, every search
    * after the first). A fresh JVM overwrite-rewrites the same path. */
  def bucketedTable(df: DataFrame, key: String, buckets: Int,
                    tag: String): DataFrame = {
    require(buckets >= 1, s"buckets must be positive: $buckets")
    val spark = df.sparkSession
    val id = {
      val s = df.inputFiles.sorted.mkString(",") + "|" +
        df.queryExecution.analyzed.canonicalized.toString + s"|$key|$buckets"
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    }
    val tab = s"graft_${tag}_b${buckets}_$id"
    if (!spark.catalog.tableExists(tab)) {
      val path = new java.io.File(
        sys.props("java.io.tmpdir"), s"graft_bucketed/$tab").getAbsolutePath
      df.write.mode("overwrite").format("parquet")
        .bucketBy(buckets, key).sortBy(key)
        .option("path", path).saveAsTable(tab)
    }
    spark.table(tab)
  }

  /** Co-located fact-to-fact join via at-rest bucketing — the shuffle
    * elimination the 100 TB regime lives on. Both inputs are persisted
    * hash-bucketed by their join key with the SAME bucket count, so each
    * side's scan already satisfies the join's required distribution: the
    * physical plan joins bucket i of one table against bucket i of the
    * other with NO Exchange on either side (pinned in PlanShapeSpec). At
    * production scale the bucketed write happens ONCE at ingest (e.g.
    * 4096 buckets), and every subsequent join/aggregation on that key —
    * the daily fact-to-fact reconciliation this query models — reads
    * co-located buckets instead of reshuffling terabytes per run.
    *
    * The join itself is hinted SHUFFLE_HASH (bucket-local hash join): with
    * both sides' distributions satisfied the hint only picks the join
    * IMPLEMENTATION, build-side = orders (the smaller). Revenue stays in
    * integer e4 cents (exact, order-free). The post-join groupBy on
    * (o_orderpriority, l_returnflag) is the plan's only exchange — 25
    * partially-aggregated rows per task. */
  /** TPC-H Q17 shape: revenue locked in small-quantity orders of selected
    * brands — lineitem rows whose quantity sits below 20% of their part's
    * average order quantity (`avg_yearly` = that revenue / 7, per TPC-H).
    *
    * The correlated scalar subquery of the SQL form (`l_quantity < 0.2 *
    * (SELECT avg(l_quantity) ... WHERE l_partkey = p_partkey)`)
    * decorrelates into one per-part aggregate joined back on partkey;
    * declared explicitly so the brand dimension prunes BOTH consumers: the
    * brand semi-filter cuts the fact to the ~|brands|/25 slice BEFORE the
    * per-part aggregate, so at 100 TB the partkey shuffle only ever
    * carries brand rows (Catalyst's own decorrelation would do the same;
    * writing it as two consumers of one pruned scan makes the reuse
    * explicit). The brand slice of `part` is SF-PROPORTIONAL (~26 B rows
    * at SF 10^5 means the slice is still billions) so it joins
    * SHUFFLE_HASH on partkey — the same key the aggregate reuses — never
    * broadcast. Aggregate side is partkey-keyed like the probe side —
    * SHUFFLE_HASH, no sort.
    *
    * Exactness: quantities are integral doubles, so the 20%-of-average
    * predicate is the exact integer comparison `5*q*n < sum_q`; revenue
    * sums as cents and the one double expression (/100.0/7.0, round 2)
    * can never land on a 2-dp rounding tie (it would need cents*10/7 to
    * end in 5, impossible for integer cents). */
  def smallQuantityRevenue(lineitem: DataFrame, part: DataFrame,
                           brands: Seq[String] = Seq("Brand#2", "Brand#4")): DataFrame = {
    val dims = part.filter(col("p_brand").isin(brands: _*))
      .select("p_partkey", "p_brand")
    val li = lineitem.select(col("l_partkey"),
        expr("CAST(l_quantity AS BIGINT)").as("q"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
      .join(dims.hint("SHUFFLE_HASH"), col("l_partkey") === col("p_partkey"))
    val avgs = li.groupBy("l_partkey")
      .agg(sum("q").as("sum_q"), count(lit(1)).as("n_li"))
    li.join(avgs.hint("SHUFFLE_HASH"), Seq("l_partkey"))
      .filter(col("q") * 5 * col("n_li") < col("sum_q"))
      .groupBy("p_brand")
      .agg(sum("cents").as("rev_cents"), count(lit(1)).as("n_small"))
      .withColumn("avg_yearly",
        expr("round(CAST(rev_cents AS DOUBLE) / 100.0 / 7.0, 2)"))
  }

  /** TPC-H Q18 shape: large-volume customers — orders whose lineitems sum
    * past `minQty` units, with their customer and order header, top-`k` by
    * order value. The SQL form's `IN (SELECT ... HAVING sum > t)` subquery
    * is the SAME aggregate the outer query re-computes — declared once
    * here, so the plan is: one orderkey-keyed partial aggregate (the only
    * pass over the big fact), a HAVING filter that collapses it to the few
    * qualifying orders, then two hash joins that only ever see qualifying
    * rows (AQE broadcasts the shrunken side as soon as it fits — the hints
    * just pin hash strategy over sort-merge). Final top-k is
    * TakeOrderedAndProject: k rows cross to the driver, never the join
    * result.
    *
    * Exactness: quantities sum as integers, order value as cents; the sort
    * carries the (total_cents desc, o_orderkey asc) tie-break. */
  def largeVolumeCustomers(customer: DataFrame, orders: DataFrame,
                           lineitem: DataFrame, minQty: Long = 250,
                           k: Int = 100): DataFrame = {
    val big = lineitem
      .groupBy("l_orderkey")
      .agg(sum(expr("CAST(l_quantity AS BIGINT)")).as("sum_qty"))
      .filter(col("sum_qty") > minQty)
    orders.select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("total_cents"))
      .join(big.hint("SHUFFLE_HASH"), col("o_orderkey") === col("l_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_name")).hint("SHUFFLE_HASH"),
        col("c_custkey") === col("o_custkey"))
      .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
        "total_cents", "sum_qty")
      .orderBy(desc("total_cents"), asc("o_orderkey")).limit(k)
  }

  def bucketedRevenueJoin(orders: DataFrame, lineitem: DataFrame,
                          buckets: Int = 8): DataFrame = {
    val o = bucketedTable(
      orders.select("o_orderkey", "o_orderpriority"),
      "o_orderkey", buckets, "orders")
    val l = bucketedTable(
      lineitem.select("l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"),
      "l_orderkey", buckets, "lineitem")
    l.join(o.hint("SHUFFLE_HASH"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority", "l_returnflag")
      .agg(
        sum(expr("cast(round(l_extendedprice * 100) AS BIGINT) * " +
          "(100 - cast(round(l_discount * 100) AS BIGINT))")).as("revenue_e4"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q13 shape (reference `main.py:363-365` serves one request at a
    * time; this is the batch "how many orders does each customer have"
    * distribution a capacity planner asks of the same data): LEFT OUTER
    * join customer→orders with an extra join-side predicate (the spec's
    * `o_comment NOT LIKE ...`, here an order-priority exclusion — it must
    * live IN the join condition, not a WHERE, or zero-order customers
    * vanish), count per customer, then histogram the counts.
    *
    * Plan at scale: orders is pre-aggregated to (custkey, cnt) BEFORE the
    * outer join — the join then carries one row per customer per side
    * instead of one per order, and the outer join itself is a cheap
    * hash join on the shrunken aggregate. Second aggregate is over at most
    * |distinct counts| ~ tiny. No row explosion anywhere. */
  def customerOrderDistribution(customer: DataFrame, orders: DataFrame,
                                excludePriority: String = "4-NOT SPECIFIED"): DataFrame = {
    val perCust = orders.filter(col("o_orderpriority") =!= excludePriority)
      .groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
    customer.select("c_custkey")
      .join(perCust.hint("SHUFFLE_HASH"), col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("cnt"), lit(0L)).as("c_count"))
      .groupBy("c_count").agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  /** TPC-H Q14 shape: promo revenue share per ship-month — conditional
    * aggregation over a fact-dim join. The dim is the FULL part table
    * (every lineitem needs its p_type), and part grows linearly with SF
    * (~26 B rows / ~400 GB projected at SF 10^5) — broadcasting it would
    * ship the whole frame through the driver to every executor, so the
    * join is SHUFFLE_HASH on partkey: both sides hash-exchange once, the
    * month aggregate stays map-side partial after the join. Revenue in
    * exact e4 fixed point (cents x discount-percent), ONE division per
    * output row. Output: (ship_month, promo_rev_e4, total_rev_e4,
    * promo_share) ordered by month. */
  def promoRevenueShare(lineitem: DataFrame, part: DataFrame,
                        promoType: String = "PROMO"): DataFrame = {
    val revE4 = expr("cast(round(l_extendedprice * 100) AS BIGINT) * " +
      "(100 - cast(round(l_discount * 100) AS BIGINT))")
    lineitem.select(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"),
        col("l_partkey"), revE4.as("rev_e4"))
      .join(part.select("p_partkey", "p_type").hint("SHUFFLE_HASH"),
        col("l_partkey") === col("p_partkey"))
      .groupBy("ship_month")
      .agg(sum(when(col("p_type") === promoType, col("rev_e4")).otherwise(0L))
          .as("promo_rev_e4"),
        sum("rev_e4").as("total_rev_e4"))
      .withColumn("promo_share", expr(
        "round(100.0 * CAST(promo_rev_e4 AS DOUBLE) / CAST(total_rev_e4 AS DOUBLE), 6)"))
      .orderBy("ship_month")
  }

  /** TPC-H Q22 shape: "global customers sale" — customers in the given
    * market segments whose account balance exceeds the average POSITIVE
    * balance of those segments, and who have gone dormant (no orders on or
    * after `dormantSince`; the spec's 7-year-no-orders clause). The scalar
    * average is an exact integer pair (cent sum, count) computed once and
    * broadcast into the filter via a cross join of one row; the dormancy
    * predicate is a LEFT ANTI join against the distinct custkeys of the
    * date-pruned orders — a frame whose size tracks the ACTIVE-customer
    * count, i.e. SF-proportional, so it joins SHUFFLE_HASH (per-partition
    * hash build, never a driver-routed broadcast or a per-row NOT EXISTS
    * probe). Output:
    * per-segment count and exact cent sum of qualifying balances. */
  def inactiveRichCustomers(customer: DataFrame, orders: DataFrame,
                            segments: Seq[String] = Seq("BUILDING", "MACHINERY", "HOUSEHOLD"),
                            dormantSince: String = "2000-01-01"): DataFrame = {
    val cust = customer.filter(col("c_mktsegment").isin(segments: _*))
      .select(col("c_custkey"), col("c_mktsegment"),
        expr("cast(round(c_acctbal * 100) AS BIGINT)").as("bal_cents"))
    val avgRow = cust.filter(col("bal_cents") > 0)
      .agg(sum("bal_cents").as("pos_sum"), count(lit(1)).as("pos_n"))
    cust.join(broadcast(avgRow))
      // bal > avg as exact integer cross-multiplication: no double rounding
      .filter(col("bal_cents") * col("pos_n") > col("pos_sum"))
      .join(orders.filter(col("o_orderdate") >= lit(dormantSince).cast("timestamp"))
          .select(col("o_custkey")).distinct().hint("SHUFFLE_HASH"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("numcust"), sum("bal_cents").as("totacctbal_cents"))
  }

  /** TPC-H Q10 shape: returned-item revenue — top-`k` customers by revenue
    * of their 'R'-flagged lineitems within one order-date quarter. The fact
    * is pre-filtered and pre-aggregated per ORDER before joining order
    * headers (dates prune orders first, so the order→lineitem join carries
    * only the quarter's orders), then re-aggregated per customer; the
    * customer dim joins LAST, when only |customers with returns| rows
    * remain. Top-k is TakeOrderedAndProject — k rows to the driver.
    * Exact cents x discount e4 arithmetic; (rev desc, custkey asc)
    * tie-break. */
  def returnedItemRevenue(customer: DataFrame, orders: DataFrame,
                          lineitem: DataFrame, fromDate: String = "1996-01-01",
                          toDate: String = "1996-04-01", k: Int = 20): DataFrame = {
    val ords = orders
      .filter(col("o_orderdate") >= lit(fromDate).cast("timestamp") &&
        col("o_orderdate") < lit(toDate).cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val li = lineitem.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        expr("cast(round(l_extendedprice * 100) AS BIGINT) * " +
          "(100 - cast(round(l_discount * 100) AS BIGINT))").as("rev_e4"))
      .groupBy("l_orderkey").agg(sum("rev_e4").as("rev_e4"), count(lit(1)).as("n_ret"))
    ords.join(li.hint("SHUFFLE_HASH"), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_custkey")
      .agg(sum("rev_e4").as("revenue_e4"), sum("n_ret").as("n_returned"))
      .join(customer.select(col("c_custkey"), col("c_name"),
        expr("cast(round(c_acctbal * 100) AS BIGINT)").as("acctbal_cents")).hint("SHUFFLE_HASH"),
        col("o_custkey") === col("c_custkey"))
      .select("c_custkey", "c_name", "acctbal_cents", "revenue_e4", "n_returned")
      .orderBy(desc("revenue_e4"), asc("c_custkey")).limit(k)
  }

  /** TPC-H Q19 shape: discounted revenue under an OR-of-ANDs predicate
    * spanning both join sides (brand+size on the dim, quantity on the
    * fact). The per-side halves of the disjunction are pushed BELOW the
    * join as union bounds — part is pre-filtered to the union of the
    * brand/size clauses (so the hash build holds only candidate parts)
    * and lineitem to the union of the quantity ranges (pushed to the
    * parquet scan as `l_quantity <= maxHi`) — while the exact
    * conjunctions apply after the join. The candidate-part slice is a
    * CONSTANT FRACTION of part, i.e. still SF-proportional, so it joins
    * SHUFFLE_HASH, never broadcast. Per-brand revenue output; exact e4
    * arithmetic. */
  def disjunctivePromoRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    // (brand, sizeLo, sizeHi, qtyLo, qtyHi) clauses of the disjunction
    val clauses = Seq(
      ("Brand#1", 1, 10, 1L, 20L), ("Brand#2", 5, 20, 10L, 40L),
      ("Brand#3", 20, 40, 20L, 50L))
    val dimUnion = clauses.map { case (b, sLo, sHi, _, _) =>
      col("p_brand") === b && col("p_size").between(sLo, sHi)
    }.reduce(_ || _)
    val qtyMax = clauses.map(_._5).max
    val joint = clauses.map { case (b, sLo, sHi, qLo, qHi) =>
      col("p_brand") === b && col("p_size").between(sLo, sHi) &&
        col("q").between(qLo, qHi)
    }.reduce(_ || _)
    lineitem.select(col("l_partkey"),
        expr("CAST(l_quantity AS BIGINT)").as("q"),
        expr("cast(round(l_extendedprice * 100) AS BIGINT) * " +
          "(100 - cast(round(l_discount * 100) AS BIGINT))").as("rev_e4"))
      .filter(col("q") <= qtyMax)
      .join(part.filter(dimUnion).select("p_partkey", "p_brand", "p_size")
          .hint("SHUFFLE_HASH"),
        col("l_partkey") === col("p_partkey"))
      .filter(joint)
      .groupBy("p_brand")
      .agg(sum("rev_e4").as("revenue_e4"), count(lit(1)).as("n_items"))
      .orderBy("p_brand")
  }

  /** TPC-H Q7 shape: volume shipping between two nations — revenue by
    * (supplier nation, customer nation, ship year) for the ordered pairs
    * of `nationA`/`nationB`, over a two-year ship window. The 25-row
    * nation frame broadcasts onto supplier and customer; the resulting
    * `supNat`/`custNat` frames are two-nation SLICES of supplier/customer
    * — a constant fraction, so still SF-proportional (~100 M customers
    * per nation at SF 10^5) — and therefore join SHUFFLE_HASH on their
    * keys, never broadcast. The ship-window filter prunes the fact scan
    * first; the lineitem⋈orders hop is the one fact-fact shuffle. */
  def volumeShipping(lineitem: DataFrame, orders: DataFrame,
                     customer: DataFrame, supplier: DataFrame, nation: DataFrame,
                     nationA: String = "NATION_1", nationB: String = "NATION_2",
                     fromYear: Int = 1996, toYear: Int = 1997): DataFrame = {
    val nat = nation.filter(col("n_name").isin(nationA, nationB))
      .select("n_nationkey", "n_name")
    val supNat = supplier.join(broadcast(nat),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val custNat = customer.join(broadcast(nat),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val ordNat = orders.select("o_orderkey", "o_custkey")
      .join(custNat.hint("SHUFFLE_HASH"), col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "cust_nation")
    lineitem
      .filter(year(col("l_shipdate")).between(fromYear, toYear))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).as("l_year"),
        expr("cast(round(l_extendedprice * 100) AS BIGINT) * " +
          "(100 - cast(round(l_discount * 100) AS BIGINT))").as("rev_e4"))
      .join(supNat.hint("SHUFFLE_HASH"), col("l_suppkey") === col("s_suppkey"))
      .join(ordNat.hint("SHUFFLE_HASH"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(sum("rev_e4").as("revenue_e4"), count(lit(1)).as("n_items"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q15 shape: top supplier — suppliers whose quarter revenue
    * EQUALS the maximum (the spec's view + scalar subquery, and the
    * general argmax-against-global pattern). The per-supplier aggregate is
    * computed ONCE and consumed twice: the 1-row max broadcasts back onto
    * it (no second pass over the fact), and only the argmax row(s) touch
    * the supplier dim. That last lookup joins SHUFFLE_HASH on suppkey:
    * supplier is SF-proportional (~1.3 B rows at SF 10^5), so the name
    * lookup hash-exchanges both sides rather than shipping the whole dim
    * through the driver. Exact e4 integers make "equals the max" safe —
    * no float-compare tie hazard. */
  def topRevenueSupplier(lineitem: DataFrame, supplier: DataFrame,
                         fromDate: String = "1996-01-01",
                         toDate: String = "1996-04-01"): DataFrame = {
    val rev = lineitem
      .filter(col("l_shipdate") >= lit(fromDate).cast("timestamp") &&
        col("l_shipdate") < lit(toDate).cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum(expr("cast(round(l_extendedprice * 100) AS BIGINT) * " +
        "(100 - cast(round(l_discount * 100) AS BIGINT))")).as("total_e4"),
        count(lit(1)).as("n_items"))
    val mx = rev.agg(max("total_e4").as("max_e4"))
    rev.join(broadcast(mx))
      .filter(col("total_e4") === col("max_e4"))
      .join(supplier.select(col("s_suppkey"), col("s_name")).hint("SHUFFLE_HASH"),
        col("l_suppkey") === col("s_suppkey"))
      .select("s_suppkey", "s_name", "total_e4", "n_items")
      .orderBy("s_suppkey")
  }

  /** TPC-H Q4 shape: order-priority checking — orders in a quarter with at
    * least one LATE lineitem (shipped more than `lateDays` after the order
    * date), counted by priority. The EXISTS is a LEFT SEMI hash join whose
    * non-equi lateness predicate compares columns from BOTH sides, so it
    * rides the join as an extra condition (one shuffle, no fact
    * re-aggregation, no row explosion from multi-lineitem orders — semi
    * emits each order at most once). Date pruning on orders lands before
    * the join. */
  def latePriorityCounts(orders: DataFrame, lineitem: DataFrame,
                         lateDays: Int = 90, fromDate: String = "1996-01-01",
                         toDate: String = "1996-07-01"): DataFrame = {
    val ords = orders
      .filter(col("o_orderdate") >= lit(fromDate).cast("timestamp") &&
        col("o_orderdate") < lit(toDate).cast("timestamp"))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = lineitem.select("l_orderkey", "l_shipdate")
    // the hint must sit on the BUILD (right) side: a left-semi shuffled
    // hash join builds right, and a left-side hint left the planner free
    // to broadcast the projected lineitem frame instead (caught by
    // PlanAudit's broadcast pricer — fact-sized, fatal at 100 TB)
    ords.join(li.hint("SHUFFLE_HASH"),
        col("o_orderkey") === col("l_orderkey") &&
        expr(s"datediff(l_shipdate, o_orderdate) > $lateDays"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q12-flavored latency banding: order→ship calendar-day latency
    * bucketed into fixed bands per order priority, with each band's share
    * of its priority — the SLA-attainment cut. One hash join (no
    * pre-aggregation possible: latency needs both sides' dates), one
    * partial-aggregated shuffle to the tiny (priority × band) frame; the
    * share window runs over that frame, not the fact. */
  def shipLatencyBands(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val joined = lineitem.select("l_orderkey", "l_shipdate")
      .join(orders.select("o_orderkey", "o_orderdate", "o_orderpriority")
          .hint("SHUFFLE_HASH"),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("lat", expr("datediff(l_shipdate, o_orderdate)"))
      .withColumn("band", expr(
        """CASE WHEN lat <= 30 THEN '00-30' WHEN lat <= 60 THEN '31-60'
             WHEN lat <= 90 THEN '61-90' ELSE '90+' END"""))
    val counts = joined.groupBy("o_orderpriority", "band")
      .agg(count(lit(1)).as("n_items"))
    counts
      .withColumn("prio_total",
        sum("n_items").over(Window.partitionBy("o_orderpriority")))
      .withColumn("share",
        expr("round(CAST(n_items AS DOUBLE) / prio_total, 6)"))
      .orderBy("o_orderpriority", "band")
  }

  /** TPC-H Q21 shape: suppliers who kept orders waiting — the supplier was
    * the ONLY late shipper (> `lateDays` after the order date) on a
    * multi-supplier order. The spec's EXISTS(other supplier) +
    * NOT EXISTS(other late supplier) pair collapses into ONE per-order
    * aggregate: distinct supplier count, distinct LATE supplier count, and
    * the late supplier id (well-defined exactly when the late count is 1) —
    * so the whole correlated-subquery dance costs one orderkey-keyed
    * shuffle, no self-joins. Top-`k` blockers by (waiting orders desc,
    * suppkey asc). */
  def soleBlockerSuppliers(orders: DataFrame, lineitem: DataFrame,
                           supplier: DataFrame, lateDays: Int = 90,
                           k: Int = 20): DataFrame = {
    val perOrder = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(orders.select("o_orderkey", "o_orderdate").hint("SHUFFLE_HASH"),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        expr(s"datediff(l_shipdate, o_orderdate) > $lateDays"))
      .groupBy("l_orderkey")
      .agg(countDistinct("l_suppkey").as("n_supp"),
        countDistinct(when(col("late"), col("l_suppkey"))).as("n_late_supp"),
        max(when(col("late"), col("l_suppkey"))).as("late_supp"))
    perOrder.filter(col("n_late_supp") === 1 && col("n_supp") > 1)
      .groupBy("late_supp").agg(count(lit(1)).as("numwait"))
      // supplier is SF-proportional: name lookup is a suppkey hash join,
      // never a broadcast of the full dim
      .join(supplier.select(col("s_suppkey"), col("s_name")).hint("SHUFFLE_HASH"),
        col("late_supp") === col("s_suppkey"))
      .select("s_suppkey", "s_name", "numwait")
      .orderBy(desc("numwait"), asc("s_suppkey")).limit(k)
  }

  /** TPC-H Q6 shape: forecasted revenue change — a pure filtered aggregate,
    * the canonical predicate-pushdown probe. Every predicate (ship year,
    * discount band, quantity cap) refers only to scanned columns, so ALL
    * of them reach the parquet reader as PushedFilters and the scan reads
    * exactly 3 columns; the plan is scan → single partial/final agg, zero
    * joins, one 1-row exchange. Revenue = Σ price_cents · disc_e2 (the
    * would-have-been revenue of dropping the discounts), exact e4
    * integers. The discount band compares ROUND-CENT integers, not
    * floats — `0.05 <= l_discount` on binary doubles is exactly the
    * boundary-tie hazard Q6 is famous for. */
  def forecastRevenueChange(lineitem: DataFrame, year: Int = 1996,
                            discLo: Int = 5, discHi: Int = 7,
                            qtyMax: Long = 24L): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit(s"$year-01-01").cast("timestamp") &&
        col("l_shipdate") < lit(s"${year + 1}-01-01").cast("timestamp"))
      .select(
        expr("cast(round(l_extendedprice * 100) AS BIGINT)").as("price_c"),
        expr("cast(round(l_discount * 100) AS BIGINT)").as("disc_e2"),
        expr("CAST(l_quantity AS BIGINT)").as("q"))
      .filter(col("disc_e2").between(discLo, discHi) && col("q") < qtyMax)
      .agg(sum(expr("price_c * disc_e2")).as("revenue_e4"),
        count(lit(1)).as("n_items"))

  /** TPC-H Q8 shape: national market share — of all revenue a region's
    * customers spent on one part type, the fraction supplied by a target
    * nation, per order year. Only the genuinely bounded frames broadcast
    * (region = 5 rows, the ≤25-row nation-key sets); every frame DERIVED
    * from customer/supplier/part — the region-sliced customer keys (~1/5
    * of customer), the one-type part slice, the target-nation supplier
    * flags (~1/25 of supplier) — is a constant fraction of an
    * SF-proportional table, so each joins SHUFFLE_HASH on its key instead
    * of shipping billions of rows through the driver. The fact-fact hop
    * (lineitem⋈orders) is hinted hash on orderkey. The share is a conditional
    * aggregate (sum-if supplier-nation = target / sum), NOT a second
    * pass: numerator and denominator ride the same groupBy. Exact e4
    * integers; one division per output row. */
  def nationMarketShare(lineitem: DataFrame, orders: DataFrame,
                        customer: DataFrame, supplier: DataFrame,
                        nation: DataFrame, region: DataFrame, part: DataFrame,
                        targetNation: String = "NATION_2",
                        regionName: String = "ASIA",
                        partType: String = "PROMO"): DataFrame = {
    val regionKeys = nation
      .join(broadcast(region.filter(col("r_name") === regionName)
        .select("r_regionkey")), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey")
    val custInRegion = customer
      .join(broadcast(regionKeys), col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val ordInRegion = orders.select("o_orderkey", "o_custkey", "o_orderdate")
      .join(custInRegion.hint("SHUFFLE_HASH"), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
    val targetKeys = nation.filter(col("n_name") === targetNation)
      .select("n_nationkey")
    val suppFlag = supplier
      .join(broadcast(targetKeys), col("s_nationkey") === col("n_nationkey"),
        "left_semi")
      .select("s_suppkey")
    lineitem
      .join(part.filter(col("p_type") === partType)
        .select("p_partkey").hint("SHUFFLE_HASH"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        expr("cast(round(l_extendedprice * 100) AS BIGINT) * " +
          "(100 - cast(round(l_discount * 100) AS BIGINT))").as("rev_e4"))
      .join(ordInRegion.hint("SHUFFLE_HASH"),
        col("l_orderkey") === col("o_orderkey"))
      .join(suppFlag.withColumn("is_target", lit(true)).hint("SHUFFLE_HASH"),
        col("l_suppkey") === col("s_suppkey"), "left")
      .groupBy("o_year")
      .agg(sum(when(col("is_target"), col("rev_e4")).otherwise(0L))
          .as("nation_e4"),
        sum("rev_e4").as("total_e4"), count(lit(1)).as("n_items"))
      .withColumn("mkt_share", expr(
        "round(CAST(nation_e4 AS DOUBLE) / total_e4, 6)"))
      .orderBy("o_year")
  }

  /** TPC-H Q11 shape: important stock — groups whose aggregate exceeds a
    * threshold derived from the global aggregate (the
    * HAVING-against-scalar-subquery pattern). The per-part revenue
    * aggregate is computed ONCE and consumed twice: its own 1-row
    * total+count broadcasts back onto it, so the threshold costs no
    * second fact pass. The cut is MEAN-relative (value > mult × mean part
    * value) rather than the spec's fixed global fraction — a fixed
    * fraction degenerates to the empty set as the part universe grows
    * (TPC-H itself scales Q11's fraction by 1/SF for the same reason),
    * while mean-relative is scale-free. Exact cross-multiplied integers
    * (value·n·denom > total·num), no float threshold. Output ordered
    * (value desc, partkey asc). */
  def topValueParts(lineitem: DataFrame, multNum: Long = 5L,
                    multDenom: Long = 4L): DataFrame = {
    val perPart = lineitem
      .groupBy("l_partkey")
      .agg(sum(expr("cast(round(l_extendedprice * 100) AS BIGINT) * " +
        "(100 - cast(round(l_discount * 100) AS BIGINT))")).as("value_e4"),
        count(lit(1)).as("n_items"))
    val total = perPart.agg(sum("value_e4").as("total_e4"),
      count(lit(1)).as("n_parts"))
    perPart.join(broadcast(total))
      .filter(col("value_e4") * col("n_parts") * multDenom >
        col("total_e4") * multNum)
      .withColumn("share", expr("round(CAST(value_e4 AS DOUBLE) / total_e4, 6)"))
      .select("l_partkey", "value_e4", "n_items", "share")
      .orderBy(desc("value_e4"), asc("l_partkey"))
  }

  /** TPC-H Q9 shape: product-type profit — profit by supplier nation and
    * order year for parts whose name matches a pattern. The fixture has
    * no partsupp cost table, so cost = p_retailprice · quantity stands in
    * (same join topology, same amounts arithmetic): profit_e4 =
    * revenue_e4 − cost_e4 with every term an exact e4 integer. Joins:
    * nation (25 rows) broadcasts onto supplier, but the resulting supNat
    * frame and the pattern-sliced part frame are both SF-proportional
    * (constant fractions of supplier/part), so they join the fact
    * SHUFFLE_HASH on their keys; the fact-fact hop (lineitem⋈orders for
    * the year) is hinted hash on orderkey. One partial-aggregated shuffle
    * to the (nation, year) frame. */
  def productTypeProfit(lineitem: DataFrame, orders: DataFrame,
                        supplier: DataFrame, nation: DataFrame,
                        part: DataFrame,
                        namePattern: String = "%rod%"): DataFrame = {
    val supNat = supplier
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    val parts = part.filter(col("p_name").like(namePattern))
      .select(col("p_partkey"),
        expr("cast(round(p_retailprice * 100) AS BIGINT)").as("cost_c"))
    lineitem
      .join(parts.hint("SHUFFLE_HASH"), col("l_partkey") === col("p_partkey"))
      .join(supNat.hint("SHUFFLE_HASH"), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("nation"),
        expr("""cast(round(l_extendedprice * 100) AS BIGINT)
            * (100 - cast(round(l_discount * 100) AS BIGINT))
            - cost_c * CAST(l_quantity AS BIGINT) * 100""").as("profit_e4"))
      .join(orders.select(col("o_orderkey"),
          year(col("o_orderdate")).as("o_year")).hint("SHUFFLE_HASH"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("nation", "o_year")
      .agg(sum("profit_e4").as("profit_e4"), count(lit(1)).as("n_items"))
      .orderBy("nation", "o_year")
  }

  /** TPC-H Q16 shape: supplier variety — how many DISTINCT suppliers stock
    * each (brand, type, size) combination, excluding one brand and an
    * explicit size list (the spec's NOT-predicates) and excluding
    * blacklisted suppliers via an ANTI join (the spec's NOT IN
    * (SELECT...) — here: suppliers under an account-balance floor). Both
    * the part slice and the blacklist are constant FRACTIONS of
    * SF-proportional tables (part ~26 B, supplier ~1.3 B rows at SF
    * 10^5), so both join SHUFFLE_HASH — the anti join hash-builds the
    * blacklist per partition, never driver-collects it. The distinct
    * count runs as the standard two-phase expand (dedup on
    * (brand,type,size,suppkey), then count) — one keyed shuffle each,
    * both partial-aggregated. Output by
    * (supplier_cnt desc, brand, type, size). */
  def supplierVariety(lineitem: DataFrame, part: DataFrame,
                      supplier: DataFrame, excludeBrand: String = "Brand#1",
                      excludeSizes: Seq[Int] = Seq(3, 14, 23, 45),
                      minAcctbal: Double = 1000.0): DataFrame = {
    val dims = part
      .filter(col("p_brand") =!= excludeBrand &&
        !col("p_size").isin(excludeSizes: _*))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val badSupp = supplier.filter(col("s_acctbal") < minAcctbal)
      .select("s_suppkey")
    lineitem.select("l_partkey", "l_suppkey")
      .join(dims.hint("SHUFFLE_HASH"), col("l_partkey") === col("p_partkey"))
      .join(badSupp.hint("SHUFFLE_HASH"), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_type"),
        asc("p_size"))
  }

  /** TPC-H Q12 shape: shipping category vs order priority — per lineitem
    * category (the spec's l_shipmode; the fixture's categorical lineitem
    * column is l_returnflag) inside a ship-date year, how many lines
    * belong to critical-priority orders (1-URGENT/2-HIGH) vs not. The
    * spec's defining feature is the CASE-WHEN split aggregation over the
    * order⋈lineitem join — both counts in ONE pass, no second join or
    * union. Plan: the year filter prunes the fact scan first, then one
    * orderkey-keyed hash join (fact-fact → SHUFFLE_HASH, the
    * latePriorityCounts convention), one partial-aggregated shuffle to
    * the |categories|-row frame. Exact integer counts only. */
  def shipmodePriorityCounts(orders: DataFrame, lineitem: DataFrame,
                             shipYear: Int = 1996): DataFrame = {
    val li = lineitem
      .filter(org.apache.spark.sql.functions.year(col("l_shipdate")) === shipYear)
      .select("l_orderkey", "l_returnflag")
    li.join(orders.select("o_orderkey", "o_orderpriority").hint("SHUFFLE_HASH"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy("l_returnflag")
  }

  /** TPC-H Q2 shape: min-cost supplier — for each part in a (type, size)
    * slice, the regional supplier(s) offering the minimum cost, with
    * supplier detail, ordered by account balance (the spec's top-100). The
    * fixture has no partsupp, so cost per (part, supplier) = that
    * supplier's lineitem revenue cents for the part — same join topology,
    * same correlated-subquery shape: the spec's `ps_supplycost = (SELECT
    * min(ps_supplycost) ... WHERE p_partkey = ps_partkey AND <region>)`
    * decorrelates into one per-part MIN over the already-region-filtered
    * cost table, joined back on partkey (SHUFFLE_HASH — both sides carry
    * the same partkey shuffle, no sort).
    *
    * Scale: only nation (25) and region (5) broadcast. The part slice
    * and the region-filtered supplier frame are constant FRACTIONS of
    * SF-proportional tables (~26 B parts / ~1.3 B suppliers at SF 10^5),
    * so every join that consumes them — the partkey prune, the suppkey
    * semi, and both final detail lookups — is SHUFFLE_HASH on its key.
    * The only corpus pass is lineitem → one (partkey, suppkey)
    * partial-aggregated shuffle, pre-pruned by BOTH filters, so the
    * shuffle carries only the slice. Ties keep
    * every min-cost supplier (spec semantics). The final order
    * (s_acctbal desc, nation, s_name, p_partkey) is a unique total order
    * — s_name is supplier-unique, p_partkey splits same-supplier rows —
    * so the LIMIT is deterministic; k rows cross the driver via
    * TakeOrderedAndProject, never the join result.
    *
    * Exactness: costs sum as integer cents; the min/equality filter is
    * integer; s_acctbal passes through as the stored double. */
  def minCostSupplier(lineitem: DataFrame, part: DataFrame,
                      supplier: DataFrame, nation: DataFrame,
                      region: DataFrame, partType: String = "STANDARD",
                      maxSize: Int = 15, regionName: String = "ASIA",
                      k: Int = 100): DataFrame = {
    val supReg = supplier
      .join(broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === regionName)
        .select("r_regionkey")), col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
        col("n_name").as("nation"))
    val dims = part
      .filter(col("p_type") === partType && col("p_size") <= maxSize)
      .select("p_partkey", "p_brand")
    val cost = lineitem
      .join(dims.select("p_partkey").hint("SHUFFLE_HASH"),
        col("l_partkey") === col("p_partkey"))
      .join(supReg.select("s_suppkey").hint("SHUFFLE_HASH"),
        col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
        .as("cost_c"))
    val minc = cost.groupBy("l_partkey").agg(min("cost_c").as("min_c"))
    cost.join(minc.hint("SHUFFLE_HASH"), Seq("l_partkey"))
      .filter(col("cost_c") === col("min_c"))
      .join(supReg.hint("SHUFFLE_HASH"), col("l_suppkey") === col("s_suppkey"))
      .join(dims.hint("SHUFFLE_HASH"), col("l_partkey") === col("p_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("nation"),
        col("l_partkey").as("p_partkey"), col("p_brand"), col("cost_c"))
      .orderBy(desc("s_acctbal"), asc("nation"), asc("s_name"),
        asc("p_partkey"))
      .limit(k)
  }

  /** TPC-H Q20 shape: excess shippers — regional suppliers who shipped
    * more than `multNum/multDenom` × the mean per-supplier quantity of a
    * part-name slice inside a date window (the spec's nested
    * `IN (SELECT ps_suppkey ... WHERE ps_availqty > 0.5 * (SELECT
    * sum(l_quantity) ...))` chain; availqty has no fixture column, so the
    * threshold is MEAN-relative like the Q11 adaptation — a fixed
    * absolute quantity degenerates as the corpus grows, mean-relative is
    * scale-free). The pattern-sliced part frame is SF-proportional, so
    * its prune joins SHUFFLE_HASH on partkey (never broadcast).
    * Decorrelation: one date+pattern-pruned pass over
    * lineitem into a per-supplier quantity aggregate (|suppliers|-bounded),
    * its 1-row total broadcast back as an exact cross-multiplied integer
    * cut (qty·n·denom > total·num), then the qualifying-supplier frame
    * joins the region-filtered supplier dim — every post-corpus frame is
    * dim-bounded, so the chain is broadcast/hash joins over tiny tables.
    * Output ordered by s_name (supplier-unique → deterministic). */
  def excessShippers(lineitem: DataFrame, part: DataFrame,
                     supplier: DataFrame, nation: DataFrame,
                     region: DataFrame, namePattern: String = "small%",
                     year: Int = 1995, regionName: String = "ASIA",
                     multNum: Long = 4L, multDenom: Long = 5L): DataFrame = {
    val pp = part.filter(col("p_name").like(namePattern)).select("p_partkey")
    val shipped = lineitem
      .filter(org.apache.spark.sql.functions.year(col("l_shipdate")) === year)
      .join(pp.hint("SHUFFLE_HASH"), col("l_partkey") === col("p_partkey"))
      .groupBy("l_suppkey")
      .agg(sum(expr("CAST(l_quantity AS BIGINT)")).as("qty"))
    val tot = shipped.agg(sum("qty").as("tot_q"), count(lit(1)).as("n_supp"))
    val qual = shipped.crossJoin(broadcast(tot))
      .filter(col("qty") * col("n_supp") * multDenom >
        col("tot_q") * multNum)
      .select("l_suppkey", "qty")
    supplier
      .join(broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === regionName)
        .select("r_regionkey")), col("n_regionkey") === col("r_regionkey"))
      .join(qual.hint("SHUFFLE_HASH"), col("s_suppkey") === col("l_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name").as("nation"),
        col("qty"))
      .orderBy(asc("s_name"))
  }
}
