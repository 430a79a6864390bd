package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics operators (product-analytics / warehouse shapes
  * over the `events` fixture: event_id, ts, user_id, event_type, value).
  * The reference has no event model at all (its only table is the chunk
  * collection, `/root/reference/main.py:158-170`); these are the extension
  * surface a general analytics engine needs, each designed around one
  * user-keyed shuffle that a 1000-executor cluster can scale out.
  *
  * Determinism rules shared with the rest of the repo: every output value is
  * either an integer, a timestamp (micros on both engines), or a DOUBLE
  * computed by one explicit expression tree over exact integer inputs — so
  * DuckDB and Spark agree bit-for-bit and the driver's hash compare holds.
  */
object EventAnalytics {

  /** Integer day index relative to `anchor` — THE calendar convention every
    * operator (and oracle) here shares: days-since-anchor, floor semantics.
    * Engine-neutral where dayofweek()/week() origins are not. */
  def dayIdxSql(tsCol: String, anchor: String): String =
    s"CAST(datediff(CAST($tsCol AS DATE), DATE '$anchor') AS BIGINT)"

  /** Integer week index relative to `anchor` (dayIdx DIV-by-7, floored). */
  def weekIdxSql(tsCol: String, anchor: String): String =
    s"CAST(floor(${dayIdxSql(tsCol, anchor)} / 7.0) AS BIGINT)"

  /** Ordered-step funnel: for each user, the earliest time they completed
    * step i strictly after completing step i-1 (the classic product-funnel
    * semantics — re-orderings don't count). Long-form output: one row per
    * user per reached step `(user_id, step, step_ts)`.
    *
    * Shape at scale: step 1 is one user-keyed partial-aggregate shuffle;
    * each later step joins the (shrinking) frontier back to that step's
    * filtered events on user_id — every shuffle in the chain is keyed the
    * same way, so AQE coalesces and the frontier side gets broadcast as
    * soon as it fits. Never a global sort or a per-user collect.
    */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val e = events.select(col("user_id"), col("event_type"), col("ts"))
    var frontier = e.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min("ts").as("t"))
    var out = frontier.select(col("user_id"), lit(1).as("step"), col("t"))
    steps.tail.zipWithIndex.foreach { case (st, i) =>
      frontier = e.filter(col("event_type") === st)
        .join(frontier.select("user_id", "t").hint("SHUFFLE_HASH"),
          Seq("user_id"))
        .filter(col("ts") > col("t"))
        .groupBy("user_id").agg(min("ts").as("t"))
      out = out.unionByName(
        frontier.select(col("user_id"), lit(i + 2).as("step"), col("t")))
    }
    out.select(col("user_id"), col("step"), col("t").as("step_ts"))
  }

  /** Windowed funnel — [[funnel]] with a max-gap constraint per
    * transition: step i+1 counts only within `maxGapSeconds` of the
    * user's step-i time (the product-analytics default; an unbounded
    * funnel credits conversions months later). Same greedy-earliest
    * semantics and the same iterative shape — one user-keyed aggregate
    * per step, each frontier one row per user — corpus-proportional, so
    * every frontier join is pinned SHUFFLE_HASH, never broadcast — and
    * the gap predicate simply rides the per-transition filter. Output is the summary form: per step, users reached plus
    * conversion from the previous step and from the top (the step-frame
    * window runs over |steps| rows, not users). */
  def windowedFunnel(events: DataFrame, steps: Seq[String],
                     maxGapSeconds: Long = 7L * 86400L): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    require(maxGapSeconds > 0, s"bad gap: $maxGapSeconds")
    val e = events.select(col("user_id"), col("event_type"), col("ts"))
    var frontier = e.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min("ts").as("t"))
    var out = frontier.select(col("user_id"), lit(1).as("step"))
    steps.tail.zipWithIndex.foreach { case (st, i) =>
      frontier = e.filter(col("event_type") === st)
        .join(frontier.select("user_id", "t").hint("SHUFFLE_HASH"),
          Seq("user_id"))
        .filter(col("ts") > col("t") &&
          col("ts") <= col("t") + expr(s"INTERVAL $maxGapSeconds SECOND"))
        .groupBy("user_id").agg(min("ts").as("t"))
      out = out.unionByName(
        frontier.select(col("user_id"), lit(i + 2).as("step")))
    }
    val counts = out.groupBy("step").agg(count(lit(1)).as("n_users"))
    val w = Window.orderBy("step")
    counts
      .withColumn("prev", lag("n_users", 1).over(w))
      .withColumn("first", first("n_users").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("step"), col("n_users"),
        expr("round(CAST(n_users AS DOUBLE) / coalesce(prev, n_users), 6)")
          .as("conv_prev"),
        expr("round(CAST(n_users AS DOUBLE) / first, 6)").as("conv_first"))
      .orderBy("step")
  }

  /** Weekly cohort-LTV triangle — cumulative purchase revenue per signup
    * cohort by weeks-since-signup, per cohort member: the revenue twin of
    * [[retentionCohorts]] (that one counts active users, this one sums
    * what they spend — the curve a data/growth team projects lifetime
    * value from). Exact integer cents end-to-end; the single division
    * per output row happens after the cumulative sum.
    *
    * Shape at scale: one user-keyed first-seen aggregate (one row per
    * user), one keyed join back onto the purchase slice, one aggregate to
    * the (cohort_week, week_offset) frame — at most weeks² rows — and the
    * cumulative window runs over THAT frame partitioned by cohort, never
    * over events. Cohort sizes broadcast back onto it. */
  def cohortLtv(events: DataFrame, anchor: String = "2024-01-01"): DataFrame = {
    val week = (c: String) => expr(weekIdxSql(c, anchor))
    val firstSeen = events.groupBy("user_id").agg(min("ts").as("first_ts"))
      .select(col("user_id"), week("first_ts").as("cohort_week"))
    val sizes = firstSeen.groupBy("cohort_week")
      .agg(count(lit(1)).as("cohort_users"))
    val cells = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), week("ts").as("w"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .join(firstSeen.hint("SHUFFLE_HASH"), Seq("user_id"))
      .groupBy(col("cohort_week"), (col("w") - col("cohort_week")).as("week_offset"))
      .agg(sum("cents").as("revenue_cents"),
        countDistinct("user_id").as("n_buyers"))
    val cum = Window.partitionBy("cohort_week").orderBy("week_offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cum_cents", sum("revenue_cents").over(cum))
      .join(broadcast(sizes), Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("revenue_cents"),
        col("n_buyers"), col("cum_cents"), col("cohort_users"),
        expr("round(CAST(cum_cents AS DOUBLE) / cohort_users, 6)")
          .as("ltv_cents_per_user"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Welch's two-sample t-test between two event types' values — the A/B
    * primitive (unequal variances assumed, the safe default). All moments
    * are EXACT integer cents aggregates (n, Σc, Σc² as BIGINTs — one
    * partial-aggregated shuffle to 2 rows); mean, sample variance, the t
    * statistic and the Welch–Satterthwaite df are then a fixed chain of
    * IEEE double operations on those exact integers, so both engines
    * compute bit-identical statistics. Output: 1 row (type_a, type_b,
    * n_a, n_b, mean_a, mean_b, t_stat, df). */
  def welchTTest(events: DataFrame, typeA: String = "purchase",
                 typeB: String = "click"): DataFrame = {
    require(typeA != typeB, "need two distinct event types")
    val m = events.filter(col("event_type").isin(typeA, typeB))
      .select(col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("c").as("s"),
        sum(expr("c * c")).as("s2"))
    val a = m.filter(col("event_type") === typeA)
      .select(col("n").as("n_a"), col("s").as("s_a"), col("s2").as("s2_a"))
    val b = m.filter(col("event_type") === typeB)
      .select(col("n").as("n_b"), col("s").as("s_b"), col("s2").as("s2_b"))
    // sample variance from exact integers: (n·Σc² − (Σc)²) / (n·(n−1)) —
    // GUARDED: n = 1 has no sample variance (the divisor is zero and ANSI
    // mode raises, not NaNs), and identical-constant samples give se2 = 0
    // (undefined t). Degenerate inputs yield NULL statistics, not a
    // fixture-dependent crash.
    a.join(broadcast(b))
      .withColumn("va", expr(
        """CASE WHEN n_a < 2 THEN CAST(NULL AS DOUBLE)
           ELSE CAST(n_a * s2_a - s_a * s_a AS DOUBLE) / n_a / (n_a - 1) END"""))
      .withColumn("vb", expr(
        """CASE WHEN n_b < 2 THEN CAST(NULL AS DOUBLE)
           ELSE CAST(n_b * s2_b - s_b * s_b AS DOUBLE) / n_b / (n_b - 1) END"""))
      .withColumn("se2", expr("va / n_a + vb / n_b"))
      .select(
        lit(typeA).as("type_a"), lit(typeB).as("type_b"),
        col("n_a"), col("n_b"),
        expr("round(CAST(s_a AS DOUBLE) / n_a, 6)").as("mean_a"),
        expr("round(CAST(s_b AS DOUBLE) / n_b, 6)").as("mean_b"),
        expr("""CASE WHEN se2 IS NULL OR se2 = 0 THEN CAST(NULL AS DOUBLE)
          ELSE round((CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b)
            / sqrt(se2), 6) END""").as("t_stat"),
        expr("""CASE WHEN se2 IS NULL OR se2 = 0 THEN CAST(NULL AS DOUBLE)
          ELSE round(se2 * se2 / (va * va / n_a / n_a / (n_a - 1)
            + vb * vb / n_b / n_b / (n_b - 1)), 6) END""").as("df"))
  }

  /** Seasonal-naive backtest — forecast each day's per-type total by the
    * value `season` days earlier and score the forecast (MAPE + bias):
    * the baseline every demand/traffic forecasting effort must beat, and
    * the cheapest continuous data-quality tripwire for periodic streams.
    * Daily totals are exact cents (one calendar-bounded aggregate); the
    * forecast join is (type, day) → (type, day − season) — keyed, dense
    * or not (missing prior days simply score no row, no gap-fill
    * needed). Errors stay integer (|a−f|) until the two final divisions.
    * Output per type: days scored, MAPE over positive-actual days, and
    * the mean signed bias in cents. */
  def seasonalNaiveBacktest(events: DataFrame, season: Int = 7,
                            anchor: String = "2024-01-01"): DataFrame = {
    require(season >= 1, s"bad season: $season")
    val daily = events
      .select(col("event_type"), expr(dayIdxSql("ts", anchor)).as("day_idx"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .groupBy("event_type", "day_idx").agg(sum("c").as("actual"))
    val forecast = daily.select(col("event_type"),
      (col("day_idx") + season).as("day_idx"), col("actual").as("fc"))
    // per-day APE re-fixed at 2^20 BEFORE the sum: a float sum aggregate
    // would make the MAPE partition-order-dependent (the repo's
    // fixed-before-sum rule); |a−f|·2^20 stays far inside double's exact
    // integer range for cent-scale daily totals
    daily.join(forecast.hint("SHUFFLE_HASH"), Seq("event_type", "day_idx"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("actual") > 0, 1L).otherwise(0L)).as("n_scored"),
        sum(when(col("actual") > 0, expr(
          "CAST(floor(CAST(abs(actual - fc) AS DOUBLE) * 1048576.0 / actual + 0.5) AS BIGINT)"))
          .otherwise(0L)).as("__ape_fx"),
        sum(expr("fc - actual")).as("__bias"))
      .select(col("event_type"), col("n_days"), col("n_scored"),
        // no positive-actual day to score -> NULL MAPE (ANSI divides
        // raise on zero, they don't NaN — the guard IS the semantics)
        expr("""CASE WHEN n_scored = 0 THEN CAST(NULL AS DOUBLE)
          ELSE round(CAST(__ape_fx AS DOUBLE) / 1048576.0 / n_scored, 6)
          END""").as("mape"),
        expr("round(CAST(__bias AS DOUBLE) / n_days, 6)").as("bias_cents"))
      .orderBy("event_type")
  }

  /** Weekly retention cohorts: cohort = integer week (from `anchor`) of a
    * user's first event; one output row per (cohort_week, week_offset) with
    * the distinct-user count active that many weeks after joining.
    *
    * Two user-keyed shuffles (first-seen aggregate, then the join back) and
    * one tiny final aggregate over at most weeks^2 groups. The first-seen
    * side is one row per user — broadcast-able long before the events side
    * would need a sort-merge.
    */
  def retentionCohorts(events: DataFrame, anchor: String = "2024-01-01"): DataFrame = {
    val week = (c: String) => expr(weekIdxSql(c, anchor))
    val firstSeen = events.groupBy("user_id").agg(min("ts").as("first_ts"))
      .select(col("user_id"), week("first_ts").as("cohort_week"))
    events.select(col("user_id"), week("ts").as("w"))
      .join(firstSeen, Seq("user_id"))
      .groupBy(col("cohort_week"), (col("w") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct("user_id").as("n_users"))
  }

  /** Daily gap-fill/resample: per-user calendar-day event counts with
    * explicit zero rows for the silent days between a user's first and last
    * event. Output `(user_id, day_idx, n_events)` with day_idx = days since
    * `anchor` (integer — engine-neutral, no date rendering).
    *
    * The dense day series is generated per user with `sequence` + `explode`
    * (distributed — each user's span explodes where that user's row lives,
    * no driver loop), then left-joins the per-(user, day) counts. Both
    * sides hash-partition on user_id. Span growth is bounded by the
    * calendar, not the event count: a year of days per user is 365 rows —
    * the join stays user-keyed and skew-free even when one user has
    * millions of events, because counts were pre-aggregated first.
    */
  def gapFillDaily(events: DataFrame, anchor: String = "2024-01-01"): DataFrame = {
    val dayIdx = (c: String) => expr(dayIdxSql(c, anchor))
    val counts = events
      .select(col("user_id"), dayIdx("ts").as("day_idx"))
      .groupBy("user_id", "day_idx").agg(count(lit(1)).as("n"))
    val spans = counts.groupBy("user_id")
      .agg(min("day_idx").as("d0"), max("day_idx").as("d1"))
      .select(col("user_id"), explode(expr("sequence(d0, d1)")).as("day_idx"))
    spans.join(counts, Seq("user_id", "day_idx"), "left")
      .select(col("user_id"), col("day_idx"),
        coalesce(col("n"), lit(0L)).as("n_events"))
  }

  /** SCD-2-style state history: collapse each user's consecutive runs of
    * the same event_type into validity intervals
    * `(user_id, event_type, valid_from, valid_to)` — valid_to is the start
    * of the next run, null for the current (open) state. The classic
    * gaps-and-islands shape: two row_numbers per user assign a run id, one
    * aggregate collapses runs, one lead() closes the intervals.
    *
    * All three windows partition by user_id — one shuffle, reused across
    * the window stack; no global window anywhere. Ties broken by
    * (ts, event_id) so the history is total-ordered and reproducible.
    *
    * Under same-user ts collisions two runs can share a valid_from; the
    * earlier (lower-eid0) run's interval would be [T, T) — zero-width,
    * valid at no instant under the half-open containment rule. Those runs
    * are DROPPED (max-eid0 run per (user_id, valid_from) wins), which
    * makes the output genuinely unique per (user_id, valid_from) — the
    * precondition [[Joins.pointInTimeJoin]]/[[Joins.asOfJoin]] rely on, so
    * the as-of and interval-containment formulations of a point-in-time
    * lookup agree even on colliding-timestamp histories.
    */
  def stateHistory(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val byUserType = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    val runs = events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("run_id",
        row_number().over(byUser) - row_number().over(byUserType))
      .groupBy("user_id", "event_type", "run_id")
      // tie-break key for equal valid_from values (possible only under
      // same-user ts collisions): the run's min event_id — unique per run
      // and engine-neutral, unlike min_by/arg_min whose tie behavior isn't
      .agg(min("ts").as("valid_from"), min("event_id").as("eid0"))
    // zero-width-run removal: struct-max on (eid0, event_type) — eid0 is
    // unique across runs (min of disjoint event_id sets) so the
    // lexicographic max is deterministic, and the agg map-side combines
    val dedup = runs
      .groupBy("user_id", "valid_from")
      .agg(max(struct(col("eid0"), col("event_type"))).as("__m"))
      .select(col("user_id"), col("valid_from"),
        col("__m.eid0").as("eid0"), col("__m.event_type").as("event_type"))
    val order = Window.partitionBy("user_id").orderBy(col("valid_from"), col("eid0"))
    dedup
      .withColumn("valid_to", lead(col("valid_from"), 1).over(order))
      .select(col("user_id"), col("event_type"), col("valid_from"), col("valid_to"))
  }

  /** Retrigger dedup: drop events that re-fire within `gapSeconds` of the
    * previous event of the SAME (user, type) — the at-least-once-delivery /
    * double-click cleanup every event pipeline runs before analytics. An
    * event survives iff it STARTS a burst (no same-key predecessor within
    * the gap); a chain of rapid retriggers collapses to its first event.
    * One (user_id, event_type)-partitioned lag window — keyed shuffle,
    * bounded state, exact integer microsecond arithmetic; ties broken by
    * event_id so equal-timestamp duplicates dedup deterministically.
    * Output: (event_id, user_id, event_type, ts_us). */
  def dedupBursts(events: DataFrame, gapSeconds: Long = 3600): DataFrame = {
    require(gapSeconds >= 1)
    events
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("ts_us"))
      .withColumn("__prev", lag(col("ts_us"), 1).over(
        Window.partitionBy("user_id", "event_type").orderBy(col("ts_us"), col("event_id"))))
      .filter(col("__prev").isNull ||
        col("ts_us") - col("__prev") > lit(gapSeconds * 1000000L))
      .select("event_id", "user_id", "event_type", "ts_us")
  }

  /** Last-touch attribution: for every conversion event, the latest
    * STRICTLY-earlier non-conversion event of the same user — "which
    * touchpoint gets credit for this purchase". Earlier means earlier in
    * the per-user (ts, event_id) total order (the stateHistory tie
    * convention), so equal-timestamp rows attribute deterministically. One
    * user-partitioned window carrying the last non-conversion row as a
    * struct (`Joins.asOfJoin`'s carry trick — ts and type must come from
    * the SAME touch row); per-user state is one struct. First-session
    * conversions (no prior touch) keep nulls — they are real and a funnel
    * wants to see them. Output: (conv_event_id, user_id, touch_event_id,
    * touch_type, delay_us). */
  def lastTouchAttribution(events: DataFrame,
                           convType: String = "purchase"): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("ts_us"))
      .withColumn("__touch",
        last(when(col("event_type") =!= convType,
          struct(col("ts_us").as("t"), col("event_id").as("e"),
            col("event_type").as("y"))), ignoreNulls = true).over(w))
      .filter(col("event_type") === convType)
      .select(col("event_id").as("conv_event_id"), col("user_id"),
        col("__touch.e").as("touch_event_id"),
        col("__touch.y").as("touch_type"),
        (col("ts_us") - col("__touch.t")).as("delay_us"))
  }

  /** OHLC downsampling: open/high/low/close of the (integer-cents) value
    * per (event_type, fixed time bucket) — the time-series resample every
    * metrics store runs. ONE map-side-combined aggregate: open/close ride
    * lexicographic struct min/max over (ts_us, event_id, cents) — exact,
    * engine-neutral, deterministic under ts ties via event_id — so no
    * window, no second pass. Output: (event_type, bucket, open, high, low,
    * close, n_events). */
  def ohlcResample(events: DataFrame, bucketSeconds: Long = 21600): DataFrame = {
    require(bucketSeconds >= 1)
    val micros = bucketSeconds * 1000000L
    events
      .select(col("event_type"), col("event_id"),
        expr("unix_micros(ts)").as("ts_us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("bucket", expr(s"CAST(floor(ts_us / ${micros}.0) AS BIGINT)"))
      .groupBy("event_type", "bucket")
      .agg(
        min(struct(col("ts_us"), col("event_id"), col("cents")))
          .getField("cents").as("open"),
        max("cents").as("high"), min("cents").as("low"),
        max(struct(col("ts_us"), col("event_id"), col("cents")))
          .getField("cents").as("close"),
        count(lit(1)).as("n_events"))
  }

  /** Daily activity rollup: per calendar day, the event count, distinct
    * active users, users first seen that day, and the running total of
    * users acquired — the product-analytics daily dashboard in one query.
    *
    * Two user/day-keyed aggregates and one left join; the only window runs
    * over the PER-DAY rollup, whose cardinality is calendar-bounded (36.5k
    * rows per century regardless of event volume), so the single-partition
    * cumulative sum is a constant-size tail, not a scale risk (the
    * `Sampling.selectByTokenBudget` bounded-window argument; partitionBy
    * (lit) keeps WindowExec off its warning path). */
  def dailyActiveUsers(events: DataFrame, anchor: String = "2024-01-01"): DataFrame = {
    val e = events.select(col("user_id"), expr(dayIdxSql("ts", anchor)).as("d"))
    val daily = e.groupBy("d")
      .agg(count(lit(1)).as("n_events"), countDistinct("user_id").as("n_users"))
    val nu = e.groupBy("user_id").agg(min("d").as("d"))
      .groupBy("d").agg(count(lit(1)).as("n_new"))
    val w = Window.partitionBy(lit(1)).orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.join(nu, Seq("d"), "left")
      .withColumn("n_new_users", coalesce(col("n_new"), lit(0L)))
      .withColumn("cum_users", sum("n_new_users").over(w))
      .select(col("d").as("day_idx"), col("n_events"), col("n_users"),
        col("n_new_users"), col("cum_users"))
  }

  /** Robust per-type outlier audit via median absolute deviation — the
    * anomaly screen a metrics pipeline should run instead of z-scores
    * when the value distribution has heavy tails (the mean and stddev a
    * z-score leans on are themselves dragged by the outliers; the median
    * and MAD are 50%-breakdown robust). Per event type: the exact lower
    * median of cent values, the exact MAD, and how many rows sit more
    * than `madK` MADs from the median.
    *
    * Exactness: cents are integers, both medians are the value at rank
    * `(n+1) DIV 2` of a (value, event_id)-tie-broken total order (the
    * nearest-rank lower-median convention — rank arithmetic identical on
    * both engines), and the outlier rule `|cents − med| > madK·mad` is
    * pure integer comparison; the single double is one count division.
    *
    * Shape at scale: a handful of event types means per-type window
    * ranks would sort the whole stream in ≤|types| tasks (the q211
    * defect class), so both value-at-rank extractions ride
    * [[Ranks.distributedRank]] — two range exchanges over all cores, two
    * |types|-row broadcasts back, one final partial-aggregated rollup. */
  def madOutliers(events: DataFrame, madK: Int = 3): DataFrame = {
    require(madK >= 1, s"bad madK: $madK")
    val items = events.select(col("event_type").as("g"), col("event_id"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val nPer = items.groupBy("g").agg(count(lit(1)).as("n"))
    val med = Ranks.distributedRank(items, Seq("g"),
        Seq(col("cents"), col("event_id")), "rk")
      .join(broadcast(nPer), "g")
      .filter(col("rk") === expr("(n + 1) DIV 2"))
      .select(col("g"), col("cents").as("med_cents"))
    val dev = items.join(broadcast(med), "g")
      .withColumn("adev", abs(col("cents") - col("med_cents")))
    val mad = Ranks.distributedRank(dev, Seq("g"),
        Seq(col("adev"), col("event_id")), "rk")
      .join(broadcast(nPer), "g")
      .filter(col("rk") === expr("(n + 1) DIV 2"))
      .select(col("g"), col("adev").as("mad_cents"))
    dev.join(broadcast(mad), "g")
      .groupBy("g")
      .agg(count(lit(1)).as("n"), min("med_cents").as("med_cents"),
        min("mad_cents").as("mad_cents"),
        sum(when(col("adev") > col("mad_cents") * madK, 1L).otherwise(0L))
          .as("n_outliers"))
      .select(col("g").as("event_type"), col("n"), col("med_cents"),
        col("mad_cents"), col("n_outliers"),
        expr("round(CAST(n_outliers AS DOUBLE) / n, 6)").as("outlier_frac"))
      .orderBy("event_type")
  }

  /** Trimmed mean per event type — the robust location estimate between
    * the mean (0% breakdown) and the [[madOutliers]] median (50%): drop
    * the lowest and highest `trimNum/trimDen` fraction of values by rank
    * and average the interior. The standard way to publish a mean that a
    * few fat-finger rows can't drag.
    *
    * Exactness: integer cents, trim bounds `floor(n·p)` in pure rank
    * arithmetic over the (value, event_id)-tie-broken total order, the
    * interior sum an exact BIGINT, one division at the end. Shape at
    * scale: ranks via [[Ranks.distributedRank]] (the ≤|types|-task
    * window trap again), one |types|-row broadcast of the counts, one
    * partial-aggregated rollup. */
  def trimmedMean(events: DataFrame, trimNum: Int = 1,
                  trimDen: Int = 10): DataFrame = {
    require(trimNum >= 0 && trimDen > 0 && 2 * trimNum < trimDen,
      s"bad trim fraction: $trimNum/$trimDen")
    val items = events.select(col("event_type").as("g"), col("event_id"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val nPer = items.groupBy("g").agg(count(lit(1)).as("n"))
    Ranks.distributedRank(items, Seq("g"),
        Seq(col("cents"), col("event_id")), "rk")
      .join(broadcast(nPer), "g")
      .withColumn("cut", expr(s"n * $trimNum DIV $trimDen"))
      .filter(col("rk") > col("cut") && col("rk") <= col("n") - col("cut"))
      .groupBy("g")
      .agg(count(lit(1)).as("n_kept"), min("n").as("n"),
        sum("cents").as("kept_cents"))
      .select(col("g").as("event_type"), col("n"), col("n_kept"),
        expr("round(CAST(kept_cents AS DOUBLE) / n_kept, 6)")
          .as("trimmed_mean_cents"))
      .orderBy("event_type")
  }

  /** Gini concentration of spend per event type — the inequality audit
    * ("do 1% of users carry half the volume?") every usage pipeline
    * eventually needs: per type, the Gini coefficient of per-user cent
    * totals, G = (2·Σ rank·x − (n+1)·Σx) / (n·Σx) over users ranked
    * ascending by (total, user_id). 0 = perfectly even, →1 = one user
    * owns everything.
    *
    * Exactness: one partial-aggregated shuffle to a row per (type,
    * user), exact BIGINT rank/moment products (Σ rank·x ≤ n²·max_cents —
    * BIGINT headroom to ~10^6 users at ~$10k each per type; beyond that
    * the moments move to decimal, same plan), ranks via
    * [[Ranks.distributedRank]], one division per type. Zero-total types
    * have no defined concentration: NULL, not an ANSI divide error. */
  def giniConcentration(events: DataFrame): DataFrame = {
    val perUser = events
      .select(col("event_type").as("g"), col("user_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy("g", "user_id").agg(sum("cents").as("x"))
    Ranks.distributedRank(perUser, Seq("g"),
        Seq(col("x"), col("user_id")), "rk")
      .groupBy("g")
      .agg(count(lit(1)).as("n_users"), sum("x").as("total_cents"),
        sum(col("rk") * col("x")).as("rx"))
      .select(col("g").as("event_type"), col("n_users"), col("total_cents"),
        expr("""CASE WHEN total_cents = 0 THEN CAST(NULL AS DOUBLE)
          ELSE round(CAST(2 * rx - (n_users + 1) * total_cents AS DOUBLE)
            / (CAST(n_users AS DOUBLE) * total_cents), 6) END""").as("gini"))
      .orderBy("event_type")
  }

  /** First-order Markov transition counts and probabilities between
    * consecutive events per user: one lag window on the (ts, event_id)
    * total order, one (from, to) aggregate, row-marginal probabilities as
    * exact count ratios. The state-machine screening pass (what usually
    * follows a funnel: WHICH step transitions dominate?). */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val fromT = pairs.groupBy("from_type").agg(sum("n").as("n_from"))
    pairs.join(broadcast(fromT), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("round(CAST(n AS DOUBLE) / n_from, 6)").as("p"))
  }

  /** Markov steady-state behavior profile — power iteration of the
    * [[transitionMatrix]] from a uniform start: where a user's session
    * settles if the observed transition dynamics keep acting, the
    * one-vector summary that complements the raw matrix (and a drift
    * tripwire: the stationary vector moves before individual cells look
    * alarming).
    *
    * Determinism: transition probabilities fix at 2^20 by floor division
    * of exact counts; each iteration is p·P with integer products floored
    * back to 2^20 (Σ p_fx·t_fx DIV 2^20) — pure integer arithmetic, so
    * `iters` steps are bit-identical in any engine, and the known floor
    * leakage (mass can shrink slightly per step) is part of the defined
    * semantics rather than float noise.
    *
    * Shape: the matrix is |types|² rows; every iteration is one keyed
    * join + aggregate over that TINY frame (the events scan happens once
    * in the matrix build). Output: (event_type, p_fx, p) ordered by
    * type. */
  def markovStationary(events: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 16, s"bad iters: $iters")
    val m = transitionMatrix(events).select("from_type", "to_type", "n")
    val fromTotals = m.groupBy("from_type").agg(sum("n").as("n_from"))
    val t = m.join(broadcast(fromTotals), Seq("from_type"))
      .select(col("from_type"), col("to_type"),
        expr("CAST(n * 1048576 DIV n_from AS BIGINT)").as("t_fx"))
    // the state space is the union of sources and targets; a state with
    // no OUTGOING rows sheds its mass at the next step (the join finds no
    // distribution for it) — i.e. the iteration restricts to the
    // sub-chain that keeps moving, which is the profile this summarizes
    val states = t.select(col("from_type").as("s"))
      .union(t.select(col("to_type").as("s"))).distinct()
    val nStates = states // tiny frame; 1-row count broadcast
      .agg(count(lit(1)).as("k"))
    var p = states.join(broadcast(nStates))
      .select(col("s"), expr("CAST(1048576 DIV k AS BIGINT)").as("p_fx"))
    for (_ <- 1 to iters)
      p = p.join(t, p("s") === t("from_type"))
        .groupBy(col("to_type").as("s2"))
        .agg(sum(expr("p_fx * t_fx")).as("num"))
        .select(col("s2").as("s"), expr("CAST(num DIV 1048576 AS BIGINT)").as("p_fx"))
    p.select(col("s").as("event_type"), col("p_fx"),
        expr("round(CAST(p_fx AS DOUBLE) / 1048576.0, 6)").as("p"))
      .orderBy("event_type")
  }

  /** Top-k most frequent length-3 event-type paths (consecutive per user,
    * the product-analytics "common journeys" view). Two lags on one
    * user-keyed window, one path aggregate, a deterministic top-k cut. */
  def topPaths(events: DataFrame, k: Int = 10): DataFrame = {
    require(k >= 1)
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("t2", lead("event_type", 1).over(w))
      .withColumn("t3", lead("event_type", 2).over(w))
      .filter(col("t3").isNotNull)
      .groupBy(col("event_type").as("step1"), col("t2").as("step2"),
        col("t3").as("step3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("step1"), asc("step2"), asc("step3"))
      .limit(k)
  }

  /** Time-weighted average value per user (the TWAP shape): each
    * observation holds until the next one, so its weight is the micros
    * until the user's next event; the last observation of a user carries
    * no interval and is excluded (the standard right-open convention).
    * Both the weights (micros) and the values (cents) are exact integers;
    * the single closing division is one shared double expression, so the
    * result hash-checks. One user-keyed window + one user-keyed aggregate.
    *
    * Overflow bound (the zscoreOutliers contract style): sum(cents x
    * dt_us) <= max_cents x user_span_us, so a long holds while
    * max_value_dollars x span_years < ~3,200 (e.g. $1000 values over a
    * 3-year horizon). Past that, coarsen the weight unit (dt_us DIV 1000
    * on BOTH engines), not the value scale. */
  def timeWeightedAvg(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("next_us", lead(expr("unix_micros(ts)"), 1).over(w))
      .withColumn("dt_us", expr("next_us - unix_micros(ts)"))
      .filter(col("dt_us").isNotNull)
      .groupBy("user_id")
      .agg(sum(expr("cents * dt_us")).as("s"), sum("dt_us").as("d"),
        count(lit(1)).as("n_intervals"))
      .select(col("user_id"), col("n_intervals"),
        expr("round((CAST(s AS DOUBLE) / d) / 100.0, 6)").as("twap"))
  }

  /** Per-user EWMA of daily spend with decay 1/2 (half-life one day) over
    * the user's most recent `maxDays` active days. Decay 1/2 is the trick:
    * the weight ladder 2^0..2^(maxDays-1) is exact in int64 (cents <= ~1e7
    * x 2^31 < 2^63, and < 2^53 so the final division is double-exact), so
    * the whole smoothing collapses to ONE integer weighted sum per user —
    * no running recurrence, no float accumulation order to disagree on,
    * hash-exact across engines. Truncation at `maxDays` is principled, not
    * a dodge: a day beyond 32 half-lives contributes < 2^-32 of its value,
    * below the 6-dp boundary rounding.
    *
    * Shape at scale: daily rollup = one user/day partial-aggregated
    * shuffle; recency rank = user-keyed window over <= calendar-days rows
    * per user; final sum = one more user-keyed aggregate AQE coalesces
    * onto the same exchange. Output: (user_id, n_days, ewma_cents). */
  def ewmaDailySpend(events: DataFrame, maxDays: Int = 32): DataFrame = {
    require(maxDays >= 1 && maxDays <= 32, "weight ladder must fit int64/2^53")
    val daily = events
      .select(col("user_id"), expr(dayIdxSql("ts", "2024-01-01")).as("d"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy("user_id", "d").agg(sum("cents").as("day_cents"))
    val w = Window.partitionBy("user_id").orderBy(desc("d"))
    daily
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= maxDays)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_days"),
        sum(expr(s"day_cents * CAST(pow(2, $maxDays - rn) AS BIGINT)")).as("s"),
        max(expr(s"CAST(pow(2, $maxDays - rn) AS BIGINT)")).as("top_w"))
      .select(col("user_id"), col("n_days"),
        expr("round(CAST(s AS DOUBLE) / top_w / 100.0, 6)").as("ewma"))
  }

  /** Semi-structured property extraction: pull a typed field out of the
    * `props` JSON column and aggregate it per event_type — the
    * warehouse-side of event instrumentation where payloads arrive as JSON
    * strings. Extraction is `get_json_object` (codegen'd, map-only); the
    * rollup is one partial-aggregated shuffle over event_type. All outputs
    * integer except the single rounded average. Output per event_type:
    * (n, n_with_k, sum_k, n_distinct_k, avg_k). */
  def jsonPropsRollup(events: DataFrame, field: String = "k"): DataFrame =
    events
      .select(col("event_type"),
        expr(s"CAST(get_json_object(props, '$$.$field') AS BIGINT)").as("kv"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        count(col("kv")).as("n_with_k"),
        coalesce(sum("kv"), lit(0L)).as("sum_k"),
        countDistinct(col("kv")).as("n_distinct_k"),
        expr("round(CASE WHEN count(kv) = 0 THEN NULL ELSE CAST(sum(kv) AS DOUBLE) / count(kv) END, 6)")
          .as("avg_k"))

  /** Seasonal (day-of-week) anomaly detection on daily volumes: a Monday
    * is judged against OTHER MONDAYS, not the whole series — the
    * decomposition that keeps weekly rhythm out of the anomaly channel.
    * Day-of-week is dayIdx mod 7 (days since the anchor — engine-neutral
    * where dayofweek() origins differ). Baselines are exact integer
    * moments of the per-(type, day) cent totals grouped by (type, dow);
    * the z computation is the `zscoreOutliers` expression over them.
    * Shapes: one (type, day) rollup, one tiny (type, dow) aggregate
    * broadcast back, map-only flagging. Output (|z| > threshold rows):
    * (event_type, d, dow, day_cents, z). */
  def dowAnomalies(events: DataFrame, threshold: Double = 1.5,
                   anchor: String = "2024-01-01"): DataFrame = {
    // |z| against n same-dow samples is bounded by sqrt(n-1): a month of
    // data gives n ~ 4-5 per weekday, so a 2.0 default would be unreachable
    require(threshold > 0)
    val daily = PlanCache.memo(events
      .select(col("event_type"), expr(dayIdxSql("ts", anchor)).as("d"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy("event_type", "d").agg(sum("cents").as("day_cents"))
      .withColumn("dow", expr("((d % 7) + 7) % 7")))
    val base = daily.groupBy("event_type", "dow")
      .agg(count(lit(1)).as("n"), sum("day_cents").as("s"),
        sum(expr("day_cents * day_cents")).as("ssq"))
    daily.join(broadcast(base), Seq("event_type", "dow"))
      .withColumn("sd", expr(
        "sqrt((CAST(ssq AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / n)"))
      .withColumn("z", expr(
        """CASE WHEN sd <= 0.0 OR isnan(sd) THEN CAST(NULL AS DOUBLE)
          | ELSE round((CAST(day_cents AS DOUBLE) - CAST(s AS DOUBLE) / n) / sd, 6) END""".stripMargin))
      .filter(abs(col("z")) > threshold)
      .select(col("event_type"), col("d"), col("dow"), col("day_cents"), col("z"))
  }

  /** Two-sample Kolmogorov-Smirnov drift statistic per event_type: the max
    * ECDF gap between values observed before vs on-or-after `splitDate` —
    * the continuous-distribution complement of the chi-squared test (q118)
    * for detecting that a metric's distribution moved between two eras.
    *
    * Exactness: at every distinct value the ECDF gap `|F1(v) - F2(v)|` is
    * kept as the integer `|cum1*n2 - cum2*n1|` (common denominator n1*n2),
    * so the max is an exact BIGINT and the one double division happens once
    * per group at the boundary. Calendar split (not median-rank split) so
    * side labeling is map-only — no global rank shuffle.
    *
    * Shape at scale: one (type, value)-keyed partial-aggregated shuffle
    * collapses the row count to distinct values, then the running ECDF is
    * one window prefix-sum per type. The per-type sort is inherent to an
    * exact KS; at the 100 TB regime swap the exact tail for the same gap
    * computed over DDSketch CDFs (q173's buckets are already a mergeable
    * ECDF grid) and this operator becomes fully partial-aggregable. */
  def ksDrift(events: DataFrame, splitDate: String = "2024-01-16",
              typeCol: String = "event_type", valueCol: String = "value"): DataFrame =
    ksDriftFromCounts(ksValueCounts(events, splitDate, typeCol, valueCol))

  /** The mergeable state behind [[ksDrift]]: per-(type, value) counts on
    * each side of the split — additive integers, so per-batch partials
    * fold by plain summation (the streaming maintenance form). */
  def ksValueCounts(events: DataFrame, splitDate: String = "2024-01-16",
                    typeCol: String = "event_type", valueCol: String = "value"): DataFrame =
    events
      .select(col(typeCol).as("event_type"), col(valueCol).as("v"),
        when(col("ts") < lit(splitDate).cast("timestamp"), 1L).otherwise(0L).as("h1"))
      .groupBy("event_type", "v")
      .agg(sum("h1").as("c1"), sum(expr("1 - h1")).as("c2"))

  /** Fold (event_type, v, c1, c2) counts into the KS statistic — the ECDF
    * prefix-sum + max-gap tail of [[ksDrift]]. */
  def ksDriftFromCounts(byValue: DataFrame): DataFrame = {
    val totals = byValue.groupBy("event_type")
      .agg(sum("c1").as("n1"), sum("c2").as("n2"))
    val w = Window.partitionBy("event_type").orderBy("v")
    byValue
      .withColumn("cum1", sum("c1").over(w))
      .withColumn("cum2", sum("c2").over(w))
      .join(broadcast(totals), Seq("event_type"))
      .groupBy("event_type", "n1", "n2")
      .agg(max(abs(col("cum1") * col("n2") - col("cum2") * col("n1"))).as("ks_num"))
      .withColumn("ks", expr("round(CAST(ks_num AS DOUBLE) / (n1 * n2), 6)"))
      .select("event_type", "n1", "n2", "ks_num", "ks")
  }

  /** PSI (population stability index) drift per event type across a
    * calendar split — the production-ML drift metric that complements
    * [[ksDrift]]: KS reports the worst single ECDF gap, PSI integrates
    * distribution movement over BANDS (Σ (p₁−p₂)·ln(p₁/p₂)), the number
    * monitoring dashboards alert on (>0.1 drifting, >0.25 action).
    *
    * Determinism recipe: values band at `bandCents` granularity; band
    * counts are exact integers; probabilities are Laplace-smoothed
    * rationals over the OBSERVED band union ((c+1)/(n+B) — zero-band
    * terms stay finite with no epsilon magic number); each band's term is
    * one double expression over exact integers re-fixed at 2^20 BEFORE
    * the sum (the fixed-before-sum rule), so the PSI is
    * partition-order-invariant and engine-portable.
    *
    * One partial-aggregated shuffle to the (type, band) frame, a
    * per-type totals broadcast back, a tiny rollup. Output: (event_type,
    * n1, n2, n_bands, psi) ordered by type. */
  def psiDrift(events: DataFrame, splitDate: String = "2024-01-16",
               bandCents: Long = 500L): DataFrame =
    psiFromValueCounts(ksValueCounts(events, splitDate), bandCents)

  /** PSI fold over a (event_type, v, c1, c2) per-VALUE count frame — the
    * same maintained state [[ksDriftFromCounts]] folds (the band is a
    * pure function of the stored value), so ONE incrementally-maintained
    * table answers BOTH drift statistics: KS from the value-ordered
    * prefix sums, PSI from the band regrouping. This is the point of
    * keeping drift state at value granularity rather than pre-banded. */
  def psiFromValueCounts(byValue: DataFrame,
                         bandCents: Long = 500L): DataFrame = {
    require(bandCents >= 1, s"bad band width: $bandCents")
    val bands = byValue
      .select(col("event_type"),
        expr(s"CAST(round(v * 100) AS BIGINT) DIV $bandCents").as("band"),
        col("c1"), col("c2"))
      .groupBy("event_type", "band")
      .agg(sum("c1").as("c1"), sum("c2").as("c2"))
    val totals = bands.groupBy("event_type")
      .agg(sum("c1").as("n1"), sum("c2").as("n2"),
        count(lit(1)).as("n_bands"))
    bands.join(broadcast(totals), Seq("event_type"))
      .withColumn("term_fx", expr(
        """CAST(floor(
             (CAST(c1 + 1 AS DOUBLE) / (n1 + n_bands)
              - CAST(c2 + 1 AS DOUBLE) / (n2 + n_bands))
             * ln(CAST(c1 + 1 AS DOUBLE) * (n2 + n_bands)
                  / (CAST(c2 + 1 AS DOUBLE) * (n1 + n_bands)))
             * 1048576.0 + 0.5) AS BIGINT)"""))
      .groupBy("event_type", "n1", "n2", "n_bands")
      .agg(sum("term_fx").as("psi_fx"))
      .select(col("event_type"), col("n1"), col("n2"), col("n_bands"),
        expr("round(CAST(psi_fx AS DOUBLE) / 1048576.0, 6)").as("psi"))
      .orderBy("event_type")
  }

  /** Per-group z-score outliers: events whose value sits more than
    * `threshold` population standard deviations from their event_type's
    * mean. Moments are exact integer sums of 2^10-fixed-point values (value
    * <= ~1e3 and 100k rows/group keeps sumsq < 2^55 — no overflow), so the
    * one double expression computing z sees identical inputs on every
    * engine and partitioning; z is rounded to 6 dp at the boundary.
    *
    * One partial-aggregated shuffle over event_type for the moments (a
    * handful of rows — broadcast back), then a map-only flagging pass.
    */
  def zscoreOutliers(events: DataFrame, threshold: Double = 2.0): DataFrame = {
    val fixed = events.select(col("event_id"), col("event_type"),
      expr("CAST(floor(value * 1024.0 + 0.5) AS BIGINT)").as("fx"))
    val moments = fixed.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("fx").as("s"),
        sum(expr("fx * fx")).as("ssq"))
    fixed.join(broadcast(moments), Seq("event_type"))
      // zero-variance groups have no outliers by definition; the explicit
      // guard also keeps ANSI mode from raising DIVIDE_BY_ZERO on them
      .withColumn("sd", expr(
        "sqrt((CAST(ssq AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / n)"))
      .withColumn("z", expr(
        """CASE WHEN sd <= 0.0 OR isnan(sd) THEN CAST(NULL AS DOUBLE)
          | ELSE round((CAST(fx AS DOUBLE) - CAST(s AS DOUBLE) / n) / sd, 6) END""".stripMargin))
      .filter(abs(col("z")) > threshold)
      .select(col("event_id"), col("event_type"), col("z"))
  }

  /** Benford first-digit audit per event type — the fraud/synthetic-data
    * smell test: compare the first-digit distribution of positive cent
    * values against Benford's log10(1+1/d) law with a χ² statistic.
    *
    * Determinism: digit counts are exact integers; the nine Benford
    * probabilities are 2^10 fixed-point constants (same ln expression both
    * engines); each digit's χ² term is computed by one double expression
    * and re-fixed at 2^20 before the sum, so the 9-term summation order
    * cannot flip bits. One shuffle to (type, digit), a 9-row-per-type
    * rollup after. Output: (event_type, n, chi2) ordered by type. */
  def benfordAudit(events: DataFrame): DataFrame =
    benfordFromCounts(benfordDigitCounts(events))

  /** The audit's maintained state: exact (event_type, d, o) first-digit
    * counts. ADDITIVE across event batches — counts of disjoint slices
    * merge by per-(type, digit) sum — which is what
    * `Streams.streamingBenfordDigits` maintains incrementally. First
    * digit of a positive integer via string head (exact, no log). */
  def benfordDigitCounts(events: DataFrame): DataFrame = events
    .select(col("event_type"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    .filter(col("cents") > 0)
    .withColumn("d", expr("CAST(substring(CAST(cents AS STRING), 1, 1) AS INT)"))
    .groupBy("event_type", "d").agg(count(lit(1)).as("o"))

  /** χ² fold over a (event_type, d, o) digit-count frame — the
    * state-to-answer half of [[benfordAudit]]: n re-derives as Σo per
    * type (the counts are a partition of the positive rows), the 9-digit
    * grid rebuilds absent digits at o = 0, and each digit's term is
    * re-fixed at 2^20 before the sum exactly as in the one-shot form. */
  def benfordFromCounts(counts: DataFrame): DataFrame = {
    val n = counts.groupBy("event_type").agg(sum("o").as("n"))
    // all 9 digits per type, absent digits at o = 0 (they still contribute)
    val grid = n.select(col("event_type"), col("n"),
      explode(expr("sequence(1, 9)")).as("d"))
    val pFx = "CAST(floor(ln(1.0 + 1.0 / d) / ln(10.0) * 1024.0 + 0.5) AS BIGINT)"
    grid.join(counts, Seq("event_type", "d"), "left")
      .na.fill(0L, Seq("o"))
      .withColumn("term_fx", expr(
        s"""CAST(floor(
             CAST((o * 1024 - n * $pFx) AS DOUBLE) * (o * 1024 - n * $pFx)
             / (CAST(n AS DOUBLE) * $pFx * 1024.0)
             * 1048576.0 + 0.5) AS BIGINT)"""))
      .groupBy("event_type")
      .agg(max("n").as("n"),
        expr("round(CAST(sum(term_fx) AS DOUBLE) / 1048576.0, 6)").as("chi2"))
      .orderBy("event_type")
  }

  /** Exact daily p50/p90/p99 bands per event type — the latency/spend
    * dashboard cut, nearest-rank definition (value at rank ⌈p·n⌉, all
    * ranks from pure integer arithmetic: (n+1)÷2, (9n+9)÷10,
    * (99n+99)÷100) so both engines select the identical cent value with
    * no interpolation or float percentile semantics.
    *
    * Shape at scale: one shuffle clusters (day, type) groups; the rank
    * window runs inside each group (a day×type of one event type — small
    * and naturally bounded), and the band extraction is a conditional agg
    * over the same pass. Output ordered (day, event_type). */
  def dailyPercentileBands(events: DataFrame): DataFrame = {
    val base = events.select(
      date_format(col("ts"), "yyyy-MM-dd").as("day"),
      col("event_type"), col("event_id"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val w = Window.partitionBy("day", "event_type")
    val ranked = base
      .withColumn("rn", row_number().over(
        w.orderBy(asc("cents"), asc("event_id"))).cast("long"))
      .withColumn("n", count(lit(1)).over(w))
    ranked.groupBy("day", "event_type")
      .agg(max("n").as("n"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("cents"))).as("p50_cents"),
        max(when(col("rn") === expr("(9 * n + 9) div 10"), col("cents"))).as("p90_cents"),
        max(when(col("rn") === expr("(99 * n + 99) div 100"), col("cents"))).as("p99_cents"))
      .orderBy("day", "event_type")
  }

  /** Deterministic POISSON-bootstrap confidence interval for the mean
    * `value` per event type — the uncertainty band a metrics pipeline
    * should publish next to every mean, computed WITHOUT distributional
    * assumptions. Instead of materializing `b` multinomial resamples
    * (which needs a global per-group position index and a draw→item
    * join), each row independently draws a Poisson(1) replication weight
    * per replica — the standard massive-data bootstrap (Chamandy et al.,
    * "Estimating uncertainty for massive data streams", Google 2012):
    * as n→∞ the multinomial(n, 1/n) per-item count converges to
    * Poisson(1), so the replica statistic distribution is the same, but
    * the computation becomes embarrassingly parallel — NO join, NO rank,
    * no per-group state; one map pass plus one (group, replica)
    * aggregate whose partial-combine collapses to b rows per group per
    * partition before the (only) shuffle.
    *
    * The replica statistic is the WEIGHTED MEAN Σw·x / Σw (not sum/n):
    * that is the ratio form Poisson bootstrap requires — replica "size"
    * Σw varies, and the ratio both corrects for it and keeps the
    * degenerate-group property (a constant-valued group's every replica
    * mean equals the group mean exactly, so its CI collapses to the
    * mean). The CI is the [loRank, hiRank] order statistics of the b
    * replica means (defaults 3rd/38th of 40 ≈ a 90% percentile
    * interval).
    *
    * Deterministic end to end: the weights are inverse-CDF Poisson(1) on
    * 16-bit uniforms — exact integer thresholds floor(cdf·2^16), tail
    * truncated at w=8 (mass 2^-16, absorbed into the w=8 bucket; Monte
    * Carlo error from b=40 replicas dwarfs the quantization) — and each
    * replica mean is ONE IEEE division of two exact integer sums
    * (cents·w and w), so both engines order identical doubles. The Σw=0
    * replica (probability e^-n, only reachable for tiny groups)
    * deterministically falls back to the group mean. The only window
    * runs over the b-rows-per-group replica frame — bounded by the `b`
    * parameter, not the corpus.
    *
    * Hashing is per ITEM, not per (item, replica): 3 sha256 digests per
    * row yield 48 independent 16-bit uniforms (4 hex chars each), the
    * per-replica work after the 40× explode is a substr+conv — 13x less
    * hashing than a hash-per-draw formulation. The scan is
    * [[TextAnalysis.spreadForCompute]]-spread first: the 40× fan-out is
    * CPU-bound, and a small-file scan would otherwise run it on one
    * task (a no-op at 100 TB where the scan is already thousands of
    * splits). */
  /** [[bootstrapCi]]'s draw scheme, split out so the golden spec can pin
    * individual (g, event_id, r) → weight draws against hand-computed
    * values (the r13 regression was an engine/oracle draw divergence; any
    * future change to this scheme must break that spec and force a
    * matching oracle rewrite — `SparkEntry.oracleSql("q211_bootstrap_ci")`
    * mirrors these expressions token for token). Input: (g, event_id,
    * cents); output: one row per (input row × replica 1..b) carrying the
    * Poisson(1) weight `w`. Per-ITEM digest = 3 concatenated
    * sha256('pb:'||g||':{0,1,2}:'||id) hex strings; replica r's uniform =
    * the 4 hex chars at offset (r-1)·4 parsed base-16; thresholds are
    * floor(2^16 · P(Poisson(1) <= k)) for k = 0..7, u >= all → w = 8. */
  private[graft] def poissonDraws(items: DataFrame, b: Int): DataFrame =
    items
      .withColumn("dg", expr(
        """concat(
           sha2(concat('pb:', g, ':0:', CAST(event_id AS STRING)), 256),
           sha2(concat('pb:', g, ':1:', CAST(event_id AS STRING)), 256),
           sha2(concat('pb:', g, ':2:', CAST(event_id AS STRING)), 256))"""))
      .select(col("g"), col("event_id"), col("cents"), col("dg"),
        explode(expr(s"sequence(1, $b)")).as("r"))
      .withColumn("u",
        expr("cast(conv(substr(dg, (r - 1) * 4 + 1, 4), 16, 10) AS BIGINT)"))
      .withColumn("w", expr(
        """CAST(CASE WHEN u < 24109 THEN 0
                WHEN u < 48218 THEN 1
                WHEN u < 60273 THEN 2
                WHEN u < 64291 THEN 3
                WHEN u < 65296 THEN 4
                WHEN u < 65497 THEN 5
                WHEN u < 65530 THEN 6
                WHEN u < 65535 THEN 7
                ELSE 8 END AS BIGINT)"""))

  def bootstrapCi(events: DataFrame, b: Int = 40, loRank: Int = 3,
                  hiRank: Int = 38): DataFrame = {
    require(b >= 2 && b <= 48 && loRank >= 1 && hiRank <= b && loRank < hiRank,
      s"bad bootstrap params b=$b lo=$loRank hi=$hiRank")
    val items = TextAnalysis.spreadForCompute(
      events.select(col("event_type").as("g"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents")))
    val n = items.groupBy("g")
      .agg(count(lit(1)).as("n"), sum("cents").as("total"))
    val sums = poissonDraws(items, b)
      .groupBy("g", "r")
      .agg(sum(expr("w * cents")).as("s"), sum("w").as("wsum"))
    // n is one row per event TYPE — a closed categorical frame (bounded
    // independent of corpus growth), so the broadcast survives 100 TB
    val ranked = sums.join(broadcast(n), "g")
      .withColumn("m", when(col("wsum") > 0,
          col("s").cast("double") / col("wsum").cast("double"))
        .otherwise(col("total").cast("double") / col("n").cast("double")))
      .withColumn("k",
        row_number().over(Window.partitionBy("g").orderBy(asc("m"), asc("r"))))
    val lo = ranked.filter(col("k") === loRank).select(col("g"), col("m").as("m_lo"))
    val hi = ranked.filter(col("k") === hiRank).select(col("g"), col("m").as("m_hi"))
    n.join(broadcast(lo), "g").join(broadcast(hi), "g")
      .select(col("g").as("event_type"), col("n"),
        expr("round(CAST(total AS DOUBLE) / n, 6)").as("mean_cents"),
        expr("round(m_lo, 6)").as("ci_lo"),
        expr("round(m_hi, 6)").as("ci_hi"))
      .orderBy("event_type")
  }

  /** RFM (recency / frequency / monetary) customer segmentation over the
    * purchase stream — the standard CRM cut: quartile each user on how
    * recently they bought, how often, and how much, and concatenate the
    * three quartile digits into a segment code ("444" = best).
    *
    * Exactness: recency in whole days from the stream's max purchase ts
    * (integer date_diff), monetary in cents (integer), quartiles via
    * `ntile(4)` with a (metric, user_id) tie-break so both engines assign
    * identical buckets (ntile's floor-distribution is SQL-standard).
    *
    * Shape at scale: one partial-aggregated shuffle collapses the event
    * stream to a row per USER before any ranking; each quartile is then
    * [[Ranks.globalNtile]] over the distinct-user frame — a range
    * exchange + local ranks + an nPartitions-row offsets broadcast, never
    * a SinglePartition WindowExec (a global `ntile` window would sort
    * hundreds of millions of users in ONE task at 100 TB). The max-ts
    * anchor is a 1-row broadcast, not a driver-side collect. */
  def rfmSegments(events: DataFrame): DataFrame =
    rfmFromUserStats(rfmUserStats(events))

  /** The mergeable per-user state behind [[rfmSegments]]: last purchase ts
    * (max-mergeable), purchase count and cent sum (additive) — split out
    * so the streaming maintainer can write it as epoch partials and fold
    * by max/sum. */
  def rfmUserStats(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy("user_id")
      .agg(max("ts").as("last_ts"), count(lit(1)).as("frequency"),
        sum("cents").as("monetary_cents"))

  /** [[rfmSegments]]' quartile assembly over a pre-aggregated
    * (user_id, last_ts, frequency, monetary_cents) table. */
  def rfmFromUserStats(perUser: DataFrame): DataFrame = {
    val anchor = perUser.agg(max("last_ts").as("anchor_ts"))
    // memoized: three quartile rankings and their count each re-read this
    // frame — one materialization instead of five upstream re-evaluations
    val scored = PlanCache.memo(perUser.join(broadcast(anchor))
      .withColumn("recency_days",
        expr("CAST(datediff(anchor_ts, last_ts) AS BIGINT)")))
    // smaller recency = better, so rank it DESC to make quartile 4 best on
    // all three axes; each ntile is the distributed form (bit-identical to
    // `ntile(4)` under the user_id tie-break)
    def q(order: Seq[Column], out: String) =
      Ranks.globalNtile(scored, order, 4, out)
        .select(col("user_id"), col(out))
    val r = q(Seq(desc("recency_days"), asc("user_id")), "r_q")
    val f = q(Seq(asc("frequency"), asc("user_id")), "f_q")
    val m = q(Seq(asc("monetary_cents"), asc("user_id")), "m_q")
    scored
      .select("user_id", "recency_days", "frequency", "monetary_cents")
      .join(r.hint("SHUFFLE_HASH"), "user_id")
      .join(f.hint("SHUFFLE_HASH"), "user_id")
      .join(m.hint("SHUFFLE_HASH"), "user_id")
      .withColumn("segment", concat(col("r_q"), col("f_q"), col("m_q")))
      .orderBy("user_id")
  }
}
