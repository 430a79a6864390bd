package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project, Window => LogicalWindow}
import org.apache.spark.sql.execution.{CollectLimitExec, FileSourceScanExec, GlobalLimitExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec}

/** Dev harness: audit every SparkEntry query's executed plan for the
  * operators that do not survive scale (SortMergeJoin where a broadcast or
  * banded shape was intended, CartesianProduct anywhere, WindowExec in an
  * ANN ranking path, any GLOBAL window — empty partition spec, planned
  * as a SinglePartition WindowExec — outside the documented
  * constant-bounded frames, and any BroadcastExchange whose build side is
  * SF-PROPORTIONAL — scans a TPC-H fact/dim table without a structural
  * bound, the round-11 lesson: q194/q205/q214/q250 shipped full part/
  * supplier projections through the driver because nothing priced the
  * broadcast). Prints one line per query; non-empty findings exit 1.
  * Usage: sbt "runMain graft.tools.PlanAudit [sfDir]"
  */
object PlanAudit {
  /** Queries whose ranking runs over the CORPUS (ANN probes, search top-k,
    * grouped rankers): a WindowExec there means the full input shuffled to
    * its partition and sorted — the exact plan GroupedTopK/
    * TakeOrderedAndProject exist to avoid. Excluded by design: rankers over
    * already-k-limited rows (q06/q51/q60/q70/q71's post-limit row_number
    * sits ABOVE a TakeOrderedAndProject(limit=k), so the window input is k
    * rows — documented in hybridSearch/searchRanked) and the
    * window-function operators themselves (q14/q85/q115 etc., where the
    * window IS the semantics). */
  val annRankPaths: Set[String] = Set(
    "q23_ann_topk", "q29_ann_lsh", "q30_ann_ivf",
    "q31_ann_topk_custom", "q32_search_batch", "q44_ann_rp", "q45_rp_pairs",
    "q46_ann_sq8", "q56_ann_bq", "q57_hybrid_batch", "q58_sq8_upsert",
    "q59_bq_upsert", "q62_range_search",
    "q66_search_page", "q67_ann_rp_sq8", "q69_det_ivf", "q72_top_tokens",
    "q75_recommend", "q76_ann_pq", "q80_ann_ivfpq", "q90_ann_ivfpq_res",
    "q100_class_topics", "q103_weighted_sample", "q116_ann_multiprobe",
    "q128_class_sample", "q133_hard_negatives")

  /** Queries whose plan legitimately contains GLOBAL window(s) — with no
    * partition spec — because the windowed frame is CONSTANT-bounded
    * (by an operator parameter or the problem structure), never
    * corpus-proportional. Every entry names its bound AND the maximum
    * number of such windows it is allowed (the round-11 advisor note:
    * a blanket skip would let a future corpus-proportional global window
    * ride an allowlisted query silently — the audit now tolerates only
    * the documented count and flags any extra). An unlisted global window
    * fails the audit (the round-10 lesson: q204/q216/q199 shipped
    * SinglePartition sorts over per-user / per-row frames precisely
    * because nothing flagged the class). */
  val boundedGlobalWindowPaths: Map[String, (Int, String)] = Map(
    // post-limit rankers: the window input sits ABOVE a
    // TakeOrderedAndProject(limit=k), so the frame is k rows by plan
    // construction (documented on hybridSearch/searchRanked)
    "q06_search" -> (1, "k rows above TakeOrderedAndProject"),
    "q51_hybrid_rrf" -> (2, "two k-row arms above TakeOrderedAndProject"),
    "q60_filtered_search" -> (1, "k rows above TakeOrderedAndProject"),
    "q71_snippets" -> (1, "k rows above TakeOrderedAndProject"),
    // per-day rollup: calendar-bounded (36.5k rows/century) regardless of
    // event volume — dailyActiveUsers' cumulative acquisition sum
    "q106_daily_active" -> (1, "per-day frame, calendar-bounded"),
    // water-filling allocation: every window runs over the one-row-per-
    // LANGUAGE aggregate (the assignCells tiny-table contract); the
    // optimizer replicates the frame across the allocation's fixed
    // passes, so up to 10 such windows appear — all |languages|-bounded
    "q191_unimax" -> (10, "per-language frames, |languages|-bounded"),
    // cumulative gain over the per-DECILE rollup: `buckets` rows by
    // construction (parameter-bounded, require()d <= 1000)
    "q216_lift" -> (1, "per-decile frame, buckets-bounded"),
    // funnel conversion frame: one row per funnel STEP
    "q226_windowed_funnel" -> (1, "per-step frame, |steps|-bounded"))

  /** The global-window findings for one optimized logical plan: every
    * Window with an EMPTY partition spec — Spark plans it as a
    * SinglePartition WindowExec, shuffling the whole frame into one task —
    * except the distributed-rank OFFSETS shape: ordered by the `__pid`
    * range-partition id AND fed by an aggregate GROUPED on `__pid`
    * (≤ nPartitions rows by construction: `Ranks.exclusivePrefixSum`,
    * `TableStats.exactQuantiles`, `Sampling.selectByTokenBudget`). The
    * aggregate requirement is load-bearing (round-11 advisor note): a
    * window that merely SORTS a corpus-proportional frame by a column
    * someone happened to call __pid is not the offsets shape and fails. */
  def globalWindowFindings(plan: LogicalPlan): Seq[String] = {
    def stripProjects(p: LogicalPlan): LogicalPlan = p match {
      case proj: Project => stripProjects(proj.child)
      case other => other
    }
    def pidOffsetsShape(w: LogicalWindow): Boolean =
      w.orderSpec.exists(_.references.exists(_.name == "__pid")) &&
        (stripProjects(w.child) match {
          case a: Aggregate =>
            a.groupingExpressions.exists(_.references.exists(_.name == "__pid"))
          case _ => false
        })
    plan.collect {
      case w: LogicalWindow if w.partitionSpec.isEmpty && !pidOffsetsShape(w) =>
        s"SinglePartition-Window[order=${
          w.orderSpec.map(_.child.sql).mkString(",")}]"
    }
  }

  /** Tables whose row count is PROPORTIONAL to the scale factor — a
    * BroadcastExchange built from one of these (without a structural
    * bound) ships O(SF) bytes through the driver to every executor: fine
    * at sf0.1, fatal at the 100 TB operating point (part ~26 B rows,
    * supplier ~1.3 B at SF 1e5). nation (25) and region (5) are
    * spec-constant and exempt. */
  val sfProportionalTables: Set[String] =
    Set("lineitem", "orders", "customer", "part", "supplier", "partsupp")

  /** Broadcasts over SF-proportional scans that are legitimately bounded
    * for reasons the structural rule cannot see, keyed by query name →
    * (max allowed count, the bound). Entries must name their bound like
    * boundedGlobalWindowPaths; the structural rule (1-row global
    * aggregate or explicit limit below the exchange) covers every other
    * bounded frame in the tree. */
  val boundedBroadcastPaths: Map[String, (Int, String)] = Map(
    // CMS join-size estimate: the broadcast frame is the (j, cell) grid —
    // a GROUPED aggregate over orders, but its key domain is the sketch
    // shape d·w ≤ 8·65536 cells (require()d), parameter-bounded at any SF
    "q222_join_size_est" -> (1, "CMS grid, d*w <= 256k cells by require()"))

  /** Flatten an executed plan INCLUDING adaptive stage bodies: after AQE,
    * materialized stages appear as leaf QueryStageExec wrappers whose
    * `plan` holds the real subtree, and reused exchanges hide theirs
    * behind ReusedExchangeExec — a naive `collect` sees neither. */
  def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
    case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
    case q: QueryStageExec => flatten(q.plan)
    case r: ReusedExchangeExec => flatten(r.child)
    case _ => p.children.flatMap(flatten)
  })

  /** A broadcast subtree is structurally bounded when something below the
    * exchange caps its rows independent of input size: a GLOBAL aggregate
    * (empty grouping → exactly 1 row: the avg/max/total scalar frames) or
    * an explicit limit (TakeOrderedAndProject / GlobalLimit /
    * CollectLimit → ≤ k rows). Grouped aggregates do NOT count — their
    * cardinality is the key domain, which usually grows with the corpus. */
  def structurallyBounded(subtree: Seq[SparkPlan]): Boolean =
    subtree.exists {
      case h: HashAggregateExec => h.groupingExpressions.isEmpty
      case o: ObjectHashAggregateExec => o.groupingExpressions.isEmpty
      case s: SortAggregateExec => s.groupingExpressions.isEmpty
      case _: TakeOrderedAndProjectExec | _: GlobalLimitExec |
           _: CollectLimitExec => true
      case _ => false
    }

  /** Every unbounded BroadcastExchange over an SF-proportional table in
    * one EXECUTED plan (run it first — with AQE the final plan is the
    * one that matters, and an AQE-decided broadcast of a genuinely tiny
    * runtime frame still fails here if its scan is SF-proportional: at
    * 100 TB that same frame would not be tiny, so the join must not
    * depend on broadcastability). */
  def broadcastFindings(executed: SparkPlan): Seq[String] =
    flatten(executed).collect { case b: BroadcastExchangeExec => b }
      .flatMap { b =>
        val sub = flatten(b)
        val scanned = sub.collect { case f: FileSourceScanExec =>
          f.relation.location.rootPaths.map(
            _.getName.replaceAll("\\.parquet$", ""))
        }.flatten.toSet
        val hot = scanned.intersect(sfProportionalTables)
        if (hot.nonEmpty && !structurallyBounded(sub))
          Seq(s"BroadcastExchange-over-[${hot.toSeq.sorted.mkString(",")}]")
        else Seq.empty
      }.distinct

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.tune(spark)
    var bad = 0
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val qe = fn(spark, sfDir).queryExecution
        // execute first: with AQE the pre-execution string is the INITIAL
        // plan (static size estimates); the audit judges the FINAL plan
        qe.toRdd.count()
        val p = qe.executedPlan.toString
        val globalWindows = globalWindowFindings(qe.optimizedPlan)
        val allowedWindows = boundedGlobalWindowPaths.get(name).map(_._1).getOrElse(0)
        val broadcasts = broadcastFindings(qe.executedPlan)
        val allowedBroadcasts = boundedBroadcastPaths.get(name).map(_._1).getOrElse(0)
        val findings = Seq(
          "SortMergeJoin" -> p.contains("SortMergeJoin"),
          "CartesianProduct" -> p.contains("CartesianProduct"),
          "WindowExec-in-ann-path" ->
            (annRankPaths.contains(name) && p.contains("Window"))
        ).collect { case (k, true) => k } ++
          // tolerate only the documented count on allowlisted queries —
          // an EXTRA global window / broadcast beyond it still fails
          (if (globalWindows.size <= allowedWindows) Seq.empty else globalWindows) ++
          (if (broadcasts.size <= allowedBroadcasts) Seq.empty else broadcasts)
        if (findings.nonEmpty) { bad += 1; println(s"AUDIT $name: ${findings.mkString(", ")}") }
        else println(s"AUDIT $name: clean")
      } catch {
        case e: Exception => bad += 1; println(s"AUDIT $name: ERROR ${e.getMessage}")
      }
    }
    graft.operators.PlanCache.releaseAll(spark)
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
