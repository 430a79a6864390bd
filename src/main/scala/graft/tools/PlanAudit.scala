package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window => LogicalWindow}

/** Dev harness: audit every SparkEntry query's executed plan for the
  * operators that do not survive scale (SortMergeJoin where a broadcast or
  * banded shape was intended, CartesianProduct anywhere, WindowExec in an
  * ANN ranking path, and any GLOBAL window — empty partition spec, planned
  * as a SinglePartition WindowExec — outside the documented
  * constant-bounded frames). Prints one line per query; non-empty findings
  * exit 1. Usage: sbt "runMain graft.tools.PlanAudit [sfDir]"
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

  /** Queries whose plan legitimately contains a GLOBAL window — one with
    * no partition spec — because the windowed frame is CONSTANT-bounded
    * (by an operator parameter or the problem structure), never
    * corpus-proportional. Every entry must name its bound; an unlisted
    * global window fails the audit (the round-10 lesson: q204/q216/q199
    * shipped SinglePartition sorts over per-user / per-row frames
    * precisely because nothing flagged the class). */
  val boundedGlobalWindowPaths: Map[String, String] = Map(
    // post-limit rankers: the window input sits ABOVE a
    // TakeOrderedAndProject(limit=k), so the frame is k rows by plan
    // construction (documented on hybridSearch/searchRanked)
    "q06_search" -> "k rows above TakeOrderedAndProject",
    "q51_hybrid_rrf" -> "two k-row arms above TakeOrderedAndProject",
    "q60_filtered_search" -> "k rows above TakeOrderedAndProject",
    "q71_snippets" -> "k rows above TakeOrderedAndProject",
    // per-day rollup: calendar-bounded (36.5k rows/century) regardless of
    // event volume — dailyActiveUsers' cumulative acquisition sum
    "q106_daily_active" -> "per-day frame, calendar-bounded",
    // water-filling allocation: every window runs over the one-row-per-
    // LANGUAGE aggregate (the assignCells tiny-table contract)
    "q191_unimax" -> "per-language frame, |languages|-bounded",
    // cumulative gain over the per-DECILE rollup: `buckets` rows by
    // construction (parameter-bounded, require()d <= 1000)
    "q216_lift" -> "per-decile frame, buckets-bounded",
    // funnel conversion frame: one row per funnel STEP
    "q226_windowed_funnel" -> "per-step frame, |steps|-bounded")

  /** The global-window findings for one optimized logical plan: every
    * Window with an EMPTY partition spec — Spark plans it as a
    * SinglePartition WindowExec, shuffling the whole frame into one task —
    * except the distributed-rank offsets shape (ordered by the `__pid`
    * range-partition id, ≤ nPartitions rows by construction:
    * `Ranks.exclusivePrefixSum`, `TableStats.exactQuantiles`,
    * `Sampling.selectByTokenBudget`). */
  def globalWindowFindings(plan: LogicalPlan): Seq[String] =
    plan.collect {
      case w: LogicalWindow if w.partitionSpec.isEmpty &&
          !w.orderSpec.exists(_.references.exists(_.name == "__pid")) =>
        s"SinglePartition-Window[order=${
          w.orderSpec.map(_.child.sql).mkString(",")}]"
    }

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
        val findings = Seq(
          "SortMergeJoin" -> p.contains("SortMergeJoin"),
          "CartesianProduct" -> p.contains("CartesianProduct"),
          "WindowExec-in-ann-path" ->
            (annRankPaths.contains(name) && p.contains("Window"))
        ).collect { case (k, true) => k } ++
          (if (boundedGlobalWindowPaths.contains(name)) Seq.empty
           else globalWindowFindings(qe.optimizedPlan))
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
