package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: audit every SparkEntry query's executed plan for the
  * operators that do not survive scale (SortMergeJoin where a broadcast or
  * banded shape was intended, CartesianProduct anywhere, WindowExec in an
  * ANN ranking path). Prints one line per query; non-empty findings exit 1.
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
        ).collect { case (k, true) => k }
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
