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
    * `TableStats.equiDepthHistogram`, `Sampling.selectByTokenBudget`). The
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

  /** The audit prices a BroadcastExchange over ANY file scan that is not
    * spec-constant: every parquet input in this engine — the TPC-H
    * fact/dim tables, the corpus tables (documents/embeddings/events),
    * AND any persisted index/fixture under a dynamic path — is derived
    * from the corpus and grows with the scale factor, so an unbounded
    * broadcast of one ships O(SF) bytes through the driver (fine at
    * sf0.1, fatal at the 100 TB operating point: part ~26 B rows,
    * supplier ~1.3 B at SF 1e5). Only nation (25 rows) and region (5)
    * are constant by spec. A name-based PROPORTIONAL set (the r12/early-
    * r13 form) left persisted-index scans unpriced because their paths
    * are dynamic — the inverted rule closes that hole. */
  val specConstantTables: Set[String] = Set("nation", "region")

  /** Kept for spec/back-compat readability: the named tables the original
    * pricer enumerated (the inverted rule above supersedes it). */
  val sfProportionalTables: Set[String] =
    Set("lineitem", "orders", "customer", "part", "supplier", "partsupp",
        "documents", "embeddings", "events")

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
    "q222_join_size_est" -> (1, "CMS grid, d*w <= 256k cells by require()"),
    // ---- ANN / similarity: QUERY-side frames. The query batch is an
    // operator INPUT (a literal-bounded id filter in the declared queries;
    // an operationally-bounded request batch in production) — everything
    // below derives from it at |queries| x const rows. The corpus side of
    // these joins never broadcasts (pinned SHUFFLE_HASH / GroupedTopK-
    // bounded, enforced structurally).
    "q23_ann_topk" -> (1, "query batch (literal id filter, <=5 rows)"),
    "q31_ann_topk_custom" -> (1, "query batch (literal id filter)"),
    "q29_ann_lsh" -> (1, "query bucket table, |queries| x numTables rows"),
    "q44_ann_rp" -> (2, "query bucket table + query batch"),
    "q46_ann_sq8" -> (1, "quantized query batch"),
    "q290_ann_sq8_persisted" -> (1,
      "quantized query batch (q46's frame; corpus side reads saved codes)"),
    "q291_ann_bq_persisted" -> (2,
      "query sign-sketches + query batch (q56's frames; code scan reads saved index)"),
    "q56_ann_bq" -> (2, "query sign-sketches + query batch (re-rank)"),
    "q67_ann_rp_sq8" -> (2, "query bucket table + quantized query batch"),
    "q76_ann_pq" -> (2, "query ADC lookup tables + query batch (re-rank)"),
    "q80_ann_ivfpq" -> (2, "query ADC lookup tables + query batch"),
    "q90_ann_ivfpq_res" -> (2, "per-cell query residual tables + query batch"),
    "q116_ann_multiprobe" -> (2,
      "multi-probe query bucket table ((2r+1) x |queries| x tables) + query batch"),
    "q133_hard_negatives" -> (1, "labeled query batch"),
    "q143_triplets" -> (2, "query batch, one per (pos, neg) leg"),
    "q161_ann_recall" -> (1, "query batch (both audit arms are GroupedTopK-bounded)"),
    // persisted-index probe: the loaded centroid table is nLists rows by
    // index construction (detIvfIndex packages the driver-side centroid
    // array — 8 rows here, never corpus-proportional); the probes frame
    // is GroupedTopK-bounded at |queries| x nProbe and needs no entry
    "q261_ann_ivf_persisted" -> (1,
      "persisted centroid table, nLists rows by index construction"),
    // same centroid-table bound plus the q80 query-side pair (ADC lookup
    // tables + re-rank query batch), all riding the |queries|/nLists
    // bounds — the corpus side (assignments, codes) stays SHUFFLE_HASH/
    // GroupedTopK-bounded
    "q282_ann_ivfpq_persisted" -> (3,
      "persisted centroid table (nLists rows) + query ADC lookup tables + query batch (re-rank)"),
    // the serving composition's vector leg is exactly q282's probe (same
    // three bounded frames); the lexical leg's stats/df rows are global
    // aggregates (structurally bounded) over the term-pruned state read
    "q292_hybrid_serving" -> (3,
      "q282's probe frames: persisted centroid table (nLists rows) + query ADC lookup tables + query batch (re-rank)"),
    // the erasure-leg probe reads the same saved centroid table as q261
    "q287_ann_ivf_deleted" -> (1,
      "persisted centroid table, nLists rows by index construction"),
    // the maintained-lifecycle probe reads the same saved centroid table
    "q297_ann_ivf_maintained" -> (1,
      "persisted centroid table, nLists rows by index construction"),
    // the post-retrain probe reads the swapped-in centroid table — still
    // nLists rows by construction, whatever generation produced it
    "q301_ann_ivf_retrained" -> (1,
      "persisted centroid table, nLists rows by index construction"),
    // the retrained IVF-PQ probes exactly like q282 over the swapped-in
    // generation — same three bounded frames
    "q304_ann_ivfpq_retrained" -> (3,
      "q282's probe frames over the retrained saved artifacts"),
    // the quantized erasure legs probe exactly like their persisted twins
    "q293_ann_sq8_deleted" -> (1,
      "quantized query batch (q290's frame; corpus side reads saved survivors)"),
    "q294_ann_bq_deleted" -> (2,
      "query sign-sketches + query batch (q291's frames; code scan reads saved survivors)"),
    "q295_ann_ivfpq_deleted" -> (3,
      "q282's probe frames over the post-delete saved artifacts"),
    // the takedown composition probes exactly like q292 — q282's three
    // bounded frames on the vector leg (read from the post-delete saved
    // artifacts), lexical-leg stats structurally bounded as in q292
    "q299_hybrid_takedown" -> (3,
      "q292's probe frames over the post-takedown saved artifacts + deleted lex state"),
    // the readmit composition probes exactly like q292 over the healed
    // artifacts — same three bounded frames
    "q303_hybrid_readmit" -> (3,
      "q292's probe frames over the readmitted saved artifacts + healed lex state"),
    // the TEXT-IN serving composition probes exactly like q292; its query
    // batch is a literal 5-string local relation (hash-embedded in-plan),
    // so at most the same three bounded frames reach a broadcast
    "q306_hybrid_serving_text" -> (3,
      "q292's probe frames; query batch is a literal 5-string local relation"),
    // the maintained (>=3-wave + compacted) IVF-PQ probes exactly like
    // its two-wave twin — same three bounded frames, whatever the upsert
    // history or file layout of the coarse cells
    "q300_ann_ivfpq_maintained" -> (3,
      "q282's probe frames over the compacted multi-wave saved artifacts"),
    // the maintained CMS grid is the q222 frame read from state parquet:
    // d*w <= 256k cells by require(), parameter-bounded at any SF
    "q285_cms_topk_stream" -> (1,
      "CMS grid from state, d*w <= 256k cells by require()"),
    // q175's bounded frames with the sketch side read from state parquet
    "q288_kmv_overlap_stream" -> (4,
      "per-group k-min sketches from state, k-bounded (q175's frames)"),
    "q225_matryoshka" -> (2, "query batch at two prefix dims"),
    // exact audit arms: the corpus IS the query side by contract (the
    // verifiable baseline; the production path runs the same tail over
    // ANN candidates with a knnProbes sample) — BroadcastNestedLoopJoin
    // is the only non-cartesian plan for that shape
    "q24_knn_pairs" -> (1,
      "exact all-pairs baseline: BNLJ side of the theta self-join (scale path: q45 rp-LSH)"),
    "q182_label_noise" -> (1,
      "exact audit baseline: corpus as query side by contract (scale path: ANN candidates)"),
    // upsert deltas: micro-batches under the streaming ingest contract
    // (Streams.streamingIvfUpsert et al.) — operationally bounded, and
    // broadcasting the delta is exactly what keeps the standing index
    // from shuffling on every batch
    "q10_upsert" -> (1, "upsert delta ids, micro-batch contract"),
    "q58_sq8_upsert" -> (2, "upsert delta (micro-batch) + quantized query batch"),
    "q59_bq_upsert" -> (3,
      "upsert delta (micro-batch) + query sign-sketches + query batch"),
    // decontamination: the broadcast frame derives from the EVAL-SUITE
    // input (a fixed benchmark), not the training corpus being scanned
    "q55_decontaminate" -> (1, "benchmark shingle set, bounded by the eval-suite input"),
    "q102_bloom_decon" -> (1, "exclude-list fingerprint set, benchmark-bounded"),
    // hash-bucketed / parameter-bounded state
    "q172_dsir" -> (2, "hash-bucketed feature tables, dims require()d <= 65536"),
    // per-category frames: the grouping key is a closed categorical
    // domain (event taxonomy / language / source registry), not a
    // corpus-growing id — the |event_types|-bounded convention already
    // used by boundedGlobalWindowPaths
    "q93_retention" -> (1, "per-cohort-week sizes, calendar-bounded"),
    "q94_gap_fill" -> (1, "per-day spine, calendar-bounded"),
    "q96_zscore" -> (1, "per-type moments, |event_types|-bounded"),
    "q106_daily_active" -> (1, "per-day acquisition counts, calendar-bounded"),
    "q119_transitions" -> (1, "per-type totals, |event_types|-bounded"),
    "q166_hll_distinct" -> (1, "per-type HLL rollup, |types| x registers"),
    "q174_hll_daily" -> (1, "(day, register) grid, calendar x m-bounded"),
    "q175_kmv_overlap" -> (4, "per-group k-min sketches, k-bounded"),
    "q188_ks_drift" -> (1, "per-type KS counts, |event_types|-bounded"),
    "q191_unimax" -> (2, "per-language allocation frames, |languages|-bounded"),
    "q197_jsd_sources" -> (3,
      "per-source / source-pair term stats, |sources|-bounded (taxonomy contract)"),
    "q211_bootstrap_ci" -> (3, "per-group moment frames, |groups|-bounded"),
    "q215_benford" -> (1, "(type, digit) grid, |types| x 9"),
    "q227_cohort_ltv" -> (1, "per-cohort-week frame, calendar-bounded"),
    "q229_welch_ttest" -> (1, "per-type moments (two arms)"),
    "q237_psi_drift" -> (1, "per-type band counts, |types| x bands"),
    "q239_markov_stationary" -> (4, "state-keyed frames, |event_types|-bounded"),
    "q241_mad_outliers" -> (3, "per-type median/MAD frames, |types|-bounded"),
    "q242_trimmed_mean" -> (1, "per-type trim bounds, |types|-bounded"),
    // streamed-state readers (q271-q277): the SAME bounded frames as
    // their batch twins above, now read from the folded state parquet —
    // the scan path changed, the frame bound did not
    "q271_ks_drift_stream" -> (1, "per-type KS counts, |event_types|-bounded (q188's frame from state)"),
    "q272_psi_stream" -> (1, "per-type band counts, |types| x bands (q237's frame from state)"),
    "q273_benford_stream" -> (1, "(type, digit) grid, |types| x 9 (q215's frame from state)"),
    "q274_cohort_ltv_stream" -> (1, "per-cohort-week frame, calendar-bounded (q227's frame from state)"),
    "q277_dsir_stream" -> (2, "hash-bucketed feature tables, dims require()d <= 65536 (q172's frames, raw side from state)"))

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

  /** A node that caps its output rows independent of input size: a GLOBAL
    * aggregate (empty grouping → exactly 1 row: the avg/max/total scalar
    * frames) or an explicit limit (TakeOrderedAndProject / GlobalLimit /
    * CollectLimit → ≤ k rows). Grouped aggregates do NOT count — their
    * cardinality is the key domain, which usually grows with the corpus. */
  private def isRowBounding(node: SparkPlan): Boolean = node match {
    case h: HashAggregateExec => h.groupingExpressions.isEmpty
    case o: ObjectHashAggregateExec => o.groupingExpressions.isEmpty
    case s: SortAggregateExec => s.groupingExpressions.isEmpty
    case _: TakeOrderedAndProjectExec | _: GlobalLimitExec |
         _: CollectLimitExec => true
    // A GroupedTopK caps its output at groups x k — bounded iff the group
    // domain is. The QUERY-grouped shape (grouping references the engine's
    // query_id/query columns) is |query batch| x k: the per-query probe
    // sets, ANN shortlists, and exact audit arms this engine broadcasts by
    // design. Corpus-keyed grouped-topks (per-label, per-cell, per-doc)
    // do NOT ride this — their group domain grows with the corpus — the
    // same name-keyed convention as the __pid offsets exemption in
    // globalWindowFindings.
    case g: graft.plans.GroupedTopKExec =>
      g.groupExprs.nonEmpty && g.groupExprs.forall(_.references.forall(a =>
        a.name == "query_id" || a.name == "query"))
    case _ => false
  }

  /** SF-proportional scans reachable from `p` with NO row-bounding node on
    * the path from `p` down to the scan — the dominance check. The
    * round-12 advisor defect: checking "any bounding node anywhere in the
    * subtree" exempted `fact JOIN (1-row agg)` — a fact-sized broadcast —
    * because the agg BRANCH satisfied the existence test. A bound only
    * caps what flows THROUGH it, so the walk stops descending at a
    * bounding node and an SF scan on any other branch still surfaces. */
  def unboundedHotScans(p: SparkPlan): Seq[String] = p match {
    case _ if isRowBounding(p) => Seq.empty
    case f: FileSourceScanExec =>
      f.relation.location.rootPaths
        .map(_.getName.replaceAll("\\.parquet$", ""))
        .filterNot(specConstantTables.contains)
    case a: AdaptiveSparkPlanExec => unboundedHotScans(a.executedPlan)
    case q: QueryStageExec => unboundedHotScans(q.plan)
    case r: ReusedExchangeExec => unboundedHotScans(r.child)
    case _ => p.children.flatMap(unboundedHotScans)
  }

  /** Every unbounded BroadcastExchange over an SF-proportional table in
    * one EXECUTED plan (run it first — with AQE the final plan is the
    * one that matters, and an AQE-decided broadcast of a genuinely tiny
    * runtime frame still fails here if its scan is SF-proportional: at
    * 100 TB that same frame would not be tiny, so the join must not
    * depend on broadcastability). Exchanges are deduped by NODE identity,
    * not finding text: flatten follows ReusedExchangeExec into the
    * original exchange, so one exchange can surface once per reuse site —
    * but two DISTINCT offenders over the same table must count twice
    * against the allowlist (the round-12 advisor note on `.distinct`). */
  def broadcastFindings(executed: SparkPlan): Seq[String] =
    flatten(executed).collect { case b: BroadcastExchangeExec => b }
      .groupBy(_.id).values.map(_.head).toSeq.sortBy(_.id)
      .flatMap { b =>
        val hot = unboundedHotScans(b.child).distinct.sorted
        if (hot.nonEmpty)
          Seq(s"BroadcastExchange-over-[${hot.mkString(",")}]")
        else Seq.empty
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
