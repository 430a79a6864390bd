package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus sampling/layout operators for a training-data pipeline:
  *
  *  - deterministic train/val/test split: bucket = SHA-256(key) mod 10000,
  *    compared against cumulative weight thresholds. Stable across runs,
  *    engines and cluster sizes (no RNG state), map-only, and any future
  *    re-run assigns every old document to the same split — the property
  *    that keeps eval sets uncontaminated as the corpus grows.
  *  - sequence packing: the concatenate-then-cut layout step of pretraining
  *    prep. Documents are sharded (shard = doc_id mod nShards, so the
  *    window sort is per-shard, never global), ordered within shard, and a
  *    running token offset assigns each doc the training-sequence index its
  *    first token lands in (bin = start_offset div budget). One shuffle
  *    (the per-shard window); shards scale the sort out.
  */
object Sampling {

  private def bucketExpr(keyExpr: String): String =
    s"cast(conv(substr(sha2($keyExpr, 256), 1, 8), 16, 10) AS bigint) % 10000"

  private def splitCase(weights: Seq[(String, Double)], bucketCol: String): String = {
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9, "weights must sum to 1")
    val cuts = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
      .map(c => math.round(c * 10000))
    if (weights.size == 1) s"'${weights.head._1}'" // CASE needs >= 1 WHEN
    else weights.init.zip(cuts.init)
      .map { case ((name, _), cut) => s"WHEN $bucketCol < $cut THEN '$name'" }
      .mkString("CASE ", " ", s" ELSE '${weights.last._1}' END")
  }

  /** Append (bucket, split) columns in place — the column-wise form for
    * composition inside a pipeline: a split is a projection of the key, so
    * joining a corpus to `splitByHash` of itself would be a needless
    * large-large self-join at scale. */
  def withSplit(docs: DataFrame,
                weights: Seq[(String, Double)] =
                  Seq("train" -> 0.98, "val" -> 0.01, "test" -> 0.01),
                keyExpr: String = "cast(doc_id AS string)"): DataFrame =
    docs.withColumn("bucket", expr(bucketExpr(keyExpr)))
      .withColumn("split", expr(splitCase(weights, "bucket")))

  /** Deterministic epoch-shuffled training order: each doc gets a seeded
    * pseudo-random shard and its position within that shard — the global
    * shuffle every training run needs, WITHOUT the `ORDER BY random()`
    * single-point sort (a SinglePartition WindowExec at corpus scale).
    * The permutation key is sha256(seed:doc_id) — a new `seed` string is
    * a fresh epoch permutation, reproducible on any engine or cluster
    * size (the splitByHash stability argument applied to ordering); the
    * shard is the hash's first byte mod `nShards`, so shards are balanced
    * in expectation and assignment is a map-only projection. Positions
    * come from `Ranks.distributedRank` over (hash, doc_id) within each
    * shard — range-balanced parallel ranking, the one-broadcast-offset
    * pattern, never a global window. Output: (doc_id, shard, pos),
    * pos 1-based within shard. */
  def trainOrder(docs: DataFrame, seed: String = "epoch0", nShards: Int = 8,
                 nPartitions: Int = 32): DataFrame = {
    require(nShards >= 1 && seed.matches("[A-Za-z0-9_:-]+"),
      s"bad shards/seed: $nShards/$seed")
    val keyed = docs.selectExpr("doc_id",
        s"sha2(concat('$seed:', CAST(doc_id AS STRING)), 256) AS __hx")
      .withColumn("shard",
        expr(s"CAST(conv(substring(__hx, 1, 2), 16, 10) AS BIGINT) % $nShards"))
    Ranks.distributedRank(keyed, Seq("shard"),
        Seq(col("__hx"), col("doc_id")), "pos", nPartitions)
      .select("doc_id", "shard", "pos")
  }

  /** Deterministic split column from cumulative weights. `weights` must sum
    * to 1 and iterate in declaration order (train/val/test by default). */
  def splitByHash(docs: DataFrame,
                  weights: Seq[(String, Double)] =
                    Seq("train" -> 0.98, "val" -> 0.01, "test" -> 0.01),
                  keyExpr: String = "cast(doc_id AS string)"): DataFrame =
    withSplit(docs.selectExpr("doc_id"), weights, keyExpr)
      .select("doc_id", "bucket", "split")

  /** Group-aware holdout split summary — the leakage-safe form of
    * [[splitByHash]] for grouped data: the split keys on the GROUP
    * (user, session, document family), so every row of a group lands in
    * the same split and per-group signal can never straddle train/test
    * (the classic evaluation leak a row-keyed split invites). The split
    * is a pure projection of the group key (map-only, no join, stable
    * as data grows — the `withSplit` rule); the summary aggregates once
    * to the |splits|-row frame. The `straddle_groups` audit column —
    * groups observed in more than one split — is the operator's
    * verification arm: 0 by construction here, nonzero exactly when a
    * FOREIGN split assignment (joined rather than derived) leaked. */
  def groupHoldoutSplit(rows: DataFrame, groupCol: String = "user_id",
                        weights: Seq[(String, Double)] =
                          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      : DataFrame = {
    val tagged = rows.withColumn("bucket",
        expr(bucketExpr(s"concat('grp:', cast($groupCol AS string))")))
      .withColumn("split", expr(splitCase(weights, "bucket")))
    val perSplit = tagged.groupBy("split").agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col(groupCol)).as("n_groups"))
    val straddle = tagged.groupBy(col(groupCol))
      .agg(countDistinct(col("split")).as("ns"))
      .agg(sum(when(col("ns") > 1, 1L).otherwise(0L)).as("straddle_groups"))
    val total = perSplit.agg(sum("n_rows").as("total_rows"))
    perSplit.join(broadcast(total)).join(broadcast(straddle))
      .select(col("split"), col("n_rows"), col("n_groups"),
        expr("round(CAST(n_rows AS DOUBLE) / total_rows, 6)").as("row_share"),
        col("straddle_groups"))
      .orderBy("split")
  }

  /** Deterministic per-stratum downsampling (domain/language rebalancing):
    * keep a document iff its hash bucket falls below its stratum's fraction
    * x 10000. The hash key carries a `strat:` prefix so sampling decisions
    * are INDEPENDENT of `splitByHash`'s buckets (same key would correlate
    * the sample with the train split). Map-only, growth-stable: a document's
    * keep/drop never changes as the corpus grows. Strata absent from
    * `fractions` keep `default`. */
  def stratifiedSampleByHash(docs: DataFrame, stratumCol: String,
                             fractions: Map[String, Double],
                             default: Double = 1.0,
                             keyExpr: String = "concat('strat:', cast(doc_id AS string))"): DataFrame = {
    require((fractions.values ++ Seq(default)).forall(f => f >= 0.0 && f <= 1.0),
      "fractions must be in [0, 1]")
    // SQL-escape stratum literals (doubled single quotes) — same guard as
    // sampleToMixture; a quote in a stratum name must not break the CASE
    val caseExpr = fractions.toSeq.sortBy(_._1).map { case (k, f) =>
      s"WHEN $stratumCol = '${k.replace("'", "''")}' THEN ${math.round(f * 10000)}"
    }.mkString("CASE ", " ", s" ELSE ${math.round(default * 10000)} END")
    docs.withColumn("__b", expr(bucketExpr(keyExpr)))
      .filter(expr(s"__b < $caseExpr")).drop("__b")
  }

  /** Deterministic fixed-size uniform sample per group — "n examples per
    * class", the few-shot/eval-set selection step. Rows are ordered by the
    * sha256 hex of a `grp:`-prefixed key (a uniform permutation, independent
    * of the split/strat/mix hash families by prefix; ties impossible on
    * unique keys) and the first `n` per group win. Rides `GroupedTopK`
    * (bounded per-partition heaps — shuffle volume is partitions x groups x
    * n, never the corpus), and the selection is growth-stable ONLY in
    * distribution, not membership (unlike fraction-based hash sampling, a
    * fixed-size sample's members must change as the group grows — inherent
    * to the contract, not the implementation). Output: (group, doc_id,
    * rank). */
  def samplePerGroup(docs: DataFrame, groupCol: String, n: Int,
                     keyExpr: String = "CAST(doc_id AS STRING)"): DataFrame = {
    require(n >= 1)
    val keyed = docs.select(col(groupCol), col("doc_id"),
      expr(s"sha2(concat('grp:', $keyExpr), 256)").as("__h"))
    graft.plans.GroupedTopK(keyed, Seq(col(groupCol)), Seq(asc("__h")), n)
      .select(col(groupCol), col("doc_id"), col("rank"))
  }

  /** Data selection under a global token budget: keep the highest-quality
    * documents until `budgetTokens` (a document is kept iff its sequence
    * STARTS inside the budget — the packing convention). The global order
    * (quality desc, doc_id) needs a global running sum — each document's
    * start offset is exactly the EXCLUSIVE prefix sum of token counts
    * over that order, i.e. [[Ranks.exclusivePrefixSum]] (range exchange +
    * parallel local windows + an nPartitions-row offsets broadcast, never
    * a single-partition global window; this operator is where the
    * pattern was first built, now factored into Ranks). doc_id
    * uniqueness makes the order total, so results are identical whatever
    * range boundaries the partitioner samples. Output: (doc_id, quality,
    * n_tokens, start_offset). */
  def selectByTokenBudget(docs: DataFrame, budgetTokens: Long,
                          nPartitions: Int = 32): DataFrame = {
    require(budgetTokens > 0 && nPartitions > 0)
    val scored = TextAnalysis.qualityScore(docs)
      .select(col("doc_id"), col("quality"), col("n_tokens").cast("long").as("n_tokens"))
    Ranks.exclusivePrefixSum(scored, Seq.empty,
        Seq(desc("quality"), asc("doc_id")), col("n_tokens"), "start_offset",
        nPartitions)
      .filter(col("start_offset") < budgetTokens)
      .select("doc_id", "quality", "n_tokens", "start_offset")
  }

  /** Mixture-weighted downsampling (the domain-reweighting step of a
    * pretraining data recipe): given target mixture `weights` per stratum
    * and a total row `budget`, each stratum keeps
    * `min(1, ((w / sumW) * budget) / n)` of its rows — strata over their
    * target share are thinned toward it, strata under it keep everything
    * (the cap; hash sampling cannot invent rows). Selection is the same
    * deterministic SHA-256 bucket rule as `stratifiedSampleByHash` (its own
    * `mix:` key prefix, so decisions are independent of split/strat
    * sampling), making the sample growth-stable and engine-reproducible.
    *
    * Stratum counts are a driver-side collect by design: strata are
    * domains/languages — small by definition (the `assignCells` tiny-table
    * contract). One map-side-combined count agg + a map-only filter; strata
    * absent from `weights` are dropped (weight 0). */
  def sampleToMixture(docs: DataFrame, stratumCol: String,
                      weights: Seq[(String, Double)], budget: Long,
                      keyExpr: String = "concat('mix:', cast(doc_id AS string))"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 >= 0.0) && budget > 0,
      "need non-negative weights and a positive budget")
    val sumW = weights.map(_._2).sum
    require(sumW > 0.0, "weights must not all be zero")
    // null strata can't carry a weight (weights are non-null strings), so
    // they fall through to the ELSE 0 arm; toString tolerates non-string
    // stratum columns (the literal comparison below then relies on Spark's
    // implicit cast, same as the oracle SQL).
    val counts = docs.groupBy(stratumCol).count().collect()
      .flatMap(r => Option(r.get(0)).map(_.toString -> r.getLong(1))).toMap
    val thresholds = weights.map { case (st, w) =>
      val n = counts.getOrElse(st, 0L)
      val frac = if (n == 0L) 0.0 else math.min(1.0, ((w / sumW) * budget) / n)
      st -> math.floor(frac * 10000 + 0.5).toLong
    }
    // SQL-escape the stratum literal (doubled single quotes) — a quote in a
    // domain name must not break or rewrite the generated CASE
    val caseExpr = thresholds.map { case (st, t) =>
      s"WHEN $stratumCol = '${st.replace("'", "''")}' THEN ${t}L"
    }.mkString("CASE ", " ", " ELSE 0L END")
    docs.withColumn("__b", expr(bucketExpr(keyExpr)))
      .filter(expr(s"__b < $caseExpr")).drop("__b")
  }

  /** Per-stratum quality-quantile selection: keep the top `frac` of each
    * stratum's documents by quality — "best 40% of every domain", the
    * percentile-filter form of quality selection (a global cut would let
    * one clean domain crowd out every other).
    *
    * Ranking within each stratum is [[Ranks.distributedRank]] partitioned
    * by the stratum: range-repartition on (stratum, quality desc,
    * doc_id) — a total order, so every stratum's rows are globally
    * ordered across partitions — with the tiny (partition, stratum)
    * offsets broadcast back. No single-partition global window, no
    * per-stratum full sort on one node. The keep bound is
    * `floor(n_s * frac + 0.5)` in f64 (mirrored by the oracle). Output:
    * (doc_id, stratum, quality, rnk). */
  def topQualityByStratum(docs: DataFrame, stratumCol: String, frac: Double,
                          nPartitions: Int = 32): DataFrame = {
    require(frac > 0.0 && frac <= 1.0 && nPartitions > 0)
    val scored = TextAnalysis.qualityScore(docs, passthrough = Seq(stratumCol))
      .select(col("doc_id"), col(stratumCol), col("quality"))
    val ranked = Ranks.distributedRank(scored, Seq(stratumCol),
      Seq(desc("quality"), asc("doc_id")), "rnk", nPartitions)
    // per-stratum totals from the ranked frame: its memoized exchange is
    // already materialized, so this does not re-tokenize the corpus
    val totals = ranked.groupBy(stratumCol).agg(count(lit(1)).as("__n"))
    ranked.join(broadcast(totals), Seq(stratumCol))
      .filter(col("rnk") <=
        expr(s"CAST(floor(CAST(__n AS DOUBLE) * $frac + 0.5) AS BIGINT)"))
      .select(col("doc_id"), col(stratumCol), col("quality"), col("rnk"))
  }

  /** Sequence packing: per-shard running token offsets and the index of the
    * fixed-`budget` training sequence each document starts in. Output:
    * (doc_id, shard, n_tokens, start_offset, bin). */
  def packSequences(docs: DataFrame, budget: Int = 2048,
                    nShards: Int = 32): DataFrame = {
    require(budget > 0 && nShards > 0)
    val w = Window.partitionBy("shard").orderBy("doc_id")
    docs
      .selectExpr("doc_id", s"doc_id % $nShards AS shard",
        s"size(${TextAnalysis.tokensExpr}) AS n_tokens")
      .withColumn("start_offset",
        coalesce(sum(col("n_tokens")).over(w) - col("n_tokens"), lit(0L)))
      .withColumn("bin", floor(col("start_offset") / budget))
  }

  /** Deterministic weighted sampling without replacement (Efraimidis-
    * Spirakis A-ES): each row gets key -ln(u)/w with u a hash-derived
    * uniform in (0,1) — keeping the n SMALLEST keys per stratum is an exact
    * weighted sample without replacement, with zero RNG state: the same row
    * draws the same u on any engine, run, or cluster size (the split-by-hash
    * stability argument, extended to weighted selection). u uses 24 hash
    * bits offset by half an ulp-of-grid so it is never 0 (ln is finite) and
    * both engines compute the identical double.
    *
    * Selection ranks through GroupedTopK's bounded heaps — per-stratum
    * top-n over a corpus-sized input with (partitions x strata x n) shuffle
    * volume, never a window sort. */
  def weightedSample(docs: DataFrame, weightExpr: String, n: Int,
                     stratumCol: String = "source",
                     keyExpr: String = "CAST(doc_id AS STRING)"): DataFrame = {
    require(n >= 1)
    val u = s"(cast(conv(substr(sha2(concat('ws:', $keyExpr), 256), 1, 6), 16, 10) AS bigint)" +
      " + 0.5) / 16777216.0"
    val scored = docs
      .withColumn("w", expr(s"CAST($weightExpr AS DOUBLE)"))
      .filter(col("w") > 0) // zero/negative weight = never sampled
      .withColumn("es_key", expr(s"-ln($u) / w"))
    graft.plans.GroupedTopK(
        scored.select(col(stratumCol), col("doc_id"), col("es_key")),
        Seq(col(stratumCol)), Seq(asc("es_key"), asc("doc_id")), n)
      .select(col(stratumCol), col("doc_id"),
        round(col("es_key"), 6).as("es_key"), col("rank"))
  }

  /** DSIR-style importance selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): pick `k` documents from a
    * RAW pool whose hashed-n-gram distribution looks most like a TARGET
    * corpus, sampling with probability proportional to the importance ratio
    * p_target(doc)/p_raw(doc) under bucketed unigram models.
    *
    * Everything is deterministic and oracle-checkable by construction:
    *  - features are the repo's engine-neutral sha256 hash buckets
    *    (`hashFeatures`' convention), `dims` buckets with add-1 smoothing;
    *  - each bucket's log importance ratio ln(p_t/p_r) is fixed-pointed
    *    once per DISTINCT bucket (floor(ln * 2^30 + 0.5) as LONG — the
    *    `surprisalScore` recipe), so per-doc sums are integer additions
    *    that commute under any partitioning;
    *  - sampling proportional to exp(logw) uses the Gumbel-top-k trick
    *    with hash-derived uniforms (the `weightedSample` A-ES argument
    *    transposed to log space): key = logw + (-ln(-ln(u))) with u from
    *    sha256('dsir:' || doc_id) — zero RNG state, identical doubles on
    *    both engines.
    *
    * Scale shape: two corpus scans (raw + target occurrence counts), both
    * collapsing immediately to `dims`-bounded feature tables (<= 65536
    * rows); the ratio table broadcast-joins back to raw occurrences
    * (map-only), one doc-keyed integer aggregation, and a global top-k via
    * TakeOrderedAndProject (per-partition partial top-k — never a sort of
    * the pool). Cost ~ corpus tokens; state ~ dims. Zero-token docs have
    * no features and are never selected (both engines agree).
    *
    * Output: (doc_id, n_tokens, logw, gkey) for the k selected docs —
    * logw the fixed-point log importance weight, gkey the Gumbel key the
    * selection ranked on (both rounded 6dp for display; ranking uses the
    * unrounded doubles, the q103 convention). */
  def dsirSelect(raw: DataFrame, target: DataFrame, k: Int,
                 dims: Int = 256): DataFrame =
    dsirSelectFromFeatures(dsirDocFeatures(raw, dims), target, k, dims)

  /** The raw pool's per-document hashed-feature histogram
    * (doc_id, feature, n) — DSIR's maintainable raw-side state. Additive
    * across document batches (each appended doc contributes only its own
    * rows), so `Streams.streamingDsirFeatures` maintains it as idempotent
    * epoch partials and corpus refresh never re-tokenizes earlier docs;
    * per-doc size is bounded by min(doc tokens, dims). */
  def dsirDocFeatures(docs: DataFrame, dims: Int = 256): DataFrame = {
    require(dims >= 2 && dims <= 65536, s"dims must be in [2, 65536]: $dims")
    val bucket = s"cast(conv(substr(sha2(token, 256), 1, 4), 16, 10) AS BIGINT) % $dims"
    docs
      .select(col("doc_id"), explode(expr(TextAnalysis.tokensExpr)).as("token"))
      .withColumn("feature", expr(bucket))
      .groupBy("doc_id", "feature").agg(count(lit(1)).as("n"))
  }

  /** DSIR selection from an ALREADY-BUILT (doc_id, feature, n) histogram
    * table — the entry point for the incrementally-maintained pool
    * (`Streams.dsirSelectAt`): the raw corpus is never re-scanned, only
    * its bounded feature state. Bit-identical to [[dsirSelect]] on the
    * same pool: cnt_r = sum(n) per feature equals the occurrence count,
    * and the per-doc integer sum of n * sfx equals the per-occurrence
    * sum, so logw/gkey reproduce exactly. */
  def dsirSelectFromFeatures(docFeat: DataFrame, target: DataFrame, k: Int,
                             dims: Int = 256): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(dims >= 2 && dims <= 65536, s"dims must be in [2, 65536]: $dims")
    val bucket = s"cast(conv(substr(sha2(token, 256), 1, 4), 16, 10) AS BIGINT) % $dims"
    val cntT = target
      .select(col("doc_id"), explode(expr(TextAnalysis.tokensExpr)).as("token"))
      .withColumn("feature", expr(bucket))
      .groupBy("feature").agg(count(lit(1)).as("cnt_t"))
    val cntR = docFeat.groupBy("feature").agg(sum("n").as("cnt_r"))
    val totT = cntT.agg(sum("cnt_t").as("tot_t"))
    val totR = cntR.agg(sum("cnt_r").as("tot_r"))
    // one ln per distinct bucket; raw-occurring buckets all have cnt_r >= 1,
    // absent-in-target buckets smooth to cnt_t = 0
    val fx = cntR.join(cntT, Seq("feature"), "left")
      .na.fill(0L, Seq("cnt_t"))
      .crossJoin(broadcast(totT)).crossJoin(broadcast(totR))
      .withColumn("sfx", expr(
        s"CAST(floor(ln((CAST(cnt_t + 1 AS DOUBLE) * CAST(tot_r + $dims AS DOUBLE)) / " +
          s"(CAST(cnt_r + 1 AS DOUBLE) * CAST(tot_t + $dims AS DOUBLE))) " +
          "* 1073741824.0 + 0.5) AS BIGINT)"))
      .select("feature", "sfx")
    val u = "(cast(conv(substr(sha2(concat('dsir:', CAST(doc_id AS STRING)), 256), 1, 6), 16, 10) AS BIGINT)" +
      " + 0.5) / 16777216.0"
    docFeat.join(broadcast(fx), Seq("feature"))
      .groupBy("doc_id")
      .agg(sum("n").as("n_tokens"), sum(expr("n * sfx")).as("ssfx"))
      .withColumn("logw", expr("CAST(ssfx AS DOUBLE) / 1073741824.0"))
      .withColumn("gkey", expr(
        s"CAST(ssfx AS DOUBLE) / 1073741824.0 + (-ln(-ln($u)))"))
      .orderBy(desc("gkey"), asc("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("n_tokens"),
        round(col("logw"), 6).as("logw"), round(col("gkey"), 6).as("gkey"))
  }

  /** UniMax language-budget allocation + per-language selection (the
    * water-filling multilingual sampling of Chung et al., ICLR 2023):
    * given a total character budget `B = total_chars * budgetNum DIV
    * budgetDen` and a per-language repeat cap of `epochs` passes, allocate
    * the budget as uniformly as possible across languages without pushing
    * any language past `epochs x` its corpus size. Head languages (en) get
    * a constant share; tail languages are capped at `epochs` epochs instead
    * of being oversampled to noise — the published fix for
    * temperature-sampling's tail over-repetition.
    *
    * Water-filling in exact integers: languages sorted by capacity
    * `c_l = epochs * chars_l` ascending, a language is SATURATED when
    * `c_l * (langs_after_and_self) + cum_prev_capacity <= B` (the monotone
    * prefix property of the sorted order makes the greedy a closed form);
    * saturated languages take `c_l`, the rest split the remainder evenly
    * (floor division). The allocation decomposes as `full_epochs = a_l DIV
    * chars_l` whole passes plus a partial pass of `a_l % chars_l` chars,
    * filled by docs in deterministic sha256 shuffle order until the next
    * doc would overflow.
    *
    * Shape at scale: the allocation runs on ONE aggregate row per language
    * (driver-free, broadcast back); the partial-pass fill is one
    * per-language window cumsum — the same deterministic-shuffle sort every
    * hash-ordered selection here pays (`selectByTokenBudget`). Output: one
    * row per language with the allocation arithmetic and a digest of the
    * partial-pass doc ids. */
  def unimaxSample(docs: DataFrame, budgetNum: Long = 2, budgetDen: Long = 5,
                   epochs: Long = 2, langCol: String = "lang"): DataFrame = {
    require(budgetNum >= 0 && budgetDen > 0 && epochs >= 1)
    val sized = docs.select(col(langCol).as("lang"), col("doc_id"),
      length(col("text")).cast("long").as("chars"))
    val perLang = sized.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("chars").as("chars_l"))
      .withColumn("cap_l", col("chars_l") * epochs)
    // the whole allocation runs on one row per language — the literal
    // partition key keeps WindowExec off its "No Partition Defined"
    // global-sort warning path (same trick as searchRanked)
    val wAll = Window.partitionBy(lit(0))
    val wAsc = Window.partitionBy(lit(0)).orderBy(col("cap_l").asc, col("lang").asc)
    val alloc = perLang
      .withColumn("total", sum("chars_l").over(wAll))
      .withColumn("budget", expr(s"total * $budgetNum DIV $budgetDen"))
      .withColumn("i", row_number().over(wAsc))
      .withColumn("cum_prev",
        coalesce(sum("cap_l").over(wAsc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_langs", count(lit(1)).over(wAll))
      .withColumn("sat", col("cap_l") * (col("n_langs") - col("i") + 1) + col("cum_prev") <= col("budget"))
      .withColumn("k_sat", sum(when(col("sat"), 1L).otherwise(0L)).over(wAll))
      .withColumn("filled", sum(when(col("sat"), col("cap_l")).otherwise(0L)).over(wAll))
      .withColumn("alloc", when(col("sat"), col("cap_l"))
        .otherwise(expr("(budget - filled) DIV (n_langs - k_sat)")))
      .withColumn("full_epochs", expr("alloc DIV chars_l"))
      .withColumn("rem_chars", expr("alloc % chars_l"))
      .select("lang", "n_docs", "chars_l", "cap_l", "alloc", "full_epochs", "rem_chars")
    val hashed = sized.withColumn("h",
      sha2(concat(lit("unimax:"), col("doc_id").cast("string")), 256))
    val filled = hashed
      .withColumn("cum", sum("chars").over(
        Window.partitionBy("lang").orderBy(col("h").asc, col("doc_id").asc)))
      .join(broadcast(alloc), Seq("lang"))
      .filter(col("cum") <= col("rem_chars"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_partial"), sum("chars").as("partial_chars"),
        sha2(array_join(expr(
          "transform(sort_array(collect_list(doc_id)), x -> CAST(x AS STRING))"), ","), 256)
          .as("partial_sha"))
    alloc.join(filled, Seq("lang"), "left")
      .na.fill(0L, Seq("n_partial", "partial_chars"))
      .withColumn("partial_sha", coalesce(col("partial_sha"), sha2(lit(""), 256)))
  }

  /** Importance reweighting toward a uniform language target — the
    * distribution-shift correction a mixture rebalance applies WITHOUT
    * resampling: every doc of language l gets weight
    * w_l = target_share / current_share = total / (L·chars_l), plus the
    * effective sample size ESS = (Σ n·w)² / Σ n·w² (Kish), the standard
    * "how much corpus is left after reweighting" diagnostic ([[unimaxSample]]
    * and [[temperatureMixture]] are the resampling alternatives).
    *
    * Exactness: weights in 2^14 fixed point via BIGINT floor-division
    * (total·2^14 stays under 2^63 to ~560 TB of text), ESS from the two
    * exact integer moments with one double expression. Shape at scale: one
    * partial-aggregated shuffle to a row per language; two 1-row
    * broadcasts. */
  def importanceReweight(docs: DataFrame): DataFrame = {
    val scale = 16384L
    val perLang = langCounts(docs)
    val tot = perLang.agg(sum("chars_l").as("total"), count(lit(1)).as("n_langs"))
    val w = perLang.join(broadcast(tot))
      .withColumn("w_fx", expr(s"(total * $scale) div (n_langs * chars_l)"))
    val moments = w.agg(sum(expr("n_docs * w_fx")).as("s1"),
      sum(expr("n_docs * w_fx * w_fx")).as("s2"))
    w.join(broadcast(moments))
      .select(col("lang"), col("n_docs"), col("chars_l"),
        expr("round(CAST(chars_l AS DOUBLE) / total, 6)").as("share"),
        expr(s"round(CAST(w_fx AS DOUBLE) / $scale, 6)").as("weight"),
        expr("round(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(s2 AS DOUBLE), 6)")
          .as("ess"))
      .orderBy("lang")
  }

  /** Temperature-scaled multilingual sampling weights (mBERT/XLM-R style),
    * T = 2: w_l ∝ size_l^(1/2) — the standard compromise between
    * proportional sampling (starves tail languages) and uniform (over-
    * trains them). [[unimaxSample]] is the budget-capped alternative; this
    * is the smooth one.
    *
    * α = 1/2 exactly so the only transcendental is `sqrt`, which IEEE 754
    * requires correctly rounded — engine and oracle agree bit-for-bit,
    * unlike a general pow(x, 0.3). sqrt(size) is held in 2^20 fixed point;
    * weights and the `budget`-token allocation are then exact integer
    * ratios with one division per output column.
    *
    * Shape at scale: one partial-aggregated shuffle to a row per language,
    * then a 1-row broadcast for the normalizer. Output per language:
    * (n_docs, chars_l, weight, alloc_chars, epochs — how many times the
    * language's corpus is consumed at this budget). */
  def temperatureMixture(docs: DataFrame, budget: Long = 1000000L): DataFrame =
    temperatureMixtureFromCounts(langCounts(docs), budget)

  /** The additive (lang, n_docs, chars_l) state [[temperatureMixtureFromCounts]]
    * consumes — split out so the streaming maintainer can write it as
    * per-epoch partials and fold by plain sums. */
  def langCounts(docs: DataFrame): DataFrame =
    docs.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(length(col("text"))).as("chars_l"))

  /** [[temperatureMixture]]'s allocation arithmetic over a pre-aggregated
    * (lang, n_docs, chars_l) table. */
  def temperatureMixtureFromCounts(counts: DataFrame,
                                   budget: Long = 1000000L): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val perLang = counts.withColumn("fx",
      expr("CAST(floor(sqrt(CAST(chars_l AS DOUBLE)) * 1048576.0 + 0.5) AS BIGINT)"))
    val norm = perLang.agg(sum("fx").as("sfx"))
    perLang.join(broadcast(norm))
      .select(col("lang"), col("n_docs"), col("chars_l"),
        expr("round(CAST(fx AS DOUBLE) / sfx, 6)").as("weight"),
        // floor-integer allocation: budget·fx ≤ 1e6·(2^20·sqrt(1e12)) ≪ 2^63
        expr(s"CAST(($budget * fx) div sfx AS BIGINT)").as("alloc_chars"),
        expr(s"round(CAST($budget AS DOUBLE) * fx / sfx / chars_l, 6)").as("epochs"))
      .orderBy("lang")
  }
}
