package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, Normalizer}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftFunctions.cosine_similarity

/** Similarity-search operators over an embedding column (`array<float>`):
  *
  *  - brute-force cosine top-k: exact, the verifiable semantics. A small
  *    query set broadcasts against the corpus (no shuffle of the big side);
  *    per-query rank via window. This is the "batch multi-query" form of the
  *    reference's single-query search (SURVEY §2.7).
  *  - cosine pair join: all pairs above a threshold (exact; quadratic —
  *    correctness baseline for the LSH path).
  *  - LSH approximate top-k: MLlib BucketedRandomProjectionLSH on normalized
  *    vectors (L2 ordering == cosine ordering after normalization). The
  *    100 TB path: candidates per query ~ bucket size, not corpus size.
  */
object Similarity {

  /** Exact cosine scores of every (query, item) pair. `queries` must be small
    * (it is broadcast); the corpus side never shuffles. */
  def cosineScores(items: DataFrame, queries: DataFrame): DataFrame =
    TextAnalysis.spreadForCompute(items).crossJoin(broadcast(queries))
      .withColumn("score", cosine_similarity(col("embedding"), col("query_embedding")))

  /** The one per-query ranker for every top-k path in this file: the custom
    * `GroupedTopK` operator (map-side bounded heaps cap shuffle volume at
    * partitions x queries x k) instead of `row_number().over(Window
    * .partitionBy("query_id"))`, which shuffles and fully sorts EVERY scored
    * candidate row — the difference between "passes at sf0.1" and "survives
    * 100x". Equivalence is oracle-proven: q23 (this path) and q31 (GroupedTopK
    * direct) share the same DuckDB oracle. Expects `scored` to carry
    * (query_id, vec_id, score); emits (query_id, vec_id, rnk, score-rounded). */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame =
    graft.plans.GroupedTopK(
        scored.select(col("query_id"), col("vec_id"), col("score")),
        Seq(col("query_id")), Seq(desc("score"), asc("vec_id")), k)
      .select(col("query_id"), col("vec_id"), col("rank").as("rnk"),
        round(col("score"), 4).as("score"))

  /** Exact top-k per query, deterministic order (score desc, vec_id asc). */
  def bruteForceTopK(items: DataFrame, queries: DataFrame, k: Int): DataFrame =
    topKPerQuery(cosineScores(items, queries), k)

  /** Mutual-kNN pair mining with the margin criterion (Artetxe & Schwenk
    * 2019's bitext-mining rule, the standard for aligning two embedding
    * collections — parallel-corpus mining, cross-modal pairing, label
    * transfer): keep (va, vb) only when each is in the OTHER's top-k, and
    * score by margin = cos(va, vb) / (mean of both sides' top-k cosines) —
    * mutual agreement plus locally-normalized similarity kills hub vectors
    * that plain thresholding keeps.
    *
    * Determinism recipe: each cosine is fixed-pointed once
    * (floor(cos * 2^30 + 0.5) as LONG), so the top-k sums are exact
    * integers and the margin is ONE double division — hash-oracled
    * end-to-end. Ranking runs through GroupedTopK both directions. This
    * exact form scores |a| x |b| pairs (the verifiable baseline, like
    * `bruteForceTopK`); at scale the same mutual+margin tail runs over
    * candidate top-k from the rp-LSH/IVF arms instead.
    * Requires both sides to hold >= k vectors (margin normalizes by k).
    * Output: (vec_a, vec_b, score, margin) for mutual pairs. */
  def mutualTopKPairs(a: DataFrame, b: DataFrame, k: Int = 4): DataFrame = {
    require(k >= 1 && k <= 64, s"k must be in [1, 64]: $k")
    val qa = a.select(col("vec_id").as("query_id"), col("embedding").as("query_embedding"))
    val qb = b.select(col("vec_id").as("query_id"), col("embedding").as("query_embedding"))
    def topFx(items: DataFrame, queries: DataFrame): DataFrame =
      graft.plans.GroupedTopK(
        cosineScores(items, queries)
          .withColumn("fx", expr("CAST(floor(score * 1073741824.0 + 0.5) AS BIGINT)"))
          .select(col("query_id"), col("vec_id"), col("score"), col("fx")),
        Seq(col("query_id")), Seq(desc("score"), asc("vec_id")), k)
    // each direction feeds two consumers (the mutual join and its top-k
    // sum) — memoized so the |a| x |b| scoring pass runs once per side
    val tabFull = PlanCache.memo(topFx(b, qa))
    val tbaFull = PlanCache.memo(topFx(a, qb))
    val tab = tabFull.select(col("query_id").as("vec_a"),
      col("vec_id").as("vec_b"), col("score"), col("fx"))
    val tba = tbaFull.select(col("vec_id").as("vec_a"),
      col("query_id").as("vec_b"))
    val sa = tab.groupBy("vec_a").agg(sum("fx").as("sfa"))
    val sb = tbaFull.groupBy(col("query_id").as("vec_b"))
      .agg(sum("fx").as("sfb"))
    tab.join(tba.hint("SHUFFLE_HASH"), Seq("vec_a", "vec_b"))
      .join(sa.hint("SHUFFLE_HASH"), Seq("vec_a"))
      .join(sb.hint("SHUFFLE_HASH"), Seq("vec_b"))
      .select(col("vec_a"), col("vec_b"), round(col("score"), 4).as("score"),
        round(expr(s"CAST(fx AS DOUBLE) * ${2 * k}.0 / (sfa + sfb)"), 6).as("margin"))
  }

  /** Recall@k of the deterministic IVF index against exact brute force —
    * the retrieval-quality monitor a production ANN deployment runs on a
    * probe query set ("measure, don't guess" as an OPERATOR, not just a
    * spec gate). Both arms are existing oracled machinery (q69's cell-
    * pruned probe, q23's exact scorer); the comparison is one id-keyed
    * join + per-query count over 2 x |queries| x k rows, so the audit
    * costs one extra exact pass over the corpus for the probe set only —
    * at 100 TB you run it on a sampled probe set, not every query.
    * Output per query: (query_id, n_overlap, recall). */
  def annRecall(items: DataFrame, queries: DataFrame, k: Int = 3,
                nLists: Int = 8, iters: Int = 3, nProbe: Int = 3): DataFrame = {
    require(k >= 1)
    val ivf = detIvfTopK(items, queries, k, nLists, iters, nProbe)
      .select("query_id", "vec_id")
    // both arms are |queries| x k rows — broadcast, never a sort-merge
    val exact = bruteForceTopK(items, queries, k).select("query_id", "vec_id")
    val hits = ivf.join(broadcast(exact), Seq("query_id", "vec_id"))
      .groupBy("query_id").agg(count(lit(1)).as("n_overlap"))
    queries.select("query_id")
      .join(broadcast(hits), Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        expr(s"round(CAST(coalesce(n_overlap, 0) AS DOUBLE) / $k, 6)").as("recall"))
  }

  /** Hard-negative mining for contrastive training: per query, the top-k
    * most similar corpus vectors whose `label` DIFFERS from the query's —
    * "close in embedding space, wrong class", the negatives that actually
    * move a contrastive loss (easy negatives are already far). Same scale
    * shape as `bruteForceTopK` (tiny query side broadcast, the corpus never
    * shuffles, GroupedTopK ranks) with the label predicate BELOW the
    * ranker, so the partial heaps only ever hold eligible rows. `queries`
    * carries (query_id, query_embedding, query_label); output keeps the
    * negative's label for downstream batch assembly. */
  def hardNegatives(items: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = items.crossJoin(broadcast(queries))
      .filter(col("label") =!= col("query_label"))
      .withColumn("score", cosine_similarity(col("embedding"), col("query_embedding")))
      .select(col("query_id"), col("vec_id"), col("label"), col("score"))
    graft.plans.GroupedTopK(scored,
        Seq(col("query_id")), Seq(desc("score"), asc("vec_id")), k)
      .select(col("query_id"), col("vec_id"), col("label"),
        col("rank").as("rnk"), round(col("score"), 4).as("score"))
  }

  /** kNN label-noise audit (confident-learning-lite, Northcutt et al.
    * 2021's intuition without the model): for every labeled vector, the
    * fraction of its k nearest neighbors (cosine, self excluded) whose
    * label DISAGREES — a majority-disagreeing example sits inside another
    * class's region and is a mislabel/ambiguity suspect, the rows a
    * training pipeline routes to re-annotation before they poison a
    * classifier head.
    *
    * Determinism: neighbors rank on the fixed-point cosine
    * (floor(cos * 2^30 + 0.5), the mutualTopKPairs recipe) with vec_id
    * tie-break, so the cut is integer-exact and hash-oracled; outputs are
    * integer counts plus one division. This exact form scores
    * corpus x corpus (the verifiable baseline, like `mutualTopKPairs`);
    * at scale the same disagreement tail runs over ANN candidates from
    * the rp-LSH/IVF arms. Output: (vec_id, label, n_disagree, disagree,
    * suspect = strict-majority disagreement). */
  def knnLabelNoise(vecs: DataFrame, k: Int = 4): DataFrame = {
    require(k >= 1 && k <= 64, s"k must be in [1, 64]: $k")
    val items = vecs.select(col("vec_id"), col("embedding"), col("label"))
    val queries = vecs.select(col("vec_id").as("query_id"),
      col("embedding").as("query_embedding"), col("label").as("query_label"))
    labelNoiseFromCandidates(knnCandidates(items, queries, k), k)
  }

  /** The per-query top-`k` labeled neighbour candidates shared by
    * [[knnLabelNoise]], [[knnConfusion]] and their streaming maintainers:
    * (query_id, query_label, vec_id, label, fx) rows, `k` per query,
    * ranked by the 2^30 fixed-point cosine with vec_id tie-break, self
    * excluded. This frame is the audits' MERGEABLE state: the top-k over
    * a union corpus equals the top-k of unioned per-partial top-k's (the
    * KMV k-min argument), so per-epoch candidate partials fold exactly. */
  private[graft] def knnCandidates(items: DataFrame, queries: DataFrame,
                                   k: Int): DataFrame = {
    val scored = cosineScores(items, queries)
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("fx", expr("CAST(floor(score * 1073741824.0 + 0.5) AS BIGINT)"))
      .select(col("query_id"), col("query_label"), col("vec_id"),
        col("label"), col("fx"))
    graft.plans.GroupedTopK(scored,
        Seq(col("query_id")), Seq(desc("fx"), asc("vec_id")), k)
      .select("query_id", "query_label", "vec_id", "label", "fx")
  }

  /** The fixed-count hash-ordered probe sample both audits query with:
    * first `maxQueries` vec_ids by sha256('knnq:' id) — deterministic on
    * any engine, a TakeOrderedAndProject top-maxQueries, bounded
    * regardless of corpus size. */
  def knnProbes(vecs: DataFrame, maxQueries: Int): DataFrame = {
    require(maxQueries >= 1, s"bad maxQueries: $maxQueries")
    vecs.select(col("vec_id"), col("embedding"), col("label"),
        sha2(concat(lit("knnq:"), col("vec_id").cast("string")), 256).as("__h"))
      .orderBy(col("__h"), col("vec_id")).limit(maxQueries)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("query_embedding"), col("label").as("query_label"))
  }

  /** [[hubnessTopHubs]]' k-occurrence fold over a candidate frame (from
    * [[knnCandidates]] or a folded streaming state) — the audit's
    * aggregation half, reusable wherever per-query neighbour lists
    * already exist (the maintained streaming state, an ANN index's
    * materialized lists). Note the candidate rank is the 2^30 fixed-point
    * cosine (the audit-family convention), where the one-shot
    * [[hubnessTopHubs]] ranks raw doubles — identical except for
    * sub-quantum ties. */
  private[graft] def hubnessFromCandidates(cands: DataFrame,
                                           maxHubs: Int = 20): DataFrame = {
    val occ = cands.groupBy("vec_id").agg(count(lit(1)).as("k_occ"))
    val slots = cands.agg(count(lit(1)).as("n_slots"))
    occ.join(broadcast(slots))
      .select(col("vec_id"), col("k_occ"),
        expr("round(CAST(k_occ AS DOUBLE) / n_slots, 6)").as("slot_share"))
      .orderBy(desc("k_occ"), asc("vec_id")).limit(maxHubs)
  }

  /** [[knnLabelNoise]]'s per-query disagreement fold over a candidate
    * frame (from [[knnCandidates]] or a folded streaming state). */
  private[graft] def labelNoiseFromCandidates(cands: DataFrame,
                                              k: Int): DataFrame =
    cands
      .groupBy("query_id", "query_label")
      .agg(sum(when(col("label") =!= col("query_label"), 1L).otherwise(0L))
        .as("n_disagree"))
      .select(col("query_id").as("vec_id"), col("query_label").as("label"),
        col("n_disagree"),
        expr(s"round(CAST(n_disagree AS DOUBLE) / $k, 6)").as("disagree"),
        (col("n_disagree") * 2 > k).as("suspect"))

  /** kNN-classifier confusion matrix — the standard eval artifact over an
    * embedding space: each vector's predicted label is the MAJORITY among
    * its k nearest neighbours (leave-one-out, self excluded) and the
    * output is the (actual, predicted) cell counts with row-normalized
    * fractions. [[knnLabelNoise]] scores per-VECTOR disagreement for
    * re-annotation routing; this aggregates the same neighbourhoods into
    * the per-CLASS error structure (which classes leak into which).
    *
    * Determinism: the same 2^30 fixed-point cosine ranks as the noise
    * audit; majority ties break (count desc, label asc) through a second
    * GroupedTopK — never a window over the corpus. Output ordered
    * (actual, predicted).
    *
    * Scale: leave-one-out over the FULL collection is |V|×|V| scoring by
    * definition, so the query side is capped at a FIXED count — the
    * first `maxQueries` vec_ids by sha256('knnq:' id), the
    * [[hubnessTopHubs]] hash-ordered bounded sample (deterministic on
    * both engines, a TakeOrderedAndProject top-maxQueries, never a full
    * sort; a sampling MODULUS would still scale with the corpus). Below
    * the cap the matrix is the exact leave-one-out confusion; above it
    * the cells are relative-frequency estimates from maxQueries sampled
    * query rows (row_frac unbiased) and cost is maxQueries × corpus —
    * bounded regardless of corpus growth. */
  def knnConfusion(vecs: DataFrame, k: Int = 4,
                   maxQueries: Int = 4096): DataFrame = {
    require(k >= 1 && k <= 64, s"k must be in [1, 64]: $k")
    val items = vecs.select(col("vec_id"), col("embedding"), col("label"))
    confusionFromCandidates(
      knnCandidates(items, knnProbes(vecs, maxQueries), k))
  }

  /** [[knnConfusion]]'s majority-vote → cell fold over a candidate frame
    * (from [[knnCandidates]] or a folded streaming state): per-query
    * label votes, majority with (votes desc, label asc) tie-break through
    * a second GroupedTopK — never a window over the corpus — then
    * (actual, predicted) cell counts with row-normalized fractions. */
  private[graft] def confusionFromCandidates(cands: DataFrame): DataFrame = {
    val votes = cands
      .groupBy("query_id", "query_label", "label")
      .agg(count(lit(1)).as("votes"))
    val predicted = graft.plans.GroupedTopK(
        votes.select(col("query_id"), col("query_label"), col("label"),
          col("votes")),
        Seq(col("query_id")), Seq(desc("votes"), asc("label")), 1)
    val cells = predicted
      .groupBy(col("query_label").as("actual"), col("label").as("predicted"))
      .agg(count(lit(1)).as("n"))
    val rowTotals = cells.groupBy(col("actual").as("a2"))
      .agg(sum("n").as("row_n"))
    cells.join(broadcast(rowTotals), col("actual") === col("a2"))
      .select(col("actual"), col("predicted"), col("n"),
        expr("round(CAST(n AS DOUBLE) / row_n, 6)").as("row_frac"))
      .orderBy("actual", "predicted")
  }

  /** Embedding drift monitor: per label, the cosine between the centroids
    * of two deterministic halves of the corpus (`splitExpr`, default
    * vec_id parity) — the "did my embedding distribution move" check an
    * embedding pipeline runs between model versions or time windows
    * (drift_cos near 1 = stable; lower = the label's region moved).
    *
    * Determinism (the detKMeans fixed-point recipe): components quantize
    * to integers (floor(v * 1024 + 0.5)), per-(label, half, dim) sums are
    * exact BIGINT aggregates, and the count divisions CANCEL in cosine —
    * cos(sa/na, sb/nb) = cos(sa, sb) — so the only float math is one
    * fixed-order fold per dot/norm over 64 integers, identical on any
    * engine or partitioning. Long arithmetic holds to ~2^42 rows per
    * (label, half); the dim-keyed aggregate is map-side combined and the
    * final join is per-label tiny. Output: (label, n_a, n_b,
    * drift_cos). */
  def centroidDrift(items: DataFrame, splitExpr: String = "vec_id % 2"): DataFrame =
    centroidDriftFromPartials(centroidDriftPartials(items, splitExpr))

  /** The mergeable state behind [[centroidDrift]]: per-(label, half, dim)
    * fixed-point component sums plus the per-(label, half) row count as a
    * `dim = -1` row — everything ADDITIVE, so per-batch partials fold by
    * one keyed sum and the streaming maintainer never rescans earlier
    * batches. */
  private[graft] def centroidDriftPartials(items: DataFrame,
                                           splitExpr: String): DataFrame = {
    val q = items
      .select(col("label"), expr(splitExpr).cast("int").as("grp"),
        posexplode(col("embedding")).as(Seq("i", "v")))
      .select(col("label"), col("grp"), col("i"),
        expr("CAST(floor(CAST(v AS DOUBLE) * 1024 + 0.5) AS BIGINT)").as("q"))
    q.groupBy("label", "grp", "i").agg(sum("q").as("s"))
      .unionByName(items
        .select(col("label"), expr(splitExpr).cast("int").as("grp"))
        .groupBy("label", "grp")
        .agg(count(lit(1)).as("s"))
        .withColumn("i", lit(-1)))
  }

  /** [[centroidDrift]]'s cosine assembly over a (label, grp, i, s)
    * partial frame — one keyed sum merges any number of partials first,
    * so the one-shot and streaming forms share this fold verbatim. */
  private[graft] def centroidDriftFromPartials(partials: DataFrame): DataFrame = {
    def dot(u: String, v: String) =
      s"aggregate(zip_with($u, $v, (x, y) -> x * y), 0.0D, (acc, p) -> acc + p)"
    val merged = partials.groupBy("label", "grp", "i").agg(sum("s").as("s"))
    val vecs = merged.filter(col("i") >= 0).groupBy("label", "grp")
      .agg(expr("transform(sort_array(collect_list(struct(i, s))), p -> p.s)").as("sv"))
    val counts = merged.filter(col("i") === -1)
      .select(col("label"), col("grp"), col("s").as("n"))
    val sides = vecs.join(counts.hint("SHUFFLE_HASH"), Seq("label", "grp"))
    val a = sides.filter(col("grp") === 0)
      .select(col("label"), col("sv").as("sa"), col("n").as("n_a"))
    val b = sides.filter(col("grp") === 1)
      .select(col("label"), col("sv").as("sb"), col("n").as("n_b"))
    a.join(b.hint("SHUFFLE_HASH"), Seq("label"))
      .withColumn("drift_cos", expr(
        s"""round(CASE WHEN ${dot("sa", "sa")} = 0.0D OR ${dot("sb", "sb")} = 0.0D
             THEN 0.0
             ELSE ${dot("sa", "sb")} / (sqrt(${dot("sa", "sa")}) * sqrt(${dot("sb", "sb")})) END, 6)"""))
      .select("label", "n_a", "n_b", "drift_cos")
  }

  /** Triplet mining for metric learning: per anchor query, the nearest
    * SAME-label vector (excluding the anchor itself — the positive) and the
    * nearest DIFFERENT-label vector (the hard negative, `hardNegatives`
    * k=1) — the (anchor, positive, negative) batch a triplet/contrastive
    * loss consumes. Both legs are the broadcast-queries + GroupedTopK
    * shape over one corpus pass each; the final join is queries-sized.
    * Anchors whose label has no other member (no positive) drop — a
    * triplet needs all three rows. Output: (query_id, pos_id, pos_score,
    * neg_id, neg_score). */
  def tripletMine(items: DataFrame, queries: DataFrame): DataFrame = {
    val scored = items.crossJoin(broadcast(queries))
      .filter(col("label") === col("query_label") && col("vec_id") =!= col("query_id"))
      .withColumn("score", cosine_similarity(col("embedding"), col("query_embedding")))
      .select(col("query_id"), col("vec_id"), col("score"))
    val pos = graft.plans.GroupedTopK(scored,
        Seq(col("query_id")), Seq(desc("score"), asc("vec_id")), 1)
      .select(col("query_id"), col("vec_id").as("pos_id"),
        round(col("score"), 4).as("pos_score"))
    val neg = hardNegatives(items, queries, 1)
      .select(col("query_id"), col("vec_id").as("neg_id"),
        col("score").as("neg_score"))
    pos.join(neg.hint("SHUFFLE_HASH"), Seq("query_id"))
  }

  /** Exact all-pairs cosine >= threshold (a < b). Quadratic — use only as
    * correctness baseline or on bounded partitions; the scale path is
    * `lshSimilarityJoin`. */
  def cosinePairs(items: DataFrame, threshold: Double): DataFrame =
    items.as("a").join(items.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("score", cosine_similarity(col("a.embedding"), col("b.embedding")))
      .filter(col("score") >= threshold)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(col("score"), 4).as("score"))

  private def normalized(items: DataFrame, inCol: String): DataFrame = {
    val withVec = items.withColumn("vec",
      array_to_vector(col(inCol).cast("array<double>")))
    new Normalizer().setInputCol("vec").setOutputCol("nvec").setP(2.0)
      .transform(withVec)
  }

  /** Approximate near-duplicate pair join via LSH: normalize, bucket with
    * random hyperplane projections, `approxSimilarityJoin` the corpus with
    * itself inside the L2 radius implied by the cosine threshold
    * (`d^2 = 2 - 2cos` on unit vectors), re-score candidates with exact
    * cosine. Every returned pair truly satisfies the threshold (exact
    * verification); recall depends on bucket collisions — the quadratic
    * `cosinePairs` is the exactness baseline, this is the 100 TB path. */
  def lshNearDupPairs(items: DataFrame, threshold: Double,
                      bucketLength: Double = 0.5, numTables: Int = 6): DataFrame = {
    val radius = math.sqrt(math.max(2.0 - 2.0 * threshold, 0.0)) + 1e-9
    // evaluated 3x downstream (fit + both sides of the self-join);
    // MEMORY_ONLY via PlanCache.memo (recompute on eviction, one entry
    // across repeat builds, released by PlanCache.releaseAll)
    val ni = PlanCache.memo(normalized(items, "embedding"))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("nvec").setOutputCol("hashes")
      .setBucketLength(bucketLength).setNumHashTables(numTables).setSeed(42L)
    val model = lsh.fit(ni)
    model.approxSimilarityJoin(ni, ni, radius, "l2dist")
      .filter(col("datasetA.vec_id") < col("datasetB.vec_id"))
      .select(col("datasetA.vec_id").as("vec_a"), col("datasetB.vec_id").as("vec_b"),
        col("datasetA.embedding").as("ea"), col("datasetB.embedding").as("eb"))
      .withColumn("score", cosine_similarity(col("ea"), col("eb")))
      .filter(col("score") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("score"), 4).as("score"))
      .distinct()
  }

  /** A built IVF index: per-vector cell assignments + the (tiny) centroid
    * table. Build once with `ivfIndex`, query many times with `ivfProbe`,
    * persist with `save` (assignments land cell-partitioned, so per-cell
    * reads prune partitions) and recover with `Similarity.loadIvfIndex`. */
  final case class IvfIndex(assignments: DataFrame, centroids: DataFrame) {
    def save(path: String): Unit = {
      assignments.write.mode("overwrite").partitionBy("cell")
        .parquet(s"$path/assignments")
      centroids.write.mode("overwrite").parquet(s"$path/centroids")
    }
  }

  /** Generation-aware load (the `loadSqIndex` resolve rule): a `_GEN`
    * pointer at `path` resolves to the serving generation; a plain saved
    * index dir reads directly. */
  def loadIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndex = {
    val dir = resolveIndexDir(spark, path)
    IvfIndex(spark.read.parquet(s"$dir/assignments"),
      spark.read.parquet(s"$dir/centroids"))
  }

  /** One-off IVF index build: KMeans-partition the corpus into `nLists`
    * cells on normalized vectors. The normalized corpus is cached for the
    * duration of the build (KMeans iterates over it) and released once the
    * assignments are materialized — the returned assignments are themselves
    * cached, since an index exists to be probed repeatedly. Deterministic
    * under the fixed seed. */
  def ivfIndex(items: DataFrame, nLists: Int = 16): IvfIndex = {
    val key = memoKey(items, s"ivf|$nLists").map(s => (items.sparkSession, s))
    key.foreach { mk =>
      ivfMemo.synchronized {
        ivfMemo.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
        ivfMemo.get(mk)
      } match {
        case Some(hit) => return hit
        case None =>
      }
    }
    val built = buildIvfIndex(items, nLists)
    key.foreach(mk => ivfMemo.synchronized { ivfMemo.update(mk, built) })
    built
  }

  private def buildIvfIndex(items: DataFrame, nLists: Int): IvfIndex = {
    val ni = normalized(items, "embedding").cache()
    // Fit on a bounded sample: centroid quality saturates far below full
    // corpus size, while MLlib KMeans cost is per-iteration over ALL fit
    // rows — at 100 TB fitting on the corpus itself is a non-starter. Every
    // vector is still assigned to its cell below; the recall@3 gate in
    // SimilaritySpec holds the sampled fit to the same quality bar.
    val n = ni.count()
    val fitRows = math.max(4096L, nLists * 256L)
    val fitInput =
      if (n <= fitRows * 2) ni
      else ni.sample(withReplacement = false, fitRows.toDouble / n, seed = 42L)
    // Random init instead of k-means||: the parallel init alone costs ~5
    // full passes, and cell quality for IVF bucketing (held to the recall@3
    // gate) does not need it — Lloyd iterations converge either way.
    val km = new KMeans().setK(nLists).setSeed(42L).setMaxIter(8)
      .setInitMode("random")
      .setFeaturesCol("nvec").setPredictionCol("cell")
    val model = km.fit(fitInput)
    // an index exists to be probed repeatedly: memoized like every
    // plan-builder persist (repeat builds share one entry; release with
    // PlanCache.releaseAll)
    val assigned = PlanCache.memo(model.transform(ni)
      .select(col("vec_id"), col("embedding"), col("cell")))
    assigned.count() // materialize so the normalized input can be released
    ni.unpersist()
    val spark = items.sparkSession
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.map(_.toFloat))
    }.toSeq.toDF("cell", "centroid")
    IvfIndex(assigned, centroids)
  }

  /** Assign vectors to the nearest centroid of an EXISTING index — squared
    * Euclidean on the L2-normalized vector, the KMeans assignment rule
    * (centroids are cell means, NOT unit vectors, so argmax-cosine would
    * mis-assign; the |c|^2 term matters) — without refitting. The centroid
    * table is tiny by construction (nLists rows): it collects into one
    * literal expression, so assignment is map-only — no join, no shuffle,
    * no MLlib model object needed (a loaded index carries only the table).
    * Ties break to the lowest cell id; a zero vector passes through
    * un-normalized (the Normalizer's behavior at build time). */
  def assignCells(vectors: DataFrame, centroids: DataFrame,
                  embCol: String = "embedding"): DataFrame = {
    val cents = centroids.select("cell", "centroid").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
      .sortBy(_._1)
    require(cents.nonEmpty, "empty centroid table")
    val centsSql = cents.map { case (_, c) =>
      c.map(v => v.toDouble.toString).mkString("array(", ", ", ")")
    }.mkString("array(", ", ", ")")
    val cellIds = cents.map(_._1).mkString("array(", ", ", ")")
    vectors
      .withColumn("__nrm", expr(
        s"sqrt(aggregate($embCol, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"))
      .withColumn("__nv", expr(
        s"IF(__nrm = 0.0, CAST($embCol AS array<double>), transform($embCol, x -> CAST(x AS DOUBLE) / __nrm))"))
      .withColumn("__d2", expr(
        s"transform($centsSql, c -> aggregate(zip_with(__nv, c, (x, y) -> (x - y) * (x - y)), CAST(0.0 AS DOUBLE), (a, x) -> a + x))"))
      .withColumn("cell", expr(
        s"""element_at($cellIds, aggregate(sequence(1, size(__d2)),
              named_struct('bd', CAST('Infinity' AS DOUBLE), 'bi', 1),
              (acc, i) -> IF(__d2[i-1] < acc.bd, named_struct('bd', __d2[i-1], 'bi', i), acc),
              acc -> acc.bi))"""))
      .select(col("vec_id"), col(embCol), col("cell"))
  }

  /** Incremental IVF maintenance: replace-by-id upsert of a delta without a
    * full rebuild — delta vectors re-assign against the EXISTING (frozen)
    * centroids, everything else is untouched. Work ~ |delta| x nLists map
    * cost + one anti-join on vec_id; at 100 TB a re-ingest touches the
    * delta, not the corpus. (Centroids drift only under a full `ivfIndex`
    * rebuild — the classic IVF maintenance contract: cheap upserts between
    * periodic refits.) */
  def upsertIvf(index: IvfIndex, delta: DataFrame): IvfIndex = {
    val assigned = assignCells(delta, index.centroids)
    val kept = index.assignments
      .join(delta.select("vec_id"), Seq("vec_id"), "left_anti")
      .select("vec_id", "embedding", "cell")
    IvfIndex(assigned.unionByName(kept), index.centroids)
  }

  /** Persisted-index form of `upsertIvf`: rewrite ONLY the cell partitions
    * the delta touches (dynamic partition overwrite — the `Engine.writeIndex`
    * machinery), leaving every untouched cell's files in place.
    *
    * "Touched" must include BOTH the delta ids' NEW cells (where re-assigned
    * rows land) and their OLD cells (where the stale rows being replaced
    * live) — a delta whose updated embedding moves a vector to a different
    * cell would otherwise leave the stale row in an unrewritten partition,
    * and the index would answer probes with both versions of the id.
    *
    * The merged rows are staged to a temp directory and the overwrite runs
    * from that materialized copy: a cache (persist+count) is NOT durable —
    * lost blocks would recompute the lineage against partially-overwritten
    * files mid-write and corrupt the index. */
  def upsertIvfAt(spark: org.apache.spark.sql.SparkSession, path: String,
                  delta: DataFrame): Unit = {
    val idx = loadIvfIndex(spark, path)
    val assigned = assignCells(delta, idx.centroids)
    upsertCellTable(spark, s"$path/assignments", idx.assignments,
      assigned.select("vec_id", "embedding", "cell"),
      delta.select("vec_id"), Seq("vec_id", "embedding"))
  }

  /** The touched-partitions-only upsert shared by the cell-partitioned
    * persisted tables: rewrite ONLY the partitions the delta touches —
    * its ids' NEW cells (where re-assigned rows land) AND their OLD cells
    * (where the stale rows being replaced live); a delta whose updated
    * embedding moves a vector to a different cell would otherwise leave
    * the stale row in an unrewritten partition. A touched OLD cell whose
    * every row was a moved delta id ends up empty — its partition is
    * REMOVED explicitly (the [[deleteFromCellTable]] rule: dynamic
    * overwrite only rewrites partitions present in the staged frame, so
    * an emptied cell would otherwise keep serving the stale rows). */
  private def upsertCellTable(spark: org.apache.spark.sql.SparkSession,
                              tableDir: String, table: DataFrame,
                              newRows: DataFrame, deltaIds: DataFrame,
                              rowCols: Seq[String]): Unit = {
    val oldCells = table
      .join(broadcast(deltaIds), Seq("vec_id"))
      .select("cell")
    val touched = newRows.select("cell").unionByName(oldCells).distinct()
    val kept = table.join(broadcast(touched), Seq("cell"))
      .join(broadcast(deltaIds), Seq("vec_id"), "left_anti")
      .select((rowCols :+ "cell").map(col): _*)
    val tmp = s"$tableDir.__staging"
    newRows.select((rowCols :+ "cell").map(col): _*).unionByName(kept)
      .write.mode("overwrite").parquet(tmp)
    val staged = spark.read.parquet(tmp)
    // bounded collects: cell domain is nLists by construction
    val stagedCells = staged.select("cell").distinct()
      .collect().map(_.getInt(0)).toSet
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    touched.distinct().collect().map(_.getInt(0))
      .filterNot(stagedCells).foreach { c =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$tableDir/cell=$c"), true)
      }
    staged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("cell").parquet(tableDir)
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
  }

  /** Delete-by-id maintenance on a SAVED IVF index — the erasure leg of
    * the persisted lifecycle (build → upsert → DELETE → probe), the
    * right-to-erasure path a production index must serve WITHOUT a refit
    * or full rewrite: only the cell partitions the deleted ids live in
    * are rewritten (partition-pruned read, staged copy — the
    * `upsertIvfAt` durability rule), centroids stay frozen (deletes do
    * not move cell geometry; a periodic retrain does). A touched cell
    * whose every vector is deleted gets its partition REMOVED explicitly:
    * dynamic partition overwrite only rewrites partitions present in the
    * staged frame, so an emptied cell would otherwise keep serving its
    * stale rows — and the removal runs BEFORE the overwrite so the
    * EMPTIED-cell window fails closed (a crash between the two steps has
    * already dropped those cells; overwrite-first would leave them
    * serving deleted ids until the retry). Partially-deleted cells do
    * keep serving their deleted ids until the overwrite lands, so a
    * crashed call must be RETRIED to completion — both step orders
    * converge on the rerun; the ordering only narrows the window, it is
    * not a full crash-atomicity guarantee. A delete that would empty the
    * ENTIRE index fails loudly instead: the next load would otherwise
    * die on parquet schema inference over a part-less directory, far
    * from the cause. */
  def deleteIvfAt(spark: org.apache.spark.sql.SparkSession, path: String,
                  ids: DataFrame): Unit =
    deleteFromCellTable(spark, s"$path/assignments", ids,
      Seq("vec_id", "embedding"))

  /** The partition-pruned delete-by-id shared by every cell-partitioned
    * persisted table (IVF coarse assignments, cell-partitioned PQ codes):
    * only the cell partitions the deleted ids live in are read and
    * rewritten (staged copy — the `upsertIvfAt` durability rule), an
    * emptied touched cell gets its partition REMOVED explicitly (dynamic
    * overwrite only rewrites partitions present in the staged frame), and
    * the removal runs BEFORE the overwrite so the emptied-cell window
    * fails closed. Partially-deleted cells keep serving their deleted ids
    * until the overwrite lands, so a crashed call must be retried to
    * completion — both step orders converge on the rerun. A delete that
    * would empty the ENTIRE table fails loudly (a part-less dir fails the
    * next load far from the cause). */
  private def deleteFromCellTable(spark: org.apache.spark.sql.SparkSession,
                                  tableDir: String, ids: DataFrame,
                                  rowCols: Seq[String]): Unit = {
    val table = spark.read.parquet(tableDir)
    // bounded collect: cell domain is nLists by construction
    val touched = table
      .join(broadcast(ids.select("vec_id")), Seq("vec_id"))
      .select("cell").distinct().collect().map(_.getInt(0)).toSeq
    if (touched.isEmpty) return
    val kept = table.filter(col("cell").isin(touched: _*))
      .join(broadcast(ids.select("vec_id")), Seq("vec_id"), "left_anti")
      .select((rowCols :+ "cell").map(col): _*)
    val tmp = s"$tableDir.__staging"
    kept.write.mode("overwrite").parquet(tmp)
    val staged = spark.read.parquet(tmp)
    val survivors = staged.select("cell").distinct()
      .collect().map(_.getInt(0)).toSet
    // the untouched-cells probe runs ONLY in the would-empty edge case —
    // an unconditional full-table distinct here would tax every takedown
    // with a corpus scan just to serve the refuse-empty guard
    require(survivors.nonEmpty || !table
        .filter(!col("cell").isin(touched: _*)).limit(1).isEmpty,
      s"delete would empty the entire table at $tableDir — refusing " +
        "(drop the index directory instead if that is intended)")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    touched.filterNot(survivors).foreach { c =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$tableDir/cell=$c"), true)
    }
    staged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("cell").parquet(tableDir)
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
  }

  /** The build-once scaffold shared by every persisted-index ensure*
    * wrapper: key a tmp dir by the SEMANTIC parameters (the `$nLists|$iters`
    * convention — every parameter that changes the index content must be in
    * `key`), guard the build with the `_INDEX_READY` marker + build lock
    * (double-checked, no non-local return inside the lock), and hand
    * `build` the index dir. One definition so a marker-protocol fix lands
    * everywhere at once. */
  private def ensureIndexDir(spark: org.apache.spark.sql.SparkSession,
                             prefix: String, key: String)
                            (build: String => Unit): String = {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft-$prefix-" +
      graft.TmpCache.dirKey(key)
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val index = s"$base/index"
    val marker = new org.apache.hadoop.fs.Path(base, "_INDEX_READY")
    if (fs.exists(marker)) return index
    graft.TmpCache.withBuildLock(base) {
      if (!fs.exists(marker)) {
        build(index)
        fs.create(marker, true).close()
      }
    }
    index
  }

  // ------------------------------------- generation-pointer serving —

  /** Zero-downtime generation serving for the persisted ANN index family
    * (the `Engine.writeIndexVersioned` pattern applied to the IVF / IVF-PQ
    * / SQ8 / BQ stores): the index ROOT holds numbered generation dirs
    * (`gen=N/`) plus a tiny `_GEN` pointer file naming the serving one.
    * Readers resolve the pointer once per query ([[resolveIndexDir]]) and
    * read only that generation; STRUCTURAL rewrites (retrain, compact,
    * the full-table SQ/BQ/flat rewrites) build the NEXT generation
    * completely beside the serving one and then flip the pointer (staged
    * `_GEN.tmp` + rename — atomic on HDFS/object stores with atomic
    * rename), so a concurrent probe never sees a missing or
    * mixed-generation table and a crashed build never touches the serving
    * copy (the partial `gen=N+1` dir is cleared and rebuilt by the
    * retry). Partition-pruned in-place mutations (`upsertIvfAt`,
    * `deleteIvfAt`, the cell-partitioned PQ upsert/delete) stay in-place
    * WITHIN the serving generation — rewriting only the touched cell
    * partitions is exactly what a new generation would throw away.
    * [[pruneGens]] keeps the previous generation around for in-flight
    * readers (the `pruneIndexVersions` keep=2 rule) and drops older
    * ones. */
  def currentGen(spark: org.apache.spark.sql.SparkSession,
                 root: String): Option[Int] = {
    val p = new org.apache.hadoop.fs.Path(s"$root/_GEN")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim.toInt)
      finally in.close()
    }
  }

  /** The directory the index ROOT currently serves from: the `_GEN`
    * generation dir when the pointer exists, the root itself for a legacy
    * (pre-generation) layout — so loaders work over both. */
  def resolveIndexDir(spark: org.apache.spark.sql.SparkSession,
                      root: String): String =
    currentGen(spark, root).map(n => s"$root/gen=$n").getOrElse(root)

  /** Start building the NEXT generation: returns (number, dir) with any
    * partial dir from a crashed earlier build cleared. The serving
    * generation is never touched. */
  private def beginGen(spark: org.apache.spark.sql.SparkSession,
                       root: String): (Int, String) = {
    val n = currentGen(spark, root).getOrElse(0) + 1
    val dir = s"$root/gen=$n"
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    (n, dir)
  }

  /** Flip the `_GEN` pointer to a COMPLETELY built generation — staged
    * tmp write + ATOMIC REPLACE rename (`FileContext` with
    * `Options.Rename.OVERWRITE`, the POSIX/HDFS atomic-rename path): a
    * delete-then-rename flip would leave a pointerless window in which a
    * concurrent reader of a pure-generation root resolves to nothing.
    * The zero-downtime spec probes in a loop WHILE a retrain flips this
    * pointer. */
  private def commitGen(spark: org.apache.spark.sql.SparkSession,
                        root: String, n: Int): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(s"$root/_GEN.tmp")
    val out = fs.create(tmp, true)
    try out.write(n.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val ptr = new org.apache.hadoop.fs.Path(s"$root/_GEN")
    org.apache.hadoop.fs.FileContext.getFileContext(ptr.toUri, conf)
      .rename(tmp, ptr, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Drop all but the newest `keep` generations (the serving one plus one
    * predecessor for in-flight readers, by default). */
  def pruneGens(spark: org.apache.spark.sql.SparkSession, root: String,
                keep: Int = 2): Seq[Int] = {
    require(keep >= 1, "must keep at least the serving generation")
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootP)) return Nil
    val gens = fs.listStatus(rootP).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen="))
      .map(_.getPath.getName.stripPrefix("gen=").toInt).sorted
    val drop = gens.dropRight(keep)
    drop.foreach(n =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/gen=$n"), true))
    drop
  }

  /** Wipe an index root before a from-scratch ensure* build: the build
    * body owns the dir exclusively (no `_INDEX_READY` marker yet, build
    * lock held), and starting from a clean slate makes every retried
    * build identical — no stale generation or pointer from a crashed
    * earlier attempt can leak into the rebuilt index. */
  private def resetIndexRoot(spark: org.apache.spark.sql.SparkSession,
                             root: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  /** Copy a TINY parquet table (centroids, codebooks — nLists / m x ksub
    * rows) into a new generation that leaves it unchanged. */
  private def copyTinyParquet(spark: org.apache.spark.sql.SparkSession,
                              src: String, dst: String): Unit =
    spark.read.parquet(src).coalesce(1).write.mode("overwrite").parquet(dst)

  /** Load the serving generation of a persisted det-IVF root. */
  def loadIvfAt(spark: org.apache.spark.sql.SparkSession,
                root: String): IvfIndex =
    loadIvfIndex(spark, resolveIndexDir(spark, root))

  /** Load the serving generation of a persisted IVF-PQ root (coarse
    * quantizer + cell-partitioned codes resolved through ONE pointer, so
    * the pair can never mix generations). */
  def loadIvfPqAt(spark: org.apache.spark.sql.SparkSession,
                  root: String): (IvfIndex, PqIndex) = {
    val g = resolveIndexDir(spark, root)
    (loadIvfIndex(spark, s"$g/coarse"), loadPqIndex(spark, s"$g/pq"))
  }

  /** Build-once cache for the DECLARED deleted-index query (q287): the
    * q261 two-wave lifecycle EXTENDED by the erasure leg — fit+save on
    * the even wave, upsert the odd wave, then [[deleteIvfAt]] every
    * `vec_id % 5 == 3` (a deterministic fifth of the corpus, both waves),
    * probe from the saved files. Separate cache dir from the q261 index
    * ON PURPOSE: deleting from the shared index would corrupt q261; the
    * coarse fit is detKMeans-memoized, so the rebuild costs one
    * assignment pass, not a second Lloyd run. */
  def ensurePersistedDetIvfDeleted(spark: org.apache.spark.sql.SparkSession,
                                   embeddings: DataFrame, sfDir: String,
                                   nLists: Int = 8, iters: Int = 3,
                                   delMod: Int = 5, delRes: Int = 3): String = {
    // every semantic parameter lives in the key material (the
    // $nLists|$iters convention) — including the delete predicate, so a
    // predicate change can never serve a stale deleted-set from cache
    ensureIndexDir(spark, "detivfdel", s"$sfDir|${persistedIndexStamp(spark, sfDir)}|$nLists|$iters|" +
          s"del=mod${delMod}eq$delRes|v2") { index =>
      resetIndexRoot(spark, index)
      val (g1n, g1) = beginGen(spark, index)
      val w0 = embeddings.filter(pmod(col("vec_id"), lit(2)) === 0)
      val w1 = embeddings.filter(pmod(col("vec_id"), lit(2)) === 1)
      detIvfIndex(w0, nLists, iters).save(g1)
      commitGen(spark, index, g1n)
      upsertIvfAt(spark, g1, w1)
      deleteIvfAt(spark, g1,
        embeddings.filter(pmod(col("vec_id"), lit(delMod)) === delRes)
          .select("vec_id"))
    }
  }

  /** Retrain the coarse quantizer of a SAVED IVF index — the maintenance
    * leg [[ivfCellStats]] exists to trigger: upserts against frozen
    * centroids slowly skew the cell population (a hot cell makes every
    * probe that touches it scan its share of the corpus), and the fix is
    * a scheduled refit, never a per-query one. Deterministic Lloyd
    * ([[detKMeans]]) over the CURRENT stored vectors — so every upsert
    * and delete since the last fit is reflected — then every vector
    * reassigned and BOTH tables written as the NEXT generation beside the
    * serving one; the `_GEN` pointer flips only once the generation is
    * complete. Zero-downtime by construction: a concurrent probe resolves
    * either the old pointer (old tables, both of them) or the new one —
    * never a missing table or a new-assignments/old-centroids mix — and a
    * crash anywhere before the flip leaves the serving generation
    * untouched (the partial `gen=N+1` is cleared and rebuilt by the
    * retried call). */
  def retrainIvfAt(spark: org.apache.spark.sql.SparkSession, root: String,
                   nLists: Int = 8, iters: Int = 3): Unit = {
    val cur = resolveIndexDir(spark, root)
    val (n, next) = beginGen(spark, root)
    val stored = spark.read.parquet(s"$cur/assignments")
      .select("vec_id", "embedding")
    val idx = detIvfIndex(stored, nLists, iters)
    idx.assignments.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$next/assignments")
    idx.centroids.write.mode("overwrite").parquet(s"$next/centroids")
    commitGen(spark, root, n)
    pruneGens(spark, root)
  }

  /** Build-once cache for the DECLARED retrained-index query (q301): the
    * full monitor→act maintenance loop on one index — fit + save on the
    * even wave (q261's lifecycle), upsert the odd wave against the frozen
    * centroids, then [[retrainIvfAt]] refits the coarse quantizer over
    * the complete stored corpus and flips to the new generation. Because
    * the refit is deterministic Lloyd over ALL vec_ids, the post-retrain
    * index equals a fresh [[detIvfIndex]] on the full corpus — which is
    * what makes the probe hash-oracled (detKmeansOracle with
    * fitSrc = nv), unlike the frozen-centroid lifecycles whose fit wave
    * is the even half. The initial reset wipes any partial state a
    * crashed earlier build left (including a half-built next
    * generation), so the retry is from-scratch clean. */
  def ensurePersistedDetIvfRetrained(spark: org.apache.spark.sql.SparkSession,
                                     embeddings: DataFrame, sfDir: String,
                                     nLists: Int = 8, iters: Int = 3): String = {
    ensureIndexDir(spark, "detivfrtr", s"$sfDir|${persistedIndexStamp(spark, sfDir)}|$nLists|$iters|" +
          "retrain|v2") { index =>
      resetIndexRoot(spark, index)
      val (g1n, g1) = beginGen(spark, index)
      val w0 = embeddings.filter(pmod(col("vec_id"), lit(2)) === 0)
      val w1 = embeddings.filter(pmod(col("vec_id"), lit(2)) === 1)
      detIvfIndex(w0, nLists, iters).save(g1)
      commitGen(spark, index, g1n)
      upsertIvfAt(spark, g1, w1)
      retrainIvfAt(spark, index, nLists, iters)
    }
  }

  /** Per-cell health stats for a SAVED IVF index — the monitor an operator
    * reads to decide WHEN to act: `n_vectors`/`share` expose cell skew
    * (a hot cell makes every probe that touches it scan its share of the
    * corpus — the signal to RETRAIN the coarse quantizer), `n_files`
    * exposes upsert fragmentation (each `upsertIvfAt` wave appends files
    * into the cell partitions it touches — the signal to [[compactIvfAt]]).
    * One cell-keyed count aggregate over the partition-pruned assignments
    * + an nLists-bounded driver-side listing of the cell dirs; output
    * (cell, n_vectors, share, n_files, bytes) sorted by cell. */
  def ivfCellStats(spark: org.apache.spark.sql.SparkSession,
                   root: String): DataFrame = {
    val path = resolveIndexDir(spark, root)
    val counts = loadIvfIndex(spark, path).assignments
      .groupBy("cell").agg(count(lit(1)).as("n_vectors"))
    val total = counts.agg(sum("n_vectors").cast("double").as("n_total"))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // nLists dirs by construction — a bounded driver-side listing
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/assignments"))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
      .map { d =>
        val files = fs.listStatus(d.getPath)
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
        (d.getPath.getName.stripPrefix("cell=").toInt,
          files.length, files.map(_.getLen).sum)
      }.toSeq
    import spark.implicits._
    val layout = dirs.toDF("cell", "n_files", "bytes")
    counts.join(broadcast(layout), Seq("cell"))
      .crossJoin(broadcast(total))
      .select(col("cell"), col("n_vectors"),
        round(col("n_vectors").cast("double") / col("n_total"), 6).as("share"),
        col("n_files"), col("bytes"))
      .orderBy("cell")
  }

  /** Compact a SAVED IVF index: rewrite the multi-upsert cell partitions
    * into ONE file per cell — the persisted-index twin of the streamed
    * states' `compactEpochs` (every `upsertIvfAt` wave appends a file set
    * into the cells it touches; reads stay correct but the per-probe open
    * cost grows with upsert history). Content is untouched — probe
    * results stay byte-identical (SimilaritySpec pins it).
    * `repartition(cell)` puts each cell's rows in exactly one task, so
    * `partitionBy(cell)` emits one file per cell dir. The compacted table
    * lands as the NEXT generation (centroids, unchanged, are copied — a
    * tiny nLists-row table) and the `_GEN` pointer flips once complete:
    * no delete→rename swap window, no heal protocol — a concurrent probe
    * reads the old generation until the flip, and a crash before the
    * flip leaves the serving generation untouched. */
  def compactIvfAt(spark: org.apache.spark.sql.SparkSession,
                   root: String): Unit = {
    val cur = resolveIndexDir(spark, root)
    val (n, next) = beginGen(spark, root)
    spark.read.parquet(s"$cur/assignments")
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$next/assignments")
    copyTinyParquet(spark, s"$cur/centroids", s"$next/centroids")
    commitGen(spark, root, n)
    pruneGens(spark, root)
  }

  /** [[compactIvfAt]] for a persisted IVF-PQ root: BOTH fragmenting
    * tables — the coarse cell partitions AND the cell-partitioned PQ
    * codes — rewritten to one file per cell in ONE new generation (the
    * tiny trained artifacts, centroids + codebooks, are copied), so the
    * pair can never serve mixed compaction states. */
  def compactIvfPqAt(spark: org.apache.spark.sql.SparkSession,
                     root: String): Unit = {
    val cur = resolveIndexDir(spark, root)
    val (n, next) = beginGen(spark, root)
    spark.read.parquet(s"$cur/coarse/assignments")
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$next/coarse/assignments")
    copyTinyParquet(spark, s"$cur/coarse/centroids", s"$next/coarse/centroids")
    spark.read.parquet(s"$cur/pq/codes")
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$next/pq/codes")
    copyTinyParquet(spark, s"$cur/pq/codebooks", s"$next/pq/codebooks")
    commitGen(spark, root, n)
    pruneGens(spark, root)
  }

  /** Build-once cache for the DECLARED maintained-IVF queries (q296/q297):
    * q261's lifecycle under a LONGER maintenance history — fit + save on
    * the even-id wave, then TWO separate upsert waves (vec_id % 4 == 1,
    * then % 4 == 3) so the touched cell partitions genuinely hold
    * multiple file generations, then [[compactIvfAt]] rewrites them to
    * one file per cell. Because assignment is per-vector against the
    * FROZEN saved centroids, the post-compaction content equals q261's
    * two-wave index exactly — which is what lets q297 reuse q261's hash
    * oracle verbatim, proving compaction (and the split upsert history)
    * changed nothing an operator can observe except the file layout
    * [[ivfCellStats]] reports. */
  def ensurePersistedDetIvfMaintained(spark: org.apache.spark.sql.SparkSession,
                                      embeddings: DataFrame, sfDir: String,
                                      nLists: Int = 8, iters: Int = 3): String = {
    ensureIndexDir(spark, "detivfmnt", s"$sfDir|${persistedIndexStamp(spark, sfDir)}|$nLists|$iters|" +
          "waves=4|compact|v2") { index =>
      resetIndexRoot(spark, index)
      val (g1n, g1) = beginGen(spark, index)
      val w0 = embeddings.filter(pmod(col("vec_id"), lit(2)) === 0)
      val w1 = embeddings.filter(pmod(col("vec_id"), lit(4)) === 1)
      val w3 = embeddings.filter(pmod(col("vec_id"), lit(4)) === 3)
      detIvfIndex(w0, nLists, iters).save(g1)
      commitGen(spark, index, g1n)
      upsertIvfAt(spark, g1, w1)
      upsertIvfAt(spark, g1, w3)
      compactIvfAt(spark, index)
    }
  }

  /** Incremental int8-SQ maintenance: per-vector quantization means a delta
    * re-encodes independently — new codes for delta ids, replace-by-id
    * against the index. Exactly equals a full rebuild on the merged corpus
    * (SimilaritySpec pins probe equality). */
  def upsertSq(index: DataFrame, delta: DataFrame): DataFrame =
    sqIndex(delta).unionByName(
      index.join(delta.select("vec_id"), Seq("vec_id"), "left_anti"))

  /** Rewrite a FLAT persisted code table (SQ8/BQ: one parquet dir of
    * per-vector rows) as the next GENERATION of its root: the rewritten
    * table lands beside the serving one and the `_GEN` pointer flips once
    * it is complete — no staged delete→rename swap, no reader-visible
    * window, no heal protocol, and a crash before the flip leaves the
    * serving table untouched. `refuseEmpty` guards the erasure path (the
    * `deleteIvfAt` rule: an emptied index fails the next load far from
    * the cause) — the refused generation dir is dropped and the pointer
    * never moves. */
  private def rewriteFlatCodesGen(spark: org.apache.spark.sql.SparkSession,
                                  root: String, rows: DataFrame,
                                  refuseEmpty: Boolean): Unit = {
    val (n, next) = beginGen(spark, root)
    rows.write.mode("overwrite").parquet(next)
    if (refuseEmpty && spark.read.parquet(next).isEmpty) {
      val p = new org.apache.hadoop.fs.Path(next)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      throw new IllegalArgumentException(
        s"delete would empty the entire index at $root — refusing " +
          "(drop the index directory instead if that is intended)")
    }
    commitGen(spark, root, n)
    pruneGens(spark, root)
  }

  /** [[upsertSq]] against a SAVED int8 index root — load the serving
    * generation, re-encode the delta (per-vector quantization: no trained
    * state to freeze), replace by id, and commit the merged table as the
    * next generation. */
  def upsertSqAt(spark: org.apache.spark.sql.SparkSession, root: String,
                 delta: DataFrame): Unit =
    rewriteFlatCodesGen(spark, root,
      upsertSq(loadSqIndex(spark, resolveIndexDir(spark, root)), delta),
      refuseEmpty = false)

  /** Delete-by-id on a SAVED int8-SQ index root — the erasure leg of the
    * persisted SQ8 lifecycle (q293): per-vector codes mean erasure is one
    * replace-table rewrite without the ids; deleted codes are REMOVED
    * from storage (takedown/purge hits the serving index, not just the
    * primary store), and a subsequent [[sqProbe]] can never return them. */
  def deleteSqAt(spark: org.apache.spark.sql.SparkSession, root: String,
                 ids: DataFrame): Unit =
    rewriteFlatCodesGen(spark, root,
      loadSqIndex(spark, resolveIndexDir(spark, root))
        .join(broadcast(ids.select("vec_id")), Seq("vec_id"), "left_anti"),
      refuseEmpty = true)

  /** Delete-by-id on a SAVED binary-quantization index root —
    * [[deleteSqAt]]'s contract for the sign-sketch codes (q294). */
  def deleteBqAt(spark: org.apache.spark.sql.SparkSession, root: String,
                 ids: DataFrame): Unit =
    rewriteFlatCodesGen(spark, root,
      loadBqIndex(spark, resolveIndexDir(spark, root))
        .join(broadcast(ids.select("vec_id")), Seq("vec_id"), "left_anti"),
      refuseEmpty = true)

  /** Delete-by-id on a SAVED cell-partitioned PQ index (the resolved
    * `<gen>/pq` dir): purge the ids' rows from the codes table with the
    * same partition-pruned rewrite as [[deleteIvfAt]] — only the cell
    * partitions the deleted ids live in are read and rewritten. The
    * trained codebooks are per-SUBSPACE statistics carrying no
    * per-vector data, so they stay frozen (same reason upserts ride
    * them). Pair with [[deleteIvfAt]] on the coarse index for the full
    * IVF-PQ erasure (q295) — the coarse delete makes the ids
    * unreachable, this one erases their stored code bytes. */
  def deletePqAt(spark: org.apache.spark.sql.SparkSession, path: String,
                 ids: DataFrame): Unit =
    deleteFromCellTable(spark, s"$path/codes", ids, Seq("vec_id", "codes"))

  /** Build-once cache for the DECLARED persisted-SQ8 query (q290) — the
    * persisted lifecycle applied to the scalar-quantized index, completing
    * the family (IVF q261, IVF-PQ q282, SQ8 here): encode + save the even
    * wave, [[upsertSqAt]] the odd wave, probe via [[loadSqIndex]] +
    * [[sqProbe]] ONLY — and the SQ probe is pure integer math over the
    * 4x-smaller codes, so the serving path touches nothing but the saved
    * files (no f32 re-rank arm to feed). Per-vector quantization means no
    * trained artifact to freeze; what the persisted form proves is the
    * maintenance contract — an upsert equals a fresh encode of the merged
    * corpus — through storage. */
  def ensurePersistedSq(spark: org.apache.spark.sql.SparkSession,
                        embeddings: DataFrame, sfDir: String): String = {
    ensureIndexDir(spark, "sqidx", s"$sfDir|${persistedIndexStamp(spark, sfDir)}|v2") { index =>
      resetIndexRoot(spark, index)
      val (g1n, g1) = beginGen(spark, index)
      val w0 = embeddings.filter(pmod(col("vec_id"), lit(2)) === 0)
      val w1 = embeddings.filter(pmod(col("vec_id"), lit(2)) === 1)
      saveSqIndex(sqIndex(w0), g1)
      commitGen(spark, index, g1n)
      upsertSqAt(spark, index, w1)
    }
  }

  /** Build-once cache for the DECLARED deleted-SQ8 query (q293): the q290
    * lifecycle EXTENDED by the erasure leg — encode + save the even wave,
    * [[upsertSqAt]] the odd wave, [[deleteSqAt]] every
    * `vec_id % delMod == delRes`, probe via [[loadSqIndex]] + [[sqProbe]]
    * only. Separate cache dir from q290's index (deleting from the shared
    * one would corrupt it); the delete predicate lives in the key
    * material like every other semantic parameter. */
  def ensurePersistedSqDeleted(spark: org.apache.spark.sql.SparkSession,
                               embeddings: DataFrame, sfDir: String,
                               delMod: Int = 5, delRes: Int = 3): String = {
    ensureIndexDir(spark, "sqidxdel", s"$sfDir|${persistedIndexStamp(spark, sfDir)}|" +
        s"del=mod${delMod}eq$delRes|v2") { index =>
      resetIndexRoot(spark, index)
      val (g1n, g1) = beginGen(spark, index)
      val w0 = embeddings.filter(pmod(col("vec_id"), lit(2)) === 0)
      val w1 = embeddings.filter(pmod(col("vec_id"), lit(2)) === 1)
      saveSqIndex(sqIndex(w0), g1)
      commitGen(spark, index, g1n)
      upsertSqAt(spark, index, w1)
      deleteSqAt(spark, index,
        embeddings.filter(pmod(col("vec_id"), lit(delMod)) === delRes)
          .select("vec_id"))
    }
  }

  /** Incremental binary-quantization maintenance: sign sketches are
    * per-vector too — same replace-by-id contract, exactly equal to a full
    * rebuild on the merged corpus. */
  def upsertBq(index: DataFrame, delta: DataFrame, numBits: Int = 63): DataFrame =
    bqIndex(delta, numBits).unionByName(
      index.join(delta.select("vec_id"), Seq("vec_id"), "left_anti"))

  // ------------------------------------------------- deterministic KMeans —

  /** f64-normalize `embCol` into "__nv" (a zero vector passes through as
    * the raw f32 cast — the Normalizer convention `assignCells` follows). */
  private def withNv(df: DataFrame, embCol: String): DataFrame =
    df.withColumn("__nrm", expr(
        s"sqrt(aggregate($embCol, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"))
      .withColumn("__nv", expr(
        s"IF(__nrm = 0.0, CAST($embCol AS array<double>), transform($embCol, x -> CAST(x AS DOUBLE) / __nrm))"))

  /** argmin-squared-distance assignment of "__nv" rows against a tiny
    * driver-side f64 centroid table (ties to the lowest cell id) — the
    * `assignCells` rule, parameterized on exact doubles. Map-only. */
  private def assignNv(nv: DataFrame, cents: Seq[(Int, Array[Double])]): DataFrame = {
    val sorted = cents.sortBy(_._1)
    val centsSql = sorted.map(_._2.map(_.toString).mkString("array(", ", ", ")"))
      .mkString("array(", ", ", ")")
    val cellIds = sorted.map(_._1).mkString("array(", ", ", ")")
    nv.withColumn("__d2", expr(
        s"transform($centsSql, c -> aggregate(zip_with(__nv, c, (x, y) -> (x - y) * (x - y)), CAST(0.0 AS DOUBLE), (a, x) -> a + x))"))
      .withColumn("cell", expr(
        s"""element_at($cellIds, aggregate(sequence(1, size(__d2)),
              named_struct('bd', CAST('Infinity' AS DOUBLE), 'bi', 1),
              (acc, i) -> IF(__d2[i-1] < acc.bd, named_struct('bd', __d2[i-1], 'bi', i), acc),
              acc -> acc.bi))"""))
      .drop("__d2")
  }

  /** Fixed-point scale for deterministic centroid means: 2^20 keeps ~6
    * decimal digits of each coordinate, far beyond what cell assignment
    * needs, while per-dim contributions stay small enough that a cell of
    * 2^43 vectors cannot overflow a signed 64-bit sum. */
  private val DetKmFx = 1048576.0

  /** Deterministic distributed KMeans — same Lloyd structure as the MLlib
    * build behind `ivfIndex`, but every source of run-to-run and
    * engine-to-engine variance removed, so an index build is exactly
    * reproducible (and hash-checkable in SQL — q68/q69):
    *
    *   - init: the `k` lowest-vec_id vectors' normalized embeddings
    *     (cells 0..k-1 in that order) — no RNG;
    *   - assignment: exact f64 argmin squared distance, ties to the lowest
    *     cell (the `assignCells` rule);
    *   - update: FIXED-POINT means — each coordinate contributes
    *     `floor(x * 2^20 + 0.5)` as a LONG, cells sum longs (integer
    *     addition commutes, so partitioning/aggregation order cannot flip
    *     result bits the way f64 summation order can), and the mean
    *     converts back as `(sum / n) / 2^20` in f64;
    *   - an empty cell keeps its previous centroid.
    *
    * Scale shape per iteration: one map-only assignment pass + one
    * (cell, dim)-keyed aggregation whose shuffle is partitions x k x dim
    * partial rows (map-side combined), never corpus-sized. The centroid
    * table (k x dim doubles) is driver-side by design — same tiny-table
    * contract as `assignCells`. Returns (final centroids, assignments
    * against them). */
  /** Driver-side memo for `detKMeans` builds: an index exists to be probed
    * repeatedly (the `ivfIndex`/`PlanCache` contract), and the centroid
    * table is plain Scala data PlanCache cannot hold. Keyed by the
    * canonicalized input plan + params; sessions whose context stopped are
    * swept on each build. */
  private val detKmMemo = scala.collection.mutable.Map.empty[
    (org.apache.spark.sql.SparkSession, String),
    (Seq[(Int, Array[Double])], DataFrame)]

  /** Same contract for the MLlib-backed `ivfIndex`: repeat builds over the
    * same file-backed input (benchmark reps, probe + pair queries sharing
    * one corpus) reuse the fitted index instead of refitting KMeans. */
  private val ivfMemo = scala.collection.mutable.Map.empty[
    (org.apache.spark.sql.SparkSession, String), IvfIndex]

  /** Input-identity key for index memos: sorted input files + canonicalized
    * plan + params. Returns None for inputs with no file scan (in-memory
    * frames) — those must not be memoized (same-schema collisions). */
  private def memoKey(df: DataFrame, params: String): Option[String] = {
    val inputs = df.inputFiles.sorted.mkString(",")
    if (inputs.isEmpty) None
    else Some(inputs + "||" +
      df.queryExecution.analyzed.canonicalized.toString + "|" + params)
  }

  def detKMeans(items: DataFrame, k: Int, iters: Int = 3,
                embCol: String = "embedding")
      : (Seq[(Int, Array[Double])], DataFrame) = {
    require(k >= 1 && iters >= 1, s"need k >= 1, iters >= 1; got k=$k iters=$iters")
    // the canonicalized plan string alone is NOT a safe key: it elides the
    // scan location, so two reads of different parquet paths canonicalize
    // identically. `memoKey` disambiguates with the sorted input-file list;
    // plans with no file inputs (in-memory test frames) skip the memo
    // entirely rather than risk a same-schema collision.
    val key = memoKey(items, s"$k|$iters|$embCol")
      .map(s => (items.sparkSession, s))
    key.foreach { mk =>
      detKmMemo.synchronized {
        detKmMemo.filterInPlace((key, _) => !key._1.sparkContext.isStopped)
        detKmMemo.get(mk)
      } match {
        case Some(hit) => return hit
        case None =>
      }
    }
    val nv = withNv(items, embCol).select(col("vec_id"), col("__nv")).cache()
    var cents: Seq[(Int, Array[Double])] = nv.orderBy("vec_id").limit(k)
      .select("__nv").collect()
      .map(_.getSeq[Double](0).toArray).zipWithIndex
      .map { case (c, i) => (i, c) }.toSeq
    require(cents.size == k, s"corpus has fewer than k=$k vectors")
    for (_ <- 1 to iters) {
      val sums = assignNv(nv, cents)
        .select(col("cell"), posexplode(col("__nv")).as(Seq("dim", "x")))
        .withColumn("fx", expr(s"CAST(floor(x * $DetKmFx + 0.5) AS BIGINT)"))
        .groupBy("cell", "dim")
        .agg(sum("fx").as("sfx"), count(lit(1)).as("n"))
        .collect()
      val byCell = sums.groupBy(_.getInt(0))
      cents = cents.map { case (cell, old) =>
        byCell.get(cell) match {
          case Some(rows) =>
            val arr = new Array[Double](old.length)
            rows.foreach { r =>
              arr(r.getInt(1)) =
                (r.getLong(2).toDouble / r.getLong(3).toDouble) / DetKmFx
            }
            (cell, arr)
          case None => (cell, old)
        }
      }
    }
    val assigned = PlanCache.memo(assignNv(nv, cents).select("vec_id", "cell"))
    assigned.count() // materialize so the normalized input can be released
    nv.unpersist()
    val out = (cents, assigned)
    key.foreach(mk => detKmMemo.synchronized { detKmMemo.update(mk, out) })
    out
  }

  /** Deterministic, persistable IVF index: `detKMeans` cells packaged as
    * the standard `IvfIndex`, so save/load (`IvfIndex.save` /
    * `loadIvfIndex`), probing (`ivfProbe`) and incremental maintenance
    * (`upsertIvf`/`upsertIvfAt`) all reuse the existing machinery — but two
    * builds over the same corpus are bit-identical (no MLlib RNG). The
    * centroid table stores f32 like every persisted index; the f64-exact
    * path for oracle checks is `detIvfTopK`. */
  def detIvfIndex(items: DataFrame, nLists: Int = 8, iters: Int = 3): IvfIndex = {
    val (cents, assigned) = detKMeans(items, nLists, iters)
    val spark = items.sparkSession
    import spark.implicits._
    val centroids = cents.sortBy(_._1)
      .map { case (cell, c) => (cell, c.map(_.toFloat).toSeq) }
      .toDF("cell", "centroid")
    IvfIndex(
      assigned.join(items.select("vec_id", "embedding"), Seq("vec_id"))
        .select("vec_id", "embedding", "cell"),
      centroids)
  }

  /** Build-once cache for the DECLARED persisted-ANN query (q261): the
    * production index lifecycle, executed once per (sfDir, source stamp)
    * and answered from the SAVED files forever after —
    *
    *   1. fit + [[IvfIndex.save]] on the FIRST wave (even vec_ids) via
    *      [[detIvfIndex]] (deterministic Lloyd, so the whole chain is
    *      hash-oracled, not just rows-gated);
    *   2. [[upsertIvfAt]] the SECOND wave (odd vec_ids) against the frozen
    *      persisted centroids — delta-cost maintenance, no refit;
    *   3. readers answer via [[loadIvfIndex]] + [[ivfProbe]] only.
    *
    * Nothing is refit at query time — at 100 TB nobody re-clusters the
    * corpus per query; the index is built as the corpus lands (wave 1),
    * maintained incrementally (wave 2), and probed from storage (the q259
    * two-wave-state convention applied to the ANN pillar). Same marker
    * idempotence + build lock as the streamed-state caches; the cached
    * index is keyed to the source parquet's (length, mtime) stamp so a
    * regenerated testdata dir invalidates it. */
  /** (length, mtime) stamp of the source embeddings parquet that keys every
    * persisted-index cache dir. Stat failure is LOUD by design: a silent
    * "nostamp" fallback would let an `_INDEX_READY` marker keep serving an
    * index built from a since-regenerated dataset — the stamp is the only
    * thing tying the cache to the source bytes, and the read path needs
    * this file anyway, so failing here loses nothing. */
  private def persistedIndexStamp(spark: org.apache.spark.sql.SparkSession,
                                  sfDir: String): String = {
    val sp = new org.apache.hadoop.fs.Path(s"$sfDir/embeddings.parquet")
    val st = try {
      sp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getFileStatus(sp)
    } catch {
      case e: Exception => throw new IllegalStateException(
        s"cannot stat $sp to stamp the persisted index cache — " +
          "refusing to risk serving a stale index", e)
    }
    s"${st.getLen}-${st.getModificationTime}"
  }

  def ensurePersistedDetIvf(spark: org.apache.spark.sql.SparkSession,
                            embeddings: DataFrame, sfDir: String,
                            nLists: Int = 8, iters: Int = 3): String = {
    ensureIndexDir(spark, "detivf", s"$sfDir|${persistedIndexStamp(spark, sfDir)}|$nLists|$iters|v2") { index =>
      // crash-convergent: the reset wipes any partial earlier attempt, so
      // every retried build is identical from a clean slate
      resetIndexRoot(spark, index)
      val (g1n, g1) = beginGen(spark, index)
      val w0 = embeddings.filter(pmod(col("vec_id"), lit(2)) === 0)
      val w1 = embeddings.filter(pmod(col("vec_id"), lit(2)) === 1)
      detIvfIndex(w0, nLists, iters).save(g1)
      commitGen(spark, index, g1n)
      upsertIvfAt(spark, g1, w1)
    }
  }

  /** Fully-deterministic IVF top-k: `detKMeans` cells + the standard
    * nProbe probe, with the per-cell query scores computed against the
    * exact f64 centroids. Unlike `ivfTopK` (MLlib KMeans — rows-only +
    * recall-gated), every stage here is a pure function of the input, so
    * the whole path is hash-checked by the q69 oracle. */
  def detIvfTopK(items: DataFrame, queries: DataFrame, k: Int,
                 nLists: Int = 8, iters: Int = 3, nProbe: Int = 3): DataFrame = {
    val (cents, assigned) = detKMeans(items, nLists, iters)
    val sorted = cents.sortBy(_._1)
    val centsSql = sorted.map(_._2.map(_.toString).mkString("array(", ", ", ")"))
      .mkString("array(", ", ", ")")
    val cellIds = sorted.map(_._1).mkString("array(", ", ", ")")
    val cnorms = sorted.map { case (_, c) =>
      math.sqrt(c.map(x => x * x).sum).toString
    }.mkString("array(", ", ", ")")
    // per-query cell scores: cosine(normalized query, centroid) as a pair
    // of literal-array expressions — map-only, no join against centroids
    val qscored = withNv(queries, "query_embedding")
      .withColumn("__cs", expr(
        s"""zip_with(
              transform($centsSql, c -> aggregate(zip_with(__nv, c, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (a, x) -> a + x)),
              $cnorms,
              (d, nc) -> IF(nc = 0.0D, CAST(0.0 AS DOUBLE), d / nc))"""))
      .select(col("query_id"), col("query_embedding"),
        posexplode(col("__cs")).as(Seq("__i", "cscore")))
      .withColumn("cell", expr(s"element_at($cellIds, __i + 1)"))
      .select(col("query_id"), col("query_embedding"), col("cell"), col("cscore"))
    val probes = graft.plans.GroupedTopK(qscored,
        Seq(col("query_id")), Seq(desc("cscore"), asc("cell")), nProbe)
      .select(col("query_id"), col("query_embedding"), col("cell"))
    topKPerQuery(
      assigned.hint("SHUFFLE_HASH").join(items, Seq("vec_id"))
        .join(broadcast(probes), Seq("cell"))
        .withColumn("score",
          cosine_similarity(col("embedding"), col("query_embedding"))),
      k)
  }

  /** Probe an IVF index: broadcast-join queries against the centroid table,
    * keep each query's `nProbe` closest cells, exact cosine inside probed
    * cells only. Per-query work ~ corpus/nLists * nProbe. With
    * `pruneScan` (the default — the persisted-probe path), the probed
    * cells are additionally collected driver-side (bounded:
    * |queries| × nProbe — the `deleteIvfAt` convention) and pushed as a
    * STATIC filter on the assignments side, so a probe against a SAVED
    * cell-partitioned index reads only the probed cells' partition files
    * (PartitionFilters on the scan) — the join alone restricts rows, not
    * which files are opened. Results are unchanged either way: the
    * filter keeps a superset of what the probes join admits. `ivfTopK`
    * passes `pruneScan = false` — its index is an in-memory build with
    * nothing to partition-prune, and the collect would just add a
    * driver round-trip per probe batch. */
  def ivfProbe(index: IvfIndex, queries: DataFrame, k: Int,
               nProbe: Int = 12, pruneScan: Boolean = true): DataFrame = {
    val nq = normalized(queries, "query_embedding")
      .select(col("query_id"), col("query_embedding"),
        vector_to_array(col("nvec")).cast("array<float>").as("nvec_arr"))
    val probes = graft.plans.GroupedTopK(
        nq.crossJoin(broadcast(index.centroids))
          .withColumn("cscore", cosine_similarity(col("nvec_arr"), col("centroid")))
          .select(col("query_id"), col("query_embedding"), col("cell"), col("cscore")),
        Seq(col("query_id")), Seq(desc("cscore"), asc("cell")), nProbe)
      .select(col("query_id"), col("query_embedding"), col("cell"))
    val serve =
      if (pruneScan) {
        val cells = probes.select("cell").distinct()
          .collect().map(_.getInt(0)).toSeq
        index.assignments.filter(col("cell").isin(cells: _*))
      } else index.assignments
    topKPerQuery(
      serve.join(broadcast(probes), Seq("cell"))
        .withColumn("score", cosine_similarity(col("embedding"), col("query_embedding"))),
      k)
  }

  /** IVF (inverted-file) approximate top-k: the classic vector-DB scale
    * path — `ivfIndex` (one-off cell build, reusable/persistable) composed
    * with `ivfProbe` (per-batch query work ~ corpus/nLists * nProbe). */
  def ivfTopK(items: DataFrame, queries: DataFrame, k: Int,
              nLists: Int = 16, nProbe: Int = 13): DataFrame =
    ivfProbe(ivfIndex(items, nLists), queries, k, nProbe, pruneScan = false)
  // nProbe default is set from the recall@3 >= 0.9 gate measured at THREE
  // scales — the sf0.01 fixture (SimilaritySpec/GATES.json), sf0.1, and
  // the 8x rotated-replica octave (ScaleRehearsal's recall family,
  // committed in REHEARSAL.json): 12 passed only the fixture (0.87 at
  // sf0.1); 13 clears 0.9 at all three. On weakly-clustered corpora cell
  // locality is soft, and probing fewer cells silently drops true
  // neighbours. Strongly-clustered real-world embeddings can lower it
  // (cost ~ corpus/nLists * nProbe per query).

  /** Symmetric per-vector int8 scalar quantization: scale = max|v|/127,
    * codes = rint(v/scale) (half-even — `round_even` in the oracle). The
    * quantized index is 4x smaller than f32 and scores in pure integer
    * arithmetic (`ByteDot`): with symmetric scales, cosine similarity over
    * dequantized vectors reduces to dot(ca,cb)/(sqrt(dot(ca,ca))*
    * sqrt(dot(cb,cb))) — the scales cancel — so quantized scoring is exact
    * integer math, associative and bit-identical across engines. Zero
    * vectors quantize to all-zero codes. Map-only. */
  def quantize(items: DataFrame, embCol: String = "embedding",
               codesCol: String = "codes"): DataFrame =
    items
      .withColumn("__scale", expr(
        s"aggregate($embCol, CAST(0.0 AS DOUBLE), (a, x) -> greatest(a, abs(CAST(x AS DOUBLE)))) / 127.0"))
      .withColumn(codesCol, expr(
        // non-finite scale (a NaN/Inf component) quantizes to zero codes,
        // like the zero vector — mirrored in the q46 oracle's guard
        s"""transform($embCol, x -> IF(__scale <= 0.0 OR isnan(__scale)
                OR __scale = CAST('Infinity' AS DOUBLE), CAST(0 AS TINYINT),
              CAST(rint(CAST(x AS DOUBLE) / __scale) AS TINYINT)))"""))
      .drop("__scale")

  /** A built int8 index: (vec_id, codes, na) — codes from `quantize`, na the
    * integer self-dot computed ONCE at build time (it rides every probe).
    * ~4x smaller than the f32 corpus; persist with `saveSqIndex` and recover
    * with `loadSqIndex` for the build-once / probe-many lifecycle (the same
    * contract as `IvfIndex`). */
  def sqIndex(items: DataFrame): DataFrame = {
    import graft.GraftFunctions.byte_dot
    quantize(items).select(col("vec_id"), col("codes"))
      .withColumn("na", byte_dot(col("codes"), col("codes")))
  }

  def saveSqIndex(index: DataFrame, path: String): Unit =
    index.write.mode("overwrite").parquet(path)

  /** Generation-aware load: resolves a `_GEN` pointer when `path` is an
    * index ROOT (a raw read of a root would union every retained
    * generation), and falls back to reading `path` directly for a plain
    * table dir. */
  def loadSqIndex(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(resolveIndexDir(spark, path))

  /** Top-k probe over a built (or loaded) int8 index: integer-dot cosine on
    * the codes — with symmetric per-vector scales the scales cancel, so
    * quantized cosine is exact integer math (see `quantize`). The index
    * never shuffles (queries broadcast); ranking via GroupedTopK. */
  def sqProbe(index: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    import graft.GraftFunctions.byte_dot
    // query self-norms computed once BEFORE the cross join (they ride the
    // broadcast), not once per (item, query) pair
    val qq = quantize(queries, "query_embedding", "qcodes")
      .select(col("query_id"), col("qcodes"))
      .withColumn("nb", byte_dot(col("qcodes"), col("qcodes")))
    topKPerQuery(
      index.crossJoin(broadcast(qq))
        .withColumn("dot", byte_dot(col("codes"), col("qcodes")))
        .withColumn("score",
          when(col("na") === 0 || col("nb") === 0, lit(0.0))
            .otherwise(col("dot") / (sqrt(col("na")) * sqrt(col("nb"))))),
      k)
  }

  /** Build + probe in one call: ~4x less data scanned than f32 brute force
    * with near-identical ranking (recall-gated >= 0.9 in SimilaritySpec). */
  def sqTopK(items: DataFrame, queries: DataFrame, k: Int): DataFrame =
    sqProbe(sqIndex(items), queries, k)

  /** A built binary-quantization index: (vec_id, code), `code` the packed
    * sign bits of 63 hash-derived random projections (`SignSketch`). 8 bytes
    * per vector — 32x smaller than the 64-dim f32 corpus — and Hamming
    * distance (`bit_count(a ^ b)`, one XOR+popcount) approximates angle
    * (P[bit differs] = θ/π). Build once, probe many times; persist with
    * `saveBqIndex` / recover with `loadBqIndex` (the IvfIndex/sqIndex
    * contract). Map-only build: no shuffle, scales with input splits. */
  def bqIndex(items: DataFrame, numBits: Int = 63): DataFrame = {
    import graft.GraftFunctions.sign_sketch
    items.select(col("vec_id"), sign_sketch(col("embedding"), numBits).as("code"))
  }

  def saveBqIndex(index: DataFrame, path: String): Unit =
    index.write.mode("overwrite").parquet(path)

  /** Generation-aware load — the [[loadSqIndex]] resolve rule. */
  def loadBqIndex(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(resolveIndexDir(spark, path))

  /** Top-k probe over a binary-quantization index: per query, shortlist the
    * `shortlist` Hamming-closest codes — the full corpus scan touches ONLY
    * the 8-byte codes (queries broadcast; GroupedTopK caps the shuffle at
    * partitions x queries x shortlist) — then exact-cosine re-rank just the
    * shortlisted vectors. Scan cost per query drops ~32x vs f32 brute force;
    * exactness on the shortlist keeps returned scores true cosines. Sign
    * sketches and the (hd asc, vec_id asc) / (score desc, vec_id asc) tie
    * orders are pure functions of the input, so the whole path reproduces
    * in the DuckDB oracle — approximate ANN with a full hash check, like
    * rp-LSH and int8-SQ. Recall-gated (>= 0.9) in SimilaritySpec; the
    * default shortlist is sized from that gate on the hash-random test
    * corpus (a worst case — no cluster structure, so Hamming margins are
    * thin: 64 gave 0.78, 256 gives 0.98 at sf0.01). Re-rank cost stays
    * shortlist x queries rows — negligible next to the code scan. */
  def bqProbe(index: DataFrame, items: DataFrame, queries: DataFrame, k: Int,
              shortlist: Int = 256, numBits: Int = 63): DataFrame = {
    import graft.GraftFunctions.sign_sketch
    val qc = queries.select(col("query_id"),
      sign_sketch(col("query_embedding"), numBits).as("qcode"))
    val short = graft.plans.GroupedTopK(
        index.crossJoin(broadcast(qc))
          .select(col("query_id"), col("vec_id"),
            bitmap_count(col("code").bitwiseXOR(col("qcode"))).as("hd")),
        Seq(col("query_id")), Seq(asc("hd"), asc("vec_id")), shortlist)
      .select("query_id", "vec_id")
    topKPerQuery(
      broadcast(short).join(items, Seq("vec_id"))
        .join(broadcast(queries), Seq("query_id"))
        .withColumn("score", cosine_similarity(col("embedding"), col("query_embedding"))),
      k)
  }

  /** Build + probe in one call (binary quantization, Hamming shortlist,
    * exact re-rank). */
  def bqTopK(items: DataFrame, queries: DataFrame, k: Int,
             shortlist: Int = 256, numBits: Int = 63): DataFrame =
    bqProbe(bqIndex(items, numBits), items, queries, k, shortlist, numBits)

  // popcount of a long column (SQL bit_count); named helper because the
  // Column API has no direct equivalent
  private def bitmap_count(c: org.apache.spark.sql.Column) =
    call_function("bit_count", c)

  // ------------------------------------------------- product quantization —

  /** A built product-quantization index: per-vector subspace codes (one
    * small int per subspace — `m` bytes of signal per vector vs `4 x dim`
    * for f32) plus the per-subspace codebooks (`codebooks(sub)(cell)` = a
    * `dsub`-dim f64 centroid; tiny: m x ksub x dsub doubles, driver-side by
    * the same contract as `assignCells`' centroid table). Build with
    * `pqIndex`, probe with `pqProbe` (ADC lookup scoring), persist with
    * `save` / recover with `loadPqIndex`, maintain incrementally with
    * `upsertPq` — the IvfIndex/sqIndex lifecycle. */
  final case class PqIndex(codes: DataFrame,
                           codebooks: Seq[Seq[Array[Double]]], dsub: Int) {
    def m: Int = codebooks.size
    def save(path: String): Unit = {
      codes.write.mode("overwrite").parquet(s"$path/codes")
      val spark = codes.sparkSession
      import spark.implicits._
      codebooks.zipWithIndex.flatMap { case (cb, s) =>
        cb.zipWithIndex.map { case (c, cell) => (s, cell, c.toSeq) }
      }.toDF("sub", "cell", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
    }
  }

  def loadPqIndex(spark: org.apache.spark.sql.SparkSession, pathIn: String): PqIndex = {
    val path = resolveIndexDir(spark, pathIn)
    val rows = spark.read.parquet(s"$path/codebooks").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    require(rows.nonEmpty, s"empty codebook table at $path/codebooks")
    val m = rows.map(_._1).max + 1
    val codebooks = (0 until m).map { s =>
      rows.filter(_._1 == s).sortBy(_._2).map(_._3).toSeq
    }
    PqIndex(spark.read.parquet(s"$path/codes"), codebooks,
      codebooks.head.head.length)
  }

  private def centsSqlOf(cb: Seq[Array[Double]]): String =
    cb.map(_.map(_.toString).mkString("array(", ", ", ")"))
      .mkString("array(", ", ", ")")

  /** Append 0-based code columns `__c_0..__c_{m-1}` to a "__nv" frame: per
    * subspace, argmin squared distance of the `dsub`-wide `__nv` slice
    * against that subspace's codebook (strict-< scan with ties to the
    * lowest cell — the `assignCells` rule). Map-only; the codebooks unroll
    * into literal expressions inside whole-stage codegen. */
  private def withSubCodes(nv: DataFrame, cbs: Seq[Seq[Array[Double]]],
                           dsub: Int): DataFrame =
    cbs.zipWithIndex.foldLeft(nv) { case (d, (cb, s)) =>
      val off = s * dsub
      d.withColumn(s"__d2_$s", expr(
          s"transform(${centsSqlOf(cb)}, c -> aggregate(zip_with(slice(__nv, ${off + 1}, $dsub), c, (x, y) -> (x - y) * (x - y)), CAST(0.0 AS DOUBLE), (a, x) -> a + x))"))
        .withColumn(s"__c_$s", expr(
          s"""aggregate(sequence(1, size(__d2_$s)),
                named_struct('bd', CAST('Infinity' AS DOUBLE), 'bi', 1),
                (acc, i) -> IF(__d2_$s[i-1] < acc.bd, named_struct('bd', __d2_$s[i-1], 'bi', i), acc),
                acc -> acc.bi) - 1"""))
        .drop(s"__d2_$s")
    }

  private def codesArrayExpr(m: Int): String =
    (0 until m).map(s => s"__c_$s").mkString("array(", ", ", ")")

  /** Driver-side memo for PQ builds — the detKMeans/ivfIndex contract. */
  private val pqMemo = scala.collection.mutable.Map.empty[
    (org.apache.spark.sql.SparkSession, String), PqIndex]

  /** Product quantization — the classic memory-bound ANN index (Jégou et
    * al., "Product Quantization for Nearest Neighbor Search", TPAMI 2011):
    * split the normalized vector into `m` subspaces of `dsub = inDim / m`
    * dims, run KMeans per subspace (`ksub` cells), and store each vector as
    * `m` small codes — here 16 bytes/vector vs 256 for 64-dim f32.
    *
    * The per-subspace Lloyd build reuses `detKMeans`' determinism recipe —
    * first-`ksub`-by-vec_id init, strict-argmin assignment, FIXED-POINT
    * integer-sum means (summation order cannot flip bits), empty cells keep
    * their centroid — so two builds are bit-identical and the whole
    * codebook trajectory reproduces in SQL (the q76 oracle). All `m`
    * subspaces train in ONE pass per iteration: a single map-only
    * assignment projection (the m argmins unroll into codegen) + one
    * (sub, cell, dim)-keyed aggregation whose shuffle is
    * partitions x m x ksub x dsub partial rows — corpus-size-independent,
    * same shape as one full-dim detKMeans iteration. */
  /** Training-sample bound for the PQ codebook fit: Lloyd iterates over the
    * sample, NOT the corpus — at 100 TB `iters` extra full-corpus passes
    * would dominate the build, while codebook quality saturates far below
    * full corpus size (the `buildIvfIndex` sample-fit argument; FAISS
    * trains the same way). The sample is the `PqFitRows` first vectors in
    * SHA-256-of-vec_id order — deterministic, id-bias-free, and a
    * TakeOrderedAndProject at scale (k rows per partition, no global sort
    * materialization) — so the q76/q80 oracles reproduce it in SQL. Below
    * the bound the sample is the whole corpus and the fit is exact. */
  val PqFitRows = 4096

  def pqIndex(items: DataFrame, m: Int = 16, ksub: Int = 16, iters: Int = 2,
              inDim: Int = 64, embCol: String = "embedding"): PqIndex = {
    require(m >= 1 && inDim % m == 0, s"inDim=$inDim must split into m=$m subspaces")
    require(ksub >= 1 && iters >= 1, s"need ksub >= 1, iters >= 1")
    val key = memoKey(items, s"pq|$m|$ksub|$iters|$inDim|$embCol")
      .map(s => (items.sparkSession, s))
    key.foreach { mk =>
      pqMemo.synchronized {
        pqMemo.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
        pqMemo.get(mk)
      } match {
        case Some(hit) => return hit
        case None =>
      }
    }
    val built = buildPqIndex(items, m, ksub, iters, inDim / m, embCol)
    key.foreach(mk => pqMemo.synchronized { pqMemo.update(mk, built) })
    built
  }

  private def buildPqIndex(items: DataFrame, m: Int, ksub: Int, iters: Int,
                           dsub: Int, embCol: String): PqIndex =
    buildPqFromNv(
      withNv(items, embCol).select(col("vec_id"), col("__nv")), m, ksub, iters, dsub)

  /** The PQ build over a prepared (vec_id, __nv) frame — `__nv` is
    * whatever vector the codebooks should model: the normalized embedding
    * (plain PQ) or the cell residual (IVFADC). */
  private def buildPqFromNv(nvIn: DataFrame, m: Int, ksub: Int, iters: Int,
                            dsub: Int): PqIndex = {
    val nv = nvIn.cache()
    // deterministic hash-ordered training sample (ties impossible: sha256
    // of distinct ids); the Lloyd loop never touches the full corpus
    val fit = nv
      .withColumn("__h", expr("sha2(CAST(vec_id AS STRING), 256)"))
      .orderBy(col("__h"), col("vec_id")).limit(PqFitRows)
      .select(col("vec_id"), col("__nv")).cache()
    val initRows = fit.orderBy("vec_id").limit(ksub).select("__nv").collect()
      .map(_.getSeq[Double](0).toArray)
    require(initRows.length == ksub, s"corpus has fewer than ksub=$ksub vectors")
    var cbs: Seq[Seq[Array[Double]]] = (0 until m).map { s =>
      initRows.map(r => r.slice(s * dsub, (s + 1) * dsub)).toSeq
    }
    for (_ <- 1 to iters) {
      val scArr = (0 until m).map(s => s"named_struct('sub', $s, 'cell', __c_$s)")
        .mkString("array(", ", ", ")")
      val sums = withSubCodes(fit, cbs, dsub)
        .select(col("__nv"), explode(expr(scArr)).as("sc"))
        .select(col("sc.sub").as("sub"), col("sc.cell").as("cell"), col("__nv"))
        .select(col("sub"), col("cell"),
          posexplode(expr(s"slice(__nv, sub * $dsub + 1, $dsub)")).as(Seq("dim", "x")))
        .withColumn("fx", expr(s"CAST(floor(x * $DetKmFx + 0.5) AS BIGINT)"))
        .groupBy("sub", "cell", "dim")
        .agg(sum("fx").as("sfx"), count(lit(1)).as("n"))
        .collect()
      val byKey = sums.map(r =>
        ((r.getInt(0), r.getInt(1), r.getInt(2)), (r.getLong(3), r.getLong(4)))).toMap
      cbs = cbs.zipWithIndex.map { case (cb, s) =>
        cb.zipWithIndex.map { case (old, cell) =>
          if (byKey.contains((s, cell, 0)))
            Array.tabulate(dsub) { d =>
              val (sfx, n) = byKey((s, cell, d))
              (sfx.toDouble / n.toDouble) / DetKmFx
            }
          else old // empty cell keeps its previous centroid
        }
      }
    }
    fit.unpersist()
    // the ONE full-corpus pass: encode everything against the fitted books
    val codes = PlanCache.memo(withSubCodes(nv, cbs, dsub)
      .select(col("vec_id"), expr(codesArrayExpr(m)).as("codes")))
    codes.count() // materialize so the normalized input can be released
    nv.unpersist()
    PqIndex(codes, cbs, dsub)
  }

  /** Top-k probe over a PQ index via ADC (asymmetric distance computation):
    * each query precomputes ONE lookup table — `lt(sub)(cell)` = dot of its
    * normalized subvector with that cell's centroid, m x ksub doubles,
    * map-only over the tiny query set — and scoring a corpus vector is then
    * `m` table lookups (sum over subs of `lt(sub)(codes(sub))`), never
    * touching the f32 embedding: the full-corpus scan reads 16-byte code
    * rows, ~16x less than f32 brute force. The `shortlist` ADC-closest
    * vectors per query (GroupedTopK caps that shuffle) are then re-ranked
    * with exact cosine, so returned scores are true cosines. Every stage is
    * a pure function of the input — deterministic codebooks, sequential f64
    * ADC sums, (adc desc, vec_id) / (score desc, vec_id) tie orders — so
    * the whole path is hash-checked by the q76 oracle; recall-gated
    * (>= 0.9) in SimilaritySpec beside rp/SQ8/BQ. */
  /** Per-query ADC lookup tables for a PQ index: `lt(sub)(cell)` = dot of
    * the normalized query subvector with that cell's centroid. Map-only
    * over the (tiny, broadcastable) query set. */
  private def pqLookupTables(index: PqIndex, queries: DataFrame): DataFrame = {
    val dsub = index.dsub
    val ltArr = index.codebooks.zipWithIndex.map { case (cb, s) =>
      val off = s * dsub
      s"transform(${centsSqlOf(cb)}, c -> aggregate(zip_with(slice(__nv, ${off + 1}, $dsub), c, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (a, x) -> a + x))"
    }.mkString("array(", ", ", ")")
    withNv(queries, "query_embedding")
      .select(col("query_id"), expr(ltArr).as("lt"))
  }

  /** The ADC total: m table lookups folded subspace-ascending (the exact
    * order the DuckDB oracles reproduce). Expects `lt` and `codes` cols. */
  private def adcExpr(m: Int): org.apache.spark.sql.Column = expr(
    s"""aggregate(sequence(1, $m), CAST(0.0 AS DOUBLE),
          (a, s) -> a + element_at(element_at(lt, s), element_at(codes, s) + 1))""")

  def pqProbe(index: PqIndex, items: DataFrame, queries: DataFrame, k: Int,
              shortlist: Int = 64): DataFrame = {
    val qlt = pqLookupTables(index, queries)
    val short = graft.plans.GroupedTopK(
        index.codes.crossJoin(broadcast(qlt))
          .select(col("query_id"), col("vec_id"), adcExpr(index.m).as("adc")),
        Seq(col("query_id")), Seq(desc("adc"), asc("vec_id")), shortlist)
      .select("query_id", "vec_id")
    topKPerQuery(
      broadcast(short).join(items, Seq("vec_id"))
        .join(broadcast(queries), Seq("query_id"))
        .withColumn("score",
          cosine_similarity(col("embedding"), col("query_embedding"))),
      k)
  }

  /** Build + probe in one call (product quantization, ADC shortlist, exact
    * re-rank). */
  def pqTopK(items: DataFrame, queries: DataFrame, k: Int,
             m: Int = 16, ksub: Int = 16, iters: Int = 2,
             shortlist: Int = 64, inDim: Int = 64): DataFrame =
    pqProbe(pqIndex(items, m, ksub, iters, inDim), items, queries, k, shortlist)

  /** IVF-PQ composite ANN — the canonical billion-scale index layout
    * (coarse inverted lists bound WHICH vectors a query touches; product
    * codes bound the BYTES per touched vector): `detKMeans` cells probed at
    * `nProbe` (the q69 machinery) with ADC scoring over the PQ codes of
    * candidate cells only, then an exact-cosine re-rank of the ADC
    * shortlist. Per-query cost ~ (corpus/nLists x nProbe) 16-byte code
    * rows + shortlist f32 rows — at 100 TB the scan reads neither the whole
    * corpus (IVF prunes) nor full vectors (PQ shrinks). Codes here are
    * GLOBAL-codebook PQ over the normalized vectors (residual-free — the
    * IVF-Flat-PQ simplification; residual encoding would buy accuracy at
    * the cost of per-cell codebook state), so both halves reuse the
    * deterministic builds and the whole path is hash-checked by the q80
    * oracle (q69's probe chain composed with q76's ADC chain). Recall-gated
    * in SimilaritySpec. */
  def ivfPqTopK(items: DataFrame, queries: DataFrame, k: Int,
                nLists: Int = 8, kmIters: Int = 3, nProbe: Int = 3,
                m: Int = 16, ksub: Int = 16, pqIters: Int = 2,
                shortlist: Int = 64): DataFrame = {
    val (cents, assigned) = detKMeans(items, nLists, kmIters)
    val pq = pqIndex(items, m, ksub, pqIters)
    // per-query nProbe closest cells by cosine against the exact f64
    // centroids — identical to detIvfTopK's probe stage
    val sorted = cents.sortBy(_._1)
    val centsSql = sorted.map(_._2.map(_.toString).mkString("array(", ", ", ")"))
      .mkString("array(", ", ", ")")
    val cellIds = sorted.map(_._1).mkString("array(", ", ", ")")
    val cnorms = sorted.map { case (_, c) =>
      math.sqrt(c.map(x => x * x).sum).toString
    }.mkString("array(", ", ", ")")
    val qscored = withNv(queries, "query_embedding")
      .withColumn("__cs", expr(
        s"""zip_with(
              transform($centsSql, c -> aggregate(zip_with(__nv, c, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (a, x) -> a + x)),
              $cnorms,
              (d, nc) -> IF(nc = 0.0D, CAST(0.0 AS DOUBLE), d / nc))"""))
      .select(col("query_id"), posexplode(col("__cs")).as(Seq("__i", "cscore")))
      .withColumn("cell", expr(s"element_at($cellIds, __i + 1)"))
      .select(col("query_id"), col("cell"), col("cscore"))
    val probes = graft.plans.GroupedTopK(qscored,
        Seq(col("query_id")), Seq(desc("cscore"), asc("cell")), nProbe)
      .select(col("query_id"), col("cell"))
    // ADC over candidate cells only: codes join the (tiny) probe set on
    // cell, lookup tables ride the broadcast
    val qlt = pqLookupTables(pq, queries)
    val cand = assigned.join(broadcast(probes), Seq("cell"))
      .select("query_id", "vec_id")
    val short = graft.plans.GroupedTopK(
        cand.hint("SHUFFLE_HASH").join(pq.codes, Seq("vec_id"))
          .join(broadcast(qlt), Seq("query_id"))
          .select(col("query_id"), col("vec_id"), adcExpr(m).as("adc")),
        Seq(col("query_id")), Seq(desc("adc"), asc("vec_id")), shortlist)
      .select("query_id", "vec_id")
    topKPerQuery(
      broadcast(short).join(items, Seq("vec_id"))
        .join(broadcast(queries), Seq("query_id"))
        .withColumn("score",
          cosine_similarity(col("embedding"), col("query_embedding"))),
      k)
  }

  /** Residual IVF-PQ — true IVFADC (Jégou et al. 2011, §IV): PQ codebooks
    * model the RESIDUAL `nv - centroid(cell)` instead of the vector itself.
    * Residuals concentrate near the origin once the coarse quantizer has
    * explained the cell structure, so the same code budget buys a finer
    * reconstruction than `ivfPqTopK`'s global-codebook form (that one keeps
    * residual-free as its documented trade-off; this is the full-fidelity
    * sibling — both hash-oracled, q80/q90).
    *
    * ADC with residuals: score(q, x) ~ dot(qn, c_cell) + dot(qn, recon(r))
    * — per query ONE base dot per probed cell (nLists doubles, rides the
    * broadcast) plus the usual m lookups per candidate. Same scale shape as
    * `ivfPqTopK`: candidates ~ corpus/nLists x nProbe 16-byte code rows,
    * exact re-rank on the shortlist only. Deterministic end-to-end (the
    * detKMeans cells, the hash-ordered fit sample over the residual frame,
    * fixed-point Lloyd, sequential ADC folds). */
  def ivfPqResidualTopK(items: DataFrame, queries: DataFrame, k: Int,
                        nLists: Int = 8, kmIters: Int = 3, nProbe: Int = 3,
                        m: Int = 16, ksub: Int = 16, pqIters: Int = 2,
                        shortlist: Int = 64, inDim: Int = 64): DataFrame = {
    require(m >= 1 && inDim % m == 0, s"inDim=$inDim must split into m=$m subspaces")
    val (cents, assigned) = detKMeans(items, nLists, kmIters)
    val sorted = cents.sortBy(_._1)
    val centsSql = sorted.map(_._2.map(_.toString).mkString("array(", ", ", ")"))
      .mkString("array(", ", ", ")")
    val cellIds = sorted.map(_._1).mkString("array(", ", ", ")")
    val cnorms = sorted.map { case (_, c) =>
      math.sqrt(c.map(x => x * x).sum).toString
    }.mkString("array(", ", ", ")")
    // residual frame: __nv := nv - centroid(cell); cells are 0..k-1 by
    // construction (first-k-by-id init), so element_at(cell+1) is exact
    val resid = withNv(items, "embedding")
      .select(col("vec_id"), col("__nv"))
      .join(assigned, Seq("vec_id"))
      .withColumn("__nv", expr(
        s"zip_with(__nv, element_at($centsSql, cell + 1), (x, y) -> x - y)"))
    val residNv = resid.select(col("vec_id"), col("__nv"))
    val dsub = inDim / m
    val key = memoKey(residNv, s"ivfpqr|$nLists|$kmIters|$m|$ksub|$pqIters|$inDim")
      .map(s => (items.sparkSession, s))
    val pq = key.flatMap { mk =>
      pqMemo.synchronized {
        pqMemo.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
        pqMemo.get(mk)
      }
    }.getOrElse {
      val built = buildPqFromNv(residNv, m, ksub, pqIters, dsub)
      key.foreach(mk => pqMemo.synchronized { pqMemo.update(mk, built) })
      built
    }
    // query side: nProbe cells by centroid cosine (the q69 probe rule),
    // plus per-cell base dots and the residual lookup tables — all riding
    // the query broadcast
    val ltArr = pq.codebooks.zipWithIndex.map { case (cb, s) =>
      val off = s * dsub
      s"transform(${centsSqlOf(cb)}, c -> aggregate(zip_with(slice(__nv, ${off + 1}, $dsub), c, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (a, x) -> a + x))"
    }.mkString("array(", ", ", ")")
    val qn = withNv(queries, "query_embedding")
      .withColumn("__bs", expr(
        s"transform($centsSql, c -> aggregate(zip_with(__nv, c, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (a, x) -> a + x))"))
      .withColumn("__cs", expr(
        s"""zip_with(__bs, $cnorms,
              (d, nc) -> IF(nc = 0.0D, CAST(0.0 AS DOUBLE), d / nc))"""))
    val qscored = qn
      .select(col("query_id"), posexplode(col("__cs")).as(Seq("__i", "cscore")))
      .withColumn("cell", expr(s"element_at($cellIds, __i + 1)"))
      .select(col("query_id"), col("cell"), col("cscore"))
    val probes = graft.plans.GroupedTopK(qscored,
        Seq(col("query_id")), Seq(desc("cscore"), asc("cell")), nProbe)
      .select(col("query_id"), col("cell"))
    val qlt = qn.select(col("query_id"), expr(ltArr).as("lt"), col("__bs").as("bs"))
    val cand = assigned.join(broadcast(probes), Seq("cell"))
      .select("query_id", "vec_id", "cell")
    val short = graft.plans.GroupedTopK(
        cand.hint("SHUFFLE_HASH").join(pq.codes, Seq("vec_id"))
          .join(broadcast(qlt), Seq("query_id"))
          .select(col("query_id"), col("vec_id"),
            (expr("element_at(bs, cell + 1)") + adcExpr(m)).as("adc")),
        Seq(col("query_id")), Seq(desc("adc"), asc("vec_id")), shortlist)
      .select("query_id", "vec_id")
    topKPerQuery(
      broadcast(short).join(items, Seq("vec_id"))
        .join(broadcast(queries), Seq("query_id"))
        .withColumn("score",
          cosine_similarity(col("embedding"), col("query_embedding"))),
      k)
  }

  /** Incremental PQ maintenance: codebooks stay FROZEN (the IVF contract —
    * cheap upserts between periodic retrains), so a delta re-encodes
    * map-only against them and replaces by id. Encoding depends only on the
    * codebooks, so an upsert's codes exactly equal a fresh encode of the
    * merged corpus under the same codebooks (SimilaritySpec pins probe
    * equality). */
  def upsertPq(index: PqIndex, delta: DataFrame,
               embCol: String = "embedding"): PqIndex = {
    val nv = withNv(delta, embCol).select(col("vec_id"), col("__nv"))
    val newCodes = withSubCodes(nv, index.codebooks, index.dsub)
      .select(col("vec_id"), expr(codesArrayExpr(index.m)).as("codes"))
    PqIndex(
      newCodes.unionByName(
        index.codes.join(delta.select("vec_id"), Seq("vec_id"), "left_anti")),
      index.codebooks, index.dsub)
  }

  /** Persist a PQ index in the IVFADC layout: the codes table carries
    * each vector's COARSE CELL (taken from the paired coarse assignments
    * — the one source of truth for cell membership, so codes.cell and
    * assignments.cell can never disagree) and is `partitionBy("cell")`,
    * which is what makes the serving scan partition-prunable: a probe
    * reads only the nProbe probed cells' code files instead of the whole
    * table (`ivfPqProbe`), and deletes inherit `deleteIvfAt`'s
    * partition-pruned rewrite. The tiny codebooks land beside them as
    * before. */
  def savePqCellPartitioned(pq: PqIndex, assignments: DataFrame,
                            path: String): Unit = {
    pq.codes
      .hint("SHUFFLE_HASH")
      .join(assignments.select("vec_id", "cell"), Seq("vec_id"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/codes")
    val spark = pq.codes.sparkSession
    import spark.implicits._
    pq.codebooks.zipWithIndex.flatMap { case (cb, s) =>
      cb.zipWithIndex.map { case (c, cell) => (s, cell, c.toSeq) }
    }.toDF("sub", "cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
  }

  /** [[upsertPq]] against a SAVED cell-partitioned PQ index (the resolved
    * `<gen>/pq` dir): load the frozen codebooks, encode the delta
    * map-only against them, take each delta id's coarse cell from the
    * ALREADY-UPSERTED coarse assignments (call [[upsertIvfAt]] first —
    * the assignments are the source of truth for cell membership), and
    * rewrite ONLY the touched cell partitions (the [[upsertIvfAt]]
    * touched-cells rule, old cells included). Codebooks are never
    * touched: the production constraint is exactly that upserts ride the
    * frozen books between periodic retrains. */
  def upsertCellPqAt(spark: org.apache.spark.sql.SparkSession, path: String,
                     coarseAssignments: DataFrame, delta: DataFrame,
                     embCol: String = "embedding"): Unit = {
    val pq = loadPqIndex(spark, path)
    val nv = withNv(delta, embCol).select(col("vec_id"), col("__nv"))
    val deltaCells = coarseAssignments.select("vec_id", "cell")
      .join(broadcast(delta.select("vec_id")), Seq("vec_id"))
    // delta-sized × delta-sized equi-join: SHUFFLE_HASH, not broadcast —
    // an upsert wave can be any size, only its ids ride broadcasts
    val newCodes = withSubCodes(nv, pq.codebooks, pq.dsub)
      .select(col("vec_id"), expr(codesArrayExpr(pq.m)).as("codes"))
      .hint("SHUFFLE_HASH").join(deltaCells, Seq("vec_id"))
    upsertCellTable(spark, s"$path/codes", pq.codes,
      newCodes.select("vec_id", "codes", "cell"),
      delta.select("vec_id"), Seq("vec_id", "codes"))
  }

  /** [[upsertBq]] against a SAVED binary-quantization index root — the
    * [[upsertSqAt]] contract for the sign-sketch codes (per-vector, no
    * trained state; next-generation rewrite + pointer flip). */
  def upsertBqAt(spark: org.apache.spark.sql.SparkSession, root: String,
                 delta: DataFrame, numBits: Int = 63): Unit =
    rewriteFlatCodesGen(spark, root,
      upsertBq(loadBqIndex(spark, resolveIndexDir(spark, root)), delta, numBits),
      refuseEmpty = false)

  /** Build-once cache for the DECLARED persisted-BQ query (q291) — the
    * last index type to get the persisted lifecycle (IVF q261, IVF-PQ
    * q282, SQ8 q290, BQ here): sketch + save the even wave, [[upsertBqAt]]
    * the odd wave, probe via [[loadBqIndex]] + [[bqProbe]]. The Hamming
    * shortlist scan touches ONLY the stored 8-byte codes (32x less than
    * f32); the exact re-rank then reads the shortlist's embeddings from
    * the corpus table by id — shortlist x queries point-lookups, the one
    * arm of this index that is corpus-resident by design (BQ stores no
    * vectors; that is its entire memory story). */
  def ensurePersistedBq(spark: org.apache.spark.sql.SparkSession,
                        embeddings: DataFrame, sfDir: String,
                        numBits: Int = 63): String = {
    ensureIndexDir(spark, "bqidx", s"$sfDir|${persistedIndexStamp(spark, sfDir)}|$numBits|v2") { index =>
      resetIndexRoot(spark, index)
      val (g1n, g1) = beginGen(spark, index)
      val w0 = embeddings.filter(pmod(col("vec_id"), lit(2)) === 0)
      val w1 = embeddings.filter(pmod(col("vec_id"), lit(2)) === 1)
      saveBqIndex(bqIndex(w0, numBits), g1)
      commitGen(spark, index, g1n)
      upsertBqAt(spark, index, w1, numBits)
    }
  }

  /** Build-once cache for the DECLARED deleted-BQ query (q294): the q291
    * lifecycle EXTENDED by the erasure leg — sketch + save the even wave,
    * [[upsertBqAt]] the odd wave, [[deleteBqAt]] every
    * `vec_id % delMod == delRes`, probe via [[loadBqIndex]] +
    * [[bqProbe]]. The Hamming shortlist scans only the surviving stored
    * codes, so a deleted id can never reach the re-rank (which is the arm
    * that touches the corpus table — BQ stores no vectors). */
  def ensurePersistedBqDeleted(spark: org.apache.spark.sql.SparkSession,
                               embeddings: DataFrame, sfDir: String,
                               numBits: Int = 63, delMod: Int = 5,
                               delRes: Int = 3): String = {
    ensureIndexDir(spark, "bqidxdel", s"$sfDir|${persistedIndexStamp(spark, sfDir)}|" +
        s"$numBits|del=mod${delMod}eq$delRes|v2") { index =>
      resetIndexRoot(spark, index)
      val (g1n, g1) = beginGen(spark, index)
      val w0 = embeddings.filter(pmod(col("vec_id"), lit(2)) === 0)
      val w1 = embeddings.filter(pmod(col("vec_id"), lit(2)) === 1)
      saveBqIndex(bqIndex(w0, numBits), g1)
      commitGen(spark, index, g1n)
      upsertBqAt(spark, index, w1, numBits)
      deleteBqAt(spark, index,
        embeddings.filter(pmod(col("vec_id"), lit(delMod)) === delRes)
          .select("vec_id"))
    }
  }

  /** Probe a SAVED IVF-PQ pair — the serving path of the persisted
    * lifecycle (q282): coarse cells from the loaded f32 centroid table
    * (the `ivfProbe` probe rule: f32-rounded normalized queries against
    * f32 stored centroids, cosine, top-`nProbe` cells), ADC over the
    * loaded codes of candidate cells only (lookup tables from the loaded
    * f64 codebooks ride the query broadcast), exact-cosine re-rank of the
    * `shortlist` using the embeddings STORED IN the coarse assignments —
    * so the whole probe touches nothing but the saved files.
    *
    * When the codes table is CELL-PARTITIONED (the
    * [[savePqCellPartitioned]] IVFADC layout — `codes.cell` equals the
    * coarse assignment by construction), the probed cells are collected
    * driver-side (a bounded |queries| × nProbe list, the `deleteIvfAt`
    * bounded-collect convention) and pushed as a STATIC partition filter
    * on BOTH big-table scans: the codes scan reads only the probed
    * cells' code files (the candidates ARE the codes rows of those
    * cells — no assignments-side join needed before ADC), and the
    * re-rank reads only the probed cells' assignment partitions. Nothing
    * corpus-sized shuffles: the ADC stage is a pruned scan × broadcast
    * probe join, per-batch cost ~ (corpus/nLists × nProbe) m-byte code
    * rows + shortlist f32 rows — the billion-scale IVFADC serving shape.
    * A FLAT codes table (in-memory `pqIndex` output) takes the legacy
    * shape: candidates from the assignments, SHUFFLE_HASH join against
    * the full codes table. */
  def ivfPqProbe(coarse: IvfIndex, pq: PqIndex, queries: DataFrame, k: Int,
                 nProbe: Int = 3, shortlist: Int = 64): DataFrame = {
    val nq = normalized(queries, "query_embedding")
      .select(col("query_id"),
        vector_to_array(col("nvec")).cast("array<float>").as("nvec_arr"))
    val probes = graft.plans.GroupedTopK(
        nq.crossJoin(broadcast(coarse.centroids))
          .withColumn("cscore", cosine_similarity(col("nvec_arr"), col("centroid")))
          .select(col("query_id"), col("cell"), col("cscore")),
        Seq(col("query_id")), Seq(desc("cscore"), asc("cell")), nProbe)
      .select(col("query_id"), col("cell"))
    val qlt = pqLookupTables(pq, queries)
    val (short, rerankStore) =
      if (pq.codes.columns.contains("cell")) {
        // bounded collect: |queries| x nProbe cells, the serving batch's
        // probe set — what makes the partition filter STATIC (visible as
        // PartitionFilters on the scan, no runtime pruning needed)
        val cells = probes.select("cell").distinct()
          .collect().map(_.getInt(0)).toSeq
        val s = graft.plans.GroupedTopK(
            pq.codes.filter(col("cell").isin(cells: _*))
              .join(broadcast(probes), Seq("cell"))
              .join(broadcast(qlt), Seq("query_id"))
              .select(col("query_id"), col("vec_id"), adcExpr(pq.m).as("adc")),
            Seq(col("query_id")), Seq(desc("adc"), asc("vec_id")), shortlist)
          .select("query_id", "vec_id")
        // shortlisted ids live in probed cells by construction, so the
        // same static filter prunes the re-rank's assignments scan too
        (s, coarse.assignments.filter(col("cell").isin(cells: _*))
          .select("vec_id", "embedding"))
      } else {
        val cand = coarse.assignments.select("vec_id", "cell")
          .join(broadcast(probes), Seq("cell"))
          .select("query_id", "vec_id")
        val s = graft.plans.GroupedTopK(
            cand.hint("SHUFFLE_HASH").join(pq.codes, Seq("vec_id"))
              .join(broadcast(qlt), Seq("query_id"))
              .select(col("query_id"), col("vec_id"), adcExpr(pq.m).as("adc")),
            Seq(col("query_id")), Seq(desc("adc"), asc("vec_id")), shortlist)
          .select("query_id", "vec_id")
        (s, coarse.assignments.select("vec_id", "embedding"))
      }
    topKPerQuery(
      broadcast(short)
        .join(rerankStore, Seq("vec_id"))
        .join(broadcast(queries), Seq("query_id"))
        .withColumn("score",
          cosine_similarity(col("embedding"), col("query_embedding"))),
      k)
  }

  /** Build-once cache for the DECLARED persisted IVF-PQ query (q282) —
    * [[ensurePersistedDetIvf]]'s pattern applied to the QUANTIZED index,
    * which is what actually serves at 100 TB (IVF prunes which vectors a
    * query touches; PQ bounds the bytes per touched vector):
    *
    *   1. fit the coarse quantizer ([[detIvfIndex]]) AND the PQ codebooks
    *      ([[pqIndex]]) on the FIRST wave (even vec_ids), save both;
    *   2. maintain the SECOND wave (odd vec_ids) against the FROZEN saved
    *      artifacts — [[upsertIvfAt]] assigns against the persisted f32
    *      centroids, [[upsertPqAt]] encodes against the persisted
    *      codebooks (no codebook drift: the real production constraint —
    *      codes stay mutually comparable between periodic retrains);
    *   3. readers answer via [[loadIvfIndex]] + [[loadPqIndex]] +
    *      [[ivfPqProbe]] only — nothing refit at query time.
    *
    * Every stage is deterministic (detKMeans coarse cells, the
    * hash-ordered PQ fit sample, fixed-point Lloyd means, sequential ADC
    * folds), so the whole lifecycle is hash-oracled like q261, including
    * the f32 rounding of the saved coarse centroids. The codes land
    * CELL-PARTITIONED ([[savePqCellPartitioned]] — the IVFADC layout that
    * makes the serving scan partition-pruned) in a `gen=1` dir behind the
    * `_GEN` pointer; crash-convergent via the reset-then-rebuild rule;
    * same marker + build lock + loud source stamp as the det-IVF cache. */
  def ensurePersistedIvfPq(spark: org.apache.spark.sql.SparkSession,
                           embeddings: DataFrame, sfDir: String,
                           nLists: Int = 8, kmIters: Int = 3, m: Int = 16,
                           ksub: Int = 16, pqIters: Int = 2): String = {
    ensureIndexDir(spark, "ivfpq", s"$sfDir|${persistedIndexStamp(spark, sfDir)}|" +
        s"$nLists|$kmIters|$m|$ksub|$pqIters|v2") { index =>
      buildIvfPqGen1(spark, index, embeddings,
        Seq(embeddings.filter(pmod(col("vec_id"), lit(2)) === 1)),
        nLists, kmIters, m, ksub, pqIters)
    }
  }

  /** The shared gen=1 build for the persisted IVF-PQ lifecycles: reset
    * the root, fit BOTH trained artifacts on the even wave, save them
    * cell-partitioned under `gen=1`, flip the pointer, then upsert each
    * given wave against the frozen artifacts IN ORDER (coarse first —
    * the assignments are the source of truth the code rows take their
    * cell from). Returns the gen=1 dir for follow-on maintenance legs. */
  private def buildIvfPqGen1(spark: org.apache.spark.sql.SparkSession,
                             index: String, embeddings: DataFrame,
                             upsertWaves: Seq[DataFrame],
                             nLists: Int, kmIters: Int, m: Int,
                             ksub: Int, pqIters: Int): String = {
    resetIndexRoot(spark, index)
    val (g1n, g1) = beginGen(spark, index)
    val w0 = embeddings.filter(pmod(col("vec_id"), lit(2)) === 0)
    detIvfIndex(w0, nLists, kmIters).save(s"$g1/coarse")
    savePqCellPartitioned(pqIndex(w0, m, ksub, pqIters),
      spark.read.parquet(s"$g1/coarse/assignments"), s"$g1/pq")
    commitGen(spark, index, g1n)
    upsertWaves.foreach { w =>
      upsertIvfAt(spark, s"$g1/coarse", w)
      upsertCellPqAt(spark, s"$g1/pq",
        spark.read.parquet(s"$g1/coarse/assignments"), w)
    }
    g1
  }

  /** Build-once cache for the DECLARED deleted-IVF-PQ query (q295): the
    * q282 lifecycle EXTENDED by the erasure leg on BOTH saved artifacts —
    * [[deleteIvfAt]] purges the ids from the coarse assignments
    * (partition-pruned rewrite; makes them unreachable as probe
    * candidates AND erases their stored f32 embeddings — the re-rank
    * store), [[deletePqAt]] purges their quantized codes. Centroids and
    * codebooks stay frozen: trained per-cell/per-subspace statistics
    * carry no per-vector data, so a takedown never forces a refit. */
  def ensurePersistedIvfPqDeleted(spark: org.apache.spark.sql.SparkSession,
                                  embeddings: DataFrame, sfDir: String,
                                  nLists: Int = 8, kmIters: Int = 3,
                                  m: Int = 16, ksub: Int = 16,
                                  pqIters: Int = 2, delMod: Int = 5,
                                  delRes: Int = 3): String = {
    ensureIndexDir(spark, "ivfpqdel", s"$sfDir|${persistedIndexStamp(spark, sfDir)}|" +
        s"$nLists|$kmIters|$m|$ksub|$pqIters|del=mod${delMod}eq$delRes|v2") { index =>
      val g1 = buildIvfPqGen1(spark, index, embeddings,
        Seq(embeddings.filter(pmod(col("vec_id"), lit(2)) === 1)),
        nLists, kmIters, m, ksub, pqIters)
      val del = embeddings
        .filter(pmod(col("vec_id"), lit(delMod)) === delRes)
        .select("vec_id")
      deleteIvfAt(spark, s"$g1/coarse", del)
      deletePqAt(spark, s"$g1/pq", del)
    }
  }

  /** Retrain BOTH trained artifacts of a SAVED IVF-PQ index —
    * [[retrainIvfAt]]'s twin for the quantized serving index: coarse
    * centroids AND codebooks refit over the CURRENT stored vectors (the
    * coarse assignments table carries them, so the retrain is
    * self-contained — no source-corpus access), every vector reassigned
    * and re-encoded, and all four tables (coarse assignments/centroids,
    * cell-partitioned PQ codes, codebooks) written as ONE next
    * generation behind the `_GEN` pointer. The single pointer flip is
    * what makes the four-table swap atomic for readers: a concurrent
    * probe resolves either the complete old generation or the complete
    * new one — the mixed new-assignments/old-codebooks window of a
    * table-by-table swap cannot exist — and a crash before the flip
    * leaves the serving generation untouched. */
  def retrainIvfPqAt(spark: org.apache.spark.sql.SparkSession, root: String,
                     nLists: Int = 8, kmIters: Int = 3, m: Int = 16,
                     ksub: Int = 16, pqIters: Int = 2): Unit = {
    val cur = resolveIndexDir(spark, root)
    val (n, next) = beginGen(spark, root)
    val stored = spark.read.parquet(s"$cur/coarse/assignments")
      .select("vec_id", "embedding")
    detIvfIndex(stored, nLists, kmIters).save(s"$next/coarse")
    savePqCellPartitioned(pqIndex(stored, m, ksub, pqIters),
      spark.read.parquet(s"$next/coarse/assignments"), s"$next/pq")
    commitGen(spark, root, n)
    pruneGens(spark, root)
  }

  /** Build-once cache for the DECLARED retrained-IVF-PQ query (q304):
    * q282's lifecycle (fit both artifacts on the even wave, upsert the
    * odd wave against them frozen) followed by [[retrainIvfPqAt]] — the
    * scheduled refit the quantized serving index runs when
    * [[ivfCellStats]] reports drift. Both refits are deterministic over
    * the full stored corpus, so the post-retrain probe is hash-oracled
    * against a from-scratch full-corpus fit of BOTH artifacts. */
  def ensurePersistedIvfPqRetrained(spark: org.apache.spark.sql.SparkSession,
                                    embeddings: DataFrame, sfDir: String,
                                    nLists: Int = 8, kmIters: Int = 3,
                                    m: Int = 16, ksub: Int = 16,
                                    pqIters: Int = 2): String = {
    ensureIndexDir(spark, "ivfpqrtr", s"$sfDir|${persistedIndexStamp(spark, sfDir)}|" +
        s"$nLists|$kmIters|$m|$ksub|$pqIters|retrain|v2") { index =>
      // the initial reset (inside buildIvfPqGen1) wipes any partial next
      // generation a crashed earlier build left, so the retry is clean
      buildIvfPqGen1(spark, index, embeddings,
        Seq(embeddings.filter(pmod(col("vec_id"), lit(2)) === 1)),
        nLists, kmIters, m, ksub, pqIters)
      retrainIvfPqAt(spark, index, nLists, kmIters, m, ksub, pqIters)
    }
  }

  /** Build-once cache for the DECLARED readmit query (q303's vector leg):
    * the q295 takedown lifecycle followed by RE-INGEST of the purged ids
    * through the standard upsert path ([[upsertIvfAt]] + [[upsertPqAt]]
    * against the SAME frozen trained artifacts). Because assignment and
    * encoding are per-vector against frozen state, delete + readmit is an
    * IDENTITY on the index content — the probe hash-matches q282's
    * never-deleted oracle verbatim, proving the takedown-then-reingest
    * flow heals both saved artifacts exactly.
    *
    * Precision caveat to that identity: readmitted EVEN-wave ids are
    * re-assigned by [[assignCells]] against the f32-ROUNDED saved
    * centroids, while their original rows came from the f64 Lloyd
    * assignment — the two agree unless a vector sits on a near-tie that
    * flips under f32 rounding. The q303 oracle gates this empirically at
    * every tested SF; a corpus engineered onto such a tie would break
    * the byte-identity (not correctness — both assignments are valid
    * nearest-centroid choices). */
  def ensurePersistedIvfPqReadmitted(spark: org.apache.spark.sql.SparkSession,
                                     embeddings: DataFrame, sfDir: String,
                                     nLists: Int = 8, kmIters: Int = 3,
                                     m: Int = 16, ksub: Int = 16,
                                     pqIters: Int = 2, delMod: Int = 5,
                                     delRes: Int = 3): String = {
    ensureIndexDir(spark, "ivfpqradm", s"$sfDir|${persistedIndexStamp(spark, sfDir)}|" +
        s"$nLists|$kmIters|$m|$ksub|$pqIters|readmit=mod${delMod}eq$delRes|v2") { index =>
      val g1 = buildIvfPqGen1(spark, index, embeddings,
        Seq(embeddings.filter(pmod(col("vec_id"), lit(2)) === 1)),
        nLists, kmIters, m, ksub, pqIters)
      val del = embeddings
        .filter(pmod(col("vec_id"), lit(delMod)) === delRes)
      deleteIvfAt(spark, s"$g1/coarse", del.select("vec_id"))
      deletePqAt(spark, s"$g1/pq", del.select("vec_id"))
      upsertIvfAt(spark, s"$g1/coarse", del)
      upsertCellPqAt(spark, s"$g1/pq",
        spark.read.parquet(s"$g1/coarse/assignments"), del)
    }
  }

  /** Build-once cache for the DECLARED maintained-IVF-PQ query (q300):
    * q282's lifecycle under the LONGER maintenance history q296/q297 gave
    * the plain IVF — fit + save BOTH trained artifacts on the even wave
    * (coarse centroids AND codebooks frozen there), then TWO separate
    * upsert waves (vec_id % 4 == 1, then % 4 == 3) against the frozen
    * artifacts, then [[compactIvfPqAt]] rewrites BOTH fragmented
    * cell-partitioned tables — the coarse assignments AND the PQ codes
    * (each upsert wave appends a file set into the cell partitions it
    * touches on both stores) — to one file per cell, as one new
    * generation. Because assignment and encoding are per-vector against
    * frozen artifacts, the post-maintenance probe equals q282's two-wave
    * index exactly — q300 reuses q282's hash oracle verbatim. */
  def ensurePersistedIvfPqMaintained(spark: org.apache.spark.sql.SparkSession,
                                     embeddings: DataFrame, sfDir: String,
                                     nLists: Int = 8, kmIters: Int = 3,
                                     m: Int = 16, ksub: Int = 16,
                                     pqIters: Int = 2): String = {
    ensureIndexDir(spark, "ivfpqmnt", s"$sfDir|${persistedIndexStamp(spark, sfDir)}|" +
        s"$nLists|$kmIters|$m|$ksub|$pqIters|waves=4|compact|v2") { index =>
      buildIvfPqGen1(spark, index, embeddings,
        Seq(embeddings.filter(pmod(col("vec_id"), lit(4)) === 1),
          embeddings.filter(pmod(col("vec_id"), lit(4)) === 3)),
        nLists, kmIters, m, ksub, pqIters)
      compactIvfPqAt(spark, index)
    }
  }

  /** Deterministic random-projection dimensionality reduction (the
    * Johnson-Lindenstrauss shrink step before an expensive pair join or
    * index build): out[j] = dot(e, w_j) over hash-derived hyperplanes
    * (`RandProjBuckets.weights`, sha256("rp:j:i") — shared with the rp-LSH
    * family, so the DuckDB oracle recomputes identical weights in SQL).
    * The outDim x inDim multiply-add unrolls into one literal expression
    * inside whole-stage codegen — map-only, no shuffle, no UDF. */
  def reduceDim(items: DataFrame, outDim: Int = 16, inDim: Int = 64,
                embCol: String = "embedding", outCol: String = "reduced"): DataFrame = {
    require(outDim > 0 && outDim <= 64 && inDim > 0, "dims out of range")
    val w = graft.functions.RandProjBuckets.weights(outDim, inDim)
    val outs = (0 until outDim).map { j =>
      (0 until inDim).map(i =>
        s"(CAST($embCol[$i] AS DOUBLE) * ${w(j)(i)})").mkString("(", " + ", ")")
    }
    items.withColumn(outCol, expr(s"array(${outs.mkString(", ")})"))
  }

  /** Bucket table for the deterministic random-projection LSH: one row per
    * (id, table, bucket), zero-vector sentinel rows excluded. Map-only
    * (codegen'd `RandProjBuckets`), plain (int, long) join keys. */
  private def rpBucketTable(df: DataFrame, idCol: String, embCol: String,
                            numTables: Int, bucketLength: Double): DataFrame =
    df.select(col(idCol), posexplode(
        graft.GraftFunctions.rand_proj_buckets(col(embCol), numTables, bucketLength))
        .as(Seq("t", "bk")))
      .filter(col("bk") =!= graft.functions.RandProjBuckets.ZeroVectorBucket)

  /** [[rpBucketTable]] carrying the embedding through the explode — the
    * pair-join shape: verification happens INSIDE the band join (the
    * embedding rides the one (t, bk) shuffle, numTables copies per
    * vector), so no candidate-pair re-join against the corpus is ever
    * needed. Shuffle bytes ~ numTables x corpus embeddings — linear in
    * the corpus — vs two corpus-keyed shuffles of the (potentially much
    * larger) candidate-pair stream for the join-back form. */
  private def rpBucketTableWithVec(df: DataFrame, idCol: String,
                                   embCol: String, numTables: Int,
                                   bucketLength: Double): DataFrame =
    df.select(col(idCol), col(embCol).as("__e"), posexplode(
        graft.GraftFunctions.rand_proj_buckets(col(embCol), numTables, bucketLength))
        .as(Seq("t", "bk")))
      .filter(col("bk") =!= graft.functions.RandProjBuckets.ZeroVectorBucket)

  /** Composite ANN: deterministic rp-LSH coarse stage + int8 scalar-
    * quantized fine stage — the classic IVF-SQ index composition (coarse
    * partition prunes the corpus, quantized codes shrink what the fine
    * stage reads 4x), built from this engine's two deterministic halves so
    * the WHOLE pipeline stays hash-checkable in SQL (q67), where the
    * KMeans-based IVF twin (`ivfTopK`) can only be rows-only + recall-gated.
    * Candidates = vectors sharing any (table, bucket) with the query;
    * scoring = integer-dot cosine over the int8 codes — the fine stage
    * never touches the f32 vectors at all. At 100 TB: bucket join bounds
    * candidate work, GroupedTopK bounds the rank shuffle, and the scored
    * index is a quarter the bytes of the corpus. */
  def rpSqTopK(items: DataFrame, queries: DataFrame, k: Int,
               numTables: Int = 6, bucketLength: Double = 1.0): DataFrame = {
    import graft.GraftFunctions.byte_dot
    val ib = rpBucketTable(items, "vec_id", "embedding", numTables, bucketLength)
    val qb = rpBucketTable(queries, "query_id", "query_embedding", numTables, bucketLength)
    val cand = ib.join(broadcast(qb), Seq("t", "bk"))
      .select("query_id", "vec_id").distinct()
    val qq = quantize(queries, "query_embedding", "qcodes")
      .select(col("query_id"), col("qcodes"))
      .withColumn("nb", byte_dot(col("qcodes"), col("qcodes")))
    topKPerQuery(
      cand.hint("SHUFFLE_HASH").join(sqIndex(items), Seq("vec_id"))
        .join(broadcast(qq), Seq("query_id"))
        .withColumn("dot", byte_dot(col("codes"), col("qcodes")))
        .withColumn("score",
          when(col("na") === 0 || col("nb") === 0, lit(0.0))
            .otherwise(col("dot") / (sqrt(col("na")) * sqrt(col("nb"))))),
      k)
  }

  /** Approximate top-k via the deterministic random-projection LSH:
    * candidates = vectors sharing any (table, bucket) with the query, exact
    * cosine re-score, per-query rank. Unlike the MLlib path the bucketing
    * is a pure function of the input (hash-derived hyperplanes), so the
    * whole result is reproducible in the DuckDB oracle — the approximate
    * path stops being a rows-only check. */
  def rpTopK(items: DataFrame, queries: DataFrame, k: Int,
             numTables: Int = 6, bucketLength: Double = 1.0): DataFrame = {
    val ib = rpBucketTable(items, "vec_id", "embedding", numTables, bucketLength)
    val qb = rpBucketTable(queries, "query_id", "query_embedding", numTables, bucketLength)
    val cand = ib.join(broadcast(qb), Seq("t", "bk"))
      .select("query_id", "vec_id").distinct()
    topKPerQuery(
      cand.hint("SHUFFLE_HASH").join(items, Seq("vec_id"))
        .join(broadcast(queries), Seq("query_id"))
        .withColumn("score", cosine_similarity(col("embedding"), col("query_embedding"))),
      k)
  }

  /** Multi-probe rp-LSH top-k: each query additionally probes the
    * `probeRadius` adjacent buckets per table — the E2LSH multi-probe
    * recall lever: a near neighbor that landed just across a quantization
    * boundary is recovered WITHOUT growing the table count (the classic
    * memory/recall trade: more tables cost index space corpus-wide,
    * more probes cost only query-side candidates). Candidates grow ~
    * (2*probeRadius + 1)x on the (tiny, broadcast) probe side; the corpus
    * bucket table is untouched. Deterministic end-to-end like rpTopK —
    * the oracle replays the same +-radius expansion in SQL. Recall is
    * monotone: candidates are a superset of rpTopK's, and scoring is
    * exact, so recall@k can only improve (gated in SimilaritySpec). */
  def rpTopKMultiProbe(items: DataFrame, queries: DataFrame, k: Int,
                       numTables: Int = 6, bucketLength: Double = 1.0,
                       probeRadius: Int = 1): DataFrame = {
    require(probeRadius >= 1 && probeRadius <= 8)
    val ib = rpBucketTable(items, "vec_id", "embedding", numTables, bucketLength)
    val qb = rpBucketTable(queries, "query_id", "query_embedding",
        numTables, bucketLength)
      .select(col("query_id"), col("t"),
        explode(expr(s"sequence(bk - $probeRadius, bk + $probeRadius)")).as("bk"))
    val cand = ib.join(broadcast(qb), Seq("t", "bk"))
      .select("query_id", "vec_id").distinct()
    topKPerQuery(
      cand.hint("SHUFFLE_HASH").join(items, Seq("vec_id"))
        .join(broadcast(queries), Seq("query_id"))
        .withColumn("score",
          cosine_similarity(col("embedding"), col("query_embedding"))),
      k)
  }

  /** Near-duplicate pair join via the deterministic random-projection LSH:
    * streamed self-equi-join on (table, bucket) — the `simhashPairs` shape,
    * no per-bucket arrays — with exact cosine verification on candidates.
    * Reproducible in SQL end-to-end (see rpTopK). */
  def rpNearDupPairs(items: DataFrame, threshold: Double,
                     numTables: Int = 6, bucketLength: Double = 1.0): DataFrame = {
    val b = rpBucketTableWithVec(items, "vec_id", "embedding",
      numTables, bucketLength)
    // verify INSIDE the band join, BEFORE distinct (the simhashPairs
    // shape): the embeddings ride the one (t, bk) shuffle, a pair
    // colliding in several tables re-scores once per collision — a cheap
    // in-join dot — and the dedup shuffle carries only THRESHOLD
    // SURVIVORS; no corpus-keyed join-back of the candidate stream
    b.as("x").join(b.as("y").hint("SHUFFLE_HASH"),
        col("x.t") === col("y.t") && col("x.bk") === col("y.bk") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        col("x.__e").as("ea"), col("y.__e").as("eb"))
      .withColumn("score", cosine_similarity(col("ea"), col("eb")))
      .filter(col("score") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("score"), 4).as("score"))
      .distinct()
  }

  /** Cross-corpus near-duplicate join — dedup an INCOMING batch against an
    * EXISTING corpus (the incremental-crawl regime: re-ingesting the whole
    * corpus per delivery is exactly what doesn't scale): deterministic
    * rp-LSH buckets on both sides, a (table, bucket) equi-join of the small
    * new side against the big corpus side, exact-cosine verification on
    * candidates. Work ~ new-side buckets x collision rate, never
    * |new| x |corpus|; the corpus bucket table is a pure projection of the
    * corpus, so at scale it is computed once and persisted alongside the
    * index. Verify-before-distinct keeps the dedup shuffle at threshold
    * survivors (the `rpNearDupPairs` shape). Fully hash-checkable (q81). */
  def rpCrossNearDupPairs(newItems: DataFrame, corpus: DataFrame,
                          threshold: Double, numTables: Int = 6,
                          bucketLength: Double = 1.0): DataFrame = {
    val nb = rpBucketTableWithVec(newItems, "vec_id", "embedding",
      numTables, bucketLength)
    val cb = rpBucketTableWithVec(corpus, "vec_id", "embedding",
      numTables, bucketLength)
    nb.as("x").join(cb.as("y").hint("SHUFFLE_HASH"),
        col("x.t") === col("y.t") && col("x.bk") === col("y.bk"))
      .select(col("x.vec_id").as("vec_new"), col("y.vec_id").as("vec_old"),
        col("x.__e").as("ea"), col("y.__e").as("eb"))
      .withColumn("score", cosine_similarity(col("ea"), col("eb")))
      .filter(col("score") >= threshold)
      .select(col("vec_new"), col("vec_old"), round(col("score"), 4).as("score"))
      .distinct()
  }

  /** Approximate nearest neighbours via LSH: normalize (cosine == L2 on the
    * unit sphere), bucket with random hyperplane projections, join on bucket.
    * Deterministic under the fixed seed. Returns (query_id, vec_id, score)
    * with exact cosine re-scored on the candidates. */
  def lshTopK(items: DataFrame, queries: DataFrame, k: Int,
              bucketLength: Double = 0.5, numTables: Int = 6,
              radius: Double = 1.3): DataFrame = {
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("nvec").setOutputCol("hashes")
      .setBucketLength(bucketLength).setNumHashTables(numTables).setSeed(42L)
    // evaluated twice (fit + join left side); MEMORY_ONLY as above
    val ni = PlanCache.memo(normalized(items, "embedding"))
    val nq = normalized(queries, "query_embedding")
    val model = lsh.fit(ni)
    // On unit vectors L2² = 2 - 2cos, so radius 1.3 keeps candidates with
    // cos >= 0.155 (radius 2.0 would degenerate to a full cross join). The
    // radius bounds reachable recall outright — neighbours beyond it cannot
    // be returned from any bucket — so it is set from the corpus's observed
    // neighbour-score floor, with bucketLength/numTables tuned to the
    // recall@3 >= 0.9 gate in SimilaritySpec.
    val joined = model.approxSimilarityJoin(ni, nq, radius, "l2dist")
    topKPerQuery(
      joined.select(
          col("datasetB.query_id").as("query_id"),
          col("datasetA.vec_id").as("vec_id"),
          col("datasetA.embedding").as("e"),
          col("datasetB.query_embedding").as("q"))
        .withColumn("score", cosine_similarity(col("e"), col("q"))),
      k)
  }

  /** One-vs-rest ROC AUC per label for a scalar embedding score — the
    * class-separability probe a labeling/curation pipeline runs before
    * trusting a feature: AUC ≈ 0.5 means the score carries no signal for
    * that class. Score = first-component share of the L2 norm (a fixed
    * linear probe; any deterministic scalar works), Mann–Whitney form with
    * proper midrank tie handling.
    *
    * Shape at scale: never a global per-ROW rank. Rows collapse to
    * (score-bucket, label) counts first (fixed-point score = the bucket
    * key, partial-aggregated shuffle), and the rank-sum needs two
    * EXCLUSIVE running sums over that frame — one global, one per-label.
    * The distinct-score frame is ≤ 2^31 buckets but can approach row
    * count for continuous scores, so both prefix sums are
    * [[graft.operators.Ranks.exclusivePrefixSum]] (range exchange +
    * parallel local sums + an nPartitions-row offsets broadcast), never a
    * SinglePartition WindowExec. 2·U stays an exact BIGINT (midranks are
    * half-integers); one division per label at the end. Output:
    * (label, n_pos, n_neg, auc) ordered by label. */
  /** The eval family's shared linear-probe scorer: each (vec_id,
    * embedding, label) row maps to its 2^30 fixed-point score `f` =
    * round(first-component / L2-norm · 2^30) — one map-only pass over
    * the 1024-float arrays, the expensive step all three eval artifacts
    * ([[separabilityAuc]], [[liftTable]], [[calibrationTable]]) share.
    * Scores are exact BIGINTs, so every downstream statistic is
    * engine-deterministic; the scored frame is also the streaming
    * maintainer's per-batch partial (`Streams.streamingScoredVectors`):
    * scoring is row-local, hence trivially incremental. */
  def linearProbeScored(items: DataFrame): DataFrame = {
    val seqDot =
      "aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
    items.select(col("vec_id"), col("label"),
      expr(s"""CAST(floor(CASE WHEN $seqDot = 0.0D THEN 0.0
          ELSE CAST(element_at(embedding, 1) AS DOUBLE) / sqrt($seqDot) END
          * 1073741824.0 + 0.5) AS BIGINT)""").as("f"))
  }

  /** The additive-cell form of the scored frame: (f, label) → cnt.
    * AUC and calibration depend on the corpus ONLY through these counts
    * (they are tie-midrank / bin statistics), so the cells are the
    * smallest exactly-mergeable state for both. The streaming read paths
    * (`Streams.aucStreamedAt` / `Streams.calibrationStreamedAt`) build
    * the same cells from the maintained scored frame via
    * [[scoreCellsFromScored]]. */
  def scoreCellsFromScored(scored: DataFrame): DataFrame =
    scored.groupBy("f", "label").agg(count(lit(1)).as("cnt"))

  def scoreCells(items: DataFrame): DataFrame =
    scoreCellsFromScored(linearProbeScored(items))

  def separabilityAuc(items: DataFrame): DataFrame =
    separabilityAucFromCells(scoreCells(items))

  /** [[separabilityAuc]] from the (f, label, cnt) cell table — the
    * streaming read path (`Streams.aucStreamedAt`) shares every line
    * below with the batch operator, so parity is by construction. */
  def separabilityAucFromCells(grp: DataFrame): DataFrame = {
    val perF = grp.groupBy("f").agg(sum("cnt").as("f_tot"))
    // both distinct-score frames are unique on their order keys, so the
    // prefix sums are total-ordered and engine-deterministic
    val cumAll = graft.operators.Ranks.exclusivePrefixSum(
      perF, Seq.empty, Seq(col("f")), col("f_tot"), "below_all")
    val withBelow = graft.operators.Ranks.exclusivePrefixSum(
        grp, Seq("label"), Seq(col("f")), col("cnt"), "below_lab")
      .join(cumAll.hint("SHUFFLE_HASH"), "f")
    // 2U_c = Σ_buckets cnt·2·(non-c strictly below) + cnt·(non-c tied)
    val u2 = withBelow.groupBy("label")
      .agg(sum("cnt").as("n_pos"),
        sum(expr("cnt * 2 * (below_all - below_lab) + cnt * (f_tot - cnt)")).as("u2"))
    // total row count as a 1-row broadcast, not a driver-side count(): one
    // declarative plan, no second pass over the input
    val total = perF.agg(sum("f_tot").as("n_total"))
    u2.join(broadcast(total))
      .select(col("label"), col("n_pos"), (col("n_total") - col("n_pos")).as("n_neg"),
        expr("round(CAST(u2 AS DOUBLE) / 2.0 / n_pos / (n_total - n_pos), 6)").as("auc"))
      .orderBy("label")
  }

  /** Decile lift/gains table for the [[separabilityAuc]] linear-probe
    * score against one positive class — the model-eval companion: rank
    * all vectors by score, cut into `buckets` deciles, and report each
    * decile's positive rate, lift over the base rate, and cumulative
    * gain. AUC says "is there signal"; this says "how much do the top
    * deciles capture", which is what a selection budget acts on.
    *
    * Exactness: the score is the same 2^30 fixed-point bucket as the AUC,
    * decile assignment is the SQL-standard `ntile` floor distribution
    * over (score desc, vec_id asc) — computed by
    * [[graft.operators.Ranks.globalNtile]] (distributed rank + 1-row
    * count broadcast), bit-identical to the window form but never a
    * SinglePartition sort of the corpus — and every output is exact
    * integer counts with one division per column. The one remaining
    * global window (cumulative gain) runs over the per-DECILE frame:
    * `buckets` rows by construction, bounded by the parameter. */
  def liftTable(items: DataFrame, positiveLabel: Int = 0,
                buckets: Int = 10): DataFrame =
    liftTableFromScored(linearProbeScored(items), positiveLabel, buckets)

  /** [[liftTable]] from the already-scored (vec_id, label, f) frame — the
    * seam the streaming read path (`Streams.liftStreamedAt`) shares with
    * the batch operator, so parity is by construction. Lift cannot run
    * off [[scoreCellsFromScored]]'s cells alone: decile assignment
    * tie-breaks on vec_id, a per-ROW identity the cells erase. */
  def liftTableFromScored(scored: DataFrame, positiveLabel: Int = 0,
                          buckets: Int = 10): DataFrame = {
    require(buckets >= 2 && buckets <= 1000, s"bad buckets: $buckets")
    val dec = graft.operators.Ranks.globalNtile(
      scored, Seq(desc("f"), asc("vec_id")), buckets, "decile")
    val per = dec.groupBy("decile")
      .agg(count(lit(1)).as("n"),
        sum(when(col("label") === positiveLabel, 1L).otherwise(0L)).as("n_pos"))
    val tot = per.agg(sum("n").as("tot_n"), sum("n_pos").as("tot_pos"))
    per.join(broadcast(tot))
      .withColumn("cum_pos", sum("n_pos").over(
        Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("decile"), col("n"), col("n_pos"),
        expr("round(CAST(n_pos AS DOUBLE) / n, 6)").as("rate"),
        // an absent positive class has no base rate: NULL lift/gain, not
        // an ANSI divide error on a label-skewed input
        expr("""CASE WHEN tot_pos = 0 THEN CAST(NULL AS DOUBLE)
          ELSE round(CAST(n_pos AS DOUBLE) * tot_n / n / tot_pos, 6) END""")
          .as("lift"),
        expr("""CASE WHEN tot_pos = 0 THEN CAST(NULL AS DOUBLE)
          ELSE round(CAST(cum_pos AS DOUBLE) / tot_pos, 6) END""")
          .as("cum_gain"))
      .orderBy("decile")
  }

  /** k-center coreset by farthest-point sampling (Gonzalez greedy — the
    * data-pruning / diverse-subset selection a curation pipeline uses to
    * cover embedding space with k exemplars, 2-approx for the k-center
    * objective): seed with the minimum id, then repeatedly take the point
    * FURTHEST from the selected set.
    *
    * Deterministic and oracle-exact: components quantize at 2^10 fixed
    * point (the [[prototypeOutliers]] convention) and distances are the
    * integer Σ(qa−qb)², so the argmax and its (d2 desc, vec_id asc)
    * tie-break never touch a float; the DuckDB oracle is the same greedy
    * unrolled CTE by CTE.
    *
    * Shape at scale: the textbook k-pass trade — each round is ONE
    * distributed pass (min-distance against a ≤k-row broadcast of the
    * selected exemplars, partial-agg argmax) and one driver-side row; cost
    * k·scan, state k vectors. Output: (rank, vec_id, dist2) with the
    * seed's dist2 = 0. */
  def kCenterCoreset(items: DataFrame, k: Int = 4): DataFrame = {
    require(k >= 1 && k <= 64, s"k must be in [1, 64]: $k")
    val spark = items.sparkSession
    import spark.implicits._
    val q = items.select(col("vec_id"),
      expr("""transform(embedding,
          v -> CAST(floor(CAST(v AS DOUBLE) * 1024 + 0.5) AS BIGINT))""").as("qv"))
    // an empty (or smaller-than-k) collection is a legitimate input — a
    // filter that matched nothing must not crash the greedy seed collect
    val seedRows = q.orderBy(asc("vec_id")).limit(1)
      .as[(Long, Seq[Long])].collect()
    if (seedRows.isEmpty)
      return Seq.empty[(Int, Long, Double)].toDF("rank", "vec_id", "dist2")
    val seed = seedRows.head
    var selected = Vector((seed._1, seed._2, 0L))
    var exhausted = false
    for (_ <- 2 to k if !exhausted) {
      val selDf = broadcast(
        selected.map { case (id, v, _) => (id, v) }.toDF("sid", "sqv"))
      val chosenRows = q
        .filter(!col("vec_id").isin(selected.map(_._1): _*))
        .crossJoin(selDf)
        .withColumn("d2", expr(
          "aggregate(zip_with(qv, sqv, (x, y) -> (x - y) * (x - y)), 0L, (a, p) -> a + p)"))
        .groupBy("vec_id").agg(min("d2").as("mind2"))
        .orderBy(desc("mind2"), asc("vec_id")).limit(1)
        .as[(Long, Long)].collect()
      if (chosenRows.isEmpty) exhausted = true // fewer than k points: done
      else {
        val chosen = chosenRows.head
        val cv = q.filter(col("vec_id") === chosen._1)
          .as[(Long, Seq[Long])].collect().head._2
        selected :+= ((chosen._1, cv, chosen._2))
      }
    }
    selected.zipWithIndex
      .map { case ((id, _, d2), i) =>
        (i + 1, id, BigDecimal(d2.toDouble / 1048576.0)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .toDF("rank", "vec_id", "dist2")
  }

  /** Per-label prototype outliers — SemDeDup's cousin for label QA: the
    * vectors FURTHEST from their own class centroid are the mislabeled /
    * out-of-distribution candidates a re-annotation pass should route to
    * humans first.
    *
    * Exactness end to end: components quantize at 2^10 fixed point (the
    * [[centroidDrift]] convention — exact for float inputs), centroid sums
    * are integer vectors, and the squared distance to the centroid is the
    * INTEGER Σ_i (q_i·n − S_i)² (common denominator n·2^10 factored out),
    * so ranking never touches a float and the oracle needs no tolerance.
    * Per-dim magnitude ≤ (2^10·n)² ≈ 4e10 at n=10⁴; ×dims ≪ 2^63.
    *
    * Shape at scale: posexplode → (label, dim) partial-agg sums (the only
    * wide shuffle, |labels|·dims rows out), rejoin per (label, dim), one
    * partial-agg back to per-vector distance, then [[GroupedTopK]] per
    * label — per-partition heaps, k rows per label cross the wire. */
  def prototypeOutliers(items: DataFrame, k: Int = 3): DataFrame = {
    val q = items
      .select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("i", "v")))
      .select(col("vec_id"), col("label"), col("i"),
        expr("CAST(floor(CAST(v AS DOUBLE) * 1024 + 0.5) AS BIGINT)").as("q"))
    val cent = q.groupBy("label", "i").agg(sum("q").as("s"), count(lit(1)).as("n"))
    val d2 = q.join(cent.hint("SHUFFLE_HASH"), Seq("label", "i"))
      .groupBy("vec_id", "label", "n")
      .agg(sum(expr("(q * n - s) * (q * n - s)")).as("d2s"))
    graft.plans.GroupedTopK(d2, Seq(col("label")),
        Seq(desc("d2s"), asc("vec_id")), k)
      .select(col("label"), col("rank"), col("vec_id"), col("n").as("n_label"),
        expr("round(CAST(d2s AS DOUBLE) / n / n / 1048576.0, 6)").as("dist2"))
      .orderBy("label", "rank")
  }

  /** Hubness audit — the k-occurrence skew of the embedding space: how
    * often each vector appears in other vectors' exact top-`k` neighbour
    * lists. High-dimensional spaces concentrate neighbourhoods onto a few
    * "hub" points (Radovanović et al., JMLR 2010); hubs dominate retrieval
    * results and silently bias kNN labeling, dedup and RAG, so surfacing
    * the top hubs (and their share of all neighbour slots) is a standard
    * pre-flight check before trusting an ANN index built on the space.
    *
    * Query side = a FIXED-COUNT hash-ordered sample of the collection
    * (first `maxQueries` vec_ids by sha256('hubq:' id) — deterministic on
    * both engines, a TakeOrderedAndProject top-maxQueries, never a full
    * sort): the k-occurrence DISTRIBUTION is the object of interest and
    * is estimated from sampled neighbour lists, so the audit's operating
    * point must NOT grow with the corpus (a sampling modulus would — its
    * sample is corpus-proportional; a fixed count is the bounded form,
    * the PQ-codebook 4096-row convention). Cost is maxQueries × corpus
    * scored once through the same `GroupedTopK` path as every other
    * top-k here (per-partition heaps, shuffle capped at partitions ×
    * queries × k), never corpus². k_occ and slot_share are sample
    * statistics of the k-occurrence distribution. At 100 TB the same
    * fold runs over the ANN index's materialized neighbour lists instead
    * of brute-force scores — the aggregation (two keyed sums over
    * query×k rows) is unchanged. Self-matches are excluded (a vector
    * trivially tops its own list). Output: top `maxHubs` by
    * (k_occ desc, vec_id), each with its share of all sampled neighbour
    * slots. */
  def hubnessTopHubs(items: DataFrame, k: Int = 5, maxQueries: Int = 4096,
                     maxHubs: Int = 20): DataFrame = {
    require(k >= 1 && maxQueries >= 1 && maxHubs >= 1)
    val q = items
      .select(col("vec_id"), col("embedding"),
        sha2(concat(lit("hubq:"), col("vec_id").cast("string")), 256).as("__h"))
      .orderBy(col("__h"), col("vec_id")).limit(maxQueries)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("query_embedding"))
    val knn = topKPerQuery(
      cosineScores(items, q).filter(col("vec_id") =!= col("query_id")), k)
    val occ = knn.groupBy("vec_id").agg(count(lit(1)).as("k_occ"))
    val slots = knn.agg(count(lit(1)).as("n_slots"))
    occ.join(broadcast(slots))
      .select(col("vec_id"), col("k_occ"),
        expr("round(CAST(k_occ AS DOUBLE) / n_slots, 6)").as("slot_share"))
      .orderBy(desc("k_occ"), asc("vec_id")).limit(maxHubs)
  }

  /** Matryoshka truncation audit — how much of the exact top-`k` ranking
    * survives truncating embeddings to their first `dims` components. The
    * dimension-budget question every serving stack faces (truncatable /
    * Matryoshka embeddings ship exactly for this): if overlap@k stays
    * high at dims ≪ d, the index can store the prefix and re-rank with
    * full vectors. Both arms run the same brute-force
    * [[bruteForceTopK]] machinery (GroupedTopK per query); the truncated
    * arm slices query AND corpus vectors, scores with the identical
    * cosine, and the per-query overlap is one (query, vec) equi-join of
    * two k-row-per-query frames. Cost: two corpus scans against a
    * broadcast probe set. Output per probe query: (query_id, k,
    * n_overlap, overlap_frac) ordered by query_id. */
  def matryoshkaOverlap(items: DataFrame, dims: Int = 16, k: Int = 5,
                        nQueries: Int = 5): DataFrame = {
    require(dims >= 1 && k >= 1 && nQueries >= 1)
    val q = items.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("query_embedding"))
    val full = bruteForceTopK(items, q, k).select("query_id", "vec_id")
    val sliceItems = items.select(col("vec_id"),
      expr(s"slice(embedding, 1, $dims)").as("embedding"))
    val sliceQ = q.select(col("query_id"),
      expr(s"slice(query_embedding, 1, $dims)").as("query_embedding"))
    val trunc = bruteForceTopK(sliceItems, sliceQ, k)
      .select(col("query_id"), col("vec_id"))
    val overlap = full
      .join(trunc.hint("SHUFFLE_HASH"), Seq("query_id", "vec_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_overlap"))
    // probes with ZERO overlap still report: left-join FROM the probe
    // list with the (≤ nQueries-row) overlap frame broadcast — a
    // right-outer with a broadcast right side would force an SMJ
    q.select("query_id").join(broadcast(overlap), Seq("query_id"), "left")
      .na.fill(0L, Seq("n_overlap"))
      .select(col("query_id"), lit(k).as("k"), col("n_overlap"),
        expr(s"round(CAST(n_overlap AS DOUBLE) / $k, 6)").as("overlap_frac"))
      .orderBy("query_id")
  }

  /** Calibration (reliability) table for the [[separabilityAuc]]
    * linear-probe score against one positive class — the third leg of the
    * eval triad: AUC says "is there signal", [[liftTable]] says "what do
    * the top deciles capture", this says "does the score MEAN what it
    * claims" — per equal-width score bin, predicted probability
    * ((score+1)/2, the affine map of a [-1,1] score) vs the bin's
    * empirical positive rate, and the gap between them.
    *
    * Exactness: the score is the same 2^30 fixed-point integer as the
    * AUC/lift probes; bin assignment is pure integer arithmetic (clamped
    * floor over the [-2^30, 2^30] range), bin sums stay exact BIGINTs,
    * and each double output is one division (or one affine map) of exact
    * integers, rounded once.
    *
    * Shape at scale: rows collapse to the `bins`-row frame in one
    * partial-aggregated shuffle — no global sort, no window (equal-WIDTH
    * bins need no rank, unlike the lift table's deciles); the totals row
    * broadcasts back. Output: (bin, n, n_pos, pred, rate, gap). */
  def calibrationTable(items: DataFrame, positiveLabel: Int = 0,
                       bins: Int = 10): DataFrame =
    calibrationTableFromCells(scoreCells(items), positiveLabel, bins)

  /** [[calibrationTable]] from the (f, label, cnt) cell table — per-bin
    * n/f_sum/n_pos are all cell-additive (n = Σcnt, f_sum = Σf·cnt,
    * n_pos = Σcnt over the positive label), so calibration reads the same
    * mergeable state as the AUC; the streaming read path
    * (`Streams.calibrationStreamedAt`) shares every line below. */
  def calibrationTableFromCells(cells: DataFrame, positiveLabel: Int = 0,
                                bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bad bins: $bins")
    // f in [-2^30, 2^30]; integer equal-width bins, top edge clamped in
    val binned = cells.withColumn("bin", expr(
      s"CAST(least($bins - 1, greatest(0, " +
        s"((f + 1073741824L) * $bins) DIV 2147483649L)) AS INT)"))
    binned.groupBy("bin")
      .agg(sum("cnt").as("n"), sum(expr("f * cnt")).as("f_sum"),
        sum(when(col("label") === positiveLabel, col("cnt")).otherwise(0L)).as("n_pos"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("round((CAST(f_sum AS DOUBLE) / n / 1073741824.0 + 1.0) / 2.0, 6)")
          .as("pred"),
        expr("round(CAST(n_pos AS DOUBLE) / n, 6)").as("rate"),
        expr("round(CAST(n_pos AS DOUBLE) / n - " +
          "(CAST(f_sum AS DOUBLE) / n / 1073741824.0 + 1.0) / 2.0, 6)")
          .as("gap"))
      .orderBy("bin")
  }

  /** Embedding-dimension covariance/correlation audit — the redundancy
    * probe a pipeline runs before paying for all `d` dimensions: the
    * most-correlated off-diagonal dimension pairs of the corpus embedding
    * matrix. Highly correlated dims mean the space is over-provisioned
    * (a truncation / PCA candidate); the exact pair list is the evidence.
    *
    * Exactness (the [[prototypeOutliers]] fixed-point recipe): components
    * quantize at 2^10, per-pair second moments Σq_iq_j and per-dim sums
    * Σq_i stay exact BIGINTs, the covariance NUMERATOR n·Σq_iq_j −
    * Σq_i·Σq_j is exact, and corr = num/(√var_i·√var_j) is two
    * IEEE-exact sqrts and one division — bit-identical in any engine.
    * (BIGINT headroom: |q| ≲ 2^13 ⇒ n·Σq_iq_j < 2^63 up to n ≈ 2^35 rows;
    * beyond that the moments move to decimal(38,0), same plan.)
    *
    * Shape at scale: ONE pass — each row folds its d(d+1)/2 upper-triangle
    * products into [[CovMomentsAgg]]'s flat primitive buffer in place
    * (partial aggregation map-side, the shuffle carrying one
    * d(d+3)/2-long buffer per map task regardless of corpus size — never
    * a per-row struct generator, whose object churn was this operator's
    * round-10 bottleneck). The single merged buffer then unpacks into the
    * (i,j)-keyed moment frame of d² rows TOTAL; the d-row diagonal
    * broadcasts back for the variance join. No self-join of the exploded
    * corpus, no d² shuffle of raw rows. Output: top-`k` off-diagonal
    * pairs by (|corr| desc, i, j). */
  def embeddingCovariance(items: DataFrame, k: Int = 20): DataFrame = {
    val covAgg = udaf(CovMomentsAgg)
    val withQ = items.select(expr("transform(embedding, v -> " +
      "CAST(floor(CAST(v AS DOUBLE) * 1024 + 0.5) AS BIGINT))").as("q"))
    // ONE row holding every moment; memoized so the pair and dim frames
    // below unpack a single materialization of the corpus pass
    val res = PlanCache.memo(withQ.agg(covAgg(col("q")).as("m"))
      .select(col("m.n").as("nn"), col("m.sums").as("sums"),
        col("m.prods").as("prods")))
    // unpack the flat upper-triangle: pair (i,j) sits at row-major offset
    // i·d − i(i−1)/2 + (j−i); this generator runs over the ONE merged row
    // (d(d+1)/2 structs total), not per input row
    // empty-corpus guard: the ungrouped agg still yields its one zero row,
    // and sequence(0, -1) DESCENDS in Spark — an empty sums array must
    // short-circuit to an empty generator input, not a bogus [0,-1] walk
    val moments = res.select(col("nn").as("n"), explode(expr(
      """CASE WHEN size(sums) = 0 THEN
          CAST(array() AS ARRAY<STRUCT<i: INT, j: INT, s: BIGINT>>)
        ELSE flatten(transform(sequence(0, size(sums) - 1), i ->
          transform(sequence(i, size(sums) - 1), j ->
            struct(i AS i, j AS j, element_at(prods, CAST(
              i * size(sums) - i * (i - 1) DIV 2 + (j - i) + 1 AS INT)) AS s))))
        END"""))
      .as("e"))
      .select(col("n"), col("e.i").as("i"), col("e.j").as("j"), col("e.s").as("s"))
    // d-row frames: per-dim sums and exact variance numerators
    val dims = res.select(col("nn"), posexplode(col("sums")))
      .select(col("pos").as("d_i"), col("col").as("sum_q"), col("nn").as("n"))
    val diag = moments.filter(col("j") === col("i"))
      .select(col("i").as("v_i"), col("s").as("s_ii"))
      .join(broadcast(dims), col("v_i") === col("d_i"))
      .select(col("v_i"), (col("n") * col("s_ii") - col("sum_q") * col("sum_q"))
        .as("var_num"), col("sum_q").as("sq"), col("n"))
    moments.filter(col("j") > col("i"))
      .join(broadcast(diag.select(col("v_i"), col("var_num").as("var_i"),
        col("sq").as("sq_i"), col("n").as("nn"))), col("i") === col("v_i"))
      .join(broadcast(diag.select(col("v_i").as("v_j"),
        col("var_num").as("var_j"), col("sq").as("sq_j"))),
        col("j") === col("v_j"))
      .select(col("i"), col("j"),
        (col("nn") * col("s") - col("sq_i") * col("sq_j")).as("cov_num"),
        // zero-variance dims have no defined correlation: NULL, not a
        // divide (ANSI mode raises on /0 — the guard is semantics AND
        // safety), ranked last under the explicit NULLS LAST
        expr("""CASE WHEN var_i = 0 OR var_j = 0 THEN CAST(NULL AS DOUBLE)
          ELSE round(CAST(nn * s - sq_i * sq_j AS DOUBLE)
            / (sqrt(CAST(var_i AS DOUBLE)) * sqrt(CAST(var_j AS DOUBLE))), 6)
          END""").as("corr"))
      .orderBy(expr("abs(corr)").desc_nulls_last, col("i").asc, col("j").asc)
      .limit(k)
  }

  /** Dominant eigen-direction probe of the corpus covariance — the
    * "where does the variance actually point" companion to
    * [[embeddingCovariance]]: a few fixed-point power-iteration steps on
    * the exact covariance-numerator matrix, reporting the top-|loading|
    * dimensions of the leading principal direction. An anisotropic
    * embedding space (one direction hoarding the variance — the common
    * "rogue dimension" pathology) shows up as a handful of dims owning
    * the loading mass; a healthy space spreads it.
    *
    * Deterministic and oracle-exact: the moment fold is [[CovMomentsAgg]]
    * (exact BIGINT), the matrix is pre-scaled to 2^20 fixed point by its
    * own max |entry| and every iteration renormalizes the same way —
    * sign-safe floor division (negate → divide nonnegative → negate, so
    * Spark's truncating DIV and DuckDB's flooring `//` agree), with the
    * one overflow-prone multiply (|value| × 2^20 can pass 2^63) routed
    * through DECIMAL(38,0) / HUGEINT. A FIXED `iters` (no convergence
    * test) keeps both engines on the identical arithmetic path — the
    * q239 Markov convention. Zero-variance corpora short-circuit to zero
    * loadings (max = 0 guard), empty corpora to zero rows.
    *
    * Shape at scale: ONE corpus pass (the mergeable [[CovMomentsAgg]]
    * fold — the only stage whose cost depends on row count), then the
    * iteration runs DRIVER-SIDE on the collected moment buffer: the
    * state is d(d+3)/2 + 1 longs — bounded by the SCHEMA, not the corpus
    * (~17 KB at d=64, ~4 MB at d=1024; the PQ-codebook tiny-table
    * contract) — and a distributed y = C·x would spend ~2·iters barrier
    * stages shuffling d-row frames, pure scheduling overhead. BigInt
    * arithmetic driver-side removes even the documented decimal-fallback
    * caveat on the matrix build. Output: top `topDims` by
    * (|loading| desc, dim), with each dim's share of total |loading|. */
  def dominantEigenProbe(items: DataFrame, iters: Int = 3,
                         topDims: Int = 5): DataFrame = {
    require(iters >= 1 && iters <= 16, s"bad iters: $iters")
    require(topDims >= 1, s"bad topDims: $topDims")
    val spark = items.sparkSession
    import spark.implicits._
    val covAgg = udaf(CovMomentsAgg)
    val (n, sums, prods) = items.select(expr("transform(embedding, v -> " +
        "CAST(floor(CAST(v AS DOUBLE) * 1024 + 0.5) AS BIGINT))").as("q"))
      .agg(covAgg(col("q")).as("m"))
      .select(col("m.n"), col("m.sums"), col("m.prods"))
      .as[(Long, Seq[Long], Seq[Long])].head()
    val d = sums.length
    if (d == 0)
      return Seq.empty[(Int, Long, Option[Double])]
        .toDF("dim", "loading_fx", "share")
    // exact covariance numerators, upper triangle mirrored; the sign-safe
    // floor division mirrors the oracle's HUGEINT `//` (negate → divide
    // nonnegative → negate, so truncation == floor on both engines)
    val c = Array.tabulate(d, d) { (i, j) =>
      val (a, b) = if (i <= j) (i, j) else (j, i)
      BigInt(n) * prods(a * d - a * (a - 1) / 2 + (b - a)) -
        BigInt(sums(i)) * sums(j)
    }
    def scale(v: BigInt, m: BigInt): Long =
      if (m == 0) 0L
      else if (v < 0) -(((-v) * 1048576) / m).toLong
      else ((v * 1048576) / m).toLong
    val maxC = c.iterator.flatten.map(_.abs).foldLeft(BigInt(0))(_ max _)
    val cfx = c.map(_.map(scale(_, maxC)))
    var x = Array.fill(d)(1048576L)
    for (_ <- 1 to iters) {
      val y = Array.tabulate(d) { i =>
        (0 until d).foldLeft(BigInt(0))((acc, j) =>
          acc + BigInt(cfx(i)(j)) * x(j))
      }
      val mx = y.iterator.map(_.abs).foldLeft(BigInt(0))(_ max _)
      x = y.map(scale(_, mx))
    }
    val tot = x.iterator.map(math.abs).sum
    x.zipWithIndex
      .map { case (xv, i) =>
        // the same one double division + HALF_UP round(6) as the oracle
        (i, xv, if (tot == 0L) None
          else Some(BigDecimal(math.abs(xv).toDouble / tot)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
      .sortBy { case (i, xv, _) => (-math.abs(xv), i) }
      .take(topDims).toSeq
      .toDF("dim", "loading_fx", "share")
  }
}
