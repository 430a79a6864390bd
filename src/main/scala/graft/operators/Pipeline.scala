package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus preparation: the composition a training-data pipeline
  * actually runs, built entirely from this library's operators —
  *
  *   normalize -> quality filter -> exact dedup (keep canonical) -> split
  *
  * Every stage is an oracle-checked operator (q39, q18, q21, q41); the
  * composition itself is oracle-checked as q43. Quality and split are
  * PROJECTIONS of the row (composed column-wise — joining the corpus back
  * to a projection of itself, the obvious composition, costs a large-large
  * self-join per stage at 100 TB); dedup keeps the canonical min doc_id per
  * content hash with ONE window shuffle. Total: one wide operation, zero
  * joins, nothing quadratic. */
object Pipeline {

  /** Output: (doc_id, text, quality, split) for documents that survive the
    * quality floor and exact (normalized-text) dedup. */
  def prepareCorpus(docs: DataFrame, minQuality: Double = 0.3,
                    weights: Seq[(String, Double)] =
                      Seq("train" -> 0.98, "val" -> 0.01, "test" -> 0.01)): DataFrame = {
    val normed = TextAnalysis.normalizeText(docs)
      .select(col("doc_id"), col("norm_text").as("text"))
    val withQ = TextAnalysis.qualityScore(normed, passthrough = Seq("text"))
      .filter(col("quality") >= minQuality)
    val kept = withQ
      .withColumn("__cmin", min("doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy(sha2(col("text"), 256))))
      .filter(col("doc_id") === col("__cmin"))
    Sampling.withSplit(kept, weights)
      .select(col("doc_id"), col("text"), round(col("quality"), 6).as("quality"),
        col("split"))
  }

  /** Chunk-to-document embedding pooling — the RAG prep step that turns
    * per-chunk vectors into one doc-level vector (mean pooling), probed at
    * fixed dimensions the way q05 probes the raw embedding. The pooled
    * value at dim j is algebraically (sum of chunk digest bytes)/n scaled
    * to [-1, 1]: summing the INTEGER bytes first and dividing once makes
    * the mean order-invariant (a float mean of per-chunk doubles would
    * depend on reduce order). One generator projection + one doc-keyed
    * partial-aggregated shuffle; at full width this is `sum(array)` over
    * the vector column — same shape. Output:
    * (doc_id, n_chunks, p<dim>...). */
  def docEmbeddingProbe(docs: DataFrame, size: Int = 200, overlap: Int = 50,
                        probeDims: Seq[Int] = Seq(0, 13, 31)): DataFrame = {
    require(probeDims.nonEmpty && probeDims.forall(d => d >= 0 && d < 32))
    val chunked = docs.select(col("doc_id"),
        graft.GraftFunctions.chunk_text(col("text"), size, overlap).as(Seq("chunk_idx", "chunk")))
      .withColumn("hx", sha2(col("chunk"), 256))
    val byteAt = (j: Int) =>
      s"CAST(conv(substring(hx, ${2 * j + 1}, 2), 16, 10) AS BIGINT)"
    chunked.groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        probeDims.map(j => sum(expr(byteAt(j))).as(s"s$j")): _*)
      .select(col("doc_id") +: col("n_chunks") +: probeDims.map(j =>
        expr(s"round(CAST(s$j AS DOUBLE) / n_chunks / 255.0D * 2.0D - 1.0D, 6)")
          .as(s"p$j")): _*)
  }

  /** Split-leakage audit: how many near-duplicate pairs STRADDLE the
    * train/val/test boundary — the eval-contamination check a pipeline must
    * run after splitting, because hash-splitting is blind to content (two
    * near-identical docs hash independently, so ~2% of each dup pair's
    * probability mass lands across train/val|test). Pairs come from the
    * df-capped Jaccard machinery (never corpus²); labels attach by two
    * SHUFFLE_HASH joins on doc id (pair table is the small side after
    * verification — at most candidate-pairs rows, typically << corpus).
    * Output: the full (split_a <= split_b, n_pairs) matrix — off-diagonal
    * rows are the leaks; diagonal rows are the in-split dup load. */
  /** Per-source data card — the release-documentation table every dataset
    * ships with: document/token/char counts, mean document length,
    * language share, and the within-corpus exact-duplicate rate (the
    * number a consumer checks before trusting a source). Exact integers
    * plus single final divisions (engine-portable); the duplicate flag is
    * a sha256(text) frequency lookup — one vocab-sized aggregate joined
    * back by hash (SHUFFLE_HASH, never a self-join on text). Scale: two
    * passes over the corpus (hash counts, then the per-source rollup),
    * both map-side combined; output is one row per source.
    * Output: (source, n_docs, total_tokens, total_chars, mean_doc_tokens,
    * en_share, dup_rate). */
  def dataCard(docs: DataFrame): DataFrame = {
    val hashed = docs.select(col("source"), col("lang"),
      expr(s"size(${TextAnalysis.tokensExpr})").as("n_toks"),
      length(col("text")).as("n_chars"),
      sha2(col("text"), 256).as("h"))
    val dupHashes = hashed.groupBy("h").agg(count(lit(1)).as("n_same"))
    hashed.join(dupHashes.hint("SHUFFLE_HASH"), Seq("h"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_toks").as("total_tokens"),
        sum(expr("CAST(n_chars AS BIGINT)")).as("total_chars"),
        sum(expr("CASE WHEN lang = 'en' THEN 1L ELSE 0L END")).as("n_en"),
        sum(expr("CASE WHEN n_same > 1 THEN 1L ELSE 0L END")).as("n_dup"))
      .select(col("source"), col("n_docs"), col("total_tokens"), col("total_chars"),
        round(expr("CAST(total_tokens AS DOUBLE) / n_docs"), 6).as("mean_doc_tokens"),
        round(expr("CAST(n_en AS DOUBLE) / n_docs"), 6).as("en_share"),
        round(expr("CAST(n_dup AS DOUBLE) / n_docs"), 6).as("dup_rate"))
  }

  /** Cross-source contamination matrix — the data-governance complement of
    * [[dataCard]]'s within-source dup rate: for every source pair, how many
    * DISTINCT contents appear in both (which feeds copy from which). The
    * join runs on content hashes deduplicated per source first, so the
    * pair space is bounded by (contents shared at all) x (sources sharing
    * them)^2, never corpus^2 — a hash shared by s sources yields s(s-1)/2
    * rows, and the common case (hash in one source) yields none.
    * `keyExpr` picks the content key: the full-text hash for verbatim
    * copies (default), or a prefix/fingerprint hash for the syndicated-
    * boilerplate signal (shared openings with divergent tails).
    * Output: (src_a, src_b, n_shared) with src_a < src_b. */
  def sourceOverlap(docs: DataFrame,
                    keyExpr: String = "sha2(text, 256)"): DataFrame = {
    val h = docs.select(col("source"), expr(keyExpr).as("h")).distinct()
    h.as("a").join(h.as("b").hint("SHUFFLE_HASH"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** k-anonymity / l-diversity release audit — the privacy gate run
    * before publishing a dataset: group rows by their quasi-identifier
    * combination (the columns an adversary can link externally) and
    * report how much of the corpus sits in groups smaller than `k`
    * (re-identification risk) and how many groups are HOMOGENEOUS in the
    * sensitive attribute (attribute disclosure — k-anonymity alone
    * doesn't prevent it, hence the l-diversity arm; Sweeney 2002,
    * Machanavajjhala 2007).
    *
    * One partial-aggregated shuffle to the QI-group frame (the sensitive
    * distinct count rides the same grouping as a distinct-agg), one tiny
    * rollup to the summary row. Exact integers + two divisions. Output:
    * 1 row (k, n_rows, n_groups, n_small_groups, rows_at_risk,
    * risk_frac, n_homogeneous_groups, homogeneous_frac). */
  def kAnonymityAudit(rows: DataFrame, quasiExprs: Seq[String],
                      sensitiveExpr: String, k: Int = 5): DataFrame = {
    require(quasiExprs.nonEmpty && k >= 2, s"need quasi-identifiers and k >= 2")
    val groups = rows
      .select(quasiExprs.zipWithIndex.map { case (e, i) => expr(e).as(s"q$i") }
        :+ expr(sensitiveExpr).as("__s"): _*)
      .groupBy(quasiExprs.indices.map(i => col(s"q$i")): _*)
      .agg(count(lit(1)).as("cnt"), countDistinct(col("__s")).as("n_sens"))
    groups.agg(
        sum("cnt").as("n_rows"), count(lit(1)).as("n_groups"),
        sum(when(col("cnt") < k, 1L).otherwise(0L)).as("n_small_groups"),
        sum(when(col("cnt") < k, col("cnt")).otherwise(0L)).as("rows_at_risk"),
        sum(when(col("n_sens") === 1, 1L).otherwise(0L))
          .as("n_homogeneous_groups"))
      .select(lit(k).as("k"), col("n_rows"), col("n_groups"),
        col("n_small_groups"), col("rows_at_risk"),
        expr("round(CAST(rows_at_risk AS DOUBLE) / n_rows, 6)").as("risk_frac"),
        col("n_homogeneous_groups"),
        expr("round(CAST(n_homogeneous_groups AS DOUBLE) / n_groups, 6)")
          .as("homogeneous_frac"))
  }

  def splitLeakage(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    val splits = PlanCache.memo(
      Sampling.splitByHash(docs).select(col("doc_id"), col("split")))
    val pairs = Dedup.jaccardPairs(docs, threshold).select("doc_a", "doc_b")
    pairs
      .join(splits.select(col("doc_id").as("doc_a"), col("split").as("sa"))
        .hint("SHUFFLE_HASH"), Seq("doc_a"))
      .join(splits.select(col("doc_id").as("doc_b"), col("split").as("sb"))
        .hint("SHUFFLE_HASH"), Seq("doc_b"))
      .select(least(col("sa"), col("sb")).as("split_a"),
        greatest(col("sa"), col("sb")).as("split_b"))
      .groupBy("split_a", "split_b").agg(count(lit(1)).as("n_pairs"))
  }
}
