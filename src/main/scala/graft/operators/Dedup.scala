package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline, from exact to
  * approximate:
  *
  *  - exact:   hash-groupBy on a content key (one shuffle on the hash)
  *  - n-gram:  exact Jaccard over word-shingle sets via a shingle-inverted
  *             index self-join (shuffle on shingle — the classic
  *             "suffix-array-free" near-dup join)
  *  - MinHash: 16-hash signature, banded 4x4, LSH bucket join for candidates,
  *             exact Jaccard verification (at 100 TB this is the only shape
  *             that avoids the quadratic pair space: candidates ~ linear)
  *  - SimHash: 32-bit sign-of-sum signature per document (map-only; pairs
  *             within Hamming distance follow from a band join on the
  *             signature, same pattern as MinHash)
  *
  * All hash functions are SHA-256-derived so every stage is reproducible in
  * the DuckDB oracle (string min over fixed-width hex = numeric min).
  */
object Dedup {

  /** Exact duplicate groups keyed by SHA-256 of a normalization of the text
    * (here: the raw text; callers can pre-normalize). */
  def exactGroups(docs: DataFrame, keyExpr: String = "text"): DataFrame =
    docs.groupBy(expr(s"sha2($keyExpr, 256)").as("content_hash"))
      .agg(min("doc_id").as("canonical_doc"), count(lit(1)).as("n_docs"))

  /** Distinct word-3-gram shingles per document; documents with < 3 tokens
    * fall back to a single whole-text shingle. */
  def shingles(docs: DataFrame): DataFrame =
    docs.withColumn("toks", expr(TextAnalysis.tokensExpr))
      .withColumn("sh", expr(
        """CASE WHEN size(toks) >= 3
             THEN array_distinct(transform(sequence(0, size(toks) - 3),
                    i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])))
             ELSE array(text) END"""))
      .select(col("doc_id"), explode(col("sh")).as("shingle"))

  /** Exact n-gram Jaccard near-duplicate pairs via inverted-index self-join.
    * Output: (doc_a, doc_b, common, jaccard) for jaccard >= threshold.
    * Scale shape: one shuffle on shingle (pairs generated per-bucket), one
    * shuffle on the pair key; per-doc shingle counts broadcast. */
  def jaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val sh = shingles(docs)
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val pairs = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(broadcast(counts.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_sh", "na")), Seq("doc_a"))
      .join(broadcast(counts.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n_sh", "nb")), Seq("doc_b"))
      .withColumn("jaccard", col("common") / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("common"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  /** MinHash signatures: sig(k) = min over shingles of sha256(k || ':' || s),
    * k = 0..15, banded into 4 band keys of 4 signatures each. String-min over
    * fixed-width hex is order-isomorphic to numeric min — and portable to any
    * SQL engine. */
  def minhashBands(docs: DataFrame): DataFrame =
    docs.withColumn("toks", expr(TextAnalysis.tokensExpr))
      .withColumn("sh", expr(
        """CASE WHEN size(toks) >= 3
             THEN array_distinct(transform(sequence(0, size(toks) - 3),
                    i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])))
             ELSE array(text) END"""))
      .withColumn("sig", expr(
        """transform(sequence(0, 15),
             k -> array_min(transform(sh, s -> sha2(concat(cast(k AS string), ':', s), 256))))"""))
      .withColumn("bands", expr(
        """transform(sequence(0, 3),
             b -> sha2(concat(sig[4*b], sig[4*b+1], sig[4*b+2], sig[4*b+3]), 256))"""))
      .select(col("doc_id"), col("bands"))

  /** One row per (doc, band): the LSH bucket table. */
  def minhashBuckets(docs: DataFrame): DataFrame =
    minhashBands(docs).select(col("doc_id"),
      posexplode(col("bands")).as(Seq("band_idx", "band_key")))

  /** MinHash-LSH near-duplicate pairs: candidates = documents sharing any
    * band bucket; verification = exact Jaccard >= threshold. At scale the
    * bucket join replaces the quadratic pair space with per-bucket pairs. */
  def minhashPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val b = minhashBuckets(docs)
    val candidates = b.as("x").join(b.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    jaccardPairs(docs, threshold).join(candidates, Seq("doc_a", "doc_b"))
      .select("doc_a", "doc_b", "common", "jaccard")
  }

  /** 32-bit SimHash over whitespace tokens (token hash bits from SHA-256 hex;
    * bit b of the signature = sign of the sum of (2*bit_b(token) - 1)).
    * Map-only: one pass, no shuffle. */
  def simhash(docs: DataFrame): DataFrame =
    docs.withColumn("toks", expr(TextAnalysis.tokensExpr))
      .withColumn("hashes", expr("transform(toks, t -> sha2(t, 256))"))
      .selectExpr(
        "doc_id",
        """aggregate(
             transform(sequence(0, 31), b ->
               IF(aggregate(hashes, 0, (acc, h) ->
                    acc + IF((shiftright(cast(conv(substr(h, (b div 8) * 2 + 1, 2), 16, 10) AS int),
                                         b % 8) % 2) = 1, 1, -1)) > 0,
                  shiftleft(cast(1 AS bigint), b), cast(0 AS bigint))),
             cast(0 AS bigint), (acc, x) -> acc + x) AS simhash""")
}
