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

  /** Deterministic split column from cumulative weights. `weights` must sum
    * to 1 and iterate in declaration order (train/val/test by default). */
  def splitByHash(docs: DataFrame,
                  weights: Seq[(String, Double)] =
                    Seq("train" -> 0.98, "val" -> 0.01, "test" -> 0.01),
                  keyExpr: String = "cast(doc_id AS string)"): DataFrame =
    withSplit(docs.selectExpr("doc_id"), weights, keyExpr)
      .select("doc_id", "bucket", "split")

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
}
