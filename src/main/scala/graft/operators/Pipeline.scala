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
}
