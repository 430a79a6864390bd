package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus preparation: the composition a training-data pipeline
  * actually runs, built entirely from this library's operators —
  *
  *   normalize -> quality filter -> exact dedup (keep canonical) -> split
  *
  * Every stage is an oracle-checked operator (q39, q18, q21, q41); the
  * composition itself is oracle-checked as q43. All stages are map-only or
  * doc_id-keyed joins (broadcast/AQE-eligible); the only wide operations
  * are the dedup groupBy and the final joins — no stage is quadratic.
  */
object Pipeline {

  /** Output: (doc_id, text, quality, split) for documents that survive the
    * quality floor and exact (normalized-text) dedup. */
  def prepareCorpus(docs: DataFrame, minQuality: Double = 0.3,
                    weights: Seq[(String, Double)] =
                      Seq("train" -> 0.98, "val" -> 0.01, "test" -> 0.01)): DataFrame = {
    val normed = TextAnalysis.normalizeText(docs)
      .select(col("doc_id"), col("norm_text").as("text"))
    val withQ = normed
      .join(TextAnalysis.qualityScore(normed).select("doc_id", "quality"), Seq("doc_id"))
      .filter(col("quality") >= minQuality)
    val canonical = Dedup.exactGroups(withQ, "text")
      .select(col("canonical_doc").as("doc_id"))
    val kept = withQ.join(canonical, Seq("doc_id"))
    kept
      .join(Sampling.splitByHash(kept, weights).select("doc_id", "split"), Seq("doc_id"))
      .select(col("doc_id"), col("text"), round(col("quality"), 6).as("quality"),
        col("split"))
  }
}
