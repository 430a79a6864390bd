package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.operators.{Similarity, TableStats}

/** Quantitative gate metrics for the four `no_oracle` queries — the numbers
  * behind "exempt by contract". q29/q30 (MLlib LSH / KMeans-IVF top-k) and
  * q34 (MLlib LSH pair join) are approximate-by-nature and rows-only at the
  * driver's oracle; q127 (approx_percentile) is Spark-defined but not
  * cross-engine-defined. Each has a ScalaTest gate; this recomputes the
  * same metrics at Verify time and dumps them next to the correctness
  * artifact (`gates.json`) so every round's archive carries the evidence,
  * not just the test logs.
  *
  * Metrics mirror the spec gates exactly:
  *  - q29/q30: mean recall@3 vs [[Similarity.bruteForceTopK]] over the
  *    same 5 fixture queries (SimilaritySpec's recall gate, threshold 0.9)
  *  - q34: symmetric pair-set Jaccard of [[Similarity.lshNearDupPairs]]
  *    vs [[Similarity.cosinePairs]] at 0.3 (bounds false positives AND
  *    false negatives; SimilaritySpec's pair gate, threshold 0.9)
  *  - q127: max |empirical-rank(approx) - p| over (group, p) vs the exact
  *    sorted values — the rank-tolerance form of TableStatsSpec's band
  *    gate (threshold 0.05 rank units at GK accuracy 10000)
  */
object Gates {

  final case class Gate(query: String, metric: String, value: Double,
                        threshold: Double, atLeast: Boolean) {
    def pass: Boolean = if (atLeast) value >= threshold else value <= threshold
    def json: String =
      s""""$query":{"metric":"$metric","value":${f"$value%.4f"},""" +
        s""""threshold":$threshold,"op":"${if (atLeast) ">=" else "<="}","pass":$pass}"""
  }

  def compute(spark: SparkSession, sfDir: String): Seq[Gate] = {
    import spark.implicits._
    val e = Tables.embeddings(spark, sfDir).select("vec_id", "embedding").cache()
    val q = Tables.embeddings(spark, sfDir)
      .filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("query_embedding"))
      .cache()
    def ids(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.as[(Long, Long, Int, Double)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = ids(Similarity.bruteForceTopK(e, q, 3))
    def recall(approx: Map[Long, Set[Long]]): Double = {
      val per = exact.map { case (qid, ex) =>
        approx.getOrElse(qid, Set.empty).intersect(ex).size.toDouble / ex.size }
      per.sum / per.size
    }
    val lshRecall = recall(ids(Similarity.lshTopK(e, q, 3)))
    val ivfRecall = recall(ids(Similarity.ivfTopK(e, q, 3)))

    val exactPairs = Similarity.cosinePairs(e, 0.3)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val lshPairs = Similarity.lshNearDupPairs(e, 0.3)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val pairJaccard =
      if (exactPairs.isEmpty && lshPairs.isEmpty) 1.0
      else lshPairs.intersect(exactPairs).size.toDouble /
        lshPairs.union(exactPairs).size
    e.unpersist(); q.unpersist()

    // q127: worst empirical-rank deviation of the GK sketch vs exact order
    val li = Tables.lineitem(spark, sfDir)
    val vexpr = "CAST(round(l_extendedprice * 100) AS BIGINT)"
    val ps = Seq(0.25, 0.5, 0.75, 0.9)
    val approx = TableStats.percentilesByApprox(li, "l_returnflag", vexpr, ps)
      .as[(String, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> Seq(r._2, r._3, r._4, r._5)).toMap
    val byFlag = li.selectExpr("l_returnflag", s"$vexpr AS c")
      .as[(String, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    val rankDevs = for {
      (flag, xs) <- byFlag.toSeq
      (p, i) <- ps.zipWithIndex
    } yield {
      val a = approx(flag)(i)
      // empirical rank of the sketch value in the exact sorted sample
      val below = xs.count(_.toDouble <= a)
      math.abs(below.toDouble / xs.length - p)
    }
    val maxRankDev = if (rankDevs.isEmpty) 0.0 else rankDevs.max

    Seq(
      Gate("q29_ann_lsh", "recall_at_3", lshRecall, 0.9, atLeast = true),
      Gate("q30_ann_ivf", "recall_at_3", ivfRecall, 0.9, atLeast = true),
      Gate("q34_knn_pairs_lsh", "pair_set_jaccard", pairJaccard, 0.9, atLeast = true),
      Gate("q127_percentiles_approx", "max_rank_deviation", maxRankDev, 0.05,
        atLeast = false))
  }

  def json(gates: Seq[Gate]): String =
    gates.map(_.json).mkString("{", ",", "}")
}
