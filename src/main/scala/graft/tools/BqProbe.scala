package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Scratch probe: recall@k of the binary-quantization ANN path vs the exact
  * baseline, across shortlist sizes, at a given sf dir. */
object BqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val items = emb.select("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_embedding"))
    val k = 3
    val exact = Similarity.bruteForceTopK(items, queries, k)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (shortlist <- Seq(16, 32, 64, 128, 256, 512)) {
      val approx = Similarity.bqTopK(items, queries, k, shortlist)
        .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (exact & approx).size.toDouble / exact.size
      println(s"RESULT shortlist=$shortlist recall@$k=$recall")
    }
    spark.stop()
  }
}
