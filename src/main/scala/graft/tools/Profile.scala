package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft._
import graft.operators._

/** Dev harness: per-stage timings for the heavy operators, to localize
  * regressions the end-to-end bench can't. Usage:
  *   sbt "runMain graft.tools.Profile [sfDir]"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.tune(spark)
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime
      val r = f
      println(f"TIME $label%-28s ${(System.nanoTime - t0) / 1e9}%7.2fs  ($r)")
    }
    val docs = Tables.documents(spark, sfDir)
    time("warm docs.count")(docs.count())
    time("tokens")(docs.withColumn("toks", expr(TextAnalysis.tokensExpr))
      .selectExpr("sum(size(toks))").collect()(0).get(0))
    time("shingleArrays")(Dedup.shingleArrays(docs).selectExpr("sum(size(sh))")
      .collect()(0).get(0))
    val sh = Dedup.shingles(docs)
    time("shingles explode")(sh.count())
    time("shingles sha2 x2")(sh.select(sha2(col("shingle"), 256).as("h1"),
      sha2(concat(lit("x:"), col("shingle")), 256).as("h2"))
      .selectExpr("count(distinct h1)").collect()(0).get(0))
    time("minhashSig")(Dedup.minhashSig(docs).count())
    time("minhashBands")(Dedup.minhashBands(docs).count())
    time("minhashBuckets")(Dedup.minhashBuckets(docs).count())
    time("shingle buckets agg")(sh.groupBy("shingle")
      .agg(sort_array(collect_list(col("doc_id"))).as("ds")).count())
    time("jaccardPairs")(Dedup.jaccardPairs(docs, 0.5).count())
    time("minhashPairs")(Dedup.minhashPairs(docs, 0.5).count())
    time("events window")(SparkEntry.queries("q15_events_window")(spark, sfDir).count())
    time("ann lsh")(SparkEntry.queries("q29_ann_lsh")(spark, sfDir).count())
    time("bm25")(TextAnalysis.bm25(docs,
      Seq("transfer", "credit", "university")).count())
    time("repetition")(TextAnalysis.repetitionStats(docs).count())
    time("asOfJoin")(SparkEntry.queries("q47_asof_join")(spark, sfDir).count())
    time("intervalSelfJoin")(SparkEntry.queries("q50_interval_pairs")(spark, sfDir).count())
    time("hybrid rrf")(SparkEntry.queries("q51_hybrid_rrf")(spark, sfDir).count())
    time("token budget")(SparkEntry.queries("q54_token_budget")(spark, sfDir).count())
    time("decontaminate")(SparkEntry.queries("q55_decontaminate")(spark, sfDir).count())
    graft.operators.PlanCache.releaseAll(spark)
    spark.stop()
  }
}
