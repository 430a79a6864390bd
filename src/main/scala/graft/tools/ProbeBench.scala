package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: time individual SparkEntry queries under the exact Bench
  * session shape (local[32], 32 shuffle partitions, same warmup, toRdd
  * forcing), printing every rep — for A/B-ing one query without the noise
  * and ordering effects of a full bench run. Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.ProbeBench q22_jaccard_pairs q12_tpch_agg"
  */
object ProbeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.tune(spark)
    spark.range(100000).selectExpr("sum(id)").collect()
    graft.SparkEntry.queries("q01_chunk")(spark, sfDir).count()
    graft.SparkEntry.queries("q12_tpch_agg")(spark, sfDir).count()
    val explain = sys.env.contains("SPARK_GRAFT_EXPLAIN")
    for (name <- args) {
      val fn = graft.SparkEntry.queries(name)
      if (explain)
        println(s"== $name ==\n" + fn(spark, sfDir).queryExecution.executedPlan)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name%-24s min=${times.min}%6.2fs  reps=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    graft.operators.PlanCache.releaseAll(spark)
    spark.stop()
  }
}
