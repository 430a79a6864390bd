package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{Engine, GraftFunctions, SparkEntry, Tables}

/** End-to-end smoke drive of the engine through its public API — the runtime
  * surface for verification. Mirrors the reference's own smoke script
  * (/root/reference/test_api.sh): ingest the corpus, run the two fixture
  * queries, print stats, and exercise the error paths.
  *
  * Usage: sbt "runMain graft.tools.Smoke [sfDir]"
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-smoke")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    SparkEntry.tune(spark)

    // POST /ingest equivalent (main.py:255-312)
    val index = Engine.ingest(Tables.documents(spark, sfDir)).cache()
    val total = index.count()
    println(s"== ingest: $total chunks from $sfDir")

    // GET /stats equivalent (main.py:340-360)
    println("== stats (per source, first 5):")
    Engine.statsBySource(index).orderBy("source").show(5, truncate = false)
    Engine.statsTotal(index).show()

    // POST /search equivalents (test_api.sh:36-57 fixtures)
    for ((q, k) <- Seq(
      ("What are the articulation agreements for University of Florida?", 3),
      ("transfer credits", 2))) {
      println(s"== search: '$q' top_k=$k")
      Engine.search(index, q, k).show(20, 60)
      val resp = Engine.searchResponse(index, q, k).collect()(0)
      println(s"   total_results=${resp.getAs[Long]("total_results")} " +
        s"context_len=${resp.getAs[String]("context").length}")
    }

    // self-retrieval: querying with an indexed chunk's own text must return
    // that chunk at rank 1 with score 1.0
    val probe = index.orderBy("id").select("id", "text").collect()(0)
    val hit = Engine.search(index, probe.getString(1), 1).collect()(0)
    println(s"== self-retrieval: query=chunk ${probe.getString(0)} -> " +
      s"top hit ${hit.getAs[String]("id")} score=${hit.getAs[Double]("score")}")

    // physical plan of the flagship query
    println("== flagship plan:")
    Engine.search(index, "transfer credits", 5).explain("formatted")

    // error path: empty query must be rejected (main.py:317-318)
    try { Engine.search(index, "   ", 5); println("!! empty query accepted") }
    catch { case e: IllegalArgumentException => println(s"== empty query rejected: ${e.getMessage}") }

    spark.stop()
  }
}
