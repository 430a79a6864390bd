package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// throwaway component-timing probe for the q211 rewrite (delete before commit)
object TmpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.tune(spark)
    val ev = graft.Tables.events(spark, sfDir)
    println("events rows = " + ev.count())
    val items = ev.select(col("event_type").as("g"), col("event_id"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"))

    def time(label: String)(f: => Any): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        f
        println(f"$label rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    val exploded = items.select(col("g"), col("cents"), col("event_id"),
      explode(expr("sequence(1, 40)")).as("r"))
    time("explode-only count")(exploded.queryExecution.toRdd.count())

    val sha = exploded.withColumn("u",
      expr("""cast(conv(substr(sha2(concat('pb:', g, ':',
          CAST(r AS STRING), ':', CAST(event_id AS STRING)), 256),
          1, 8), 16, 10) AS BIGINT)"""))
    time("explode+sha agg")(sha.selectExpr("sum(u)").collect())

    val w = sha.withColumn("w", expr(
      """CAST(CASE WHEN u < 1580030168 THEN 0
              WHEN u < 3160060337 THEN 1
              WHEN u < 3950075421 THEN 2
              WHEN u < 4213413783 THEN 3
              WHEN u < 4279248373 THEN 4
              WHEN u < 4292415291 THEN 5
              WHEN u < 4294609777 THEN 6
              WHEN u < 4294923276 THEN 7
              ELSE 8 END AS BIGINT)"""))
    time("explode+sha+case agg")(w.selectExpr("sum(w)").collect())

    val grouped = w.groupBy("g", "r")
      .agg(sum(expr("w * cents")).as("s"), sum("w").as("wsum"))
    time("full group")(grouped.collect())
    spark.stop()
  }
}
