package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: audit every SparkEntry query's executed plan for the
  * operators that do not survive scale (SortMergeJoin where a broadcast or
  * banded shape was intended, CartesianProduct anywhere, WindowExec in an
  * ANN ranking path). Prints one line per query; non-empty findings exit 1.
  * Usage: sbt "runMain graft.tools.PlanAudit [sfDir]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.tune(spark)
    var bad = 0
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val qe = fn(spark, sfDir).queryExecution
        // execute first: with AQE the pre-execution string is the INITIAL
        // plan (static size estimates); the audit judges the FINAL plan
        qe.toRdd.count()
        val p = qe.executedPlan.toString
        val findings = Seq(
          "SortMergeJoin" -> p.contains("SortMergeJoin"),
          "CartesianProduct" -> p.contains("CartesianProduct")
        ).collect { case (k, true) => k }
        if (findings.nonEmpty) { bad += 1; println(s"AUDIT $name: ${findings.mkString(", ")}") }
        else println(s"AUDIT $name: clean")
      } catch {
        case e: Exception => bad += 1; println(s"AUDIT $name: ERROR ${e.getMessage}")
      }
    }
    graft.operators.PlanCache.releaseAll(spark)
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
