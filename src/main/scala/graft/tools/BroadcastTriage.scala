package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec

/** Dev-only triage companion to [[PlanAudit]]: for every query the
  * broadcast pricer flags, print the flagged exchange's subtree (node
  * names down to the scans) plus its runtime row count, so each finding
  * can be classified from the actual plan — parameter/domain-bounded
  * (→ a named boundedBroadcastPaths entry) vs corpus-proportional
  * (→ re-plan the join). Not part of any gate.
  * Usage: sbt "runMain graft.tools.BroadcastTriage [sfDir] [qPrefix...]"
  */
object BroadcastTriage {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).toSet
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.tune(spark)
    def brief(p: SparkPlan, depth: Int): String = {
      val kids = p.children ++ (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
        case _ => Seq.empty
      })
      val label = p.nodeName + (p match {
        case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec =>
          s"[grp=${h.groupingExpressions.map(_.sql).mkString(",").take(80)}]"
        case o: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec =>
          s"[grp=${o.groupingExpressions.map(_.sql).mkString(",").take(80)}]"
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          s"[${f.relation.location.rootPaths.map(_.getName).mkString(",")}]"
        case f: org.apache.spark.sql.execution.FilterExec =>
          s"[${f.condition.sql.take(100)}]"
        case _ => ""
      })
      ("  " * depth) + label + "\n" + kids.map(brief(_, depth + 1)).mkString
    }
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)
         if only.isEmpty || only.exists(name.startsWith)) {
      try {
        val qe = fn(spark, sfDir).queryExecution
        qe.toRdd.count()
        val exs = PlanAudit.flatten(qe.executedPlan)
          .collect { case b: BroadcastExchangeExec => b }
          .groupBy(_.id).values.map(_.head).toSeq.sortBy(_.id)
        for (b <- exs) {
          val hot = PlanAudit.unboundedHotScans(b.child).distinct.sorted
          if (hot.nonEmpty) {
            val rows = b.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
            println(s"TRIAGE $name rows=$rows over=${hot.mkString(",")}")
            println(brief(b.child, 1))
          }
        }
      } catch { case e: Exception => println(s"TRIAGE $name ERROR ${e.getMessage}") }
    }
    graft.operators.PlanCache.releaseAll(spark)
    spark.stop()
  }
}
