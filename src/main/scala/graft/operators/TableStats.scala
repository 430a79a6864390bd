package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table-profiling operator — the `ANALYZE TABLE`-style audit pass every
  * warehouse ships: per-column null counts, exact distinct counts, and
  * min/max, computed in ONE aggregation job over the table and emitted in
  * long format (one row per column).
  *
  * Shape: a single `agg` carrying all columns' statistics — Spark plans the
  * exact-distinct aggregates via one Expand (input multiplied by the number
  * of profiled columns, map-side partial-aggregated); there is no
  * per-column pass over the table. Profile a bounded column LIST, not "all
  * 2000 columns" — the Expand factor is the profiled-column count, a
  * deliberate, visible cost knob. min/max surface as strings so one long
  * schema covers heterogeneous column types (the usual profiling-output
  * convention). */
object TableStats {

  def profileTable(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"__n_$c"),
      countDistinct(col(c)).as(s"__d_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c"))) :+ count(lit(1)).as("__total")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', __total - __n_$c, __d_$c, __min_$c, __max_$c").mkString(", ")
    row.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (column, n_nulls, n_distinct, min_value, max_value)")
  }
}
