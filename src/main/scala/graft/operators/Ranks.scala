package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed rank / prefix-sum / ntile primitives — the replacement for
  * `Window.orderBy(...)` with no partition spec, which Spark plans as a
  * SinglePartition WindowExec: the ENTIRE frame shuffles to one task and
  * sorts there, a straight scale-killer once the frame is
  * corpus-proportional (hundreds of millions of users / rows at 100 TB).
  *
  * The pattern (shared with `TableStats.equiDepthHistogram` and
  * `Sampling.selectByTokenBudget`, now factored here):
  *
  *  1. `repartitionByRange` on (partition keys ++ order keys) — a real
  *     shuffle, but range-balanced across `nPartitions` tasks;
  *  2. a per-(range-partition, group) local window computes the local
  *     running value in parallel;
  *  3. per-(group, range-partition) totals collapse to ≤ nPartitions rows
  *     per group; their exclusive running offsets need a window over only
  *     that tiny frame (ordered by the range-partition id — the ONE
  *     global window this module permits, bounded by `nPartitions`
  *     regardless of data size, and the shape `PlanAudit` allowlists);
  *  4. a broadcast join adds each row's partition offset back:
  *     global value = local running value + partition offset.
  *
  * Every step is parallel in the data; the only serial state is the
  * nPartitions-row offsets frame. Determinism: range boundaries are
  * sampled, so WHERE a row lands can differ between evaluations — but the
  * final rank/prefix depends only on the total order, not the boundaries,
  * and the one materialization both consumers read is memoized
  * (`PlanCache.memo`) so offsets and local sums never see two different
  * exchanges (the equiDepthHistogram lesson).
  *
  * All entry points REQUIRE `order` to be a total order within each group
  * (callers tie-break by a unique id, the repo-wide convention) — a
  * non-total order would make ranks evaluation-dependent.
  */
object Ranks {

  /** `out` = the EXCLUSIVE prefix sum of `value` (cast to long) over
    * `order`, within each group of `partitionCols` (global when empty).
    * The offsets broadcast carries ≤ nPartitions + |groups| rows (groups
    * wholly inside one range partition contribute one row each), so
    * `partitionCols` should be low-cardinality keys — for high-cardinality
    * grouped ranks a plain partitioned window is already parallel and
    * should be used directly. */
  def exclusivePrefixSum(df: DataFrame, partitionCols: Seq[String],
                         order: Seq[Column], value: Column, out: String,
                         nPartitions: Int = 32): DataFrame = {
    require(nPartitions >= 1, s"bad nPartitions: $nPartitions")
    val keyCols = partitionCols.map(col) ++ order
    val ranged = df
      .repartitionByRange(nPartitions, keyCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", value.cast("long"))
    val wLocal = Window
      .partitionBy(("__pid" +: partitionCols).map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    // ONE materialization of the range exchange for both consumers (the
    // local sums and the per-partition totals): two lazy evaluations can
    // sample different range boundaries and misalign offsets
    val local = PlanCache.memo(ranged.withColumn("__local",
      coalesce(sum(col("__v")).over(wLocal), lit(0L))))
    val perPart = local
      .groupBy(("__pid" +: partitionCols).map(col): _*)
      .agg(sum("__v").as("__t"))
    // ≤ nPartitions rows per group: the bounded window of step 3
    val wOff = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perPart
      .withColumn("__off", coalesce(sum("__t").over(wOff), lit(0L)))
      .select(("__pid" +: partitionCols).map(col) :+ col("__off"): _*)
    local.join(broadcast(offsets), "__pid" +: partitionCols)
      .withColumn(out, col("__local") + col("__off"))
      .drop("__pid", "__v", "__local", "__off")
  }

  /** `out` = the 1-based dense row rank over `order` within each group of
    * `partitionCols` — `row_number()` without the SinglePartition window.
    * `order` must be a total order within each group. */
  def distributedRank(df: DataFrame, partitionCols: Seq[String],
                      order: Seq[Column], out: String,
                      nPartitions: Int = 32): DataFrame =
    exclusivePrefixSum(df, partitionCols, order, lit(1L), "__pre", nPartitions)
      .withColumn(out, col("__pre") + lit(1L))
      .drop("__pre")

  /** `out` = `ntile(buckets)` over the GLOBAL `order` — the SQL-standard
    * floor distribution (the first `n % buckets` buckets hold
    * `n DIV buckets + 1` rows, the rest `n DIV buckets`), computed from
    * the distributed rank and a 1-row count broadcast instead of a
    * SinglePartition WindowExec. Bit-identical to `ntile` under a
    * tie-broken `order`. */
  def globalNtile(df: DataFrame, order: Seq[Column], buckets: Int,
                  out: String, nPartitions: Int = 32): DataFrame = {
    require(buckets >= 1, s"bad buckets: $buckets")
    val ranked = distributedRank(df, Seq.empty, order, "__rk", nPartitions)
    val tot = df.agg(count(lit(1)).as("__n"))
    // CASE keeps the q = 0 (n < buckets) divide unevaluated: every rank
    // falls in the first branch there, each of the first n buckets
    // holding exactly one row — ntile's own degenerate case
    ranked.join(broadcast(tot))
      .withColumn(out, expr(
        s"""CAST(CASE
          WHEN __rk <= (__n % $buckets) * (__n DIV $buckets + 1)
          THEN (__rk - 1) DIV (__n DIV $buckets + 1) + 1
          ELSE (__n % $buckets)
            + (__rk - 1 - (__n % $buckets) * (__n DIV $buckets + 1))
              DIV (__n DIV $buckets) + 1
          END AS INT)"""))
      .drop("__rk", "__n")
  }
}
