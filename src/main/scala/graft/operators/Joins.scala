package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utilities for the 100 TB regime.
  *
  * Spark's AQE skew-join split handles most skew at runtime (enabled by
  * default), but it only fires for sort-merge joins and only splits
  * oversized PARTITIONS. When one join key value alone is pathological
  * (a null-ish sentinel, an empty-text hash, a "unknown" source shared by
  * a large slice of the corpus), pre-salting is the deterministic fix:
  * spread the hot key's rows over `salt` sub-keys and replicate the small
  * side once per sub-key. The join result is exactly that of the unsalted
  * join — the salt only changes the key's hash distribution.
  */
object Joins {

  /** Equi-join `big` with `small` on `key`, salted: `big` rows get a
    * deterministic salt from a content hash (spreads any single hot key
    * over `salt` partitions), `small` rows replicate `salt` times. Use when
    * a specific key value dominates; cost = small side x salt. */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
                     salt: Int = 16, joinType: String = "inner",
                     bigSaltExpr: Option[Column] = None): DataFrame = {
    require(salt > 0, s"salt must be positive: $salt")
    // right/full outer would emit each unmatched SMALL row once per salt
    // replica — only big-side-preserving join types keep exact parity
    val allowed = Set("inner", "cross", "left", "leftouter", "left_outer",
      "leftsemi", "left_semi", "semi", "leftanti", "left_anti", "anti")
    require(allowed.contains(
      joinType.toLowerCase(java.util.Locale.ROOT).replace(" ", "")),
      s"saltedEquiJoin supports big-side-preserving join types only, got $joinType")
    // deterministic per-row salt: hash of the whole row unless given
    val saltCol = bigSaltExpr.getOrElse(
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(salt)))
    val b = big.withColumn("__salt", saltCol)
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    b.join(s, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
