package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** The complete second-moment state of an embedding corpus in ONE flat
  * buffer: row count, per-dimension sums Σq_i, and the upper-triangle
  * cross-moments Σq_i·q_j — everything exact covariance/correlation needs
  * ([[Similarity.embeddingCovariance]]).
  *
  * Output of the [[CovMomentsAgg]] aggregator. All values are exact
  * BIGINT sums of the 2^10 fixed-point components, so the downstream
  * covariance numerators are engine-exact. */
case class CovMoments(n: Long, sums: Seq[Long], prods: Seq[Long])

/** Flat-accumulator covariance moments: each input row folds its
  * d(d+1)/2 upper-triangle products into a primitive `Array[Long]` buffer
  * IN PLACE — a few thousand multiply-adds per row — instead of
  * materializing d(d+3)/2 struct objects per row for a hash aggregate to
  * re-group (the shape this replaced: ~2000 rows × 2145 structs at d=64
  * was the second-slowest query in the round-10 bench; at d=1024 it would
  * be ~16 MB of generator output per 4 KB input row).
  *
  * Buffer layout: `[0]` = n, `[1..d]` = Σq_i, `[1+d ..]` = row-major
  * upper-triangle Σq_i·q_j (pair (i,j), i ≤ j, at offset
  * `1 + d + i·d − i(i−1)/2 + (j − i)`). The empty array is the unseen
  * zero, sized lazily on the first row so one aggregator serves any
  * dimensionality; ragged inputs fail fast. Merges are elementwise adds,
  * so partial aggregation is map-side and the shuffle carries ONE buffer
  * per map task (d(d+1)/2 + d + 1 longs — ~17 KB at d=64, ~4 MB at
  * d=1024) regardless of corpus size; integer sums make the fold
  * order-free and deterministic. */
object CovMomentsAgg extends Aggregator[Seq[Long], Array[Long], CovMoments] {

  def zero: Array[Long] = Array.emptyLongArray

  def reduce(b0: Array[Long], q: Seq[Long]): Array[Long] = {
    if (q == null) return b0
    val qa = q.toArray
    val d = qa.length
    val b = if (b0.isEmpty) new Array[Long](1 + d + d * (d + 1) / 2) else b0
    require(b.length == 1 + d + d * (d + 1) / 2,
      s"ragged embedding dimensionality: row has $d dims")
    b(0) += 1L
    var i = 0
    var off = 1 + d
    while (i < d) {
      val qi = qa(i)
      b(1 + i) += qi
      var j = i
      while (j < d) { b(off) += qi * qa(j); off += 1; j += 1 }
      i += 1
    }
    b
  }

  def merge(a: Array[Long], c: Array[Long]): Array[Long] =
    if (a.isEmpty) c
    else if (c.isEmpty) a
    else {
      require(a.length == c.length,
        s"ragged embedding dimensionality across partitions: ${a.length} vs ${c.length}")
      var i = 0
      while (i < a.length) { a(i) += c(i); i += 1 }
      a
    }

  def finish(b: Array[Long]): CovMoments =
    if (b.isEmpty) CovMoments(0L, Seq.empty, Seq.empty)
    else {
      // invert len = 1 + d + d(d+1)/2  ⇒  d = (√(8·len + 1) − 3) / 2
      val d = ((math.sqrt(8.0 * b.length + 1.0) - 3.0) / 2.0).round.toInt
      CovMoments(b(0), b.slice(1, 1 + d).toSeq, b.slice(1 + d, b.length).toSeq)
    }

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[CovMoments] = ExpressionEncoder[CovMoments]()
}
