package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Binary-quantization sketch of a cosine embedding: bit `t` of the result
  * is 1 iff `dot(e, w_t) >= 0`, over the same hash-derived hyperplane family
  * as the rp-LSH operators (`RandProjBuckets.weights`, w[t][i] from
  * SHA-256("rp:t:i")). The sketch packs into ONE 8-byte long — a 64-dim f32
  * embedding compresses 32x — and angular distance is approximated by
  * `bit_count(a ^ b)` (Goemans-Williamson / Charikar: P[bit differs] = θ/π),
  * one XOR+popcount per comparison instead of a 64-term float dot.
  *
  * Signs are scale-invariant, so the raw (un-normalized) sequential f64 dot
  * decides each bit; every step reproduces bit-identically in the DuckDB
  * oracle, which makes the Hamming-shortlist ANN path (`Similarity.bqTopK`)
  * fully hash-checkable, like the rp-LSH and int8-SQ paths.
  *
  * `numBits` is capped at 63: bit 63 would need `1 << 63`, which signed
  * 64-bit SQL engines reject as shift overflow — and 63 hyperplanes already
  * estimate θ to ~σ = π·sqrt(p(1-p)/63) ≤ 0.2 rad, shortlist-grade.
  *
  * The zero vector (and any non-finite component) has no direction; its dot
  * is 0 (or NaN) against every hyperplane, so it lands on the deterministic
  * `dot >= 0` branch — all-ones for zero, all-zeros for NaN — same as the
  * SQL `CASE WHEN dot >= 0` twin. Exact re-ranking scores it 0 either way.
  */
case class SignSketch(child: Expression, numBits: Int) extends UnaryExpression {
  require(numBits > 0 && numBits <= 63, s"numBits out of range: $numBits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"sign_sketch requires array<float|double>, got ${child.dataType.sql}")
  }

  // resolved lazily: child.dataType is only legal after analysis
  private def elemType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => FloatType
  }

  override def nullSafeEval(input: Any): Any =
    SignSketch.compute(input.asInstanceOf[ArrayData],
      elemType == DoubleType, numBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val isDouble = elemType == DoubleType
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SignSketch.compute($c, $isDouble, $numBits)")
  }

  override def prettyName: String = "sign_sketch"

  override protected def withNewChildInternal(newChild: Expression): SignSketch =
    copy(child = newChild)
}

object SignSketch {
  def compute(arr: ArrayData, isDouble: Boolean, numBits: Int): Long = {
    val n = arr.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      v(i) = if (isDouble) arr.getDouble(i) else arr.getFloat(i).toDouble
      i += 1
    }
    val w = RandProjBuckets.weights(numBits, n)
    var code = 0L
    var t = 0
    while (t < numBits) {
      val wt = w(t)
      var dot = 0.0
      var j = 0
      while (j < n) {
        dot += v(j) * wt(j)
        j += 1
      }
      if (dot >= 0.0) code |= 1L << t
      t += 1
    }
    code
  }
}
