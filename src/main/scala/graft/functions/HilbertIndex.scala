package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Hilbert curve index of two `bits`-bit coordinates — the codegen'd O(bits)
  * loop form of the transform `Layout.withHilbert` originally unrolled into
  * chained projections. The unrolled form was correct but had an
  * exponential-substitution hazard: CollapseProject inlines each level's
  * (hx, hy) into the next, and every level references both TWICE, so the
  * collapsed expression tree doubled per level (measured: 6.4 s at
  * bits=21, almost all of it analysis/codegen). A single expression with a
  * Java loop is O(bits) work and O(1) tree size.
  *
  * Same arithmetic as the DuckDB oracle's CTE chain (flip-within-s + swap
  * rotation, quadrant digit (3*rx)^ry), same masking of out-of-range
  * coordinates into [0, 2^bits) — see the coordinate contract on
  * `Layout.zValueSql`. Null if either input is null.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits out of range: $bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType | IntegerType, LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hilbert_index requires integral inputs, got ${l.sql}, ${r.sql}")
    }

  private def toLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex.compute(toLong(a), toLong(b), bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.HilbertIndex.compute((long)($a), (long)($b), $bits)")

  override def prettyName: String = "hilbert_index"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  /** The classic xy2d transform, flip-within-s rotation variant (validated
    * against the bijection + unit-step-adjacency curve properties in
    * LayoutSpec). Inputs masked to the low `bits` bits. */
  def compute(x0: Long, y0: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var i = bits - 1
    while (i >= 0) {
      val s = 1L << i
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      i -= 1
    }
    d
  }
}
