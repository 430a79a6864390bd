package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Integer dot product of two int8 code arrays (`array<tinyint>`), the
  * scoring kernel for scalar-quantized embeddings: with symmetric
  * per-vector quantization the scales cancel in cosine similarity, so
  *
  *   cos(a, b) ~ dot(ca, cb) / (sqrt(dot(ca, ca)) * sqrt(dot(cb, cb)))
  *
  * is computed entirely in integer arithmetic — associative, overflow-free
  * for any realistic dim (127^2 * dim << 2^63), and bit-identical across
  * engines (the DuckDB oracle reproduces it with list arithmetic).
  * Codegen'd; length-mismatched inputs (codes quantized from different
  * embedding dims — a caller bug) throw rather than silently scoring 0.
  */
case class ByteDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(ByteType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"byte_dot requires array<tinyint> args, got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    ByteDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ByteDot.compute($a, $b)")

  override def prettyName: String = "byte_dot"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ByteDot =
    copy(left = newLeft, right = newRight)
}

object ByteDot {
  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"byte_dot: code arrays of different dims (${n} vs ${b.numElements()})")
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getByte(i).toLong * b.getByte(i).toLong
      i += 1
    }
    acc
  }
}
