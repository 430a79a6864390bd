package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprint: the minimum SHA-256 (as lowercase hex) over all
  * `gram`-length character windows of the text — winnowing with window =
  * whole document. Exactly `array_min(transform(sequence(1, greatest(len-
  * gram+1, 1)), i -> sha2(substring(text, i, gram), 256)))`, the pure-SQL
  * twin the DuckDB oracle runs, but codegen'd: one incremental code-point
  * walk, one digest per window, byte-wise min (hex order == byte order for
  * fixed-width hex).
  */
case class MinGramHash(child: Expression, gram: Int = 8) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && gram > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"min_gram_hash requires a string argument and positive gram, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    MinGramHash.minGramHash(input.asInstanceOf[UTF8String], gram)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinGramHash.minGramHash($c, $gram)")

  override def prettyName: String = "min_gram_hash"

  override protected def withNewChildInternal(newChild: Expression): MinGramHash =
    copy(child = newChild)
}

object MinGramHash {
  private val hexChars = "0123456789abcdef".toCharArray

  def minGramHash(text: UTF8String, gram: Int): UTF8String = {
    val s = text.toString
    val utf16Len = s.length
    val nChars = s.codePointCount(0, utf16Len)
    val nWindows = math.max(nChars - gram + 1, 1)
    val md = MessageDigest.getInstance("SHA-256")
    var best: Array[Byte] = null
    var startOff = 0
    var w = 0
    while (w < nWindows) {
      val endChars = math.min(gram, nChars - w)
      val endOff =
        if (endChars <= 0) startOff
        else s.offsetByCodePoints(startOff, endChars)
      md.reset()
      val d = md.digest(s.substring(startOff, endOff).getBytes(StandardCharsets.UTF_8))
      if (best == null || compareUnsigned(d, best) < 0) best = d
      w += 1
      if (w < nWindows) startOff = s.offsetByCodePoints(startOff, 1)
    }
    val hex = new Array[Byte](64)
    var i = 0
    while (i < 32) {
      hex(2 * i) = hexChars((best(i) >> 4) & 0xf).toByte
      hex(2 * i + 1) = hexChars(best(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(hex)
  }

  private def compareUnsigned(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < a.length) {
      val cmp = (a(i) & 0xff) - (b(i) & 0xff)
      if (cmp != 0) return cmp
      i += 1
    }
    0
  }
}
