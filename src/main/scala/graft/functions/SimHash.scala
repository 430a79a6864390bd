package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 32-bit SimHash over an array of tokens: bit b of the signature is set iff
  * `sum over tokens of (2*bit_b(sha256(token)) - 1) > 0`, where bit_b reads
  * bit (b%8) of byte (b/8) of the token's SHA-256 digest.
  *
  * Semantically identical to the pure-SQL twin used by the DuckDB oracle
  * (nested aggregate/transform over sha2 hex — see SparkEntry q27), but ~50x
  * faster: higher-order functions are CodegenFallback (interpreted, with
  * per-element parsing and allocation), while this expression runs one
  * digest + 32 integer ops per token inside codegen.
  */
case class SimHash(child: Expression, bits: Int = 32) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if bits > 0 && bits <= 64 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"simhash requires array<string>, got ${child.dataType.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash.simhash(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.simhash($c, $bits)")

  override def prettyName: String = "simhash"

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

object SimHash {
  def simhash(tokens: ArrayData, bits: Int): Long = {
    val votes = new Array[Int](bits)
    val md = MessageDigest.getInstance("SHA-256")
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      md.reset()
      val digest = md.digest(tokens.getUTF8String(i).getBytes)
      var b = 0
      while (b < bits) {
        val bit = (digest(b / 8) >> (b % 8)) & 1
        votes(b) += (if (bit == 1) 1 else -1)
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }
}
