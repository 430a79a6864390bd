package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 16-word MinHash signature of a shingle array, in one pass.
  *
  * Word j (0-7) is the minimum over shingles of the j-th 32-bit big-endian
  * word of sha256(shingle); word 8+j the same over sha256("x:" || shingle).
  * Words are emitted as 8-char lowercase hex so they are bit-identical to
  * the SQL formulation `min(substr(sha2(shingle, 256), j*8+1, 8))` used by
  * the DuckDB oracle — lexicographic min over fixed-width lowercase hex is
  * order-isomorphic to unsigned numeric min, so the two agree exactly.
  *
  * Replaces the explode → 2x sha2 → 16x interpreted substr → groupBy/min
  * pipeline with a single codegen'd map-side expression: the signature
  * becomes a PROJECTION over the shingle arrays, removing the per-shingle
  * row explosion and the aggregation shuffle entirely. Per document the
  * cost is 2 digests + 16 integer mins per shingle, all inside
  * whole-stage codegen.
  *
  * An empty input array yields the identity signature (16 x "ffffffff") —
  * unreachable via `WordShingles`, which always emits at least one shingle.
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got ${child.dataType.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.compute($c)")

  override def prettyName: String = "minhash_sig"

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  val Words = 16
  private val SaltPrefix = "x:".getBytes("UTF-8")

  private def word(d: Array[Byte], j: Int): Long =
    ((d(4 * j) & 0xffL) << 24) | ((d(4 * j + 1) & 0xffL) << 16) |
      ((d(4 * j + 2) & 0xffL) << 8) | (d(4 * j + 3) & 0xffL)

  def compute(shingles: ArrayData): ArrayData = {
    val mins = Array.fill(Words)(0xffffffffL)
    val md = MessageDigest.getInstance("SHA-256")
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val bytes = shingles.getUTF8String(i).getBytes
      md.reset()
      val d1 = md.digest(bytes)
      md.reset()
      md.update(SaltPrefix)
      val d2 = md.digest(bytes)
      var j = 0
      while (j < 8) {
        val w1 = word(d1, j)
        if (w1 < mins(j)) mins(j) = w1
        val w2 = word(d2, j)
        if (w2 < mins(8 + j)) mins(8 + j) = w2
        j += 1
      }
      i += 1
    }
    val out = new Array[Any](Words)
    var j = 0
    while (j < Words) {
      out(j) = UTF8String.fromString(f"${mins(j)}%08x")
      j += 1
    }
    new GenericArrayData(out)
  }
}
