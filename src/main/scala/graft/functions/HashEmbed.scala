package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic hash embedding: SHA-256 of the UTF-8 text, cycled to `dim`
  * float dims via `v(i) = digest(i % 32)/255*2 - 1`.
  *
  * Semantics from the reference `generate_embedding`
  * (/root/reference/main.py:129-147): digest at main.py:135-136, cycle at
  * main.py:142, normalize at main.py:144. Math in f64, stored f32 (Pinecone
  * stores f32; see SURVEY §1.2). Deterministic + foldable, so
  * `hash_embed(lit(q))` constant-folds to a single driver-side evaluation —
  * the reference's "embed the query once" (main.py:182).
  */
case class HashEmbed(child: Expression, dim: Int = HashEmbed.DefaultDim)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"hash_embed requires a string argument, got ${child.dataType.sql}")
    else if (dim <= 0)
      TypeCheckResult.TypeCheckFailure(s"hash_embed dim must be positive, got $dim")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(input: Any): Any =
    HashEmbed.embed(input.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashEmbed.embed($c, $dim)")

  override def prettyName: String = "hash_embed"

  override protected def withNewChildInternal(newChild: Expression): HashEmbed =
    copy(child = newChild)
}

object HashEmbed {
  val DefaultDim = 1024
  val DigestBytes = 32

  /** SHA-256 digest of the UTF-8 bytes — bit-identical to Python
    * `hashlib.sha256(text.encode('utf-8')).digest()` (main.py:135-136). */
  def digest(s: UTF8String): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes)

  /** Cycle the 32 digest bytes to `dim` floats (main.py:139-147). */
  def embed(s: UTF8String, dim: Int): ArrayData = {
    val d = digest(s)
    val arr = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      arr(i) = ((d(i % DigestBytes) & 0xff) / 255.0 * 2.0 - 1.0).toFloat
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(arr)
  }

  /** Driver-side convenience (query literals, tests). */
  def embedText(s: String, dim: Int = DefaultDim): Array[Float] =
    embed(UTF8String.fromString(s), dim).toFloatArray()
}
