package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Occurrence counts of a fixed term list in a token array: one pass over
  * the tokens against a hashed term→slot map, emitting `array<bigint>` in
  * term order. The multi-term twin of `size(filter(toks, x -> x = 't'))` —
  * which the BM25/TF-IDF operators previously evaluated once per term, each
  * an interpreted (CodegenFallback) higher-order function re-scanning the
  * token array. For T terms this replaces T interpreted scans with one
  * codegen'd scan; the DuckDB oracle keeps the per-term `list_filter` form
  * and the counts are integer-exact, so parity is unaffected.
  *
  * Terms are expression-bound (a query's keyword set), not row data — the
  * term map builds once per partition via codegen references, never per row.
  */
case class TermCounts(child: Expression, terms: Seq[String]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if terms.nonEmpty => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"term_counts requires array<string> tokens and a non-empty term list, got ${child.dataType.sql}")
  }

  @transient private lazy val slots: java.util.HashMap[UTF8String, Integer] =
    TermCounts.buildSlots(terms)

  override def nullSafeEval(input: Any): Any =
    TermCounts.counts(input.asInstanceOf[ArrayData], slots, terms.length)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("termSlots", slots, "java.util.HashMap")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TermCounts.counts($c, $ref, ${terms.length})")
  }

  override def prettyName: String = "term_counts"

  override protected def withNewChildInternal(newChild: Expression): TermCounts =
    copy(child = newChild)
}

object TermCounts {

  /** First slot wins on a duplicated term, matching the callers' `.distinct`
    * discipline; duplicates would otherwise split one term's count. */
  def buildSlots(terms: Seq[String]): java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](terms.length * 2)
    terms.zipWithIndex.foreach { case (t, i) =>
      m.putIfAbsent(UTF8String.fromString(t), Integer.valueOf(i))
    }
    m
  }

  def counts(toks: ArrayData, slots: java.util.HashMap[UTF8String, Integer],
             n: Int): ArrayData = {
    val out = new Array[Long](n)
    val len = toks.numElements()
    var i = 0
    while (i < len) {
      if (!toks.isNullAt(i)) {
        val slot = slots.get(toks.getUTF8String(i))
        if (slot != null) out(slot.intValue()) += 1L
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
