package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a text: tokens are non-empty runs
  * between single spaces, shingles are `n` consecutive tokens joined by a
  * space, de-duplicated preserving first occurrence; texts with fewer than
  * `n` tokens yield the whole text as the single shingle.
  *
  * Semantically identical to the pure-SQL twin the DuckDB oracle runs
  * (`list_distinct(list_transform(...))` over `list_filter(string_split)`),
  * but one codegen'd pass instead of three interpreted higher-order
  * functions with intermediate arrays.
  */
case class WordShingles(child: Expression, n: Int = 3) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires a string argument and positive n, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    WordShingles.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingles.shingles($c, $n)")

  override def prettyName: String = "word_shingles"

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    // split(' ') then drop empties — identical to the SQL twin's
    // list_filter(string_split(text, ' '), t -> t <> '')
    val toks = new mutable.ArrayBuffer[String]()
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        if (i > start) toks += s.substring(start, i)
        start = i + 1
      }
      i += 1
    }
    val out = new mutable.LinkedHashSet[String]()
    if (toks.length >= n) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j <= toks.length - n) {
        sb.setLength(0)
        var m = 0
        while (m < n) {
          if (m > 0) sb.append(' ')
          sb.append(toks(j + m))
          m += 1
        }
        out += sb.toString
        j += 1
      }
    } else {
      out += s
    }
    new GenericArrayData(out.iterator.map(UTF8String.fromString).toArray[Any])
  }
}
