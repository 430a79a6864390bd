package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Overlapping fixed-window text chunker — a generator (UDTF-shaped) that
  * emits `(chunk_idx int, chunk string)` rows.
  *
  * Semantics from the reference `chunk_text` (/root/reference/main.py:118-126):
  * windows of `size` characters starting every `size - overlap` characters
  * while `start < len(text)`; the final window clamps at end-of-string (Python
  * slice semantics, main.py:124); empty text yields zero chunks; chunk count
  * is `ceil(len / stride)`. "Characters" are Unicode code points (Python str
  * indexing), so this walks code points, not UTF-16 units or bytes.
  *
  * The walk is incremental (one forward pass per document), so a document of
  * n chars costs O(n * size/stride) regardless of chunk count — safe for
  * multi-MB documents at scale.
  */
case class ChunkText(text: Expression, size: Expression, overlap: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(text, size, overlap)

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_idx", IntegerType, nullable = false),
    StructField("chunk", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = {
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"chunk_text requires a string argument, got ${text.dataType.sql}")
    else if (!size.foldable || !overlap.foldable ||
      !Seq(ByteType, ShortType, IntegerType, LongType).contains(size.dataType) ||
      !Seq(ByteType, ShortType, IntegerType, LongType).contains(overlap.dataType) ||
      size.eval() == null || overlap.eval() == null)
      TypeCheckResult.TypeCheckFailure("chunk_text size/overlap must be non-null integer literals")
    else if (sizeVal <= 0 || overlapVal < 0 || overlapVal >= sizeVal)
      TypeCheckResult.TypeCheckFailure(
        s"chunk_text requires 0 <= overlap < size, got size=$sizeVal overlap=$overlapVal")
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val sizeVal: Int = size.eval().asInstanceOf[Number].intValue()
  private lazy val overlapVal: Int = overlap.eval().asInstanceOf[Number].intValue()
  private lazy val stride: Int = sizeVal - overlapVal

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = text.eval(input)
    if (v == null) return Nil
    val s = v.asInstanceOf[UTF8String].toString
    val utf16Len = s.length
    val nChars = s.codePointCount(0, utf16Len)
    if (nChars == 0) return Nil
    val rows = new ArrayBuffer[InternalRow](((nChars + stride - 1) / stride).max(1))
    var idx = 0
    var startChar = 0
    var startOff = 0 // UTF-16 offset of startChar; advanced incrementally
    while (startChar < nChars) {
      val endChars = math.min(sizeVal, nChars - startChar)
      val endOff = s.offsetByCodePoints(startOff, endChars)
      rows += InternalRow(idx, UTF8String.fromString(s.substring(startOff, endOff)))
      idx += 1
      startChar += stride
      if (startChar < nChars) startOff = s.offsetByCodePoints(startOff, stride)
    }
    rows
  }

  override def prettyName: String = "chunk_text"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ChunkText =
    copy(text = newChildren(0), size = newChildren(1), overlap = newChildren(2))
}

object ChunkText {
  val DefaultSize = 1000
  val DefaultOverlap = 200

  /** Driver-side reference implementation (tests, goldens) — mirrors
    * main.py:118-126 exactly over code points. */
  def chunk(text: String, size: Int = DefaultSize, overlap: Int = DefaultOverlap): Seq[String] = {
    require(size > 0 && overlap >= 0 && overlap < size)
    val n = text.codePointCount(0, text.length)
    if (n == 0) return Nil
    val stride = size - overlap
    val out = ArrayBuffer.empty[String]
    var startChar = 0
    var startOff = 0
    while (startChar < n) {
      val endOff = text.offsetByCodePoints(startOff, math.min(size, n - startChar))
      out += text.substring(startOff, endOff)
      startChar += stride
      if (startChar < n) startOff = text.offsetByCodePoints(startOff, stride)
    }
    out.toSeq
  }
}
