package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.Inflater

import scala.collection.mutable
import scala.util.matching.Regex

/** Minimal JDK-only PDF text extraction (S1, /root/reference/main.py:106-115).
  *
  * Public-knowledge subset of ISO 32000: scan the body for numbered objects,
  * resolve `/Type /Page` objects' `/Contents` streams, FlateDecode them with
  * `java.util.zip.Inflater` where `/Filter /FlateDecode` is declared, and
  * scrape the text-showing operators (`Tj`, `'`, `"`, `TJ`) from each
  * content stream. Per the reference, pages join with a trailing "\n" each
  * (`text += page.extract_text() + "\n"`, main.py:112).
  *
  * Deliberate limits (documented, fixture-gated in SourcesSpec):
  *  - byte-to-char mapping is Latin-1 (covers the Standard/WinAnsi encodings
  *    of simple text PDFs; no CID/ToUnicode fonts — those extract as raw
  *    bytes, same degradation mode as any non-CMap-aware extractor);
  *  - objects are located by scanning, not via the xref table, so damaged
  *    xrefs don't matter but object streams (/ObjStm) are not unpacked;
  *  - line layout is approximated: `Td`/`TD`/`T*`/`'`/`"` break lines,
  *    horizontal kerning inside `TJ` arrays is ignored.
  * Image-only pages (39/40 of the reference corpus) correctly yield "".
  */
object PdfTextExtractor {

  private val ObjRe: Regex = """(?s)(\d+)\s+\d+\s+obj\b""".r
  private val ContentsRefRe: Regex = """/Contents\s+(\d+)\s+\d+\s+R""".r
  private val ContentsArrRe: Regex = """(?s)/Contents\s*\[(.*?)\]""".r
  private val RefRe: Regex = """(\d+)\s+\d+\s+R""".r

  private final case class PdfObject(num: Int, dict: String, raw: Array[Byte]) {
    def isStream: Boolean = raw != null
    def decoded: Array[Byte] =
      if (dict.contains("/FlateDecode")) inflate(raw) else raw
  }

  /** Extract all text from a PDF byte array; "" when no text operators. */
  def extract(bytes: Array[Byte]): String = {
    // Latin-1 view is byte-lossless: char i == byte i, so regex offsets into
    // the string are offsets into the byte array.
    val s = new String(bytes, "ISO-8859-1")
    val objects = parseObjects(s, bytes)
    val byNum = objects.map(o => o.num -> o).toMap
    val pages = objects.filter(o =>
      o.dict.contains("/Page") && !o.dict.contains("/Pages") &&
        o.dict.contains("/Type"))
    val pageContents: Seq[Seq[PdfObject]] =
      if (pages.nonEmpty) pages.map(p => contentRefs(p.dict).flatMap(byNum.get))
      else if (objects.exists(_.isStream))
        Seq(objects.filter(_.isStream)) // no page tree: every stream, one "page"
      else Nil // no pages, no streams: nothing to extract -> ""
    val out = new StringBuilder
    for (content <- pageContents) {
      val pageText = content.filter(_.isStream)
        .map(c => textFromContent(new String(c.decoded, "ISO-8859-1")))
        .mkString
      out.append(pageText).append('\n') // main.py:112 trailing \n per page
    }
    if (pageContents.isEmpty) "" else out.toString
  }

  private def parseObjects(s: String, bytes: Array[Byte]): Seq[PdfObject] = {
    val found = mutable.ArrayBuffer.empty[PdfObject]
    for (m <- ObjRe.findAllMatchIn(s)) {
      val start = m.end
      val end = s.indexOf("endobj", start) match {
        case -1 => s.length
        case e => e
      }
      val streamKw = s.indexOf("stream", start)
      if (streamKw >= 0 && streamKw < end) {
        val dict = s.substring(start, streamKw)
        // stream data starts after "stream" + EOL (CRLF or LF, ISO 32000 §7.3.8)
        var dataStart = streamKw + "stream".length
        if (dataStart < s.length && s.charAt(dataStart) == '\r') dataStart += 1
        if (dataStart < s.length && s.charAt(dataStart) == '\n') dataStart += 1
        val dataEnd = s.indexOf("endstream", dataStart) match {
          case -1 => end
          case e => // strip the EOL preceding "endstream"
            var e2 = e
            if (e2 > dataStart && s.charAt(e2 - 1) == '\n') e2 -= 1
            if (e2 > dataStart && s.charAt(e2 - 1) == '\r') e2 -= 1
            e2
        }
        found += PdfObject(m.group(1).toInt, dict,
          java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd))
      } else {
        found += PdfObject(m.group(1).toInt, s.substring(start, end), null)
      }
    }
    found.toSeq
  }

  /** Object numbers of a page's /Contents: single `N 0 R` or `[N 0 R ...]`. */
  private def contentRefs(pageDict: String): Seq[Int] =
    ContentsArrRe.findFirstMatchIn(pageDict) match {
      case Some(m) => RefRe.findAllMatchIn(m.group(1)).map(_.group(1).toInt).toSeq
      case None => ContentsRefRe.findFirstMatchIn(pageDict).map(_.group(1).toInt).toSeq
    }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new ByteArrayOutputStream(math.max(64, data.length * 4))
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) return out.toByteArray // corrupt: best effort
        out.write(buf, 0, n)
      }
      out.toByteArray
    } catch {
      case _: java.util.zip.DataFormatException => Array.emptyByteArray
    } finally inf.end()
  }

  /** Scrape show-text operators from one decoded content stream. */
  private[sources] def textFromContent(c: String): String = {
    val sb = new StringBuilder
    var pending: String = null // most recent string/array operand
    var i = 0
    def newline(): Unit =
      if (sb.nonEmpty && sb.charAt(sb.length - 1) != '\n') sb.append('\n')
    while (i < c.length) {
      val ch = c.charAt(i)
      ch match {
        case '(' =>
          val (str, next) = literalString(c, i)
          pending = str; i = next
        case '<' if i + 1 < c.length && c.charAt(i + 1) == '<' =>
          i = skipDict(c, i)
        case '<' =>
          val (str, next) = hexString(c, i)
          pending = str; i = next
        case '[' =>
          val (str, next) = arrayString(c, i)
          pending = str; i = next
        case '%' =>
          while (i < c.length && c.charAt(i) != '\n') i += 1
        case _ if ch.isLetter || ch == '\'' || ch == '"' || ch == '*' =>
          val start = i
          while (i < c.length && { val x = c.charAt(i)
            x.isLetterOrDigit || x == '\'' || x == '"' || x == '*' }) i += 1
          c.substring(start, i) match {
            case "Tj" | "TJ" => if (pending != null) { sb.append(pending); pending = null }
            case "'" | "\"" => newline(); if (pending != null) { sb.append(pending); pending = null }
            case "Td" | "TD" | "T*" => newline()
            case _ => // positioning/state operators carry no text
          }
        case _ => i += 1
      }
    }
    sb.toString
  }

  /** `(...)` literal string: nesting, escapes, octal (ISO 32000 §7.3.4.2). */
  private def literalString(c: String, open: Int): (String, Int) = {
    val sb = new StringBuilder
    var depth = 1
    var i = open + 1
    while (i < c.length && depth > 0) {
      c.charAt(i) match {
        case '\\' if i + 1 < c.length =>
          c.charAt(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case '(' => sb.append('('); i += 2
            case ')' => sb.append(')'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case '\n' => i += 2 // line continuation
            case '\r' => i += 2; if (i < c.length && c.charAt(i) == '\n') i += 1
            case d if d >= '0' && d <= '7' =>
              var j = i + 1; var v = 0
              while (j < c.length && j < i + 4 && c.charAt(j) >= '0' && c.charAt(j) <= '7') {
                v = v * 8 + (c.charAt(j) - '0'); j += 1
              }
              sb.append(v.toChar); i = j
            case other => sb.append(other); i += 2
          }
        case '(' => depth += 1; sb.append('('); i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) sb.append(')')
          i += 1
        case x => sb.append(x); i += 1
      }
    }
    (sb.toString, i)
  }

  /** `<hex>` string (ISO 32000 §7.3.4.3); odd final digit pads with 0. */
  private def hexString(c: String, open: Int): (String, Int) = {
    val close = c.indexOf('>', open + 1) match {
      case -1 => c.length
      case e => e
    }
    val hex = c.substring(open + 1, close).filter(x =>
      Character.digit(x, 16) >= 0)
    val padded = if (hex.length % 2 == 1) hex + "0" else hex
    val sb = new StringBuilder
    var i = 0
    while (i + 1 < padded.length + 1 && i + 2 <= padded.length) {
      sb.append(Integer.parseInt(padded.substring(i, i + 2), 16).toChar)
      i += 2
    }
    (sb.toString, math.min(close + 1, c.length))
  }

  /** `[ ... ] TJ` array: concatenate its strings, ignore kerning numbers. */
  private def arrayString(c: String, open: Int): (String, Int) = {
    val sb = new StringBuilder
    var i = open + 1
    var done = false
    while (i < c.length && !done) {
      c.charAt(i) match {
        case ']' => done = true; i += 1
        case '(' =>
          val (str, next) = literalString(c, i); sb.append(str); i = next
        case '<' =>
          val (str, next) = hexString(c, i); sb.append(str); i = next
        case _ => i += 1
      }
    }
    (sb.toString, i)
  }

  /** Skip a balanced `<< ... >>` dictionary (may nest). */
  private def skipDict(c: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i + 1 < c.length) {
      if (c.charAt(i) == '<' && c.charAt(i + 1) == '<') { depth += 1; i += 2 }
      else if (c.charAt(i) == '>' && c.charAt(i + 1) == '>') {
        depth -= 1; i += 2
        if (depth == 0) return i
      }
      else i += 1
    }
    c.length
  }
}
