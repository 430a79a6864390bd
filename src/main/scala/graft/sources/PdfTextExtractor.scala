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
  * Font mapping: each page's `/Resources /Font` entries are resolved
  * (inline dicts or indirect refs, with /Parent-chain inheritance), and any
  * font carrying a `/ToUnicode` CMap stream gets its `bfchar`/`bfrange`
  * sections parsed; the scraper tracks the current font through `Tf` and
  * maps show-text strings through the CMap — so CID/Identity-H fonts (the
  * dominant encoding of modern generators) extract real Unicode. Fonts
  * without a ToUnicode map fall back to the Latin-1 byte view (covers the
  * Standard/WinAnsi encodings of simple text PDFs).
  *
  * Deliberate limits (documented, fixture-gated in SourcesSpec):
  *  - no per-font /Encoding or /Differences handling — ToUnicode or Latin-1;
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
    val pageContents: Seq[(Seq[PdfObject], Map[String, UCMap])] =
      if (pages.nonEmpty)
        pages.map(p => (contentRefs(p.dict).flatMap(byNum.get), pageFonts(p.dict, byNum)))
      else if (objects.exists(_.isStream))
        // no page tree: every stream, one "page", no font resources
        Seq((objects.filter(_.isStream), Map.empty[String, UCMap]))
      else Nil // no pages, no streams: nothing to extract -> ""
    val out = new StringBuilder
    for ((content, fonts) <- pageContents) {
      // a page's content streams form ONE conceptual stream (ISO 32000
      // §7.8.2) — concatenate before scraping so text state (current font)
      // carries across stream boundaries
      val pageText = textFromContent(content.filter(_.isStream)
        .map(c => new String(c.decoded, "ISO-8859-1")).mkString("\n"), fonts)
      out.append(pageText).append('\n') // main.py:112 trailing \n per page
    }
    if (pageContents.isEmpty) "" else out.toString
  }

  /** Resolve `/Key << ... >>` (inline) or `/Key N 0 R` (indirect) to the
    * dictionary text. */
  private def subDict(dict: String, key: String,
                      byNum: Map[Int, PdfObject]): Option[String] = {
    val keyRe = ("/" + key + """(?![0-9A-Za-z])""").r
    keyRe.findFirstMatchIn(dict).flatMap { km =>
      var j = km.end
      while (j < dict.length && dict.charAt(j).isWhitespace) j += 1
      if (j + 1 < dict.length && dict.charAt(j) == '<' && dict.charAt(j + 1) == '<')
        Some(dict.substring(j, skipDict(dict, j)))
      else
        """^(\d+)\s+\d+\s+R""".r
          .findFirstMatchIn(dict.substring(j, math.min(dict.length, j + 32)))
          .flatMap(m => byNum.get(m.group(1).toInt).map(_.dict))
    }
  }

  /** A page's font-name -> ToUnicode map, resolving /Resources /Font (inline
    * or indirect, inherited through the /Parent chain per ISO 32000 §7.7.3.4).
    * Fonts with no /ToUnicode stream simply have no entry (Latin-1 passthrough). */
  private def pageFonts(pageDict: String,
                        byNum: Map[Int, PdfObject]): Map[String, UCMap] = {
    val ParentRe = """/Parent\s+(\d+)\s+\d+\s+R""".r
    var dict = pageDict
    var resources = subDict(dict, "Resources", byNum)
    var hops = 0
    while (resources.isEmpty && hops < 8) {
      ParentRe.findFirstMatchIn(dict).flatMap(m => byNum.get(m.group(1).toInt)) match {
        case Some(parent) => dict = parent.dict; resources = subDict(dict, "Resources", byNum)
        case None => hops = 8
      }
      hops += 1
    }
    val fontDict = resources.flatMap(subDict(_, "Font", byNum)).getOrElse(return Map.empty)
    val FontEntryRe = """/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R""".r
    val ToUniRe = """/ToUnicode\s+(\d+)\s+\d+\s+R""".r
    FontEntryRe.findAllMatchIn(fontDict).flatMap { e =>
      for {
        fontObj <- byNum.get(e.group(2).toInt)
        tuRef <- ToUniRe.findFirstMatchIn(fontObj.dict)
        cmapObj <- byNum.get(tuRef.group(1).toInt) if cmapObj.isStream
      } yield e.group(1) -> parseToUnicode(new String(cmapObj.decoded, "ISO-8859-1"))
    }.toMap
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

  /** A parsed /ToUnicode CMap: codespace ranges (byteLen, lo, hi) plus the
    * code -> Unicode-string map. `mapString` re-reads the Latin-1 operand
    * (char i == raw byte i) as code units of the codespace widths. */
  private[graft] final case class UCMap(
      spaces: Seq[(Int, Int, Int)], m: Map[Int, String]) {
    private val lens: Seq[Int] = {
      val l = spaces.map(_._1).distinct.sorted
      if (l.nonEmpty) l else Seq(2) // no codespacerange: Identity-H's width
    }
    def mapString(raw: String): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < raw.length) {
        var consumed = 0
        // shortest matching codespace wins (ISO 32000 §9.7.6.3 code matching)
        for (len <- lens if consumed == 0 && i + len <= raw.length) {
          var v = 0
          var j = 0
          while (j < len) { v = (v << 8) | (raw.charAt(i + j) & 0xff); j += 1 }
          val inSpace = spaces.exists { case (l, lo, hi) => l == len && v >= lo && v <= hi }
          if (inSpace || len == lens.last) {
            // unmapped code inside the space: emit the BMP char of the code —
            // degrades like Identity rather than dropping text
            sb.append(m.getOrElse(v, v.toChar.toString))
            consumed = len
          }
        }
        if (consumed == 0) { sb.append(raw.charAt(i)); consumed = 1 }
        i += consumed
      }
      sb.toString
    }
  }

  /** UTF-16BE hex (4 digits per code unit, surrogates allowed) -> String.
    * Short destinations (a malformed-but-common `<41>` for 'A') are VALUES —
    * zero-extend on the LEFT; right-padding would read <41> as U+4100. */
  private def utf16Hex(hex: String): String = {
    val padded = if (hex.length % 4 == 0) hex else "0" * (4 - hex.length % 4) + hex
    val sb = new StringBuilder
    var i = 0
    while (i + 4 <= padded.length) {
      sb.append(Integer.parseInt(padded.substring(i, i + 4), 16).toChar)
      i += 4
    }
    sb.toString
  }

  /** Parse a /ToUnicode CMap stream: codespacerange widths plus bfchar and
    * bfrange (both `<dstStart>` and `[<dst> ...]` forms, ISO 32000-adjacent
    * Adobe CMap spec §7.2). Tolerant: sections are located by keyword, one
    * entry regex consumes each line-form sequentially. */
  private[graft] def parseToUnicode(c: String): UCMap = {
    // PDF hex strings may contain internal whitespace (§7.3.4.3) — the
    // pattern admits it, `hx` strips it before parsing
    val Hex = "([0-9A-Fa-f][0-9A-Fa-f\\s]*)"
    def hx(s: String): String = s.replaceAll("\\s", "")
    val spaces = mutable.ArrayBuffer.empty[(Int, Int, Int)]
    val m = mutable.HashMap.empty[Int, String]
    for (sec <- s"(?s)begincodespacerange(.*?)endcodespacerange".r.findAllMatchIn(c);
         e <- s"<$Hex>\\s*<$Hex>".r.findAllMatchIn(sec.group(1)))
      spaces += ((hx(e.group(1)).length / 2,
        Integer.parseInt(hx(e.group(1)), 16), Integer.parseInt(hx(e.group(2)), 16)))
    for (sec <- s"(?s)beginbfchar(.*?)endbfchar".r.findAllMatchIn(c);
         e <- s"<$Hex>\\s*<$Hex>".r.findAllMatchIn(sec.group(1)))
      m(Integer.parseInt(hx(e.group(1)), 16)) = utf16Hex(hx(e.group(2)))
    // bfrange: sequential matching keeps the array form's inner hex strings
    // from being re-read as three-hex entries
    val rangeRe = s"(?s)<$Hex>\\s*<$Hex>\\s*(?:<$Hex>|\\[(.*?)\\])".r
    for (sec <- s"(?s)beginbfrange(.*?)endbfrange".r.findAllMatchIn(c);
         e <- rangeRe.findAllMatchIn(sec.group(1))) {
      val lo = Integer.parseInt(hx(e.group(1)), 16)
      val hi = Integer.parseInt(hx(e.group(2)), 16)
      if (e.group(4) != null) {
        // [<dst> <dst> ...]: successive destinations
        val dsts = s"<$Hex>".r.findAllMatchIn(e.group(4)).map(g => hx(g.group(1))).toSeq
        for ((d, k) <- dsts.zipWithIndex if lo + k <= hi) m(lo + k) = utf16Hex(d)
      } else {
        // <dstStart>: increment the LAST UTF-16 code unit per step
        val base = utf16Hex(hx(e.group(3)))
        if (base.nonEmpty) {
          var code = lo
          while (code <= hi) {
            val last = (base.last + (code - lo)).toChar
            m(code) = base.dropRight(1) + last
            code += 1
          }
        }
      }
    }
    UCMap(spaces.toSeq, m.toMap)
  }

  /** PDF name/delimiter boundary (ISO 32000 §7.2.2). */
  private def isDelim(ch: Char): Boolean =
    ch.isWhitespace || "()<>[]{}/%".indexOf(ch) >= 0

  /** Scrape show-text operators from one decoded content stream, mapping
    * strings through the current font's ToUnicode CMap when one exists. */
  private[sources] def textFromContent(
      c: String, fonts: Map[String, UCMap] = Map.empty): String = {
    val sb = new StringBuilder
    var pending: String = null // most recent string/array operand
    var lastName: String = null // most recent /Name token (Tf operand)
    var currentFont: String = null
    var i = 0
    def newline(): Unit =
      if (sb.nonEmpty && sb.charAt(sb.length - 1) != '\n') sb.append('\n')
    def show(): Unit = if (pending != null) {
      sb.append(fonts.get(currentFont).fold(pending)(_.mapString(pending)))
      pending = null
    }
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
        case '/' =>
          val start = i + 1
          i += 1
          while (i < c.length && !isDelim(c.charAt(i))) i += 1
          lastName = c.substring(start, i)
        case _ if ch.isLetter || ch == '\'' || ch == '"' || ch == '*' =>
          val start = i
          while (i < c.length && { val x = c.charAt(i)
            x.isLetterOrDigit || x == '\'' || x == '"' || x == '*' }) i += 1
          c.substring(start, i) match {
            case "Tj" | "TJ" => show()
            case "'" | "\"" => newline(); show()
            case "Td" | "TD" | "T*" => newline()
            case "Tf" => currentFont = lastName
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
