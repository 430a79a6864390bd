package graft.tools

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.sources.PdfTextExtractor

/** Scratch probe (no Spark): run the JDK-only PDF extractor over a real
  * corpus directory and report per-file extracted-text lengths, to size the
  * e2e fidelity assertion against reality. */
object CorpusProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/reference/pdfs")
    val files = Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.toString.endsWith(".pdf")).toSeq.sortBy(_.toString)
    var nonEmpty = 0
    for (f <- files) {
      val bytes = Files.readAllBytes(f)
      val (len, words, err) =
        try {
          val t = PdfTextExtractor.extract(bytes)
          (t.length, t.split("\\s+").count(_.nonEmpty), "")
        } catch { case e: Throwable => (-1, 0, e.toString.take(80)) }
      if (len > 0) nonEmpty += 1
      println(f"PROBE ${f.getFileName}%-60s bytes=${bytes.length}%9d chars=$len%8d words=$words%7d $err")
    }
    println(s"PROBE TOTAL ${files.size} files, $nonEmpty with non-empty text")
  }
}
