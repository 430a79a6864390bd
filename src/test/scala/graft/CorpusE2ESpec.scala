package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.PdfCorpusSource

/** End-to-end fidelity on the reference's REAL corpus (the 40 PDFs at
  * /root/reference/pdfs, ~25 MB — the workload's de-facto test corpus,
  * ref main.py:106-115, main.py:268): glob source -> per-file extraction ->
  * chunk/embed ingest -> ingest report, all through the public API.
  *
  * Corpus reality check (probed per file, tools/CorpusProbe): 4 of the 40
  * PDFs carry real text fonts; the other 36 are scanned images (JPEG/CCITT
  * streams), for which ANY text extractor — including the reference's own
  * pypdf loop — yields only the per-page "\n" joins (main.py:112). The
  * assertions below encode that contract: no per-file errors, every doc
  * non-empty (the reference's page-join behavior), real text with golden
  * substrings where text fonts exist. */
class CorpusE2ESpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpusDir = "/root/reference/pdfs"
  private lazy val corpusExists = new java.io.File(corpusDir).isDirectory

  private lazy val extracted = PdfCorpusSource.extract(
    PdfCorpusSource.corpusDir(spark, corpusDir)).cache()

  test("glob source finds all 40 corpus PDFs; extraction has zero per-file errors") {
    assume(corpusExists, s"$corpusDir not present")
    val rows = extracted.select("source", "text", "error")
      .as[(String, String, String)].collect()
    assert(rows.length == 40)
    val errs = rows.filter(_._3 != null)
    assert(errs.isEmpty, s"extraction errors: ${errs.map(r => r._1 + ": " + r._3).toSeq}")
    // every document yields non-empty text (>= 35/40 is the fidelity bar;
    // the page-join contract makes it 40/40 in practice)
    assert(rows.count(r => r._2 != null && r._2.nonEmpty) >= 35)
  }

  test("text-font PDFs extract real text; golden substrings for a known PDF") {
    assume(corpusExists, s"$corpusDir not present")
    // the corpus's four text-bearing PDFs must each yield substantial text
    val textBearing = Map(
      "07-08att" -> 1500,
      "AA_Association_of_Jesuit_Colleges_and_Universitites" -> 3000,
      "AA_FIU_business" -> 1000,
      "AA_ICUF" -> 400)
    val words = extracted.filter($"error".isNull)
      .select($"source", size(split($"text", "\\s+")).as("n_words"))
      .as[(String, Int)].collect().toMap
    for ((src, minWords) <- textBearing)
      assert(words.getOrElse(src, 0) >= minWords,
        s"$src extracted ${words.getOrElse(src, 0)} words, expected >= $minWords")
    val att = extracted.filter($"source" === "07-08att")
      .select("text").as[String].head()
    assert(att.contains("ARTICULATION AGREEMENT"))
    assert(att.contains("STRAYER UNIVERSITY"))
  }

  test("full ingest over the real corpus: every doc chunks, report adds up") {
    assume(corpusExists, s"$corpusDir not present")
    val docs = extracted.filter($"error".isNull)
      .withColumn("doc_id", monotonically_increasing_id())
      .select($"doc_id", $"source", $"path", $"text")
    val index = Engine.ingest(docs)
    val perDoc = index.groupBy("source").agg(count(lit(1)).as("n_chunks"))
      .as[(String, Long)].collect().toMap
    assert(perDoc.size == 40, s"expected 40 chunked docs, got ${perDoc.size}")
    assert(perDoc.values.forall(_ >= 1))
    // 07-08att: 14k chars of real text -> ceil(len/800) chunks, far above 1
    assert(perDoc("07-08att") >= 10)
    // the reference's ingest fold (A2): 40 processed, 0 failed
    val rep = PdfCorpusSource.ingestReport(extracted)
      .select("message", "ingested_count", "n_failed")
      .as[(String, Long, Long)].head()
    assert(rep._2 == perDoc.values.sum)
    assert(rep._3 == 0L)
    assert(rep._1 == s"Successfully ingested 40 PDF(s) with ${rep._2} total chunks")
    // and the flagship search runs end-to-end over the real index: the
    // test_api.sh fixture query returns ranked hits
    val hits = Engine.search(index, "What are the articulation agreements for University of Florida?", 3)
      .collect()
    assert(hits.length == 3)
  }
}
