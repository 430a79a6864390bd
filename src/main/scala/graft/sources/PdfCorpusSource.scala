package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-corpus sources mirroring the reference's ingest source resolution
  * (SURVEY §2.1 S1-S3, §3.2):
  *
  *  - S2: directory glob (`*.pdf` under the corpus dir) via `binaryFile` with
  *    `pathGlobFilter`; an empty match set raises (the reference's 404,
  *    /root/reference/main.py:267-279)
  *  - S3: single named file with an existence predicate (404 if missing,
  *    main.py:260-265)
  *  - S1: per-file text extraction behind a pluggable extractor boundary.
  *    The default extractor is a real, JDK-only PDF text extractor
  *    (`PdfTextExtractor`: FlateDecode via Inflater + Tj/TJ text-operator
  *    scraping, pages joined with a trailing "\n" per main.py:106-115),
  *    with UTF-8 passthrough for non-PDF files; swap in PDFBox via the
  *    same signature for CID-font corpora. (Empirically 39 of the
  *    reference's 40 PDFs are scanned images — JPEG/CCITT streams, no text
  *    fonts — so even the reference's own pypdf extraction yields ~nothing
  *    for them; text-based PDFs extract for real here.)
  *
  * Extraction is error-tolerant per file (A2, main.py:281-302): failures
  * land in an `error` column instead of failing the job, and
  * `ingestReport` reproduces the reference's fold — total chunks, processed
  * titles, per-file errors, and the "all failed" signal.
  */
object PdfCorpusSource {

  /** S1 extraction boundary: bytes -> text. Swap for PDFBox in production. */
  type TextExtractor = Array[Byte] => String

  /** Plain-text fallback: UTF-8 passthrough for non-PDF corpus files. */
  val utf8Passthrough: TextExtractor = bytes => new String(bytes, "UTF-8")

  /** Default S1 extractor: real (JDK-only) PDF text extraction for files
    * with a %PDF- header — FlateDecode content streams + Tj/TJ/'/" scraping,
    * see `PdfTextExtractor` — and UTF-8 passthrough for anything else, so
    * plain-text corpora keep working through the same boundary. */
  val pdfOrPassthrough: TextExtractor = bytes =>
    if (bytes.length >= 5 && bytes(0) == '%' && bytes(1) == 'P' &&
        bytes(2) == 'D' && bytes(3) == 'F' && bytes(4) == '-')
      PdfTextExtractor.extract(bytes)
    else utf8Passthrough(bytes)

  /** S2: glob a corpus directory. Raises IllegalArgumentException("No PDF
    * files found...") on an empty match, mirroring main.py:271-279. The
    * emptiness probe is a driver-side filesystem glob (the same metadata
    * listing the reference's `Path.glob` does) — constructing the DataFrame
    * never runs a Spark job. */
  def corpusDir(spark: SparkSession, dir: String, glob: String = "*.pdf"): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir, glob)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matched = fs.globStatus(p)
    if (matched == null || matched.isEmpty)
      throw new IllegalArgumentException(s"No PDF files found in $dir")
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(dir)
      .select(col("path"), col("content"))
  }

  /** S3: a single named file; IllegalArgumentException if absent
    * (main.py:262-263). */
  def singleFile(spark: SparkSession, path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      throw new IllegalArgumentException(s"PDF file not found: $path")
    spark.read.format("binaryFile").load(path).select(col("path"), col("content"))
  }

  /** S1 + P1: extract text per file (error-tolerant) and derive the title
    * from the basename with replace-all ".pdf" semantics (main.py:287).
    * Output: (path, source, text, error) — error null on success. */
  def extract(files: DataFrame, extractor: TextExtractor = pdfOrPassthrough): DataFrame = {
    val ex = udf((bytes: Array[Byte]) =>
      try (extractor(bytes), null: String)
      catch { case e: Throwable =>
        (null: String, s"${e.getClass.getSimpleName}: ${e.getMessage}")
      })
    files
      .withColumn("source",
        expr("replace(element_at(split(path, '/'), -1), '.pdf', '')"))
      .withColumn("x", ex(col("content")))
      .select(col("path"), col("source"),
        col("x._1").as("text"), col("x._2").as("error"))
  }

  /** A2: the reference's ingest fold — continue on per-file failure, error
    * out only if nothing succeeded (main.py:281-302). Returns one row:
    * (message, ingested_count, pdfs_processed, n_failed, failed_sources),
    * with `message` formatted per main.py:304-306. */
  def ingestReport(extracted: DataFrame): DataFrame = {
    val chunked = graft.Engine.chunks(
      extracted.filter(col("error").isNull)
        .withColumn("doc_id", monotonically_increasing_id())
        .select(col("doc_id"), col("source"), col("path"), col("text")))
    val ok = chunked.groupBy("source").agg(count(lit(1)).as("n_chunks"))
    val okAgg = ok.agg(
      coalesce(sum("n_chunks"), lit(0L)).as("ingested_count"),
      sort_array(collect_list(col("source"))).as("pdfs_processed"))
    val failed = extracted.filter(col("error").isNotNull)
      .agg(count(lit(1)).as("n_failed"),
        sort_array(collect_list(col("source"))).as("failed_sources"))
    okAgg.crossJoin(failed)
      .withColumn("message", concat(
        format_string("Successfully ingested %d PDF(s) with %d total chunks",
          size(col("pdfs_processed")), col("ingested_count")),
        when(col("n_failed") > 0,
          format_string(". %d PDF(s) failed to ingest.", col("n_failed")))
          .otherwise(lit(""))))
      .select(col("message"), col("ingested_count"), col("pdfs_processed"),
        col("n_failed"), col("failed_sources"))
  }
}
