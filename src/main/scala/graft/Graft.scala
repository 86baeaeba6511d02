package graft

import graft.io.Ingest
import graft.model.{Chunk, Doc}
import graft.pipeline.Pipeline
import org.apache.spark.sql.{Dataset, SparkSession}

/** The library façade: one object whose methods line up 1:1 with the
  * reference's public entry points, so a docler user can map each call they
  * make today onto its Spark-native equivalent.
  *
  * | reference (docler)                               | here |
  * |---|---|
  * | `converter.convert_file(path)` (base.py:246)     | [[convertFile]] |
  * | `converter.convert_files(paths)` (base.py:227)   | [[convertFiles]] |
  * | `convert_directory(dir, pattern, exclude, max_depth)` (base.py:343) | [[convertDirectory]] |
  * | `DirectoryConverter.convert_with_progress` (dir_converter.py:95) | [[convertDirectoryWithLineage]] |
  * | `MarkdownChunker().chunk(doc)` (markdown_chunker) | [[chunkMarkdown]] |
  * | `TokenAwareChunker().chunk(doc)` (token_chunker)  | [[chunkTokenAware]] |
  * | `Document.export_to_directory(dir)`               | [[exportToDirectory]] |
  *
  * Everything returns lazy `Dataset`s (the collection-of-documents shape the
  * reference iterates eagerly); [[convertFile]] is the one eager driver-side
  * convenience, matching the reference's single-Document return.
  */
object Graft {

  /** `convert_directory`: distributed listing → filter chain → extraction.
    * Failure rows (unsupported MIME, read errors, malformed payloads) are
    * dropped here like the reference's error-collecting loop; use
    * [[convertDirectoryWithLineage]] to keep the counts.
    */
  def convertDirectory(
      spark: SparkSession,
      dir: String,
      pattern: String = "**/*",
      exclude: Seq[String] = Nil,
      maxDepth: Int = 0): Dataset[Doc] =
    Pipeline.toDocs(Pipeline.extract(
      Ingest.fromDirectory(spark, dir, pattern, exclude, maxDepth)))

  /** `convert_with_progress`: the docs plus per-partition lineage rows
    * (doc/span/failure counts, bounded failure sample) — the reference's
    * `Conversion` progress state as a metrics table.
    */
  def convertDirectoryWithLineage(
      spark: SparkSession,
      dir: String,
      pattern: String = "**/*",
      exclude: Seq[String] = Nil,
      maxDepth: Int = 0,
      snapshotId: Long = 0L): (Dataset[Doc], Dataset[model.LineageRow]) = {
    val out = Pipeline.extract(Ingest.fromDirectory(spark, dir, pattern, exclude, maxDepth))
    (Pipeline.toDocs(out), Pipeline.lineage(out, snapshotId))
  }

  /** `convert_files`: an explicit path list (caller-held, so O(paths) driver
    * memory is the API's own contract), reads distributed.
    */
  def convertFiles(spark: SparkSession, paths: Seq[String]): Dataset[Doc] =
    Pipeline.toDocs(Pipeline.extract(Ingest.fromFiles(spark, paths)))

  /** `convert_file`: one path → one Document, eagerly (driver-side
    * convenience). Throws `IllegalArgumentException` on conversion failure —
    * the reference raises on unsupported MIME / unreadable input the same
    * way (utils.py:49-77, base.py:167-200).
    */
  def convertFile(spark: SparkSession, path: String): Doc = {
    import spark.implicits._
    val out = Pipeline.extract(Ingest.fromFiles(spark, Seq(path))).collect()
    out.headOption match {
      case Some(e) if e.failure.isEmpty =>
        Doc(e.doc_id, e.spans, e.title, e.source_path, e.mime_type,
          e.page_count, e.media, e.metadata)
      case Some(e) =>
        throw new IllegalArgumentException(s"conversion failed for $path: ${e.failure}")
      case None =>
        throw new IllegalArgumentException(s"no file at $path")
    }
  }

  /** `MarkdownChunker` (headers + size fallback), 1 doc → N chunk rows. */
  def chunkMarkdown(docs: Dataset[Doc], maxChunkSize: Int = 1500, overlap: Int = 50): Dataset[Chunk] =
    Pipeline.chunk(docs, maxChunkSize, overlap)

  /** `TokenAwareChunker` (token budget + line overlap). */
  def chunkTokenAware(docs: Dataset[Doc], maxTokens: Int = 4000, overlapLines: Int = 20): Dataset[Chunk] =
    Pipeline.chunkTokenAware(docs, maxTokens, overlapLines)

  /** `Document.export_to_directory` for every doc in the dataset: one
    * directory per doc_id with `document.md` + image payload files.
    */
  def exportToDirectory(docs: Dataset[Doc], baseDir: String): Unit =
    ops.DocOps.exportToDirectory(docs, baseDir)

  /** `pdf_utils.get_pdf_info` over raw bytes (container-level: page tree,
    * dims, Info dict, Standard-handler RC4 password semantics —
    * [[graft.extract.PdfBytes]]). Left = parse error / incorrect password,
    * mirroring the reference's ValueError.
    */
  def pdfInfo(data: Array[Byte], password: Option[String] = None): Either[String, extract.PdfBytes.PdfInfo] =
    extract.PdfBytes.pdfInfo(data, password)

  /** `pdf_utils.extract_pdf_pages`: keep the 0-based page indices, re-emit
    * a standalone PDF (object-closure copy — [[graft.extract.PdfRewrite]]).
    */
  def extractPdfPages(data: Array[Byte], keep: Seq[Int], password: Option[String] = None): Either[String, Array[Byte]] =
    extract.PdfRewrite.extractPages(data, keep, password)

  /** `pdf_utils.decrypt_pdf`: unencrypted bytes pass through unchanged;
    * RC4-encrypted documents re-emit decrypted; wrong password is a Left.
    */
  def decryptPdf(data: Array[Byte], password: String): Either[String, Array[Byte]] =
    extract.PdfRewrite.decryptPdf(data, password)
}
