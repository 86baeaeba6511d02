package graft.io

import graft.model.RawDoc
import graft.ops.DocOps
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Real-file ingestion: the reference's primary entry point is a directory
  * of files (`convert_directory`, converters/base.py:343-413); this is the
  * Spark-native equivalent — a `binaryFile` scan routed through the same
  * glob/exclude/max_depth/MIME filter chain ([[DocOps.directoryFilter]]) and
  * lifted into `RawDoc` rows the extraction pipeline consumes:
  *
  * {{{
  * val raw  = Ingest.fromDirectory(spark, "/data/corpus") // default glob
  * val docs = Pipeline.toDocs(Pipeline.extract(raw))
  * }}}
  *
  * Payload-kind routing mirrors the converter-registry dispatch
  * (registry.py:58-132): HTML → the boilerplate-strip stage; markdown/plain
  * text → dialect detection by marker grammar (PageBreak / {N}---- / Slide
  * number / data-URI images / plain); any other MIME → an `unsupported`
  * kind whose extraction fails into the lineage failure channel (the
  * reference's unsupported-MIME error taxonomy). Binary formats needing
  * byte-level parsers (PDF, Office) are the documented no-PDF-byte-parsing
  * limitation — on ingestion they surface as failure rows, never crashes.
  */
object Ingest {

  /** Detect the provider dialect of a markdown/plain-text payload from its
    * marker grammar — first match wins, `md_plain` otherwise.
    */
  def detectDialect(text: String): String =
    if (text.contains("<!-- PageBreak -->")) {
      // azure and docling share the PageBreak marker; docling additionally
      // uses <!-- image --> placeholders
      if (text.contains("<!-- image -->")) "md_docling" else "md_azure"
    }
    else if (text.contains("<!-- Slide number:")) "md_slides"
    else if (DatalabMarker.findFirstIn(text).isDefined) "md_datalab"
    else if (text.contains("](data:image/")) "md_datauri"
    else "md_plain"

  private val DatalabMarker = """(?m)^\s*\{\d+\}\s*-+\s*$""".r

  /** Scan `dir` with the directory-filter chain and lift the survivors into
    * RawDoc rows. Text payloads are UTF-8 decoded; the `doc_id` is the
    * path relative to `dir` (the reference keys results by relative path,
    * base.py:396-398).
    */
  def fromDirectory(
      spark: SparkSession,
      dir: String,
      pattern: String = "**/*",
      exclude: Seq[String] = Nil,
      maxDepth: Int = 0): Dataset[RawDoc] = {
    import spark.implicits._
    val base = if (dir.endsWith("/")) dir else dir + "/"
    val scanned = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(dir)
      .withColumn("rel_path",
        regexp_replace(col("path"), "^file:" + java.util.regex.Pattern.quote(base), ""))
    DocOps.directoryFilter(scanned, pathCol = "rel_path",
      pattern = pattern, exclude = exclude, maxDepth = maxDepth)
      .select(col("rel_path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (relPath, bytes) => toRawDoc(relPath, bytes) }
  }

  /** One file → one RawDoc (pure; also the unit-test surface). */
  def toRawDoc(relPath: String, bytes: Array[Byte]): RawDoc = {
    val ext = relPath.split('.').lastOption.map(_.toLowerCase).getOrElse("")
    val mime = DocOps.ExtToMime.getOrElse(ext, "application/octet-stream")
    mime match {
      case "text/html" =>
        RawDoc(relPath, "html", mime, new String(bytes, java.nio.charset.StandardCharsets.UTF_8), Nil, Nil)
      case "text/markdown" | "text/plain" | "text/x-rst" | "text/x-org" =>
        val text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        RawDoc(relPath, detectDialect(text), mime, text, Nil, Nil)
      case other =>
        // no byte-level parser for this format in-engine: surfaces as a
        // failure row in extraction lineage (reference raises on
        // unsupported MIME, utils.py:49-77 — here it is an error ROW)
        RawDoc(relPath, s"unsupported:$other", other, "", Nil, Nil)
    }
  }
}
