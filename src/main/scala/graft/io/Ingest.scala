package graft.io

import graft.model.RawDoc
import graft.ops.DocOps
import org.apache.spark.sql.{Dataset, SparkSession}

/** Real-file ingestion: the reference's primary entry point is a directory
  * of files (`convert_directory`, converters/base.py:343-413); this is the
  * Spark-native equivalent:
  *
  * {{{
  * val raw  = Ingest.fromDirectory(spark, "/data/corpus") // default glob
  * val docs = Pipeline.toDocs(Pipeline.extract(raw))
  * }}}
  *
  * The glob/exclude/max_depth/MIME filter chain is applied AT LISTING TIME
  * on the driver (FileSystem metadata only — the same listing a FileIndex
  * performs), so excluded and unsupported files are never read: the
  * `binaryFile` scan loads exactly the selected paths. Works for any Hadoop
  * filesystem scheme (the base is made fully qualified before relativizing,
  * so doc ids are paths relative to `dir` — the reference keys results by
  * relative path, base.py:396-398).
  *
  * Payload-kind routing mirrors the converter-registry dispatch
  * (registry.py:58-132): HTML → the boilerplate-strip stage; markdown/plain
  * text → dialect detection by marker grammar; any other MIME → an
  * `unsupported` kind whose extraction fails into the lineage failure
  * channel (the reference's unsupported-MIME error taxonomy). Binary
  * formats needing byte-level parsers (PDF, Office) are the documented
  * no-PDF-byte-parsing limitation — on ingestion they surface as failure
  * rows, never crashes.
  *
  * Note: files/directories whose names start with `_` or `.` are Spark
  * metadata conventions; they are listed here (parity with pathlib globs)
  * but the underlying reader may still treat `_spark_metadata` specially.
  */
object Ingest {

  /** Detect the provider dialect of a markdown/plain-text payload from its
    * marker grammar — most specific match wins, `md_plain` otherwise.
    * The datalab check reuses the normalizer's own blank-delimited marker
    * rule so near-miss content (an inline `{3}----` line with non-blank
    * neighbors) is NOT misrouted into the datalab image-rename passes.
    */
  def detectDialect(text: String): String =
    if (text.contains("<!-- image -->")) "md_docling" // placeholder is docling-specific
    else if (text.contains("<!-- PageBreak -->")) "md_azure"
    // bare <figure> without PageBreak markers is NOT azure evidence: plain
    // markdown legitimately embeds HTML figure blocks, and routing them to
    // azure would destructively replace the block with a phantom image ref.
    // md_plain preserves such content verbatim (the safe ambiguity).
    else if (text.contains("<!-- Slide number:")) "md_slides"
    else if (graft.extract.Normalize.hasDatalabMarkers(text)) "md_datalab"
    else if (text.contains("](data:image/")) "md_datauri"
    else "md_plain"

  /** List `dir` (recursively) on the driver, apply the reference's filter
    * chain (include glob → exclude globs → max_depth → MIME-supported) to
    * the RELATIVE paths, and load only the survivors as RawDoc rows.
    */
  def fromDirectory(
      spark: SparkSession,
      dir: String,
      pattern: String = "**/*",
      exclude: Seq[String] = Nil,
      maxDepth: Int = 0): Dataset[RawDoc] = {
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val basePath = new org.apache.hadoop.fs.Path(dir)
    val fs = basePath.getFileSystem(conf)
    val qualifiedBase = fs.makeQualified(basePath).toString.stripSuffix("/")

    val includeRe = DocOps.globToRegex(pattern).r
    val excludeRes = exclude.map(g => DocOps.globToRegex(g).r)
    val selected = scala.collection.mutable.ArrayBuffer.empty[String] // full paths
    val prefix = qualifiedBase + "/"
    // a single-file base is a one-element listing keyed by its file name
    val baseIsFile = fs.getFileStatus(basePath).isFile
    val it = fs.listFiles(basePath, /* recursive = */ true)
    while (it.hasNext) {
      val status = it.next()
      val full = status.getPath.toString
      val rel =
        if (baseIsFile && full == qualifiedBase)
          qualifiedBase.substring(qualifiedBase.lastIndexOf('/') + 1)
        else if (full.startsWith(prefix)) full.substring(prefix.length)
        else ""
      if (rel.nonEmpty) {
        val depthOk = maxDepth <= 0 || rel.count(_ == '/') <= maxDepth
        val matches = includeRe.pattern.matcher(rel).matches() &&
          !excludeRes.exists(_.pattern.matcher(rel).matches()) && depthOk &&
          DocOps.SupportedMimeTypes.contains(mimeOf(rel))
        if (matches) selected += full
      }
    }
    if (selected.isEmpty) return spark.emptyDataset[RawDoc]

    // explicit-path load: escape Hadoop glob metacharacters (a literal
    // 'report[1].md' must not be glob-expanded into PATH_NOT_FOUND) and
    // disable partition inference (key=value dir layouts must not sprout
    // partition columns or conflict)
    val isFile = baseIsFile
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(selected.toSeq.map(escapeHadoopGlob): _*)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .map { case (full, bytes) =>
        val rel =
          if (isFile) full.substring(full.lastIndexOf('/') + 1)
          else if (full.startsWith(prefix)) full.substring(prefix.length)
          else throw new IllegalStateException(
            s"scanned path '$full' is not under the qualified base '$prefix'")
        toRawDoc(rel, bytes)
      }
  }

  /** Backslash-escape Hadoop glob metacharacters so an explicit path is
    * taken literally by the DataSource path resolution.
    */
  private def escapeHadoopGlob(path: String): String =
    path.replaceAll("([\\\\\\[\\]{}*?])", "\\\\$1")

  /** Extension → MIME with EXACTLY guessMime's rule (`\.(\w+)$` on the
    * path): "v1.2/README" and "notes.md." both fall to octet-stream, so
    * this routing can never disagree with the filter chain that gates it.
    */
  def mimeOf(relPath: String): String =
    ExtRe.findFirstMatchIn(relPath)
      .flatMap(m => DocOps.ExtToMime.get(m.group(1).toLowerCase))
      .getOrElse("application/octet-stream")

  private val ExtRe = """\.(\w+)$""".r

  /** One file → one RawDoc (pure; also the unit-test surface). */
  def toRawDoc(relPath: String, bytes: Array[Byte]): RawDoc = {
    val mime = mimeOf(relPath)
    mime match {
      case "text/html" =>
        RawDoc(relPath, "html", mime,
          new String(bytes, java.nio.charset.StandardCharsets.UTF_8), Nil, Nil,
          source_path = relPath)
      case "text/markdown" | "text/plain" | "text/x-rst" | "text/x-org" =>
        val text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        RawDoc(relPath, detectDialect(text), mime, text, Nil, Nil, source_path = relPath)
      case other =>
        // no byte-level parser for this format in-engine: surfaces as a
        // failure row in extraction lineage (reference raises on
        // unsupported MIME, utils.py:49-77 — here it is an error ROW)
        RawDoc(relPath, s"unsupported:$other", other, "", Nil, Nil, source_path = relPath)
    }
  }
}
