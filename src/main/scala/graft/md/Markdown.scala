package graft.md

import graft.model.{Span, SpanKind}
import scala.collection.mutable.ArrayBuffer

/** Canonical docler markdown grammar: render a span stream to the markdown
  * string the reference's `export_to_directory` writes, and parse such a
  * string back into the span stream.
  *
  * Grammar evidence (reference snapshot /root/reference/tests/__snapshots__/
  * test_output.ambr):
  *   - page break comment: `<!-- docler:page_break {"next_page":N} -->`
  *     (line 17, 53); emitted with `newline_separators` newlines on each side
  *     (azure_provider/utils.py:52 uses 1, datalab_provider/utils.py:100 uses 2)
  *   - image reference: `![img-K](img-K.ext)` (line 49)
  *   - chunk boundary comment: `<!-- docler:chunk_boundary {...} -->`
  *     (chunkers/base.py:131-135)
  *   - everything else: markdown text blocks separated by blank lines
  */
object Markdown {

  private val PageBreakRe =
    """^<!--\s*docler:page_break\s*\{\s*"next_page"\s*:\s*(\d+)\s*\}\s*-->\s*$""".r
  private val ChunkBoundaryRe =
    """^<!--\s*docler:chunk_boundary\s*(\{.*\})\s*-->\s*$""".r
  private val ImageLineRe = """^!\[([^\]]*)\]\(([^)]+)\)\s*$""".r

  /** The exact page-break comment for page `n` (payload matches the golden). */
  def pageBreakMarker(n: Int): String = s"""<!-- docler:page_break {"next_page":$n} -->"""

  /** Reference `mkdown.create_page_break(next_page, newline_separators)`:
    * marker padded by `sep` newlines on each side (behavior reconstructed from
    * snapshot spacing + `.lstrip()` usage at azure_provider/utils.py:55).
    */
  def createPageBreak(nextPage: Int, newlineSeparators: Int = 1): String = {
    val pad = "\n" * newlineSeparators
    pad + pageBreakMarker(nextPage) + pad
  }

  /** Reference `mkdown.create_image_reference(id, filename)`. */
  def createImageReference(id: String, filename: String): String =
    s"![$id]($filename)"

  /** Reference `mkdown.create_chunk_boundary(chunk_id=, keywords=, extra_data=)`
    * (chunkers/base.py:131-135; mkdown is not vendored, so the payload shape is
    * a documented reconstruction): JSON object with `chunk_id`, optional
    * `keywords` array, then the extra_data entries merged at top level in
    * sorted-key order (deterministic; `chunk_id`/`keywords` never overridden).
    */
  def createChunkBoundary(
      chunkId: Int,
      keywords: Seq[String] = Nil,
      extraData: Seq[(String, String)] = Nil): String = {
    // JSON-escape; additionally '>' is unicode-escaped (legal JSON) so no payload
    // value can embed "-->" and terminate the HTML comment wrapper early, and
    // control chars are \u-escaped so the boundary stays a single line
    def js(s: String): String = "\"" + s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case '>' => "\\u003e"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val kw =
      if (keywords.isEmpty) ""
      else keywords.map(js).mkString(""","keywords":[""", ",", "]")
    val extraFields = extraData
      .filter { case (k, _) => k != "chunk_id" && k != "keywords" }
      .sortBy(_._1)
      .map { case (k, v) => s"${js(k)}:${js(v)}" }
    val ex = if (extraFields.isEmpty) "" else extraFields.mkString(",", ",", "")
    s"""<!-- docler:chunk_boundary {"chunk_id":$chunkId$kw$ex} -->"""
  }

  def pageBreakSpan(nextPage: Int, offset: Int): Span =
    Span(SpanKind.PageBreak, s"""{"next_page":$nextPage}""", "", offset)

  /** Parse a docler-canonical markdown string into the ordered span stream.
    * YAML frontmatter (if present) is skipped. Text blocks are maximal runs of
    * non-blank lines that are not marker/image lines; internal newlines are
    * preserved.
    */
  def parse(md: String): Seq[Span] = {
    var lines = md.split("\n", -1).toIndexedSeq.dropWhile(_.trim.isEmpty)
    // skip frontmatter
    if (lines.nonEmpty && lines.head.trim == "---") {
      val close = lines.indexWhere(_.trim == "---", 1)
      if (close > 0) lines = lines.drop(close + 1)
    }
    val out = ArrayBuffer.empty[Span]
    val buf = ArrayBuffer.empty[String]
    def flushText(): Unit = {
      if (buf.nonEmpty) {
        out += Span(SpanKind.Text, buf.mkString("\n"), "", out.length)
        buf.clear()
      }
    }
    // cheap prefix prechecks keep the per-line regexes off the hot path:
    // ordinary text lines (the vast majority) never touch a regex
    lines.foreach { line =>
      if (line.isEmpty || line.trim.isEmpty) flushText()
      else if (line.charAt(0) == '<' && line.startsWith("<!--")) {
        line match {
          case PageBreakRe(n) =>
            flushText(); out += pageBreakSpan(n.toInt, out.length)
          case ChunkBoundaryRe(payload) =>
            flushText(); out += Span(SpanKind.ChunkBoundary, payload, "", out.length)
          case _ => buf += line
        }
      } else if (line.charAt(0) == '!' && line.startsWith("![")) {
        line match {
          case ImageLineRe(id, file) =>
            flushText(); out += Span(SpanKind.Image, id, file, out.length)
          case _ => buf += line
        }
      } else buf += line
    }
    flushText()
    out.toSeq
  }

  /** Render a span stream back to canonical markdown (blocks joined by blank
    * lines; trailing newline as in the goldens).
    */
  def render(spans: Seq[Span]): String = {
    val blocks = spans.sortBy(_.offset).map { s =>
      s.kind match {
        case SpanKind.PageBreak =>
          val n = extractNextPage(s.text)
          pageBreakMarker(n)
        case SpanKind.Image => createImageReference(s.text, s.media_ref)
        case SpanKind.ChunkBoundary => s"<!-- docler:chunk_boundary ${s.text} -->"
        case _ => s.text
      }
    }
    blocks.mkString("", "\n\n", "\n")
  }

  /** Render with YAML frontmatter, matching the export golden shape
    * (test_output.ambr:10-15).
    */
  def renderWithFrontmatter(
      spans: Seq[Span],
      title: String,
      sourcePath: String,
      mimeType: String,
      pageCount: Int): String = {
    val fm =
      s"""---
         |title: $title
         |source_path: $sourcePath
         |mime_type: $mimeType
         |page_count: $pageCount
         |---
         |
         |""".stripMargin
    fm + render(spans)
  }

  private val NextPageRe = """"next_page"\s*:\s*(\d+)""".r

  def extractNextPage(payload: String): Int =
    NextPageRe.findFirstMatchIn(payload).map(_.group(1).toInt).getOrElse(1)

  /** page_count derivation = number of page_break spans (reference derives it
    * the same way for frontmatter, converters/base.py:215-223).
    */
  def pageCount(spans: Seq[Span]): Int = {
    val n = spans.count(_.kind == SpanKind.PageBreak)
    if (n == 0) 1 else n
  }
}
