package graft.chunk

import graft.md.Markdown
import graft.model.{Chunk, Doc}
import scala.collection.mutable.ArrayBuffer

/** Chunking stages: 1 document row → N ordered chunk rows. Spark shape is a
  * `flatMap` over `Dataset[Doc]` (the Generator/UDTF analog) — see
  * Pipeline.chunk. Algorithms re-express the reference chunkers:
  * markdown_chunker/chunker.py:20-106 and token_chunker/chunker.py:39-136.
  */
object Chunkers {

  private val ImageRefRe = """!\[([^\]]*)\]\(([^)]+)\)""".r
  private val HeaderRe = """^(#{1,6})\s+(.+)$""".r
  private val LineBreakRe = java.util.regex.Pattern.compile(
    "\\r\\n|[\\n\\r\\x0B\\f\\x1C\\x1D\\x1E\\x85\\u2028\\u2029]")

  /** Python `splitlines()`-compatible split over the FULL separator set
    * (`\r\n`, `\n`, `\r`, `\v`, `\f`, FS/GS/RS `\x1c`-`\x1e`, NEL `\x85`,
    * LS/PS `\u2028`/`\u2029`): the reference chunkers split with
    * `splitlines()`, so externally-ingested markdown containing form feeds
    * or Unicode line separators must chunk identically (internally rendered
    * markdown only ever emits `\n`).
    */
  private def splitLines(text: String): Array[String] = LineBreakRe.split(text, -1)

  /** Images referenced in a chunk's content, in reference order
    * (markdown_chunker/utils.py:15-31): every `![alt](path)` whose path is a
    * known media filename.
    */
  def assignImages(content: String, mediaFiles: Seq[String]): Seq[String] = {
    val known = mediaFiles.toSet
    ImageRefRe.findAllMatchIn(content).map(_.group(2)).filter(known.contains).toSeq
  }

  /** Header-based sections: (header, content, level); text before the first
    * header yields header=""/level=0; empty sections are skipped
    * (markdown_chunker/utils.py:34-63).
    */
  def splitByHeaders(text: String): Seq[(String, String, Int)] = {
    if (text.isEmpty) return Nil // "".splitlines() == [] in the reference
    val out = ArrayBuffer.empty[(String, String, Int)]
    var header = ""
    var level = 0
    val content = ArrayBuffer.empty[String]
    splitLines(text).foreach {
      case HeaderRe(hashes, title) =>
        if (content.nonEmpty) { out += ((header, content.mkString("\n"), level)); content.clear() }
        level = hashes.length
        header = title
      case line => content += line
    }
    if (content.nonEmpty) out += ((header, content.mkString("\n"), level))
    out.toSeq
  }

  /** Header-based chunker with size fallback (markdown_chunker/chunker.py:
    * 20-106): sections longer than `maxChunkSize` are windowed with stride
    * `max - overlap`, each window prefixed by its header.
    */
  def markdownChunks(
      doc: Doc,
      maxChunkSize: Int = 1500,
      chunkOverlap: Int = 50,
      mediaFiles: Seq[String] = Nil): Seq[Chunk] = {
    require(chunkOverlap < maxChunkSize,
      s"chunkOverlap ($chunkOverlap) must be < maxChunkSize ($maxChunkSize): " +
        "the window stride is their difference")
    val content = Markdown.render(doc.spans).stripSuffix("\n")
    val media = if (mediaFiles.nonEmpty) mediaFiles
      else doc.spans.filter(_.kind == graft.model.SpanKind.Image).map(_.media_ref)
    val chunks = ArrayBuffer.empty[Chunk]

    def fallback(text: String): Iterator[String] = new Iterator[String] {
      private var start = 0
      def hasNext: Boolean = start < text.length
      def next(): String = {
        val s = text.substring(start, math.min(start + maxChunkSize, text.length))
        start += maxChunkSize - chunkOverlap
        s
      }
    }

    val sections = splitByHeaders(content)
    if (sections.isEmpty) {
      fallback(content).foreach { sub =>
        chunks += Chunk(doc.doc_id, chunks.length, sub, assignImages(sub, media))
      }
    } else {
      sections.foreach { case (header, sec, level) =>
        if (sec.length > maxChunkSize) {
          fallback(sec).foreach { sub =>
            chunks += Chunk(doc.doc_id, chunks.length, s"$header\n\n$sub",
              assignImages(sub, media), header, level)
          }
        } else {
          chunks += Chunk(doc.doc_id, chunks.length, s"$header\n\n$sec",
            assignImages(sec, media), header, level)
        }
      }
    }
    chunks.toSeq
  }

  /** Deterministic token estimate standing in for the reference's external
    * tokenizer (token_chunker/chunker.py:21-36 calls tokonomics): whitespace
    * words plus standalone punctuation runs — stable across JVMs.
    */
  def countTokens(text: String): Int = {
    var tokens = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c.isLetterOrDigit) {
        tokens += 1
        while (i < n && text.charAt(i).isLetterOrDigit) i += 1
      } else {
        tokens += 1
        i += 1
      }
    }
    tokens
  }

  /** Greedy line-accretion until the token budget, line overlap between
    * chunks, anti-stall guard (token_chunker/chunker.py:81-136).
    */
  def tokenAwareChunks(
      doc: Doc,
      maxTokensPerChunk: Int = 4000,
      chunkOverlapLines: Int = 20,
      mediaFiles: Seq[String] = Nil): Seq[Chunk] = {
    val content = Markdown.render(doc.spans).stripSuffix("\n")
    val media = if (mediaFiles.nonEmpty) mediaFiles
      else doc.spans.filter(_.kind == graft.model.SpanKind.Image).map(_.media_ref)
    val lines = splitLines(content)
    // round-6: per-line token counts once, accreted incrementally — the
    // token count of newline-joined lines is exactly the sum of the lines'
    // counts (every separator is whitespace, so no token can straddle a
    // join), which turns the greedy loop's O(chunk²) re-count of the
    // growing chunk into O(chunk); values are unchanged (ChunkerSpec
    // goldens + the q_chunk_tokens oracle pin this).
    val lineTokens = lines.map(countTokens)
    val chunks = ArrayBuffer.empty[Chunk]
    var startIdx = 0
    var lastStartLine = -1
    while (startIdx < lines.length) {
      var endIdx = math.min(startIdx + 100, lines.length)
      var tokens = 0
      var i = startIdx
      while (i < endIdx) { tokens += lineTokens(i); i += 1 }
      while (endIdx < lines.length &&
             tokens < maxTokensPerChunk - lineTokens(endIdx)) {
        tokens += lineTokens(endIdx)
        endIdx += 1
      }
      val current = lines.slice(startIdx, endIdx).mkString("\n")
      val imgs = media.filter(f => f.nonEmpty && current.contains(f))
      chunks += Chunk(doc.doc_id, chunks.length, current, imgs,
        start_line = startIdx + 1, end_line = endIdx, token_count = tokens)
      lastStartLine = startIdx + 1
      startIdx = endIdx - chunkOverlapLines
      if (startIdx <= lastStartLine - 1) startIdx = lastStartLine + 50
      if (startIdx >= lines.length) startIdx = lines.length
    }
    chunks.toSeq
  }

  /** Insert `chunk_boundary` comments into the document content at chunk
    * starts (chunkers/base.py:99-223): line-number-based insertion when
    * chunks carry start/end lines, else a single leading boundary.
    */
  def addChunkBoundaries(content: String, chunks: Seq[Chunk]): String = {
    if (chunks.isEmpty) return content
    val sorted = chunks.sortBy(c => if (c.start_line > 0) c.start_line else c.chunk_index)
    // the reference injects keywords AND the chunk's remaining metadata as
    // extra_data (chunkers/base.py:131-135,148-156) — start/end line and
    // token_count are structural, not payload, and are excluded there too
    def boundary(c: Chunk): String =
      Markdown.createChunkBoundary(c.chunk_index, c.keywords, c.extra_data.toSeq)
    val first = sorted.head
    if (first.start_line <= 0) {
      // no line metadata: boundary for the first chunk at the very top
      boundary(first) + "\n" + content
    } else {
      val lines = splitLines(content)
      val out = ArrayBuffer.empty[String]
      sorted.zipWithIndex.foreach { case (c, i) =>
        val startIdx = math.max(0, c.start_line - 1)
        if (i == 0) out ++= lines.take(startIdx)
        out += boundary(c)
        if (i == sorted.length - 1) out ++= lines.drop(startIdx)
        else {
          val nextStart = math.max(0, sorted(i + 1).start_line - 1)
          out ++= lines.slice(startIdx, nextStart)
        }
      }
      out.mkString("\n")
    }
  }
}
