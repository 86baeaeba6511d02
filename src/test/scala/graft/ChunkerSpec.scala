package graft

import graft.chunk.Chunkers
import graft.md.Markdown
import graft.model.{Doc, Span, SpanKind}
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference chunker fixtures and invariants
  * (tests/test_chunkers.py:25-152).
  */
class ChunkerSpec extends AnyFunSuite {

  // fixture: sectioned markdown with one image per section (test_chunkers.py:25-47)
  private val sectionedSpans = Seq(
    Span(SpanKind.Text, "# Section 1", "", 0),
    Span(SpanKind.Text, "This is some text with an image:", "", 1),
    Span(SpanKind.Image, "img1", "image1.png", 2),
    Span(SpanKind.Text, "More text here.", "", 3),
    Span(SpanKind.Text, "## Subsection", "", 4),
    Span(SpanKind.Text, "Another image here:", "", 5),
    Span(SpanKind.Image, "img2", "image2.png", 6),
    Span(SpanKind.Text, "# Section 2", "", 7),
    Span(SpanKind.Text, "Final section with the last image:", "", 8),
    Span(SpanKind.Image, "img3", "image3.png", 9))
  private val media = Seq("image1.png", "image2.png", "image3.png")
  private val sectionedDoc = Doc("doc-1", sectionedSpans)

  test("header chunker: one chunk per section, each carrying exactly its image") {
    val chunks = Chunkers.markdownChunks(sectionedDoc, maxChunkSize = 1500, mediaFiles = media)
    assert(chunks.length == 3)
    assert(chunks.map(_.header) == Seq("Section 1", "Subsection", "Section 2"))
    assert(chunks.map(_.level) == Seq(1, 2, 1))
    assert(chunks.map(_.media_refs) == Seq(Seq("image1.png"), Seq("image2.png"), Seq("image3.png")))
    assert(chunks.map(_.chunk_index) == Seq(0, 1, 2))
  }

  test("invariant: every image assigned to a chunk is referenced in its content") {
    for (maxSize <- Seq(100, 500, 1500)) {
      val chunks = Chunkers.markdownChunks(sectionedDoc, maxChunkSize = maxSize, mediaFiles = media)
      chunks.foreach { c =>
        c.media_refs.foreach { ref =>
          assert(c.content.contains(s"($ref)"), s"maxSize=$maxSize chunk=${c.chunk_index}: $ref not in content")
        }
      }
    }
  }

  test("headerless long doc falls back to size windows with overlap stride") {
    // NB: like the reference, a headerless doc yields one level-0 section with
    // an empty header, so windows carry the "\n\n" header-join prefix
    // (markdown_chunker/chunker.py:85-95 formats f"{header}\n\n{sub}").
    val longText = ("Text " * 200).trim
    val doc = Doc("doc-2", Seq(Span(SpanKind.Text, longText, "", 0)))
    val chunks = Chunkers.markdownChunks(doc, maxChunkSize = 500, chunkOverlap = 50)
    assert(chunks.length > 1)
    val windows = chunks.map(_.content.stripPrefix("\n\n"))
    assert(windows.forall(_.length <= 500))
    // stride = max - overlap: consecutive windows share `overlap` chars
    assert(windows(0).substring(450) == windows(1).substring(0, 50))
  }

  test("oversized sections window with header prefix on every sub-chunk") {
    val big = "word " * 400 // 2000 chars > 1500
    val doc = Doc("doc-3", Seq(
      Span(SpanKind.Text, "# Big", "", 0),
      Span(SpanKind.Text, big.trim, "", 1)))
    val chunks = Chunkers.markdownChunks(doc, maxChunkSize = 800, chunkOverlap = 50)
    assert(chunks.length > 1)
    assert(chunks.forall(_.content.startsWith("Big\n\n")))
    assert(chunks.forall(_.header == "Big"))
  }

  test("splitByHeaders keeps pre-header prose as a level-0 section") {
    val secs = Chunkers.splitByHeaders("intro line\n# H1\nbody\n## H2\nmore")
    assert(secs == Seq(("", "intro line", 0), ("H1", "body", 1), ("H2", "more", 2)))
  }

  test("token chunker: budget respected, line ranges 1-based, overlap applied") {
    val lines = (1 to 300).map(i => s"line $i with some words here").mkString("\n")
    val doc = Doc("doc-4", Seq(Span(SpanKind.Text, lines, "", 0)))
    val chunks = Chunkers.tokenAwareChunks(doc, maxTokensPerChunk = 700, chunkOverlapLines = 20)
    assert(chunks.length > 1)
    assert(chunks.head.start_line == 1)
    // each chunk except possibly the last stays under budget
    chunks.init.foreach(c => assert(c.token_count <= 700, s"${c.token_count}"))
    // overlap: next chunk starts `overlap` lines before previous end
    assert(chunks(1).start_line == chunks(0).end_line - 20 + 1)
    // anti-stall: chunk starts strictly increase
    assert(chunks.map(_.start_line) == chunks.map(_.start_line).sorted)
    assert(chunks.map(_.start_line).distinct.length == chunks.length)
  }

  test("token counter is deterministic and counts words plus punctuation") {
    assert(Chunkers.countTokens("hello world") == 2)
    assert(Chunkers.countTokens("hello, world!") == 4)
    assert(Chunkers.countTokens("") == 0)
    assert(Chunkers.countTokens("a-b c") == 4)
  }

  test("chunk boundaries: line-based insertion keeps all content and ordering") {
    val content = (1 to 10).map(i => s"line$i").mkString("\n")
    val chunks = Seq(
      graft.model.Chunk("d", 0, "", Nil, start_line = 1, end_line = 5),
      graft.model.Chunk("d", 1, "", Nil, start_line = 6, end_line = 10))
    val out = Chunkers.addChunkBoundaries(content, chunks)
    val lines = out.split("\n").toSeq
    assert(lines.count(_.contains("docler:chunk_boundary")) == 2)
    assert(lines.filterNot(_.contains("chunk_boundary")) == (1 to 10).map(i => s"line$i"))
    assert(lines.head.contains("\"chunk_id\":0"))
    assert(lines(6).contains("\"chunk_id\":1")) // before line6
  }

  test("chunk boundaries: no line metadata → single leading boundary") {
    val out = Chunkers.addChunkBoundaries("body text",
      Seq(graft.model.Chunk("d", 0, "body text", Nil)))
    assert(out.startsWith("<!-- docler:chunk_boundary"))
    assert(out.endsWith("body text"))
  }

  test("chunk boundary spans parse back out of the markdown stream") {
    val content = "alpha\nbeta"
    val withB = Chunkers.addChunkBoundaries(content,
      Seq(graft.model.Chunk("d", 0, content, Nil)))
    val spans = Markdown.parse(withB)
    assert(spans.head.kind == SpanKind.ChunkBoundary)
    assert(spans.head.text == """{"chunk_id":0}""")
  }
}
