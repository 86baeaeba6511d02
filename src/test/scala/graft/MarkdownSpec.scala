package graft

import graft.md.Markdown
import graft.model.{Span, SpanKind}
import org.scalatest.funsuite.AnyFunSuite

class MarkdownSpec extends AnyFunSuite {

  test("page break marker grammar matches the golden form") {
    assert(Markdown.pageBreakMarker(3) == """<!-- docler:page_break {"next_page":3} -->""")
    assert(Markdown.createPageBreak(2, 2) == "\n\n" + Markdown.pageBreakMarker(2) + "\n\n")
    assert(Markdown.createImageReference("img-0", "img-0.png") == "![img-0](img-0.png)")
  }

  test("parse extracts page breaks, images and text blocks in order") {
    val md =
      """<!-- docler:page_break {"next_page":1} -->
        |# Title
        |
        |Paragraph line one
        |line two.
        |
        |![img-0](img-0.png)
        |
        |<!-- docler:page_break {"next_page":2} -->
        |
        |Last block.
        |""".stripMargin
    val spans = Markdown.parse(md)
    assert(spans.map(_.kind) == Seq(
      SpanKind.PageBreak, SpanKind.Text, SpanKind.Text, SpanKind.Image,
      SpanKind.PageBreak, SpanKind.Text))
    assert(spans.map(_.offset) == (0 until 6))
    assert(spans(1).text == "# Title")
    assert(spans(2).text == "Paragraph line one\nline two.")
    assert(spans(3).media_ref == "img-0.png")
    assert(Markdown.extractNextPage(spans(4).text) == 2)
  }

  test("parse skips YAML frontmatter") {
    val md = "---\ntitle: x\n---\n\nHello.\n"
    val spans = Markdown.parse(md)
    assert(spans == Seq(Span(SpanKind.Text, "Hello.", "", 0)))
  }

  test("render/parse round-trips an arbitrary span stream") {
    val spans = Seq(
      Markdown.pageBreakSpan(1, 0),
      Span(SpanKind.Text, "# Header", "", 1),
      Span(SpanKind.Text, "Multi\nline\nblock", "", 2),
      Span(SpanKind.Image, "img-0", "img-0.jpeg", 3),
      Markdown.pageBreakSpan(2, 4),
      Span(SpanKind.Text, "| a | b |\n| --- | --- |\n| 1 | 2 |", "", 5))
    assert(Markdown.parse(Markdown.render(spans)) == spans)
  }

  // ---- golden fixtures from the reference snapshot suite -------------------

  for ((provider, golden) <- AmbrGoldens.markdownGoldens) {
    test(s"golden[$provider]: parses to a non-empty canonical span stream") {
      val spans = Markdown.parse(golden)
      assert(spans.nonEmpty)
      // page breaks numbered 1..page_count in order
      val pages = spans.filter(_.kind == SpanKind.PageBreak)
        .map(s => Markdown.extractNextPage(s.text))
      assert(pages == (1 to pages.length), s"page numbering broken: $pages")
      // frontmatter page_count matches the span-derived count
      val fmCount = AmbrGoldens.frontmatterField(golden, "page_count").map(_.toInt)
      assert(fmCount.contains(Markdown.pageCount(spans)))
      // every image span is a normalized img-K ref
      spans.filter(_.kind == SpanKind.Image).foreach { s =>
        assert(s.media_ref.matches("""img-\d+\.\w+"""), s.media_ref)
      }
    }

    test(s"golden[$provider]: render → parse round-trips span-for-span") {
      val spans = Markdown.parse(golden)
      val roundTripped = Markdown.parse(Markdown.render(spans))
      assert(roundTripped == spans)
    }

    test(s"golden[$provider]: image spans match the exported files_list") {
      val filesKey = s"test_${provider}_export[files_list]"
      AmbrGoldens.goldens.get(filesKey).foreach { filesGolden =>
        val files = """'([^']+)'""".r.findAllMatchIn(filesGolden).map(_.group(1))
          .filterNot(_ == "document.md").toSet
        val refs = Markdown.parse(golden).filter(_.kind == SpanKind.Image)
          .map(_.media_ref).toSet
        assert(refs == files)
      }
    }
  }
}
