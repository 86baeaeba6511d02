package graft

import graft.extract.{NormImage, Normalize}
import graft.md.Markdown
import graft.model.SpanKind
import org.scalatest.funsuite.AnyFunSuite

/** Verifies the dialect normalizers reproduce the reference goldens
  * span-for-span: each golden is inverse-transformed back into the provider's
  * raw dialect (the exact provider marker forms the reference rewrites), run
  * through our normalizer, and compared as `(kind, text, media_ref, order)`
  * span sequences — the BASELINE.json invariant.
  */
class NormalizeSpec extends AnyFunSuite {

  private val MarkerRe = """<!-- docler:page_break \{"next_page":(\d+)\} -->""".r

  private def goldenSpans(provider: String) =
    AmbrGoldens.markdownGoldens.get(provider).map(g => Markdown.parse(g))

  // ----------------------------------------------------------------- azure

  test("azure dialect: PageBreak renumber + figure lift reproduce the golden") {
    assume(AmbrGoldens.available)
    val golden = AmbrGoldens.body(AmbrGoldens.markdownGoldens("azure"))
    // inverse transform: drop the leading page-1 marker, turn the rest back
    // into azure's raw `<!-- PageBreak -->`, images back into <figure> blocks
    var raw = MarkerRe.replaceAllIn(golden,
      m => if (m.group(1).toInt == 1) "" else "<!-- PageBreak -->")
    val nImages = """!\[img-\d+\]\(img-\d+\.png\)""".r.findAllIn(raw).length
    raw = """!\[img-\d+\]\(img-\d+\.png\)""".r
      .replaceAllIn(raw, "<figure>\nsome figure caption\n</figure>")
    val figures = (0 until nImages).map(i => NormImage(s"img-$i", s"img-$i.png", "image/png", ""))

    val normalized = Normalize.azure(raw, figures)
    assert(normalized.spans == Markdown.parse(golden))
    assert(normalized.images.map(_.filename) == figures.map(_.filename))
  }

  // ---------------------------------------------------------------- docling

  test("docling dialect: PageBreak renumber + <!-- image --> lift reproduce the golden") {
    assume(AmbrGoldens.available)
    val golden = AmbrGoldens.body(AmbrGoldens.markdownGoldens("docling"))
    var raw = MarkerRe.replaceAllIn(golden,
      m => if (m.group(1).toInt == 1) "" else "<!-- PageBreak -->")
    val nImages = """!\[img-\d+\]\(img-\d+\.png\)""".r.findAllIn(raw).length
    raw = """!\[img-\d+\]\(img-\d+\.png\)""".r.replaceAllIn(raw, "<!-- image -->")

    val normalized = Normalize.docling(raw, nImages)
    assert(normalized.spans == Markdown.parse(golden))
  }

  // ---------------------------------------------------------------- datalab

  test("datalab dialect: {N}---- pagination + image rename map reproduce the golden") {
    assume(AmbrGoldens.available)
    val golden = AmbrGoldens.body(AmbrGoldens.markdownGoldens("datalab"))
    // markers back to datalab's 0-based `{N}------` form
    var raw = MarkerRe.replaceAllIn(golden,
      m => s"\n\n{${m.group(1).toInt - 1}}------------------------------------------------\n\n")
    // images back to provider-original names with empty alt
    val exts = """!\[img-(\d+)\]\(img-\d+\.(\w+)\)""".r.findAllMatchIn(raw)
      .map(m => m.group(1).toInt -> m.group(2)).toMap
    val origNames = (0 until exts.size).map(i => s"_page_${i}_fig.${exts(i)}")
    raw = """!\[img-(\d+)\]\(img-\d+\.(\w+)\)""".r
      .replaceAllIn(raw, m => s"![](_page_${m.group(1)}_fig.${m.group(2)})")

    val normalized = Normalize.datalab(raw, origNames)
    assert(normalized.spans == Markdown.parse(golden))
    assert(normalized.images.map(_.filename) == (0 until exts.size).map(i => s"img-$i.${exts(i)}"))
  }

  // ------------------------------------------------------- mistral (pages)

  test("per-page assembly reproduces the mistral golden from page parts") {
    assume(AmbrGoldens.available)
    val golden = AmbrGoldens.body(AmbrGoldens.markdownGoldens("mistral"))
    // inverse: split the golden at its markers into per-page markdown parts
    val parts = MarkerRe.split(golden).map(_.trim).filter(_.nonEmpty).toSeq
    val normalized = Normalize.pages(parts)
    assert(normalized.spans == Markdown.parse(golden))
  }

  test("per-page assembly reproduces the llamaparse golden from page parts") {
    assume(AmbrGoldens.available)
    val golden = AmbrGoldens.body(AmbrGoldens.markdownGoldens("llamaparse"))
    val parts = MarkerRe.split(golden).map(_.trim).filter(_.nonEmpty).toSeq
    val normalized = Normalize.pages(parts)
    assert(normalized.spans == Markdown.parse(golden))
  }

  // ---------------------------------------------------------------- upstage

  test("upstage dialect: anchor-based insertion reproduces the golden") {
    assume(AmbrGoldens.available)
    val golden = AmbrGoldens.body(AmbrGoldens.markdownGoldens("upstage"))
    val spans = Markdown.parse(golden)
    // inverse: strip all markers; the anchor for page N is the first text
    // block after its marker
    val raw = MarkerRe.replaceAllIn(golden, "").replaceAll("^\\s+", "")
    val anchors = spans.zipWithIndex.collect {
      case (s, i) if s.kind == SpanKind.PageBreak && Markdown.extractNextPage(s.text) > 1 =>
        val anchor = spans.drop(i + 1).find(_.kind == SpanKind.Text).map(_.text).getOrElse("")
        Markdown.extractNextPage(s.text) -> Seq(anchor)
    }
    val normalized = Normalize.upstage(raw, anchors)
    assert(normalized.spans == spans)
  }

  test("upstage placeholder images are replaced first-come with img-K refs") {
    val raw = "Intro text.\n\n![image](/image/placeholder)\n\nMore.\n\n![image](/image/placeholder)"
    val n = Normalize.upstage(raw, Nil, Seq("image/png", "image/jpeg"))
    val imgs = n.spans.filter(_.kind == SpanKind.Image)
    assert(imgs.map(_.media_ref) == Seq("img-0.png", "img-1.jpeg"))
    assert(n.images.map(_.mime_type) == Seq("image/png", "image/jpeg"))
  }

  // ------------------------------------------------------------ markitdown

  test("slide markers map to page breaks with the slide's own number") {
    val raw = "<!-- Slide number: 1 -->\n# S1\n\n<!-- Slide number: 2 -->\n# S2"
    val spans = Normalize.slides(raw).spans
    assert(spans.map(_.kind) == Seq(
      SpanKind.PageBreak, SpanKind.Text, SpanKind.PageBreak, SpanKind.Text))
    assert(spans.filter(_.kind == SpanKind.PageBreak)
      .map(s => Markdown.extractNextPage(s.text)) == Seq(1, 2))
  }

  // ---------------------------------------------------------- docling-remote

  test("data-URI images are lifted to sidecar img-K refs") {
    val b64 = java.util.Base64.getEncoder.encodeToString("fake".getBytes)
    val raw = s"Text before.\n\n![chart](data:image/png;base64,$b64)\n\n![](data:image/jpeg;base64,$b64)"
    val n = Normalize.dataUriImages(raw)
    assert(n.images.map(_.filename) == Seq("img-0.png", "img-1.jpeg"))
    assert(n.images.head.content_b64 == b64)
    val spans = n.spans
    assert(spans(1) == graft.model.Span(SpanKind.Image, "chart", "img-0.png", 1))
    assert(spans(2) == graft.model.Span(SpanKind.Image, "img-1", "img-1.jpeg", 2))
  }

  test("azure golden page count survives normalization") {
    assume(AmbrGoldens.available)
    for (p <- Seq("azure", "datalab", "mistral", "upstage", "docling", "llamaparse")) {
      val g = AmbrGoldens.markdownGoldens(p)
      val fm = AmbrGoldens.frontmatterField(g, "page_count").map(_.toInt)
      assert(fm.contains(Markdown.pageCount(Markdown.parse(g))), s"provider=$p")
    }
  }
}
