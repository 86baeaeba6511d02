package graft

import graft.extract.{HtmlExtract, PageRange, PdfLayout}
import graft.model.{PdfElement, SpanKind}
import org.scalatest.funsuite.AnyFunSuite

class PageRangeSpec extends AnyFunSuite {
  // mirrors tests/test_pdf_utils.py:15-46
  test("parses single ranges, lists and mixed forms") {
    assert(PageRange.parse("1-3") == Set(1, 2, 3))
    assert(PageRange.parse("1-3,5,7-9") == Set(1, 2, 3, 5, 7, 8, 9))
    assert(PageRange.parse("4") == Set(4))
  }
  test("shift applies to every element") {
    assert(PageRange.parse("1-3", shift = -1) == Set(0, 1, 2))
    assert(PageRange.shiftRange("1-3", -1) == "0-2")
    assert(PageRange.shiftRange("1-3,5,7-9", 2) == "3-5,7,9-11")
  }
  test("malformed input raises") {
    intercept[IllegalArgumentException](PageRange.parse("invalid"))
    intercept[IllegalArgumentException](PageRange.parse("1-2-3"))
  }
  test("negative shift below zero raises Invalid shift") {
    val e = intercept[IllegalArgumentException](PageRange.shiftRange("1-3", -2))
    assert(e.getMessage.contains("Invalid shift"))
  }
  test("property: shift round-trips (seeded sweep)") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val start = rnd.nextInt(50)
      val len = 1 + rnd.nextInt(20)
      val shift = 1 + rnd.nextInt(10)
      val r = s"$start-${start + len},${start + len + 2}"
      assert(PageRange.shiftRange(PageRange.shiftRange(r, shift), -shift) == r)
      assert(PageRange.parse(r, shift) == PageRange.parse(r).map(_ + shift))
    }
  }
}

class HtmlExtractSpec extends AnyFunSuite {
  private val page =
    """<html><head><title>Site</title><script>var x=1;</script>
      |<style>.a{color:red}</style></head><body>
      |<header><a href="/">Logo</a><a href="/l">Login</a></header>
      |<nav><ul><li><a href="/1">One</a></li><li><a href="/2">Two</a></li></ul></nav>
      |<main><article>
      |<h1>The Main Headline Of The Article</h1>
      |<p>First paragraph with a decent amount of running text so the density
      |classifier keeps it as main content without hesitation.</p>
      |<p>Second paragraph also has plenty of text. It contains an
      |<a href="/ref">inline reference link</a> but is dominated by prose.</p>
      |<img src="figures/plot.png" alt="plot">
      |<ul><li>first meaningful bullet item</li><li>second meaningful bullet item</li></ul>
      |<table><tr><th>name</th><th>value</th></tr><tr><td>alpha</td><td>1</td></tr>
      |<tr><td>beta</td><td>2</td></tr></table>
      |</article></main>
      |<aside><a href="/x">Related 1</a><a href="/y">Related 2</a></aside>
      |<footer><p><a href="/tos">Terms</a> | <a href="/priv">Privacy</a></p></footer>
      |</body></html>""".stripMargin

  test("keeps article content, drops nav/header/footer/aside boilerplate") {
    val ex = HtmlExtract.extract(page)
    val texts = ex.spans.filter(_.kind == SpanKind.Text).map(_.text)
    assert(texts.exists(_.startsWith("# The Main Headline")))
    assert(texts.exists(_.contains("First paragraph")))
    assert(texts.exists(_.contains("inline reference link")))
    assert(texts.count(_.startsWith("- ")) == 2)
    assert(!texts.exists(_.contains("Login")))
    assert(!texts.exists(_.contains("Terms")))
    assert(!texts.exists(_.contains("Related 1")))
    assert(!texts.exists(t => t == "One" || t == "Two"))
    assert(!texts.exists(_.contains("var x=1")))
  }

  test("lifts images to normalized img-K refs with sidecar rows") {
    val ex = HtmlExtract.extract(page)
    val imgs = ex.spans.filter(_.kind == SpanKind.Image)
    assert(imgs.map(_.media_ref) == Seq("img-0.png"))
    assert(ex.images.map(_.mime_type) == Seq("image/png"))
  }

  test("renders tables as pipe tables") {
    val ex = HtmlExtract.extract(page)
    val table = ex.spans.map(_.text).find(_.startsWith("|")).getOrElse("")
    assert(table.startsWith("| name | value |"))
    assert(table.contains("| alpha | 1 |"))
    assert(table.split("\n")(1) == "| --- | --- |")
  }

  test("a pure link-farm page yields no text spans") {
    val farm = "<body><div>" +
      (1 to 30).map(i => s"""<a href="/$i">link number $i</a>""").mkString(" ") +
      "</div></body>"
    val ex = HtmlExtract.extract(farm)
    assert(ex.spans.isEmpty)
  }

  test("offsets are contiguous and ordered") {
    val ex = HtmlExtract.extract(page)
    assert(ex.spans.map(_.offset) == ex.spans.indices)
  }

  test("entities are decoded") {
    val ex = HtmlExtract.extract("<body><p>Fish &amp; chips &lt;now&gt; for &quot;two&quot;</p></body>")
    assert(ex.spans.head.text == "Fish & chips <now> for \"two\"")
  }

  test("blockquote renders with > prefix; pre keeps verbatim text in fences") {
    val ex = HtmlExtract.extract(
      "<body><blockquote>quoted wisdom of the ancients</blockquote>" +
        "<pre>val x = 1\n  val y = 2</pre></body>")
    val texts = ex.spans.map(_.text)
    assert(texts.contains("> quoted wisdom of the ancients"))
    assert(texts.contains("```\nval x = 1\n  val y = 2\n```"))
  }
}

class PdfLayoutSpec extends AnyFunSuite {
  test("two-column page reads left column then right column") {
    val elems = Seq(
      PdfElement(1, 300, 100, 240, 50, "text", "R1"),
      PdfElement(1, 40, 100, 240, 50, "text", "L1"),
      PdfElement(1, 40, 200, 240, 50, "text", "L2"),
      PdfElement(1, 300, 200, 240, 50, "text", "R2"))
    val out = PdfLayout.ordered(elems).map(_.text)
    assert(out == Seq("L1", "L2", "R1", "R2"))
  }

  test("full-width title precedes columns; later full-width block splits sections") {
    val elems = Seq(
      PdfElement(1, 40, 500, 520, 40, "text", "FOOTER-WIDE"),
      PdfElement(1, 40, 100, 240, 300, "text", "L"),
      PdfElement(1, 300, 100, 240, 300, "text", "R"),
      PdfElement(1, 40, 20, 520, 30, "text", "TITLE"))
    val out = PdfLayout.ordered(elems).map(_.text)
    assert(out == Seq("TITLE", "L", "R", "FOOTER-WIDE"))
  }

  test("layout emits page breaks per page and doc-wide img-K numbering") {
    val elems = Seq(
      PdfElement(1, 0, 0, 100, 10, "text", "p1 text"),
      PdfElement(1, 0, 20, 100, 10, "image", ""),
      PdfElement(2, 0, 0, 100, 10, "image", ""),
      PdfElement(2, 0, 20, 100, 10, "text", "p2 text"))
    val laid = PdfLayout.layout(elems)
    assert(laid.spans.map(_.kind) == Seq(
      SpanKind.PageBreak, SpanKind.Text, SpanKind.Image,
      SpanKind.PageBreak, SpanKind.Image, SpanKind.Text))
    assert(laid.spans.filter(_.kind == SpanKind.Image).map(_.media_ref) ==
      Seq("img-0.png", "img-1.png"))
    assert(laid.spans.map(_.offset) == (0 until 6))
  }

  test("runs on one visual line with jittered baselines sort left to right") {
    val elems = Seq(
      PdfElement(1, 200, 101.5, 80, 12, "text", "B"),
      PdfElement(1, 40, 100.2, 80, 12, "text", "A"),
      PdfElement(1, 360, 99.1, 80, 12, "text", "C"))
    // single section, one band (they overlap when merged? no — disjoint x):
    // three bands left→right; each has one element
    assert(PdfLayout.ordered(elems).map(_.text) == Seq("A", "B", "C"))
  }
}
