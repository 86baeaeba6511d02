package graft

import graft.model.SpanKind
import graft.pipeline.Pipeline
import org.scalatest.funsuite.AnyFunSuite

/** The façade: each reference entry point drives the full path end-to-end. */
class GraftApiSpec extends AnyFunSuite {

  lazy val spark = Pipeline.session("local[4]", 4, "graft-test")

  private lazy val base: java.nio.file.Path = {
    val b = java.nio.file.Files.createTempDirectory("graft-api")
    def write(rel: String, content: String): Unit = {
      val p = b.resolve(rel)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, content.getBytes("UTF-8"))
    }
    write("a/report.md", "# Title\n\nBody paragraph.\n\n<!-- PageBreak -->\n\nPage two.")
    write("a/page.html",
      "<html><head><title>T</title></head><body><article><h1>H</h1>" +
        "<p>Content body text that survives the boilerplate strip.</p></article></body></html>")
    write("skip.bin", "\u0000\u0001 not a supported document format")
    b
  }

  test("convertDirectory: docs out, unsupported files filtered by MIME chain") {
    val docs = Graft.convertDirectory(spark, base.toString).collect()
    assert(docs.map(_.doc_id).toSet == Set("a/report.md", "a/page.html"))
    val report = docs.find(_.doc_id == "a/report.md").get
    assert(report.page_count == 2 && report.title == "report")
  }

  test("convertDirectoryWithLineage accounts every ingested doc") {
    val (docs, lineage) = Graft.convertDirectoryWithLineage(spark, base.toString)
    val rows = lineage.collect()
    assert(rows.map(_.doc_count).sum == docs.count())
    assert(rows.map(_.failure_count).sum == 0)
  }

  test("convertFiles: explicit list, missing file = failure row (dropped from docs)") {
    val ok = base.resolve("a/report.md").toString
    val docs = Graft.convertFiles(spark, Seq(ok, base.resolve("nope.md").toString)).collect()
    assert(docs.map(_.doc_id).toSeq == Seq(ok))
  }

  test("convertFile: eager single Document; failure throws like the reference") {
    val doc = Graft.convertFile(spark, base.resolve("a/page.html").toString)
    assert(doc.title == "T")
    assert(doc.spans.exists(_.text == "# H"))
    val e = intercept[IllegalArgumentException] {
      Graft.convertFile(spark, base.resolve("nope.md").toString)
    }
    assert(e.getMessage.contains("nope.md"))
  }

  test("chunk + export round the façade") {
    val docs = Graft.convertDirectory(spark, base.toString, pattern = "**/*.md")
    val chunks = Graft.chunkMarkdown(docs, maxChunkSize = 40, overlap = 10).collect()
    assert(chunks.nonEmpty && chunks.forall(_.doc_id == "a/report.md"))
    val out = java.nio.file.Files.createTempDirectory("graft-api-export")
    Graft.exportToDirectory(docs, out.toString)
    val md = out.resolve("a/report.md/document.md")
    assert(java.nio.file.Files.exists(md))
    val content = new String(java.nio.file.Files.readAllBytes(md), "UTF-8")
    assert(content.startsWith("---\ntitle: report\n"))
    assert(content.contains("docler:page_break"))
  }

  test("convertFile on a REAL reference PDF: container structure, no failure row") {
    val fixture = "/root/reference/tests/resources/pdf_sample.pdf"
    assume(new java.io.File(fixture).exists(), "reference fixtures not present")
    val doc = Graft.convertFile(spark, fixture)
    assert(doc.page_count == 4)
    assert(doc.spans.count(_.kind == SpanKind.PageBreak) == 4)
    assert(doc.title == "pdf_sample") // Info dict has no /Title → filename stem
    assert(doc.mime_type == "application/pdf")
    assert(doc.metadata("pdf_file_size") == "142786")
    assert(doc.metadata("pdf_width0") == "595.0" && doc.metadata("pdf_height0") == "842.0")
    assert(doc.metadata("pdf_encrypted") == "false")
  }

  test("convertFile on a REAL reference PDF yields CONTENT text spans (round 4)") {
    val fixture = "/root/reference/tests/resources/pdf_sample.pdf"
    assume(new java.io.File(fixture).exists(), "reference fixtures not present")
    val doc = Graft.convertFile(spark, fixture)
    val texts = doc.spans.filter(_.kind == SpanKind.Text).map(_.text)
    assert(texts.nonEmpty, "real PDFs must extract text content now")
    assert(texts.exists(_.contains("Lorem ipsum")))
    // paragraphs follow their page's break marker
    assert(doc.spans.head.kind == SpanKind.PageBreak)
  }

  test("convertFile routes the round-4 byte formats through the façade") {
    import graft.extract.{DocxExtract, EpubExtract}
    val dir = java.nio.file.Files.createTempDirectory("graft-facade-fmt")
    val docx = dir.resolve("memo.docx")
    java.nio.file.Files.write(docx, DocxExtract.buildDocx("Memo",
      Seq(DocxExtract.Para("# Subject"), DocxExtract.Para("Body line."))))
    val d1 = Graft.convertFile(spark, docx.toString)
    assert(d1.title == "Memo" && d1.spans.exists(_.text == "# Subject"))
    val epub = dir.resolve("book.epub")
    java.nio.file.Files.write(epub, EpubExtract.buildEpub("Book",
      Seq("<html><body><h1>Ch</h1><p>Enough body words for the density classifier to keep this paragraph.</p></body></html>")))
    val d2 = Graft.convertFile(spark, epub.toString)
    assert(d2.title == "Book" && d2.page_count == 1)
    graft.io.TableIO.deleteRecursively(dir.toFile)
  }

  test("a façade doc parses back span-for-span (export → Markdown.parse)") {
    val doc = Graft.convertFile(spark, base.resolve("a/report.md").toString)
    val rendered = graft.md.Markdown.render(doc.spans)
    val reparsed = graft.md.Markdown.parse(rendered)
    assert(reparsed == doc.spans)
    assert(doc.spans.head.kind == SpanKind.PageBreak)
  }
}
