package graft

import graft.chunk.Chunkers
import graft.extract.{HtmlExtract, Normalize, PdfLayout}
import graft.md.Markdown
import graft.model.{Doc, PdfElement}

/** Small CLI driving the library through its public API — used by the verify
  * recipe (.claude/skills/verify) to observe extraction end-to-end without
  * Spark. Usage: sbt "Test/runMain graft.Demo".
  */
object Demo {
  def main(args: Array[String]): Unit = {
    // 1. dialect normalization on a raw azure-style payload
    val raw =
      """# Quarterly report
        |
        |Revenue grew in all segments.
        |<!-- PageBreak -->
        |<figure>chart of revenue</figure>
        |
        |Costs were flat.
        |""".stripMargin
    val figs = Seq(graft.extract.NormImage("img-0", "img-0.png", "image/png", ""))
    val normalized = Normalize.azure(raw, figs)
    println("== azure-dialect normalization ==")
    normalized.spans.foreach(s => println(f"  ${s.offset}%2d ${s.kind}%-11s ${s.media_ref}%-10s ${s.text.linesIterator.next()}"))

    // 2. HTML boilerplate strip
    val html =
      """<html><head><title>t</title><style>p{}</style></head><body>
        |<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav>
        |<article><h1>Main headline</h1>
        |<p>This is the real article body with enough text to count as content.</p>
        |<img src="hero.jpg" alt="hero"/>
        |<ul><li>first bullet point of the story</li><li>second bullet point</li></ul>
        |<table><tr><th>k</th><th>v</th></tr><tr><td>a</td><td>1</td></tr></table>
        |</article>
        |<footer><a href="/tos">Terms</a> <a href="/priv">Privacy</a></footer>
        |</body></html>""".stripMargin
    println("== html extraction (boilerplate stripped) ==")
    val extracted = HtmlExtract.extract(html)
    extracted.spans.foreach(s => println(f"  ${s.offset}%2d ${s.kind}%-11s ${s.media_ref}%-10s ${s.text.linesIterator.next()}"))

    // 3. PDF layout reading order (two columns + image)
    val elements = Seq(
      PdfElement(1, 50, 40, 500, 20, "text", "# Full-width title"),
      PdfElement(1, 50, 100, 200, 400, "text", "Left column paragraph."),
      PdfElement(1, 320, 100, 200, 180, "text", "Right column paragraph."),
      PdfElement(1, 320, 300, 200, 150, "image", ""),
      PdfElement(2, 50, 60, 470, 600, "text", "Second page body."))
    println("== pdf layout (reading order) ==")
    val laid = PdfLayout.layout(elements)
    laid.spans.foreach(s => println(f"  ${s.offset}%2d ${s.kind}%-11s ${s.media_ref}%-10s ${s.text.linesIterator.nextOption().getOrElse("")}"))

    // 4. chunking the extracted doc
    val doc = Doc("demo-1", laid.spans)
    println("== markdown chunks ==")
    Chunkers.markdownChunks(doc, maxChunkSize = 120, chunkOverlap = 20).foreach { c =>
      println(f"  chunk ${c.chunk_index} header='${c.header}' media=${c.media_refs.mkString(",")} len=${c.content.length}")
    }

    // 5. round-2 features: document assembly (title/metadata/media sidecar)
    // through the full extractOne path, plus the REAL image codec
    val datauri = graft.io.SyntheticDocs.generate(seed = 42L,
      (0L until 500L).find(i => graft.io.SyntheticDocs.payloadKindFor(i) == "md_datauri").get)
    val assembled = graft.pipeline.Pipeline.extractOne(datauri.raw)
    println("== document assembly (data-URI doc) ==")
    println(s"  title=${assembled.title} source_path=${assembled.source_path}")
    assembled.media.foreach(m => println(
      s"  media ${m.media_ref} ${m.mime_type} payload=${new String(m.content, "UTF-8")}"))
    val azureDoc = graft.pipeline.Pipeline.extractOne(
      graft.model.RawDoc("demo-az", "md_azure", "application/pdf", raw, Nil, Nil))
    println(s"  cost metadata (azure): ${azureDoc.metadata.toSeq.sorted.mkString(", ")}")

    println("== real image codec (javax.imageio) ==")
    val img = new java.awt.image.BufferedImage(48, 24, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2 = img.createGraphics(); g2.setColor(java.awt.Color.GRAY); g2.fillRect(0, 0, 48, 24); g2.dispose()
    val pngBytes = { val b = new java.io.ByteArrayOutputStream(); javax.imageio.ImageIO.write(img, "png", b); b.toByteArray }
    val (w, h, ch, luma, phash) = graft.ops.Multimodal.ImageIoCodec.decode("image/png", pngBytes)
    println(f"  decoded ${w}x$h channels=$ch mean_luma=$luma%.4f dhash=$phash%016x")

    println("== from-scratch VP8L (WebP lossless) codec ==")
    val argb = Array.tabulate(32 * 16)(i => 0xFF000000 | (i % 251) * 65793)
    val webp = graft.extract.WebpL.encode(argb, 32, 16)
    val (wpx, ww, wh) = graft.extract.WebpL.decode(webp)
    println(s"  encoded ${webp.length} bytes, round-trip ${ww}x$wh " +
      s"exact=${wpx.toSeq == argb.toSeq} container=${new String(webp, 12, 4, "ISO-8859-1")}")

    println("== CCITT fax codecs (G4 /K<0, G3 /K=0 and /K>0) ==")
    val fax = Array.tabulate(64 * 8)(i => if ((i % 64) / 8 % 2 == 0) 1.toByte else 0.toByte)
    val g4 = graft.extract.CcittG4.encode(fax, 64, 8)
    val g3 = graft.extract.CcittG4.encodeG3(fax, 64, 8, 4)
    println(s"  G4 ${g4.length}B exact=${graft.extract.CcittG4.decode(g4, 64, 8).toSeq == fax.toSeq}  " +
      s"G3/K=4 ${g3.length}B exact=${graft.extract.CcittG4.decodeG3(g3, 64, 8, 4).toSeq == fax.toSeq}")

    // 6. the Graft façade end-to-end on real files (convert_directory shape)
    {
      val b = java.nio.file.Files.createTempDirectory("graft-demo")
      java.nio.file.Files.write(b.resolve("note.md"),
        "# Facade demo\n\nOne paragraph.\n\n<!-- PageBreak -->\n\nPage two.".getBytes("UTF-8"))
      val spark = graft.pipeline.Pipeline.session("local[2]", 2, "graft-demo")
      spark.sparkContext.setLogLevel("ERROR")
      try {
        val docs = Graft.convertDirectory(spark, b.toString)
        val doc = docs.collect().head
        println(s"== Graft.convertDirectory: ${doc.doc_id} pages=${doc.page_count} " +
          s"chunks=${Graft.chunkMarkdown(docs).count()} ==")
      } finally spark.stop()
    }

    // 6b. byte-real PDF family over the reference's REAL fixture
    val fixture = new java.io.File("/root/reference/tests/resources/pdf_sample.pdf")
    if (fixture.exists()) {
      val bytes = java.nio.file.Files.readAllBytes(fixture.toPath)
      val info = Graft.pdfInfo(bytes).fold(sys.error, identity)
      println(s"== pdf_sample.pdf: pages=${info.pageCount} " +
        s"dims=${info.pageDims.head.width}x${info.pageDims.head.height} " +
        s"encrypted=${info.isEncrypted} ==")
      val sub = Graft.extractPdfPages(bytes, Seq(0, 2)).fold(sys.error, identity)
      val subInfo = Graft.pdfInfo(sub).fold(sys.error, identity)
      println(s"== extractPdfPages(0,2): ${subInfo.pageCount} pages, ${sub.length} bytes ==")
      val enc = graft.extract.PdfBytes.buildPdf(
        Seq((200.0, 300.0)), "demo secret", "demo author", Some(("pw", 4)))
      val dec = Graft.decryptPdf(enc, "pw").fold(sys.error, identity)
      val decInfo = Graft.pdfInfo(dec).fold(sys.error, identity)
      println(s"== AES-128 decrypt round-trip: title='${decInfo.title}' " +
        s"encrypted=${decInfo.isEncrypted} ==")
    }

    // 7. golden round-trip (if the reference snapshot is present)
    val ambr = new java.io.File("/root/reference/tests/__snapshots__/test_output.ambr")
    if (ambr.exists()) {
      val text = new String(java.nio.file.Files.readAllBytes(ambr.toPath))
      val start = text.indexOf("'''", text.indexOf("test_azure_export[markdown_content]"))
      val end = text.indexOf("'''", start + 3)
      val golden = text.substring(start + 3, end).split("\n").map(_.stripPrefix("  ")).mkString("\n")
      val spans = Markdown.parse(golden)
      val rt = Markdown.parse(Markdown.render(spans))
      println(s"== azure golden: ${spans.length} spans, round-trip equal = ${rt == spans} ==")
    }
  }
}
