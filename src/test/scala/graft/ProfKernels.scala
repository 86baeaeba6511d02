package graft

/** Scratch: single-threaded per-doc cost of the fixture-building + parsing
  * kernels behind the heavy per-row driver queries (q_pdf_info, q_pdf_text,
  * q_pdf_images, q_media_resize, q_xlsx...), so optimization targets the
  * real hot spot instead of the Spark wrapper.
  */
object ProfKernels {

  private def time(name: String, n: Int)(f: Long => Unit): Unit = {
    val t0 = System.nanoTime()
    (0L until n.toLong).foreach(f)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"$name%-28s $n%6d docs  ${sec * 1e3 / n}%8.3f ms/doc  total $sec%6.2f s")
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000)
    val which = if (args.length > 1) args(1) else "all"

    def pdfInfoKernel(id: Long): Unit = {
      val np = 1 + (id % 5).toInt
      val w = 300.0 + (id % 200)
      val h = 400.0 + (id % 100)
      val encryptWith =
        if (id % 7 == 3) Some(("locked", if (id % 11 == 4) 6 else 3))
        else if (id % 5 == 2) Some(("", if (id % 7 == 1) 6 else 3))
        else None
      val bytes = graft.extract.PdfBytes.buildPdf(
        Seq.fill(np)((w, h)), s"doc-$id", s"author-${id % 7}", encryptWith)
      graft.extract.PdfBytes.pdfInfo(bytes).fold(e => sys.error(e), identity)
      ()
    }

    def pdfInfoBuildOnly(id: Long): Unit = {
      val np = 1 + (id % 5).toInt
      val w = 300.0 + (id % 200)
      val h = 400.0 + (id % 100)
      val encryptWith =
        if (id % 7 == 3) Some(("locked", if (id % 11 == 4) 6 else 3))
        else if (id % 5 == 2) Some(("", if (id % 7 == 1) 6 else 3))
        else None
      graft.extract.PdfBytes.buildPdf(
        Seq.fill(np)((w, h)), s"doc-$id", s"author-${id % 7}", encryptWith)
      ()
    }

    def pdfInfoPlainKernel(id: Long): Unit = {
      val np = 1 + (id % 5).toInt
      val bytes = graft.extract.PdfBytes.buildPdf(
        Seq.fill(np)((300.0, 400.0)), s"doc-$id", "a", None)
      graft.extract.PdfBytes.pdfInfo(bytes).fold(e => sys.error(e), identity)
      ()
    }

    def pdfTextKernel(id: Long): Unit = {
      val np = 1 + (id % 3).toInt
      val pages = (1 to np).map { p =>
        Seq(s"Doc $id page $p", s"Lorem body ${(id + p) % 10}", s"alpha beta-${id % 4}")
      }
      val bytes = (id % 8) match {
        case 1 => graft.extract.PdfText.buildTextPdfTT(pages, unicodeCmap = false)
        case 3 => graft.extract.PdfText.buildTextPdfTT(pages, unicodeCmap = true)
        case 5 => graft.extract.PdfText.buildTextPdfCFF(pages)
        case 7 => graft.extract.PdfText.buildTextPdfT1(pages)
        case _ => graft.extract.PdfText.buildTextPdf(pages)
      }
      graft.extract.PdfText.pageTexts(bytes).fold(e => sys.error(e), identity)
      ()
    }

    def pdfImagesKernel(id: Long): Unit = {
      val np = 1 + (id % 3).toInt
      val imgs: Seq[Seq[(Array[Byte], Int, Int)]] = (1 to np).map { p =>
        if (p == 1) Seq((s"JPEGDATA-$id-0".getBytes("ISO-8859-1"), 64, 48))
        else if (p == 2 && id % 2 == 0) Seq((s"JPEGDATA-$id-1".getBytes("ISO-8859-1"), 32, 24))
        else Nil
      }
      val pages = (1 to np).map(p => Seq(s"Page $p text"))
      val bytes = graft.extract.PdfText.buildTextPdf(pages, compress = true, imgs)
      val out = graft.pipeline.Pipeline.extractOne(
        graft.io.Ingest.toRawDoc(s"d$id.pdf", bytes))
      require(out.failure.isEmpty, out.failure)
      ()
    }

    def mediaResizeKernel(id: Long): Unit = {
      val w = 30 + (id % 100).toInt
      val h = 20 + (id % 50).toInt
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      try { g.setColor(new java.awt.Color((id % 256).toInt, 80, 160)); g.fillRect(0, 0, w, h) }
      finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      ()
    }

    def run(tag: String)(f: Long => Unit): Unit = {
      if (which == "all" || which == tag) {
        (0L until 200L).foreach(f) // warm
        time(tag, n)(f)
      }
    }

    run("pdf_info")(pdfInfoKernel)
    run("pdf_info_build")(pdfInfoBuildOnly)
    run("pdf_info_plain")(pdfInfoPlainKernel)
    run("pdf_text")(pdfTextKernel)
    run("pdf_images")(pdfImagesKernel)
    run("media_png_build")(mediaResizeKernel)
  }
}
