package graft

import graft.extract.PdfText

/** Scratch harness: prints the extracted text of the reference fixtures so
  * the golden expectations can be reconciled against tools/pdf_text_oracle.py.
  * `--gen <tt|ttuni|cff> <out.pdf>` writes the deterministic embedded-font
  * fixture instead, for lockstep checks of the Python oracle's font decode.
  */
object ProfPdfText {
  def main(args: Array[String]): Unit = {
    if (args.length == 3 && args(0) == "--gen") {
      val pages = Seq(
        Seq("Doc 9 page 1", "Lorem body 4", "alpha beta-1"),
        Seq("second page X", "tail 77"))
      val bytes = args(1) match {
        case "tt" => PdfText.buildTextPdfTT(pages, unicodeCmap = false)
        case "ttuni" => PdfText.buildTextPdfTT(pages, unicodeCmap = true)
        case "cff" => PdfText.buildTextPdfCFF(pages)
        case "t1" => PdfText.buildTextPdfT1(pages)
        case other => sys.error(s"unknown fixture kind $other")
      }
      java.nio.file.Files.write(java.nio.file.Paths.get(args(2)), bytes)
      println(s"wrote ${bytes.length} bytes to ${args(2)}")
      return
    }
    val path = if (args.nonEmpty) args(0)
    else "/root/reference/tests/resources/pdf_sample.pdf"
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    PdfText.extract(bytes) match {
      case Left(e) => println(s"ERROR: $e")
      case Right(pages) =>
        val full = pages.map(_.lines.map(_.text).mkString("\n")).mkString("\f")
        val sha = java.security.MessageDigest.getInstance("SHA-256")
          .digest(full.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
        println(s"pages=${pages.length} lines_per_page=${pages.map(_.lines.size).mkString(",")}")
        println(s"sha256=$sha")
        if (args.length > 1 && args(1) == "--dump") {
          pages.foreach { pg =>
            println(s"=== page ${pg.page} (${pg.width}x${pg.height}) images=${pg.images.map(_.name).mkString(",")}")
            pg.lines.foreach(l => println(f"  [${l.x}%7.1f,${l.y}%7.1f w=${l.width}%6.1f s=${l.size}%4.1f] ${l.text}"))
          }
        }
    }
  }
}
