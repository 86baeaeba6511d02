package graft

import graft.io.Ingest
import graft.pipeline.Pipeline
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-input robustness over EVERY non-image supported MIME: the
  * extraction contract is "malformed input is a failure ROW" — no route
  * may throw past extractOne, hang, or loop unboundedly on random bytes,
  * truncations, or bit-flipped variants of a valid document. (The byte
  * parsers carry anti-DoS guards — zip-bomb caps, CFB chain bounds,
  * CCITT progress checks — this spec drives the whole family through the
  * same gauntlet.)
  */
class FuzzRoutingSpec extends AnyFunSuite {

  // a deterministic PRNG: reproducible corpus, no wall-clock dependence
  private def rng(seed: Long) = new scala.util.Random(seed)

  // a small plausible sample per MIME so truncation/mutation has real
  // structure to corrupt (random bytes alone rarely reach deep parsing)
  private val samples: Map[String, Array[Byte]] = {
    def s(x: String) = x.getBytes("UTF-8")
    Map(
      "text/x-rst" -> s("Title\n=====\n\nBody ``x``\n"),
      "text/x-org" -> s("#+TITLE: T\n* H\n| a | b |\n|---+---|\n"),
      "application/x-bibtex" -> s("@article{k, title={T}, year=1999}"),
      "application/x-biblatex" -> s("@online{w, title = {W}}"),
      "application/x-ipynb+json" ->
        s("""{"nbformat":4,"cells":[{"cell_type":"markdown","source":["# H"]}]}"""),
      "application/x-latex" -> s("\\section{S}\nBody \\textbf{b}.\n"),
      "application/x-research-info-systems" -> s("TY  - JOUR\nTI  - T\nER  -\n"),
      "application/csl+json" -> s("""[{"id":"a","type":"book","title":"T"}]"""),
      "application/x-endnote+xml" ->
        s("<xml><records><record><titles><title>T</title></titles></record></records></xml>"),
      "application/docbook+xml" -> s("<article><title>T</title><para>P</para></article>"),
      "application/x-fictionbook+xml" ->
        s("<FictionBook><body><section><p>P</p></section></body></FictionBook>"),
      "application/x-jats+xml" ->
        s("<article><body><sec><title>S</title><p>P</p></sec></body></article>"),
      "application/x-opml+xml" ->
        s("""<opml><head><title>O</title></head><body><outline text="x"/></body></opml>"""),
      "application/x-typst" -> s("= T\nBody *b*.\n```\nraw\n```\n"),
      "text/troff" -> s(".TH T 1\n.SH NAME\nt \\- x\n.nf\ncode\n.fi\n"),
      "text/x-mdoc" -> s(".Dt T 1\n.Sh NAME\n.Nm t\n.Bd -literal\nx\n.Ed\n"),
      "text/x-dokuwiki" -> s("====== T ======\nBody //i//\n<code>\nx\n</code>\n"),
      "text/x-pod" -> s("=head1 T\n\nBody B<b>.\n\n=over 4\n\n=item *\n\nI.\n\n=back\n"),
      "text/csv" -> s("a,b\n1,\"x,y\"\n"),
      "text/tab-separated-values" -> s("a\tb\n1\t2\n"))
  }

  private def runOne(mime: String, bytes: Array[Byte]): Unit = {
    val out = Pipeline.extractOne(Ingest.toRawDoc("f.bin", bytes, mime))
    // contract: either clean spans or a failure row — never an escape
    assert(out.failure.nonEmpty || out.spans != null, mime)
  }

  test("random bytes: every non-image route returns, failure row or clean") {
    val mimes = graft.ops.DocOps.SupportedMimeTypes
      .filterNot(_.startsWith("image/")).toSeq.sorted
    val r = rng(0x5eed)
    for (mime <- mimes; trial <- 0 until 8) {
      val n = 1 + r.nextInt(4096)
      val junk = Array.fill(n)(r.nextInt(256).toByte)
      val t0 = System.nanoTime()
      runOne(mime, junk)
      val ms = (System.nanoTime() - t0) / 1e6
      assert(ms < 30000, s"$mime trial $trial took ${ms}ms on random bytes")
    }
  }

  test("truncations of valid documents never escape") {
    val r = rng(0xcafe)
    for ((mime, full) <- samples; _ <- 0 until 6) {
      val cut = 1 + r.nextInt(math.max(1, full.length - 1))
      runOne(mime, full.take(cut))
    }
  }

  test("random byte flips in valid documents never escape") {
    val r = rng(0xf00d)
    for ((mime, full) <- samples; _ <- 0 until 10) {
      val mutated = full.clone()
      val flips = 1 + r.nextInt(4)
      for (_ <- 0 until flips)
        mutated(r.nextInt(mutated.length)) = r.nextInt(256).toByte
      runOne(mime, mutated)
    }
  }

  test("bit-flipped REAL containers (zip/CFB/PDF family) never escape") {
    import graft.extract._
    val containers: Seq[(String, String, Array[Byte])] = Seq(
      ("application/pdf", "pdf",
        PdfText.buildTextPdf(Seq(Seq("Page one text"), Seq("Page two")))),
      ("application/vnd.openxmlformats-officedocument.wordprocessingml.document",
        "docx", DocxExtract.buildDocx("T", Seq(DocxExtract.Para("# Head"),
          DocxExtract.Para("Body text")))),
      ("application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
        "xlsx", OfficeExtract.buildXlsx("T", Seq(("S", Seq(Seq("a", "1")))))),
      ("application/epub+zip", "epub",
        EpubExtract.buildEpub("T", Seq("<html><body><p>ch</p></body></html>"))),
      ("application/vnd.oasis.opendocument.spreadsheet", "ods",
        OdsExtract.buildOds("T", Seq(("S", Seq(Seq("a", "1")))))),
      ("application/msword", "doc", DocExtract.buildDoc("T", Seq("Para one"))),
      ("application/vnd.ms-powerpoint", "ppt",
        PptExtract.buildPpt("T", Seq(("Slide", Seq("line"))))),
      ("application/vnd.ms-excel", "xls",
        XlsExtract.buildXls("T", Seq(("S", Seq(Seq(XlsExtract.XlsStr("a"))))))),
      ("application/vnd.ms-excel.sheet.binary.macroEnabled.12", "xlsb",
        XlsbExtract.buildXlsb("T", Seq(("S", Seq(Seq(XlsExtract.XlsStr("a"))))))),
      ("application/rtf", "rtf",
        RtfExtract.buildRtf("T", Seq("Body")).getBytes("ISO-8859-1")))
    val r = rng(0xbeef)
    for ((mime, tag, full) <- containers; trial <- 0 until 12) {
      val mutated = full.clone()
      val flips = 1 + r.nextInt(6)
      for (_ <- 0 until flips)
        mutated(r.nextInt(mutated.length)) = r.nextInt(256).toByte
      val t0 = System.nanoTime()
      runOne(mime, mutated)
      val ms = (System.nanoTime() - t0) / 1e6
      assert(ms < 30000, s"$tag trial $trial took ${ms}ms")
      // truncation sweep too: container indexes point past EOF
      runOne(mime, full.take(1 + r.nextInt(full.length)))
    }
  }

  test("pathological nesting and unterminated constructs stay bounded") {
    val cases = Seq(
      ("application/docbook+xml",
        "<article>" + "<section><title>x</title>" * 2000 + "</article>"),
      ("application/x-jats+xml",
        "<article><body>" + "<sec><title>s</title>" * 2000 + "</body></article>"),
      ("application/x-opml+xml",
        "<opml><body>" + "<outline text='x'>" * 2000 + "</body></opml>"),
      ("text/x-pod", "=over 4\n" * 3000 + "\n=item *\n\nx\n"),
      ("application/x-typst", "```\n" + "x\n" * 5000), // unterminated fence
      ("text/troff", ".nf\n" + "x\n" * 5000),          // unterminated .nf
      ("application/x-latex", "\\begin{itemize}\n" * 2000 + "\\item x\n"),
      ("text/x-dokuwiki", "  * x\n" * 5000),
      ("application/x-bibtex", "@a{k, t={" + "{" * 5000 + "}"))
    for ((mime, text) <- cases) {
      val t0 = System.nanoTime()
      runOne(mime, text.getBytes("UTF-8"))
      val ms = (System.nanoTime() - t0) / 1e6
      assert(ms < 30000, s"$mime pathological case took ${ms}ms")
    }
  }
}
