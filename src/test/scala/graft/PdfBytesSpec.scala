package graft

import graft.extract.PdfBytes
import org.scalatest.funsuite.AnyFunSuite

/** Container-level PDF parsing against the reference's REAL fixture PDFs
  * (read at runtime from /root/reference/tests/resources, like AmbrGoldens)
  * plus writer→parser round-trips. The fixture expectations were established
  * by the independent second implementation `tools/pdf_info_oracle.py`
  * (both implement PDF 32000-1 §7.3/§7.5 from scratch).
  */
class PdfBytesSpec extends AnyFunSuite {

  private val resources = "/root/reference/tests/resources"

  private def read(p: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))

  test("pdf_sample.pdf: 4 A4 pages, no Title/Author, not encrypted") {
    val f = new java.io.File(s"$resources/pdf_sample.pdf")
    assume(f.exists(), "reference fixtures not present")
    val info = PdfBytes.pdfInfo(read(f.getPath)).fold(e => fail(e), identity)
    assert(info.pageCount == 4)
    assert(info.fileSize == 142786L)
    assert(!info.isEncrypted)
    assert(info.pageDims == Seq.fill(4)(PdfBytes.PageDim(595.0, 842.0)))
    // Info dict carries Creator/Producer/CreationDate but no Title/Author →
    // empty strings, matching pypdf's `metadata.title or ""`
    assert(info.title == "" && info.author == "")
  }

  test("pdf_sample_page_nums.pdf: 3 pages at 594.99x792") {
    val f = new java.io.File(s"$resources/pdf_sample_page_nums.pdf")
    assume(f.exists(), "reference fixtures not present")
    val info = PdfBytes.pdfInfo(read(f.getPath)).fold(e => fail(e), identity)
    assert(info.pageCount == 3)
    assert(info.fileSize == 335995L)
    assert(info.pageDims.size == 3)
    info.pageDims.foreach { d =>
      assert(math.abs(d.width - 594.992125984252) < 1e-9)
      assert(d.height == 792.0)
    }
    assert(info.title == "" && info.author == "")
  }

  test("writer->parser round-trip: page count, dims, title, author") {
    for (n <- Seq(1, 2, 5, 17); (w, h) <- Seq((300.0, 400.0), (595.5, 842.25))) {
      val pages = (0 until n).map(i => (w + i, h))
      val bytes = PdfBytes.buildPdf(pages, s"T-$n", s"A-$n")
      val info = PdfBytes.pdfInfo(bytes).fold(e => fail(e), identity)
      assert(info.pageCount == n)
      assert(info.fileSize == bytes.length.toLong)
      assert(info.pageDims == pages.map { case (pw, ph) => PdfBytes.PageDim(pw, ph) })
      assert(info.title == s"T-$n" && info.author == s"A-$n")
      assert(!info.isEncrypted)
    }
  }

  test("text strings: UTF-16BE titles, literal-string escapes") {
    val bytes = PdfBytes.buildPdf(Seq((100.0, 100.0)), "Grüße 中文", "a(b)\\c")
    val info = PdfBytes.pdfInfo(bytes).fold(e => fail(e), identity)
    assert(info.title == "Grüße 中文")
    assert(info.author == "a(b)\\c")
  }

  test("decodeTextString: BOM dispatch") {
    assert(PdfBytes.decodeTextString(Array(0xfe, 0xff, 0x00, 0x41).map(_.toByte)) == "A")
    assert(PdfBytes.decodeTextString("plain".getBytes("ISO-8859-1")) == "plain")
    assert(PdfBytes.decodeTextString(Array(0xef, 0xbb, 0xbf).map(_.toByte) ++ "é".getBytes("UTF-8")) == "é")
  }

  test("malformed bytes are a Left, never a throw") {
    assert(PdfBytes.pdfInfo("not a pdf at all".getBytes).isLeft)
    assert(PdfBytes.pdfInfo(Array.emptyByteArray).isLeft)
    // truncate a valid pdf mid-xref
    val good = PdfBytes.buildPdf(Seq((10.0, 10.0)), "t", "a")
    assert(PdfBytes.pdfInfo(good.take(good.length - 30)).isLeft)
  }

  test("RC4 matches the published test vectors") {
    import graft.extract.PdfCrypt.rc4
    def hx(b: Array[Byte]) = b.map(x => f"${x & 0xff}%02X").mkString
    assert(hx(rc4("Key".getBytes, "Plaintext".getBytes)) == "BBF316E8D940AF0AD3")
    assert(hx(rc4("Wiki".getBytes, "pedia".getBytes)) == "1021BF0420")
    assert(hx(rc4("Secret".getBytes, "Attack at dawn".getBytes)) == "45A01F645FC35B383552544B9BF5")
  }

  test("empty-user-password encrypted PDFs open as not-encrypted (RC4 R=2/R=3, AES R=4)") {
    // the pdf_utils.py:212-215 behavior: many PDFs are owner-locked with an
    // empty user password; get_pdf_info must read them fully
    for (r <- Seq(2, 3, 4)) {
      val bytes = PdfBytes.buildPdf(Seq((200.0, 300.0), (200.0, 300.0)),
        s"enc-title-$r", s"enc-author-$r", Some(("", r)))
      val info = PdfBytes.pdfInfo(bytes).fold(e => fail(s"r=$r: $e"), identity)
      assert(!info.isEncrypted, s"r=$r")
      assert(info.pageCount == 2)
      assert(info.pageDims.head == PdfBytes.PageDim(200.0, 300.0))
      assert(info.title == s"enc-title-$r" && info.author == s"enc-author-$r")
    }
  }

  test("password-protected PDFs: correct password opens, wrong raises, none gives basic shape") {
    val bytes = PdfBytes.buildPdf(Seq((100.0, 100.0)), "secret title", "secret author",
      Some(("hunter2", 3)))
    // no password → truly-encrypted basic shape
    val locked = PdfBytes.pdfInfo(bytes).fold(e => fail(e), identity)
    assert(locked.isEncrypted && locked.pageCount == 0 && locked.title == "")
    // correct password → full info, UTF-16/latin-1 strings decrypted
    val open = PdfBytes.pdfInfo(bytes, Some("hunter2")).fold(e => fail(e), identity)
    assert(!open.isEncrypted && open.pageCount == 1)
    assert(open.title == "secret title" && open.author == "secret author")
    // wrong password → Left mentioning the password (reference raises ValueError)
    val err = PdfBytes.pdfInfo(bytes, Some("wrong")).left.getOrElse(fail("expected Left"))
    assert(err.contains("Incorrect password"))
  }

  test("extractPages on the REAL fixture: subset reparses with right count/dims and keeps content streams") {
    import graft.extract.PdfRewrite
    val f = new java.io.File(s"$resources/pdf_sample.pdf")
    assume(f.exists(), "reference fixtures not present")
    val src = read(f.getPath)
    val sub = PdfRewrite.extractPages(src, Seq(0, 2)).fold(e => fail(e), identity)
    val info = PdfBytes.pdfInfo(sub).fold(e => fail(e), identity)
    assert(info.pageCount == 2)
    assert(info.pageDims == Seq.fill(2)(PdfBytes.PageDim(595.0, 842.0)))
    // the kept pages' Flate content streams must ride along verbatim
    assert(new String(sub, "ISO-8859-1").contains("FlateDecode"))
    assert(sub.length > 1000, s"suspiciously small: ${sub.length}")
    // reversed/repeated selections follow the keep order
    val rev = PdfRewrite.extractPages(src, Seq(3, 3, 1)).fold(e => fail(e), identity)
    assert(PdfBytes.pdfInfo(rev).fold(e => fail(e), identity).pageCount == 3)
    // out-of-range indices are SILENTLY skipped (pdf_utils.py:172-176)
    val skipped = PdfRewrite.extractPages(src, Seq(0, 7)).fold(e => fail(e), identity)
    assert(PdfBytes.pdfInfo(skipped).fold(e => fail(e), identity).pageCount == 1)
  }

  test("regression: unsigned /P values wrap instead of saturating") {
    // many producers serialize P as unsigned 32-bit (4294967252 == -44);
    // Double->Int saturation would derive the wrong file key
    val enc = PdfBytes.buildPdf(Seq((10.0, 10.0)), "t", "a", Some(("", 3)))
    // the patch lengthens the file, shifting the xref — recompute startxref
    val hacked = new String(enc, "ISO-8859-1").replace("/P -44", "/P 4294967252")
    val info = PdfBytes.pdfInfo(
      rebuildStartxref(hacked).getBytes("ISO-8859-1")).fold(e => fail(e), identity)
    assert(!info.isEncrypted && info.pageCount == 1 && info.title == "t")
  }

  /** Recomputes the startxref offset after a text patch shifted the xref. */
  private def rebuildStartxref(pdf: String): String = {
    val xrefAt = pdf.lastIndexOf("\nxref\n") + 1
    val sx = pdf.lastIndexOf("startxref\n")
    val end = pdf.indexOf('\n', sx + "startxref\n".length)
    pdf.substring(0, sx) + "startxref\n" + xrefAt + pdf.substring(end)
  }

  test("regression: 19-byte single-EOL xref entries still parse") {
    val pdf = new String(PdfBytes.buildPdf(Seq((10.0, 10.0)), "t19", "a"), "ISO-8859-1")
    // rewrite every 20-byte "NNNNNNNNNN GGGGG n \n" entry to the 19-byte
    // single-EOL deviation "NNNNNNNNNN GGGGG n\n"
    val patched = pdf.replace(" n \n", " n\n").replace(" f \n", " f\n")
    assert(patched.length < pdf.length)
    val info = PdfBytes.pdfInfo(
      rebuildStartxref(patched).getBytes("ISO-8859-1")).fold(e => fail(e), identity)
    assert(info.pageCount == 1 && info.title == "t19")
  }

  test("regression: sub-milli reals round-trip without exponent syntax") {
    val bytes = PdfBytes.buildPdf(Seq((0.0005, 12000000.5)), "tiny", "a")
    assert(!new String(bytes, "ISO-8859-1").toUpperCase.contains("E-"))
    val info = PdfBytes.pdfInfo(bytes).fold(e => fail(e), identity)
    assert(info.pageDims == Seq(PdfBytes.PageDim(0.0005, 12000000.5)))
  }

  test("extractPages round-trip on writer PDFs preserves the selected dims") {
    import graft.extract.PdfRewrite
    val pages = (0 until 6).map(i => (100.0 + i, 200.0 + i))
    val src = PdfBytes.buildPdf(pages, "t", "a")
    val sub = PdfRewrite.extractPages(src, Seq(4, 1)).fold(e => fail(e), identity)
    val info = PdfBytes.pdfInfo(sub).fold(e => fail(e), identity)
    assert(info.pageDims == Seq(PdfBytes.PageDim(104.0, 204.0), PdfBytes.PageDim(101.0, 201.0)))
  }

  test("decryptPdf: plaintext unchanged; encrypted re-emits open and readable") {
    import graft.extract.PdfRewrite
    val plain = PdfBytes.buildPdf(Seq((10.0, 20.0)), "t", "a")
    // unencrypted → ORIGINAL bytes unchanged (pdf_utils.py:104-106)
    assert(PdfRewrite.decryptPdf(plain, "whatever").fold(e => fail(e), identity) eq plain)
    val enc = PdfBytes.buildPdf(Seq((10.0, 20.0), (30.0, 40.0)), "tt", "aa", Some(("pw", 3)))
    val dec = PdfRewrite.decryptPdf(enc, "pw").fold(e => fail(e), identity)
    val info = PdfBytes.pdfInfo(dec).fold(e => fail(e), identity)
    assert(!info.isEncrypted && info.pageCount == 2)
    assert(info.pageDims == Seq(PdfBytes.PageDim(10.0, 20.0), PdfBytes.PageDim(30.0, 40.0)))
    // wrong password is an error (reference raises)
    assert(PdfRewrite.decryptPdf(enc, "nope").isLeft)
    // empty-user-password files decrypt without a password
    val enc2 = PdfBytes.buildPdf(Seq((10.0, 20.0)), "t2", "a2", Some(("", 3)))
    val dec2 = PdfRewrite.decryptPdf(enc2, "").fold(e => fail(e), identity)
    assert(!PdfBytes.pdfInfo(dec2).fold(e => fail(e), identity).isEncrypted)
    // AES-128 (V4/AESV2): password-protected info decrypts through JCE
    val aes = PdfBytes.buildPdf(Seq((50.0, 60.0)), "aes title", "aes author", Some(("pw4", 4)))
    assert(PdfBytes.pdfInfo(aes).fold(e => fail(e), identity).isEncrypted) // locked w/o pw
    val openAes = PdfBytes.pdfInfo(aes, Some("pw4")).fold(e => fail(e), identity)
    assert(!openAes.isEncrypted && openAes.title == "aes title" && openAes.author == "aes author")
    val decAes = PdfRewrite.decryptPdf(aes, "pw4").fold(e => fail(e), identity)
    val infoAes = PdfBytes.pdfInfo(decAes).fold(e => fail(e), identity)
    assert(!infoAes.isEncrypted && infoAes.title == "aes title")
    assert(PdfRewrite.decryptPdf(aes, "bad").isLeft)
  }

  test("hybrid-reference xref: /XRefStm entries beat the classic section's free tombstones") {
    // §7.5.8.4: hybrid files mark ObjStm-compressed objects FREE in the
    // classic table; their real type-2 entries live in the /XRefStm stream,
    // which takes precedence. A first-wins install of the classic section
    // would tombstone the Pages/Page objects and silently report 0 pages.
    val out = new java.io.ByteArrayOutputStream
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.5\n")
    val off1 = out.size(); w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    val off4 = out.size(); w("4 0 obj\n<< /Length 0 >>\nstream\n\nendstream\nendobj\n")
    // ObjStm (obj 6, uncompressed) carrying obj 2 (Pages) and obj 3 (Page)
    val o2 = "<< /Type /Pages /Count 1 /Kids [ 3 0 R ] >>"
    val o3 = "<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 200 300 ] /Contents 4 0 R >>"
    val header = s"2 0 3 ${o2.length + 1} "
    val payload = header + o2 + " " + o3
    val off6 = out.size()
    w(s"6 0 obj\n<< /Type /ObjStm /N 2 /First ${header.length} /Length ${payload.length} >>\nstream\n$payload\nendstream\nendobj\n")
    // xref STREAM (obj 5, uncompressed, W [1 2 1]): the authoritative entries
    val off5 = out.size()
    def e(ty: Int, f2: Int, f3: Int): Array[Byte] =
      Array(ty.toByte, ((f2 >> 8) & 0xff).toByte, (f2 & 0xff).toByte, f3.toByte)
    val rows = Array(e(0, 0, 255), e(1, off1, 0), e(2, 6, 0), e(2, 6, 1),
      e(1, off4, 0), e(1, off5, 0), e(1, off6, 0)).flatten
    w(s"5 0 obj\n<< /Type /XRef /Size 7 /W [ 1 2 1 ] /Index [ 0 7 ] /Root 1 0 R /Length ${rows.length} >>\nstream\n")
    out.write(rows)
    w("\nendstream\nendobj\n")
    // classic table: hybrid convention — ObjStm-carried objects marked free
    val xrefAt = out.size()
    w("xref\n0 7\n")
    w("0000000000 65535 f \n")
    w(f"$off1%010d 00000 n \n")
    w("0000000000 00000 f \n") // obj 2: FREE here, real entry in XRefStm
    w("0000000000 00000 f \n") // obj 3: FREE here, real entry in XRefStm
    w(f"$off4%010d 00000 n \n")
    w("0000000000 00000 f \n") // the XRefStm object itself is hidden too
    w(f"$off6%010d 00000 n \n")
    w(s"trailer\n<< /Size 7 /Root 1 0 R /XRefStm $off5 >>\nstartxref\n$xrefAt\n%%EOF\n")
    val info = PdfBytes.pdfInfo(out.toByteArray).fold(e => fail(e), identity)
    assert(info.pageCount == 1)
    assert(info.pageDims == Seq(PdfBytes.PageDim(200.0, 300.0)))
  }

  test("gen>0 objects derive per-object keys from the xref generation") {
    import graft.extract.{PdfCrypt, PdfRewrite}
    val title = "generation-one title"
    val out = new java.io.ByteArrayOutputStream
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    def hex(b: Array[Byte]): String = "<" + b.map(x => f"${x & 0xff}%02X").mkString + ">"
    val pwd = Array.emptyByteArray
    val id0 = PdfCrypt.md5("gen1-test".getBytes("UTF-8"))
    val o = PdfCrypt.computeO(pwd, pwd, 3, 16)
    val perm = -44
    val key = PdfCrypt.fileKey(pwd, o, perm, id0, 3, 16)
    val u = PdfCrypt.computeU(key, id0, 3) ++ new Array[Byte](16)
    val offsets = scala.collection.mutable.ArrayBuffer[(Int, Int)]() // (offset, gen)
    def obj(num: Int, gen: Int, body: String): Unit = {
      offsets += ((out.size(), gen)); w(s"$num $gen obj\n$body\nendobj\n")
    }
    w("%PDF-1.4\n")
    obj(1, 0, "<< /Type /Catalog /Pages 2 0 R >>")
    obj(2, 0, "<< /Type /Pages /Count 1 /Kids [ 3 0 R ] >>")
    obj(3, 0, "<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 100 200 ] /Contents 4 0 R >>")
    obj(4, 0, "<< /Length 0 >>\nstream\n\nendstream")
    // the Info object lives at GENERATION 1: Algorithm 1 hashes (num, gen),
    // so keying it as gen 0 decrypts to garbage
    val tEnc = PdfCrypt.encryptString(key, 5, 1, title.getBytes("ISO-8859-1"))
    obj(5, 1, s"<< /Title ${hex(tEnc)} >>")
    obj(6, 0, s"<< /Filter /Standard /V 2 /Length 128 /R 3 /O ${hex(o)} /U ${hex(u)} /P $perm >>")
    val xrefAt = out.size()
    w("xref\n0 7\n0000000000 65535 f \n")
    offsets.foreach { case (off, g) => w(f"$off%010d $g%05d n \n") }
    w(s"trailer\n<< /Size 7 /Root 1 0 R /Info 5 1 R /Encrypt 6 0 R /ID [ ${hex(id0)} ${hex(id0)} ] >>\nstartxref\n$xrefAt\n%%EOF\n")
    val bytes = out.toByteArray
    assert(PdfBytes.pdfInfo(bytes).fold(e => fail(e), identity).title == title)
    // decryptPdf's copy path must also key the gen-1 strings correctly
    val dec = PdfRewrite.decryptPdf(bytes, "").fold(e => fail(e), identity)
    assert(PdfBytes.pdfInfo(dec).fold(e => fail(e), identity).title == title)
  }

  test("EncryptMetadata=false: plaintext XMP and Crypt-Identity streams copy verbatim") {
    import graft.extract.{PdfCrypt, PdfRewrite}
    val xmp = "<x:xmpmeta GRAFT-PLAINTEXT-MARKER attr='v'/>"
    val idPayload = "IDENTITY-CRYPT-PLAINTEXT-PAYLOAD"
    val out = new java.io.ByteArrayOutputStream
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    def hex(b: Array[Byte]): String = "<" + b.map(x => f"${x & 0xff}%02X").mkString + ">"
    val pwd = Array.emptyByteArray
    val id0 = PdfCrypt.md5("plain-meta-test".getBytes("UTF-8"))
    val o = PdfCrypt.computeO(pwd, pwd, 4, 16)
    val perm = -44
    // R=4 with EncryptMetadata=false changes the key derivation (extra
    // ffffffff salt) — both sides must agree
    val key = PdfCrypt.fileKey(pwd, o, perm, id0, 4, 16, encryptMetadata = false)
    val u = PdfCrypt.computeU(key, id0, 4) ++ new Array[Byte](16)
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    def obj(num: Int, body: String): Unit = { offsets += out.size(); w(s"$num 0 obj\n$body\nendobj\n") }
    w("%PDF-1.4\n")
    obj(1, "<< /Type /Catalog /Pages 2 0 R /Metadata 7 0 R >>")
    obj(2, "<< /Type /Pages /Count 1 /Kids [ 3 0 R ] >>")
    obj(3, "<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 100 200 ] /Contents 4 0 R /GraftX 8 0 R >>")
    obj(4, "<< /Length 0 >>\nstream\n\nendstream")
    val tEnc = PdfCrypt.encryptString(key, 5, 0, "meta title".getBytes("ISO-8859-1"))
    obj(5, s"<< /Title ${hex(tEnc)} >>")
    obj(6, "<< /Filter /Standard /V 4 /Length 128 /CF << /StdCF << /CFM /V2 /AuthEvent /DocOpen >> >> " +
      s"/StmF /StdCF /StrF /StdCF /R 4 /O ${hex(o)} /U ${hex(u)} /P $perm /EncryptMetadata false >>")
    // the XMP metadata stream is stored PLAINTEXT (EncryptMetadata false)
    obj(7, s"<< /Type /Metadata /Subtype /XML /Length ${xmp.length} >>\nstream\n$xmp\nendstream")
    // a /Crypt Identity-filtered stream is stored plaintext too (§7.4.10)
    obj(8, "<< /Filter /Crypt /DecodeParms << /Type /CryptFilterDecodeParms /Name /Identity >> " +
      s"/Length ${idPayload.length} >>\nstream\n$idPayload\nendstream")
    val xrefAt = out.size()
    w(s"xref\n0 ${offsets.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(off => w(f"$off%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R /Info 5 0 R /Encrypt 6 0 R /ID [ ${hex(id0)} ${hex(id0)} ] >>\nstartxref\n$xrefAt\n%%EOF\n")
    val bytes = out.toByteArray
    val opened = PdfBytes.pdfInfo(bytes).fold(e => fail(e), identity)
    assert(!opened.isEncrypted && opened.title == "meta title")
    val dec = PdfRewrite.decryptPdf(bytes, "").fold(e => fail(e), identity)
    val decStr = new String(dec, "ISO-8859-1")
    // verbatim copies — a wrongly-applied RC4 pass would garble both
    assert(decStr.contains(xmp), "XMP metadata must copy verbatim")
    assert(decStr.contains(idPayload), "Crypt-Identity stream must copy verbatim")
    assert(PdfBytes.pdfInfo(dec).fold(e => fail(e), identity).title == "meta title")
  }

  test("AES-256 (V5/AESV3): R6 and R5 round-trips, owner password, Perms") {
    import graft.extract.{PdfCrypt, PdfRewrite}
    for (r <- Seq(6, 5)) {
      val doc = PdfBytes.buildPdf(Seq((120.0, 240.0), (130.0, 250.0)),
        s"v5 title r$r", s"v5 author r$r", Some(("secret256", r)))
      // locked without the password → basic encrypted shape
      val locked = PdfBytes.pdfInfo(doc).fold(e => fail(e), identity)
      assert(locked.isEncrypted && locked.pageCount == 0)
      // user password opens: structure + decrypted Info strings
      val open = PdfBytes.pdfInfo(doc, Some("secret256")).fold(e => fail(e), identity)
      assert(!open.isEncrypted && open.pageCount == 2)
      assert(open.title == s"v5 title r$r" && open.author == s"v5 author r$r")
      // wrong password raises (reference parity)
      assert(PdfBytes.pdfInfo(doc, Some("nope")).isLeft)
      // decryptPdf re-emits without /Encrypt, Info preserved
      val dec = PdfRewrite.decryptPdf(doc, "secret256").fold(e => fail(e), identity)
      val decInfo = PdfBytes.pdfInfo(dec).fold(e => fail(e), identity)
      assert(!decInfo.isEncrypted && decInfo.title == s"v5 title r$r")
      assert(decInfo.pageDims == Seq(PdfBytes.PageDim(120.0, 240.0), PdfBytes.PageDim(130.0, 250.0)))
    }
    // empty-user-password V5 docs open as not-encrypted without a password
    val open = PdfBytes.buildPdf(Seq((10.0, 10.0)), "t", "a", Some(("", 6)))
    assert(!PdfBytes.pdfInfo(open).fold(e => fail(e), identity).isEncrypted)
    // distinct owner password verifies through Algorithm 12 and unwraps the
    // same file key; Perms validates under it
    val user = "u-pass".getBytes("UTF-8")
    val owner = "o-pass".getBytes("UTF-8")
    val fileKey = PdfCrypt.md5("ka".getBytes) ++ PdfCrypt.md5("kb".getBytes)
    val (u, ue, o, oe) = PdfCrypt.computeV5Entries(user, owner, fileKey, 6)
    assert(PdfCrypt.verifyUserPasswordV5(user, u, ue, 6).exists(_.sameElements(fileKey)))
    assert(PdfCrypt.verifyOwnerPasswordV5(owner, o, oe, u, 6).exists(_.sameElements(fileKey)))
    assert(PdfCrypt.verifyUserPasswordV5(owner, u, ue, 6).isEmpty)
    assert(PdfCrypt.verifyOwnerPasswordV5(user, o, oe, u, 6).isEmpty)
    val perms = PdfCrypt.computePerms(fileKey, -44, encryptMetadata = true)
    assert(PdfCrypt.validatePerms(fileKey, perms).contains(true))
    assert(PdfCrypt.validatePerms(fileKey.reverse, perms).isEmpty)
  }

  test("legacy stream filters: LZW, ASCIIHex, ASCII85, RunLength round-trip") {
    import graft.extract.PdfBytes.{lzwDecode, asciiHexDecode, ascii85Decode, runLengthDecode}
    // test-side encoders (independent of the decoders under test)
    def lzwEncode(data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream
      var bitBuf = 0L; var bitCnt = 0; var width = 9
      val dict = scala.collection.mutable.HashMap[Seq[Byte], Int]()
      (0 until 256).foreach(i => dict(Seq(i.toByte)) = i)
      var next = 258
      def emit(code: Int): Unit = {
        bitBuf = (bitBuf << width) | code; bitCnt += width
        while (bitCnt >= 8) { out.write(((bitBuf >> (bitCnt - 8)) & 0xff).toInt); bitCnt -= 8 }
      }
      emit(256) // clear
      var w = Seq.empty[Byte]
      data.foreach { b =>
        val wb = w :+ b
        if (dict.contains(wb)) w = wb
        else {
          emit(dict(w))
          if (next < 4096) { dict(wb) = next; next += 1 }
          // EarlyChange=1 cadence mirrored from the decoder
          if (next >= (1 << width) && width < 12) width += 1
          w = Seq(b)
        }
      }
      if (w.nonEmpty) emit(dict(w))
      emit(257) // EOD
      if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
      out.toByteArray
    }
    def a85Encode(data: Array[Byte]): Array[Byte] = {
      val sb = new StringBuilder
      data.grouped(4).foreach { g =>
        var t = 0L
        g.foreach(b => t = (t << 8) | (b & 0xff))
        var k = g.length
        while (k < 4) { t = t << 8; k += 1 }
        if (t == 0 && g.length == 4) sb += 'z'
        else {
          val cs = new Array[Char](5)
          var v = t
          (4 to 0 by -1).foreach { i => cs(i) = ('!' + (v % 85)).toChar; v /= 85 }
          sb ++= new String(cs, 0, g.length + 1)
        }
      }
      (sb.toString + "~>").getBytes("ISO-8859-1")
    }
    val rng = new scala.util.Random(11)
    // structured + random payloads cross the 9→10→11-bit LZW boundaries
    val payloads = Seq(
      "BT (hello) Tj ET " * 400,
      new String(Array.fill(8000)((rng.nextInt(256) - 128).toByte).map(b => (b & 0xff).toChar)),
      "aaaaabbbbbcccccaaaaabbbbb" * 100, "x")
      .map(_.getBytes("ISO-8859-1"))
    payloads.foreach { p =>
      assert(lzwDecode(lzwEncode(p)).sameElements(p), "lzw")
      assert(ascii85Decode(a85Encode(p)).sameElements(p), "a85")
      val hx = (p.map(b => f"${b & 0xff}%02X").mkString + ">").getBytes("ISO-8859-1")
      assert(asciiHexDecode(hx).sameElements(p), "ahx")
    }
    // RunLength: runs + literals + EOD
    val rle = Array[Byte](2, 'a', 'b', 'c', (257 - 5).toByte, 'x', 0, 'q', 128.toByte)
    assert(new String(runLengthDecode(rle), "ISO-8859-1") == "abcxxxxxq")
    // 'z' shorthand for a zero group
    assert(ascii85Decode("z~>".getBytes).sameElements(Array[Byte](0, 0, 0, 0)))
  }

  test("legacy-filter content streams extract end-to-end (A85+Flate chain, ASCIIHex)") {
    import graft.extract.PdfText
    def deflate(b: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater(); d.setInput(b); d.finish()
      val o = new java.io.ByteArrayOutputStream; val buf = new Array[Byte](4096)
      while (!d.finished()) o.write(buf, 0, d.deflate(buf))
      d.end(); o.toByteArray
    }
    def a85(data: Array[Byte]): Array[Byte] = { // same encoder as above, minimal
      val sb = new StringBuilder
      data.grouped(4).foreach { g =>
        var t = 0L
        g.foreach(b => t = (t << 8) | (b & 0xff))
        var k = g.length
        while (k < 4) { t = t << 8; k += 1 }
        if (t == 0 && g.length == 4) sb += 'z'
        else {
          val cs = new Array[Char](5)
          var v = t
          (4 to 0 by -1).foreach { i => cs(i) = ('!' + (v % 85)).toChar; v /= 85 }
          sb ++= new String(cs, 0, g.length + 1)
        }
      }
      (sb.toString + "~>").getBytes("ISO-8859-1")
    }
    def docWith(payload: Array[Byte], filter: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream
      def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
      val offsets = scala.collection.mutable.ArrayBuffer[Int]()
      def obj(num: Int, body: String): Unit = { offsets += out.size(); w(s"$num 0 obj\n$body\nendobj\n") }
      w("%PDF-1.2\n")
      obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
      obj(2, "<< /Type /Pages /Count 1 /Kids [ 3 0 R ] >>")
      obj(3, "<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
        "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>")
      offsets += out.size()
      w(s"4 0 obj\n<< /Length ${payload.length} /Filter $filter >>\nstream\n")
      out.write(payload)
      w("\nendstream\nendobj\n")
      obj(5, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
      val xrefAt = out.size()
      w(s"xref\n0 ${offsets.length + 1}\n0000000000 65535 f \n")
      offsets.foreach(o => w(f"$o%010d 00000 n \n"))
      w(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
      out.toByteArray
    }
    val content = "BT\n/F1 12 Tf\n72 720 Td\n(hello legacy filters) Tj\nET\n".getBytes("ISO-8859-1")
    // chained: A85 applied LAST on encode, FIRST on decode
    val chained = docWith(a85(deflate(content)), "[ /ASCII85Decode /FlateDecode ]")
    assert(PdfText.pageTexts(chained).fold(e => fail(e), identity) == Seq("hello legacy filters"))
    val hexed = docWith(
      (content.map(b => f"${b & 0xff}%02X").mkString + ">").getBytes("ISO-8859-1"),
      "/ASCIIHexDecode")
    assert(PdfText.pageTexts(hexed).fold(e => fail(e), identity) == Seq("hello legacy filters"))
  }

  test("Crypt-Identity content stream reads plaintext through the decode path too") {
    // the EncryptMetadata test covers the REWRITE path; this covers
    // PdfText/decodedStream: an encrypted doc whose page CONTENT carries
    // /Filter /Crypt (Identity) stored plaintext must extract verbatim —
    // decrypt-before-filter-inspection would garble it
    import graft.extract.{PdfCrypt, PdfText}
    val content = "BT\n/F1 12 Tf\n72 720 Td\n(identity plain content) Tj\nET\n"
    val out = new java.io.ByteArrayOutputStream
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    def hex(b: Array[Byte]): String = "<" + b.map(x => f"${x & 0xff}%02X").mkString + ">"
    val pwd = Array.emptyByteArray
    val id0 = PdfCrypt.md5("crypt-id-test".getBytes("UTF-8"))
    val o = PdfCrypt.computeO(pwd, pwd, 3, 16)
    val perm = -44
    val key = PdfCrypt.fileKey(pwd, o, perm, id0, 3, 16)
    val u = PdfCrypt.computeU(key, id0, 3) ++ new Array[Byte](16)
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    def obj(num: Int, body: String): Unit = { offsets += out.size(); w(s"$num 0 obj\n$body\nendobj\n") }
    w("%PDF-1.4\n")
    obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    obj(2, "<< /Type /Pages /Count 1 /Kids [ 3 0 R ] >>")
    obj(3, "<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
      "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>")
    obj(4, "<< /Filter /Crypt /DecodeParms << /Type /CryptFilterDecodeParms /Name /Identity >> " +
      s"/Length ${content.length} >>\nstream\n$content\nendstream")
    obj(5, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    obj(6, s"<< /Filter /Standard /V 2 /Length 128 /R 3 /O ${hex(o)} /U ${hex(u)} /P $perm >>")
    val xrefAt = out.size()
    w(s"xref\n0 ${offsets.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(off => w(f"$off%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R /Encrypt 6 0 R /ID [ ${hex(id0)} ${hex(id0)} ] >>\nstartxref\n$xrefAt\n%%EOF\n")
    val texts = PdfText.pageTexts(out.toByteArray).fold(e => fail(e), identity)
    assert(texts == Seq("identity plain content"))
  }

  test("corrupt xref cycles (XRefStm pointing back) fail as a Left, not a stack overflow") {
    // classic section whose /XRefStm points at ITSELF via the classic
    // offset: the visited-set guard must terminate the recursion
    val good = new String(PdfBytes.buildPdf(Seq((10.0, 10.0)), "t", "a"), "ISO-8859-1")
    val sxAt = good.lastIndexOf("startxref")
    val xrefAt = good.substring(sxAt + 9).trim.split("\\s+")(0) // the real classic offset
    val hacked = good.replace("/Root 1 0 R", s"/Root 1 0 R /XRefStm $xrefAt")
    // terminates (already-seen offsets skip); the self-reference is benign
    val r = PdfBytes.pdfInfo(hacked.getBytes("ISO-8859-1"))
    assert(r.isRight && r.toOption.get.pageCount == 1)
    // and a bogus offset is a failure ROW (Left), never a crash
    val bogus = good.replace("/Root 1 0 R", s"/Root 1 0 R /XRefStm ${sxAt + 5}")
    assert(PdfBytes.pdfInfo(bogus.getBytes("ISO-8859-1")).isLeft)
  }

  test("encrypted trailer returns the reference's basic-info shape") {
    // synthesize: take a built pdf and splice /Encrypt into the trailer
    val good = new String(PdfBytes.buildPdf(Seq((10.0, 10.0)), "t", "a"), "ISO-8859-1")
    val hacked = good.replace("/Root 1 0 R", "/Root 1 0 R /Encrypt 99 0 R")
    // the xref offset is unchanged (trailer edits live after the xref table)
    val info = PdfBytes.pdfInfo(hacked.getBytes("ISO-8859-1")).fold(e => fail(e), identity)
    assert(info.isEncrypted && info.pageCount == 0 && info.pageDims.isEmpty)
    assert(info.fileSize == hacked.length.toLong)
  }
}
