package graft.extract

import scala.collection.mutable.ArrayBuffer

/** Legacy Word binary (.doc) text extraction ([MS-DOC], public spec) over
  * the [[CfbExtract]] container — the reference routes `application/msword`
  * through MarkItDown (`markitdown_provider/provider.py:38`); here the
  * piece table is read directly: FIB → fWhichTblStm selects 0Table/1Table,
  * fcClx/lcbClx locate the Clx, its Pcdt's PlcPcd maps CP ranges to file
  * offsets with the fCompressed bit choosing CP-1252 (8-bit at fc/2) or
  * UTF-16LE (at fc) per piece. Only the main-document range (ccpText) is
  * emitted. Title from the (\u0005-prefixed) SummaryInformation property set.
  *
  * Text-to-block mapping: 0x0D = paragraph mark, 0x0C = page break (its
  * own break, recorded like RTF's \page with multiplicity), 0x0B (vertical
  * tab / line break) → newline inside the paragraph, 0x07 (cell/row mark)
  * → paragraph mark (tables degrade to cell paragraphs — the documented
  * bound; full SPRM/TAP table reconstruction is out of scope), field
  * separators 0x13/0x14/0x15 and hyperlink markers drop.
  */
object DocExtract {

  final case class WordDoc(title: String, paragraphs: Seq[String], pageBreaks: Seq[Int]) {
    def pageCount: Int = 1 + pageBreaks.size
  }

  private def u16(d: Array[Byte], p: Int): Int =
    (d(p) & 0xff) | ((d(p + 1) & 0xff) << 8)
  private def u32(d: Array[Byte], p: Int): Long =
    (d(p) & 0xffL) | ((d(p + 1) & 0xffL) << 8) |
      ((d(p + 2) & 0xffL) << 16) | ((d(p + 3) & 0xffL) << 24)

  private val Cp1252 = java.nio.charset.Charset.forName("windows-1252")

  def extract(bytes: Array[Byte]): Either[String, WordDoc] =
    CfbExtract.readStreams(bytes).flatMap { streams =>
      try {
        val wd = streams.getOrElse("WordDocument",
          throw new IllegalStateException("no WordDocument stream"))
        require(u16(wd, 0) == 0xA5EC, "bad FIB wIdent (not a Word binary)")
        val flags = u16(wd, 0x0A)
        val tableName = if ((flags & 0x0200) != 0) "1Table" else "0Table"
        val table = streams.getOrElse(tableName,
          throw new IllegalStateException(s"no $tableName stream"))
        // FIB variable parts: csw @0x20, FibRgW97 (2*csw), cslw,
        // FibRgLw97 (4*cslw) with ccpText at +12, cbRgFcLcb, then the
        // (fc,lcb) pairs — fcClx/lcbClx are pair 33
        val csw = u16(wd, 0x20)
        val lwBase = 0x22 + 2 * csw + 2
        val cslw = u16(wd, lwBase - 2)
        val ccpText = u32(wd, lwBase + 12).toInt
        val fcLcbBase = lwBase + 4 * cslw + 2
        val fcClx = u32(wd, fcLcbBase + 33 * 8).toInt
        val lcbClx = u32(wd, fcLcbBase + 33 * 8 + 4).toInt
        require(fcClx >= 0 && lcbClx > 0 && fcClx + lcbClx <= table.length, "bad Clx range")

        // Clx: skip Prcs (clxt 0x01), then Pcdt (clxt 0x02)
        var p = fcClx
        while ((table(p) & 0xff) == 0x01) p += 3 + u16(table, p + 1)
        require((table(p) & 0xff) == 0x02, "no Pcdt in Clx")
        val lcb = u32(table, p + 1).toInt
        val plc = p + 5
        val n = (lcb - 4) / 12
        require(n > 0, "empty piece table")
        val cps = (0 to n).map(i => u32(table, plc + 4 * i).toInt)

        val sb = new StringBuilder
        var i = 0
        while (i < n && sb.length < ccpText) {
          val pcd = plc + 4 * (n + 1) + 8 * i
          val fcRaw = u32(table, pcd + 2)
          val compressed = (fcRaw & 0x40000000L) != 0
          val off = (fcRaw & 0x3FFFFFFFL).toInt
          val chars = math.min(cps(i + 1) - cps(i), ccpText - sb.length)
          if (compressed)
            sb ++= new String(wd, off / 2, chars, Cp1252)
          else
            sb ++= new String(wd, off, chars * 2, java.nio.charset.StandardCharsets.UTF_16LE)
          i += 1
        }

        val paragraphs = ArrayBuffer[String]()
        val pageBreaks = ArrayBuffer[Int]()
        val cur = new StringBuilder
        def flush(): Unit = {
          val t = DocxExtract.collapseWs(cur.toString)
          if (t.nonEmpty) paragraphs += t
          cur.clear()
        }
        // fields: 0x13 begins a field (INSTRUCTION phase -- the raw field
        // code like HYPERLINK/PAGEREF plus switches, skipped entirely),
        // 0x14 separates (RESULT phase -- the display text, kept), 0x15
        // ends. Fields nest (a TOC's result contains PAGEREF fields), so
        // the phase is a stack.
        val fieldPhase = scala.collection.mutable.Stack[Boolean]() // true = instruction
        def inInstruction: Boolean = fieldPhase.exists(identity)
        sb.foreach {
          case '\u0013' => fieldPhase.push(true)
          case '\u0014' =>
            if (fieldPhase.nonEmpty) { fieldPhase.pop(); fieldPhase.push(false) }
          case '\u0015' => if (fieldPhase.nonEmpty) { fieldPhase.pop(); () }
          case _ if inInstruction => ()
          case '\r' | '\u0007' => flush()
          case '\f' => flush(); pageBreaks += paragraphs.length
          case '\u000B' => cur += '\n'
          case c if c < ' ' && c != '\t' && c != '\n' => ()
          case c => cur += c
        }
        flush()

        val title = streams.get("\u0005SummaryInformation")
          .map(CfbExtract.summaryTitle).getOrElse("")
        Right(WordDoc(title, paragraphs.toSeq, pageBreaks.toSeq))
      } catch {
        case e: Exception =>
          Left(s"doc_parse_error: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }

  // ------------------------------------------------------------ writer
  /** Deterministic .doc fixture: two pieces exercise BOTH piece decodings —
    * the first half of the paragraphs as a compressed (CP-1252) piece, the
    * rest as a UTF-16LE piece. `pageBreakBefore` = paragraph indices that a
    * page break precedes ([[WordDoc.pageBreaks]] round-trips them).
    */
  def buildDoc(
      title: String,
      paragraphs: Seq[String],
      pageBreakBefore: Seq[Int] = Nil): Array[Byte] = {
    require(paragraphs.nonEmpty, "at least one paragraph")
    val text = new StringBuilder
    paragraphs.zipWithIndex.foreach { case (para, i) =>
      if (pageBreakBefore.contains(i)) text += '\f'
      text ++= para
      text += '\r'
    }
    val full = text.toString
    val split = full.length / 2
    // CP-1252 can hold any Latin-1 fixture text; keep piece 1 pure-ASCII
    // safe by splitting at a char boundary (every char is one code unit)
    val piece1 = full.substring(0, split)
    val piece2 = full.substring(split)

    val textStart = 0x0200
    val p1Bytes = piece1.getBytes(Cp1252)
    val p2Bytes = piece2.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)

    val wd = new java.io.ByteArrayOutputStream()
    val fib = new Array[Byte](textStart)
    def put16(p: Int, v: Int): Unit = { fib(p) = (v & 0xff).toByte; fib(p + 1) = ((v >> 8) & 0xff).toByte }
    def put32(p: Int, v: Long): Unit = {
      fib(p) = (v & 0xff).toByte; fib(p + 1) = ((v >> 8) & 0xff).toByte
      fib(p + 2) = ((v >> 16) & 0xff).toByte; fib(p + 3) = ((v >> 24) & 0xff).toByte
    }
    put16(0x00, 0xA5EC) // wIdent
    put16(0x02, 0x00C1) // nFib (Word 97)
    put16(0x0A, 0x0200) // fWhichTblStm = 1 -> 1Table
    put16(0x20, 14) // csw
    val lwBase = 0x22 + 2 * 14 + 2
    put16(lwBase - 2, 22) // cslw
    put32(lwBase + 12, full.length.toLong) // ccpText
    val fcLcbBase = lwBase + 4 * 22 + 2
    put16(fcLcbBase - 2, 93) // cbRgFcLcb (Word 97)
    wd.write(fib)
    wd.write(p1Bytes)
    wd.write(p2Bytes)

    // 1Table: Clx = one Prc-free Pcdt
    val nPieces = 2
    val clx = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      clx.write((v & 0xff).toInt); clx.write(((v >> 8) & 0xff).toInt)
      clx.write(((v >> 16) & 0xff).toInt); clx.write(((v >> 24) & 0xff).toInt)
    }
    clx.write(0x02)
    w32((4 * (nPieces + 1) + 8 * nPieces).toLong) // lcb
    w32(0); w32(piece1.length.toLong); w32(full.length.toLong) // CPs
    // PCD 1: compressed -> fc = 2*byteOffset | 0x40000000
    clx.write(0); clx.write(0)
    w32((2L * textStart) | 0x40000000L)
    clx.write(0); clx.write(0)
    // PCD 2: UTF-16LE at byte offset
    clx.write(0); clx.write(0)
    w32(textStart.toLong + p1Bytes.length)
    clx.write(0); clx.write(0)
    val clxBytes = clx.toByteArray

    val table = new java.io.ByteArrayOutputStream()
    table.write(clxBytes)
    val tableBytes = table.toByteArray
    // fcClx = 0 (Clx at the start of 1Table)
    val wdBytes = wd.toByteArray
    val patched = wdBytes.clone()
    def patch32(p: Int, v: Long): Unit = {
      patched(p) = (v & 0xff).toByte; patched(p + 1) = ((v >> 8) & 0xff).toByte
      patched(p + 2) = ((v >> 16) & 0xff).toByte; patched(p + 3) = ((v >> 24) & 0xff).toByte
    }
    patch32(fcLcbBase + 33 * 8, 0L)
    patch32(fcLcbBase + 33 * 8 + 4, clxBytes.length.toLong)

    CfbExtract.build(Seq(
      "WordDocument" -> patched,
      "1Table" -> tableBytes,
      "\u0005SummaryInformation" -> CfbExtract.buildSummary(title)))
  }
}
