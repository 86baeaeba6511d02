package graft.extract

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** Excel Binary 2007 (.xlsb) extraction — [MS-XLSB] BIFF12 records inside
  * the OOXML ZIP container. `application/vnd.ms-excel.sheet.binary.
  * macroEnabled.12` is in the reference's spreadsheet surface
  * (EXCEL_BINARY_2007_MIME_TYPE, `mime_types.py:22`; `.xlsb`,
  * `mime_types.py:133`). Output is the same sheet→pipe-table shape as the
  * XLSX/XLS routes ([[OfficeExtract.XlsxDoc]]).
  *
  * BIFF12 framing ([MS-XLSB] 2.1.4): record type is one or two bytes
  * (7 bits each, bit 7 of the first byte marks a second), record length a
  * 1-4-byte 7-bit varint. Parts used: `xl/workbook.bin` BrtBundleSh
  * records (sheet name + rId, resolved through the XML
  * `xl/_rels/workbook.bin.rels`), `xl/sharedStrings.bin` BrtSSTItem
  * strings, and per-sheet BrtRowHdr + cell records (Cell common prefix =
  * col u32 + style u24 + flags u8, [MS-XLSB] 2.5.9): BrtCellRk (RkNumber,
  * identical to the BIFF8 encoding), BrtCellReal, BrtCellBool,
  * BrtCellIsst, BrtCellSt, and the BrtFmla* cached values. Strings are
  * XLWideString (cch u32 + UTF-16LE). Unknown records skip by length, so
  * styles/dimensions/extension records pass through safely. Title from
  * `docProps/core.xml` exactly as XLSX.
  */
object XlsbExtract {

  // [MS-XLSB] 2.3 record enumeration (decimal ids)
  private val BrtRowHdr = 0x00
  private val BrtCellRk = 0x02
  private val BrtCellBool = 0x04
  private val BrtCellReal = 0x05
  private val BrtCellSt = 0x06
  private val BrtCellIsst = 0x07
  private val BrtFmlaString = 0x08
  private val BrtFmlaNum = 0x09
  private val BrtFmlaBool = 0x0A
  private val BrtSSTItem = 0x13
  private val BrtBeginBook = 0x83
  private val BrtEndBook = 0x84
  private val BrtBeginBundleShs = 0x8F
  private val BrtEndBundleShs = 0x90
  private val BrtBeginSheet = 0x81
  private val BrtEndSheet = 0x82
  private val BrtBeginSheetData = 0x91
  private val BrtEndSheetData = 0x92
  private val BrtBundleSh = 0x9C
  private val BrtBeginSst = 0x9F
  private val BrtEndSst = 0xA0

  private def u16(d: Array[Byte], p: Int): Int =
    (d(p) & 0xff) | ((d(p + 1) & 0xff) << 8)
  private def u32(d: Array[Byte], p: Int): Long =
    (d(p) & 0xffL) | ((d(p + 1) & 0xffL) << 8) |
      ((d(p + 2) & 0xffL) << 16) | ((d(p + 3) & 0xffL) << 24)
  private def f64(d: Array[Byte], p: Int): Double = {
    var bits = 0L
    var k = 7
    while (k >= 0) { bits = (bits << 8) | (d(p + k) & 0xffL); k -= 1 }
    java.lang.Double.longBitsToDouble(bits)
  }

  /** XLWideString at `p`: (value, next offset). */
  private def wideStr(d: Array[Byte], p: Int): (String, Int) = {
    val cch = u32(d, p).toInt
    if (cch < 0 || p + 4 + 2L * cch > d.length)
      throw new IllegalStateException("XLWideString overruns record")
    (new String(d, p + 4, 2 * cch, java.nio.charset.StandardCharsets.UTF_16LE),
      p + 4 + 2 * cch)
  }

  /** Iterate BIFF12 records: callback(type, bodyStart, bodyLen). */
  private def records(d: Array[Byte])(f: (Int, Int, Int) => Unit): Unit = {
    var p = 0
    while (p < d.length) {
      var t = d(p) & 0xff
      p += 1
      if ((t & 0x80) != 0) {
        if (p >= d.length) throw new IllegalStateException("truncated record type")
        t = (t & 0x7f) | ((d(p) & 0x7f) << 7)
        p += 1
      }
      var len = 0
      var shift = 0
      var more = true
      while (more) {
        if (p >= d.length) throw new IllegalStateException("truncated record length")
        val b = d(p) & 0xff
        p += 1
        len |= (b & 0x7f) << shift
        shift += 7
        more = (b & 0x80) != 0 && shift < 28
      }
      if (p + len > d.length) throw new IllegalStateException("record overruns part")
      f(t, p, len)
      p += len
    }
  }

  def extract(bytes: Array[Byte]): Either[String, OfficeExtract.XlsxDoc] =
    try {
      val entries = DocxExtract.readZip(bytes)
      val wb = entries.getOrElse("xl/workbook.bin",
        throw new IllegalStateException("no xl/workbook.bin part"))

      // sheet bundle: name + rId, resolved through the (XML) rels part
      val bundles = ArrayBuffer[(String, String)]() // (name, rId)
      records(wb) { (t, p, _) =>
        if (t == BrtBundleSh) {
          var q = p + 8 // hsState u32 + iTabID u32
          val relLen = u32(wb, q).toInt
          val relId =
            if (relLen == -1) "" // XLNullableWideString null
            else {
              val (s, n) = wideStr(wb, q); q = n; s
            }
          if (relLen == -1) q += 4
          val (name, _) = wideStr(wb, q)
          bundles += ((name, relId))
        }
      }
      if (bundles.isEmpty) throw new IllegalStateException("no BrtBundleSh records")
      val rels: Map[String, String] = entries.get("xl/_rels/workbook.bin.rels")
        .map(DocxExtract.parseRels).getOrElse(Map.empty)

      // shared strings
      val sst = ArrayBuffer[String]()
      entries.get("xl/sharedStrings.bin").foreach { ss =>
        records(ss) { (t, p, _) =>
          if (t == BrtSSTItem) sst += wideStr(ss, p + 1)._1 // flags u8 first
        }
      }

      val sheets = bundles.zipWithIndex.map { case ((name, relId), i) =>
        val target = rels.get(relId)
          .map(t => DocxExtract.normalizePath(if (t.startsWith("/")) t.drop(1) else "xl/" + t))
          .getOrElse(s"xl/worksheets/sheet${i + 1}.bin") // rels-less fallback
        val part = entries.getOrElse(target,
          throw new IllegalStateException(s"missing sheet part $target"))
        OfficeExtract.Sheet(name, sheetTable(part, sst.toIndexedSeq))
      }.toSeq

      val title = entries.get("docProps/core.xml")
        .map(DocxExtract.coreTitle).getOrElse("")
      Right(OfficeExtract.XlsxDoc(title, sheets))
    } catch {
      case e: Exception =>
        Left(s"xlsb_parse_error: ${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  /** One worksheet part → markdown pipe table (XLSX shape). */
  private def sheetTable(d: Array[Byte], sst: IndexedSeq[String]): String = {
    val cells = mutable.Map[(Int, Int), String]()
    var row = 0
    records(d) { (t, p, _) =>
      def col = u32(d, p).toInt // Cell common prefix: col u32 + style/flags u32
      t match {
        case BrtRowHdr => row = u32(d, p).toInt
        case BrtCellRk => cells((row, col)) = XlsExtract.numText(XlsExtract.rkValue(u32(d, p + 8)))
        case BrtCellReal => cells((row, col)) = XlsExtract.numText(f64(d, p + 8))
        case BrtCellBool => cells((row, col)) = if (d(p + 8) != 0) "TRUE" else "FALSE"
        case BrtCellIsst =>
          val isst = u32(d, p + 8).toInt
          cells((row, col)) = sst.lift(isst)
            .getOrElse(throw new IllegalStateException(s"SST index $isst"))
        case BrtCellSt => cells((row, col)) = wideStr(d, p + 8)._1
        case BrtFmlaNum => cells((row, col)) = XlsExtract.numText(f64(d, p + 8))
        case BrtFmlaBool => cells((row, col)) = if (d(p + 8) != 0) "TRUE" else "FALSE"
        case BrtFmlaString => cells((row, col)) = wideStr(d, p + 8)._1
        case _ => () // dimensions/styles/extensions skip by length
      }
    }
    if (cells.isEmpty) return ""
    val byRow = cells.groupBy(_._1._1)
    val grid = byRow.keys.toSeq.sorted.map { r =>
      val rowCells = byRow(r)
      val maxC = rowCells.keysIterator.map(_._2).max
      (0 to maxC).map(c => rowCells.getOrElse((r, c), ""))
    }
    DocxExtract.tableMd(grid)
  }

  // ------------------------------------------------------------ writer

  /** Deterministic BIFF12 writer — the encode side of the round-trip.
    * Emits the spec container shape (BrtBeginBook/BundleShs wrappers, an
    * XML rels part, a real shared-string table, BrtBeginSheetData cell
    * blocks) with the same cell-type choices as [[XlsExtract.buildXls]]:
    * strings → SST BrtCellIsst, ints → BrtCellRk, doubles → BrtCellReal,
    * booleans → BrtCellBool.
    */
  def buildXlsb(title: String, sheets: Seq[(String, Seq[Seq[XlsExtract.XlsCell]])]): Array[Byte] = {
    import XlsExtract.{XlsBool, XlsNum, XlsRkInt, XlsStr}
    require(sheets.nonEmpty, "at least one sheet")
    class B {
      val o = new java.io.ByteArrayOutputStream()
      def w8(v: Int): B = { o.write(v & 0xff); this }
      def w16(v: Int): B = { w8(v); w8(v >> 8) }
      def w32(v: Long): B = { w16((v & 0xffff).toInt); w16(((v >> 16) & 0xffff).toInt) }
      def f64(x: Double): B = {
        val bits = java.lang.Double.doubleToLongBits(x)
        var k = 0
        while (k < 8) { w8(((bits >> (8 * k)) & 0xff).toInt); k += 1 }
        this
      }
      def ws(s: String): B = { // XLWideString
        w32(s.length.toLong)
        o.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_16LE))
        this
      }
      def arr: Array[Byte] = o.toByteArray
    }
    def rec(t: Int, body: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      if (t < 0x80) o.write(t)
      else { o.write((t & 0x7f) | 0x80); o.write((t >> 7) & 0x7f) }
      var len = body.length
      var more = true
      while (more) {
        val b = len & 0x7f
        len >>>= 7
        more = len != 0
        o.write(if (more) b | 0x80 else b)
      }
      o.write(body)
      o.toByteArray
    }

    // SST in first-appearance order
    val sstIndex = mutable.LinkedHashMap[String, Int]()
    var cstTotal = 0L
    sheets.foreach(_._2.foreach(_.foreach {
      case XlsStr(s) =>
        cstTotal += 1
        if (!sstIndex.contains(s)) sstIndex(s) = sstIndex.size
      case _ => ()
    }))
    val sstPart = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(rec(BrtBeginSst, new B().w32(cstTotal).w32(sstIndex.size.toLong).arr))
      sstIndex.keys.foreach(s => o.write(rec(BrtSSTItem, new B().w8(0).ws(s).arr)))
      o.write(rec(BrtEndSst, Array.emptyByteArray))
      o.toByteArray
    }

    def cellPrefix(c: Int): B = new B().w32(c.toLong).w32(0L)
    val sheetParts = sheets.map { case (_, rows) =>
      val o = new java.io.ByteArrayOutputStream()
      o.write(rec(BrtBeginSheet, Array.emptyByteArray))
      o.write(rec(BrtBeginSheetData, Array.emptyByteArray))
      rows.zipWithIndex.foreach { case (cols, r) =>
        o.write(rec(BrtRowHdr, new B().w32(r.toLong).w32(0L).w16(300).arr))
        cols.zipWithIndex.foreach { case (cell, c) =>
          cell match {
            case XlsStr(s) =>
              o.write(rec(BrtCellIsst, cellPrefix(c).w32(sstIndex(s).toLong).arr))
            case XlsRkInt(v) =>
              o.write(rec(BrtCellRk, cellPrefix(c).w32(((v.toLong << 2) | 0x2L) & 0xFFFFFFFFL).arr))
            case XlsNum(x) => o.write(rec(BrtCellReal, cellPrefix(c).f64(x).arr))
            case XlsBool(v) => o.write(rec(BrtCellBool, cellPrefix(c).w8(if (v) 1 else 0).arr))
          }
        }
      }
      o.write(rec(BrtEndSheetData, Array.emptyByteArray))
      o.write(rec(BrtEndSheet, Array.emptyByteArray))
      o.toByteArray
    }

    val wbPart = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(rec(BrtBeginBook, Array.emptyByteArray))
      o.write(rec(BrtBeginBundleShs, Array.emptyByteArray))
      sheets.zipWithIndex.foreach { case ((name, _), i) =>
        o.write(rec(BrtBundleSh,
          new B().w32(0L).w32((i + 1).toLong).ws(s"rId${i + 1}").ws(name).arr))
      }
      o.write(rec(BrtEndBundleShs, Array.emptyByteArray))
      o.write(rec(BrtEndBook, Array.emptyByteArray))
      o.toByteArray
    }

    val relsXml =
      ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" + "\n" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        sheets.indices.map(i =>
          s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.bin"/>""").mkString +
        "</Relationships>").getBytes(java.nio.charset.StandardCharsets.UTF_8)
    def esc(s: String): String = s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c => c.toString
    }
    val corePart =
      ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" + "\n" +
        """<cp:coreProperties xmlns:cp="http://schemas.openxmlformats.org/package/2006/metadata/core-properties" xmlns:dc="http://purl.org/dc/elements/1.1/">""" +
        s"<dc:title>${esc(title)}</dc:title></cp:coreProperties>")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)

    DocxExtract.writeZip(
      Seq("xl/workbook.bin" -> wbPart,
        "xl/_rels/workbook.bin.rels" -> relsXml,
        "xl/sharedStrings.bin" -> sstPart) ++
        sheetParts.zipWithIndex.map { case (p, i) => s"xl/worksheets/sheet${i + 1}.bin" -> p } ++
        (if (title.nonEmpty) Seq("docProps/core.xml" -> corePart) else Nil))
  }
}
