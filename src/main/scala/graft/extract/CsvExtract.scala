package graft.extract

import scala.collection.mutable.ArrayBuffer

/** Delimited-text (.csv / .tsv) extraction — `text/csv` and
  * `text/tab-separated-values` are in the reference's converter surface
  * (llamaparse_provider/provider.py:57-58; mime registry mime_types.py:99-
  * 100, EXT_TO_MIME `.csv`/`.tsv`). RFC 4180 grammar: fields separated by
  * the delimiter, records by CRLF or LF, `"`-quoted fields may embed
  * delimiters, newlines, and doubled quotes. Output is ONE markdown pipe
  * table (first record = header row), the same cell shape the
  * spreadsheet routes emit.
  */
object CsvExtract {

  /** RFC 4180 parse → rows of cells. Ragged rows are padded to the
    * widest row (the pipe-table contract wants a rectangle).
    */
  def parse(text: String, delimiter: Char): Seq[Seq[String]] = {
    val rows = ArrayBuffer[Seq[String]]()
    val row = ArrayBuffer[String]()
    val cell = new StringBuilder
    var i = 0
    var quoted = false
    var sawAny = false
    var rowSyntax = false // the row carried a delimiter or quote
    def endCell(): Unit = { row += cell.toString; cell.clear() }
    def endRow(): Unit = {
      endCell()
      // suppress blank LINES only: a record like `,,` or `""` is a valid
      // RFC 4180 data row of empty fields and must survive
      if (rowSyntax || row.exists(_.nonEmpty)) rows += row.toSeq
      row.clear()
      rowSyntax = false
    }
    while (i < text.length) {
      val c = text.charAt(i)
      if (quoted) {
        if (c == '"') {
          if (i + 1 < text.length && text.charAt(i + 1) == '"') { cell += '"'; i += 1 }
          else quoted = false
        } else cell += c
      } else c match {
        case '"' if cell.isEmpty => quoted = true; sawAny = true; rowSyntax = true
        case `delimiter` => endCell(); sawAny = true; rowSyntax = true
        case '\r' =>
          if (i + 1 < text.length && text.charAt(i + 1) == '\n') i += 1
          endRow()
        case '\n' => endRow()
        case other => cell += other; sawAny = true
      }
      i += 1
    }
    if (cell.nonEmpty || row.nonEmpty) endRow()
    if (!sawAny) return Nil
    val width = if (rows.isEmpty) 0 else rows.map(_.length).max
    rows.toSeq.map(r => r ++ Seq.fill(width - r.length)(""))
  }

  /** text → one markdown pipe table ("" for empty/blank input). */
  def toTableMd(text: String, delimiter: Char): String = {
    val rows = parse(text, delimiter)
    if (rows.isEmpty) "" else DocxExtract.tableMd(rows)
  }
}
