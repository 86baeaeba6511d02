package graft.extract

/** Page-range string handling ("1-5,7,9-11"), the reference's pre-parse
  * pushdown primitive (pdf_utils.py:22-87): filtering pages *before* the
  * expensive layout stage is our predicate-pushdown analog.
  */
object PageRange {

  /** Parse a range string into the set of page numbers, optionally shifted
    * (e.g. -1 for 1-based → 0-based).
    *
    * @throws IllegalArgumentException on malformed input or negative result
    */
  def parse(pageRange: String, shift: Int = 0): Set[Int] = {
    val shifted = if (shift != 0) shiftRange(pageRange, shift) else pageRange
    val out = Set.newBuilder[Int]
    shifted.split(',').foreach { part =>
      if (part.contains('-')) {
        val bounds = part.split('-')
        if (bounds.length != 2) malformed(pageRange)
        val (start, end) = (toInt(bounds(0), pageRange), toInt(bounds(1), pageRange))
        out ++= (start to end)
      } else out += toInt(part, pageRange)
    }
    out.result()
  }

  /** Shift every page number in a range string; rejects shifts that would
    * produce negative pages ("Invalid shift", pdf_utils.py:68-79).
    */
  def shiftRange(pageRange: String, shift: Int): String =
    pageRange.split(',').map { part =>
      if (part.contains('-')) {
        val bounds = part.split('-')
        if (bounds.length != 2) malformed(pageRange)
        val (start, end) = (toInt(bounds(0), pageRange), toInt(bounds(1), pageRange))
        if (start + shift < 0 || end + shift < 0) invalidShift(shift, pageRange)
        s"${start + shift}-${end + shift}"
      } else {
        val page = toInt(part, pageRange)
        if (page + shift < 0) invalidShift(shift, pageRange)
        (page + shift).toString
      }
    }.mkString(",")

  private def toInt(s: String, full: String): Int =
    try s.trim.toInt catch { case _: NumberFormatException => malformed(full) }

  private def malformed(r: String): Nothing =
    throw new IllegalArgumentException(
      s"Invalid page range format: $r. Expected format: '1-5,7,9-11'")

  private def invalidShift(shift: Int, r: String): Nothing =
    throw new IllegalArgumentException(s"Invalid shift $shift for page range $r")
}
