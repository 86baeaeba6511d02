package graft.extract

import scala.collection.mutable.ArrayBuffer

/** EndNote XML bibliography → markdown reference list.
  *
  * In the reference's supported surface: `application/x-endnote+xml` sits
  * in its pandoc-supported MIME registry (`mime_types.py:92`); the
  * reference delegates to pandoc (citeproc). The EndNote export schema is
  * `<records><record>…` with text wrapped in `<style>` runs; the fields
  * used (normalized into [[BibtexExtract.render]]):
  *
  *   - kind: `ref-type/@name` lowercased (spaces → `-`), else `entry`
  *   - key: `rec-number` text when present, else `ref-N` by position
  *   - authors: every `contributors/authors/author`, joined `, `
  *   - title: `titles/title`; venue: `periodical/full-title`, else
  *     `titles/secondary-title`; year: `dates/year`
  *
  * Parsed with StAX exactly like the OOXML/ODF routes; a document with
  * no `<record>` throws (failure row).
  */
object EndnoteExtract {

  def toMarkdown(src: String): String = {
    val r = DocxExtract.reader(src.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val recs = ArrayBuffer.empty[String]
    val path = ArrayBuffer.empty[String]
    var kind = ""
    var key = ""
    var title = ""
    var venue2 = "" // secondary-title fallback
    var venue = ""
    var year = ""
    val authors = ArrayBuffer.empty[String]
    val text = new StringBuilder
    def inRecord = path.contains("record")
    def reset(): Unit = {
      kind = ""; key = ""; title = ""; venue = ""; venue2 = ""; year = ""
      authors.clear()
    }
    try {
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            val name = r.getLocalName
            path += name
            // <style> runs wrap every field's text in the EndNote export
            // schema — transparent: accumulate across them so
            // <title><style>A</style><style>B</style></title> yields "AB"
            if (name != "style") text.clear()
            if (name == "record") reset()
            else if (name == "ref-type" && inRecord) {
              val n = DocxExtract.attr(r, "name")
              if (n.nonEmpty) kind = n.toLowerCase.replace(' ', '-')
            }
          case javax.xml.stream.XMLStreamConstants.CHARACTERS =>
            text.append(r.getText)
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            val name = r.getLocalName
            val t = text.toString.trim
            if (inRecord && t.nonEmpty) name match {
              case "rec-number" => key = t
              case "author" => authors += t
              case "title" if path.contains("titles") => if (title.isEmpty) title = t
              case "secondary-title" => venue2 = t
              case "full-title" if path.contains("periodical") => venue = t
              case "year" if path.contains("dates") => year = t
              case _ => ()
            }
            if (name == "record") {
              val k = if (key.nonEmpty) key else s"ref-${recs.size + 1}"
              recs += BibtexExtract.render(
                if (kind.nonEmpty) kind else "entry", k,
                Map("author" -> authors.mkString(", "), "year" -> year,
                  "title" -> title,
                  "journal" -> (if (venue.nonEmpty) venue else venue2)))
            }
            if (path.nonEmpty) path.remove(path.length - 1)
            if (name != "style") text.clear()
          case _ => ()
        }
      }
    } finally r.close()
    if (recs.isEmpty) throw new IllegalArgumentException("endnote: no records")
    recs.mkString("\n")
  }
}
