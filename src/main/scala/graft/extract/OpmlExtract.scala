package graft.extract

import scala.collection.mutable.ArrayBuffer

/** OPML (Outline Processor Markup Language) → markdown.
  *
  * In the reference's supported surface: `application/x-opml+xml` sits in
  * its pandoc-supported MIME registry (`mime_types.py:97`); the reference
  * delegates to pandoc. OPML 2.0 is a public spec: `<head><title>` and a
  * `<body>` of nested `<outline>` elements whose payload lives in
  * attributes:
  *
  *   - `head/title` → `#` heading
  *   - each `outline` → one bullet line from `@text` (falling back to
  *     `@title`), indented two spaces per nesting level; the whole body
  *     renders as ONE list block
  *   - an `outline` with `@xmlUrl` (the RSS-subscription idiom) renders
  *     its text as `[text](xmlUrl)`
  *   - `@_note` (the note-taking idiom) appends after an em-dash
  *
  * All parse state is call-local. A document with no outline and no
  * title throws (failure row).
  */
object OpmlExtract {

  def toMarkdown(src: String): String = {
    val r = DocxExtract.reader(src.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val blocks = ArrayBuffer.empty[String]
    val lines = ArrayBuffer.empty[String]
    val path = ArrayBuffer.empty[String]
    val text = new StringBuilder
    var depth = 0
    try {
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            val name = r.getLocalName
            name match {
              case "title" if path.lastOption.contains("head") => text.clear()
              case "outline" =>
                val t0 = DocxExtract.attr(r, "text")
                val t = if (t0.nonEmpty) t0 else DocxExtract.attr(r, "title")
                val url = DocxExtract.attr(r, "xmlUrl")
                val note = DocxExtract.attr(r, "_note")
                val label = if (url.nonEmpty) s"[$t]($url)" else t
                val full = if (note.nonEmpty) s"$label — $note" else label
                if (t.nonEmpty) lines += ("  " * depth) + "- " + full
                depth += 1
              case _ => ()
            }
            path += name
          case javax.xml.stream.XMLStreamConstants.CHARACTERS =>
            text.append(r.getText)
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            val name = r.getLocalName
            if (path.nonEmpty) path.remove(path.length - 1)
            name match {
              case "title" if path.lastOption.contains("head") =>
                val t = DocxExtract.collapseWs(text.toString).trim
                if (t.nonEmpty) blocks += s"# $t"
              case "outline" => depth -= 1
              case _ => ()
            }
          case _ => ()
        }
      }
    } finally r.close()
    if (lines.nonEmpty) blocks += lines.mkString("\n")
    if (blocks.isEmpty) throw new IllegalArgumentException("opml: no content")
    blocks.mkString("\n\n")
  }
}
