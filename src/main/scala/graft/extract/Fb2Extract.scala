package graft.extract

import scala.collection.mutable.ArrayBuffer

/** FictionBook 2 (.fb2) XML → markdown.
  *
  * In the reference's supported surface: `application/x-fictionbook+xml`
  * sits in its pandoc-supported MIME registry (`mime_types.py:86`); the
  * reference delegates to pandoc. From-scratch deterministic subset of
  * the public FictionBook 2.0 schema, parsed with StAX:
  *
  *   - `description/title-info/book-title` → `#` heading
  *   - inside a `body`: `<title>` renders as a heading at
  *     `1 + section-nesting` (a body-level title is `#`, a first-level
  *     `section` title `##`, capped at `######`); the `<p>` lines inside
  *     a title join with a single space
  *   - `<p>` → paragraph; `<empty-line/>` ignored
  *   - `<poem>`/`<stanza>`/`<v>` → one block per stanza, verse lines
  *     joined by newline; `<cite>` paragraphs render as `> ` quotes
  *   - inline: `<emphasis>` → `*..*`, `<strong>` → `**..**`,
  *     `<code>` → backticks, `<a l:href>` → `[text](href)`
  *   - `<image l:href="#id"/>` → `![id](id)` reference (the `#` anchor
  *     strips; `<binary>` payloads are not decoded — reference-only,
  *     same bound as the markdown image grammar)
  *
  * All parse state is call-local. A document with no rendered block
  * throws (failure row).
  */
object Fb2Extract {

  def toMarkdown(src: String): String = {
    val r = DocxExtract.reader(src.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val blocks = ArrayBuffer.empty[String]
    val path = ArrayBuffer.empty[String]
    val inline = new StringBuilder
    var inBody = false
    var sectionDepth = 0
    var inTitle = false
    val titleParts = ArrayBuffer.empty[String]
    var inCite = false
    val verseLines = ArrayBuffer.empty[String]
    var linkTargets = List.empty[String]

    def flushInline(): String = {
      val t = DocxExtract.collapseWs(inline.toString).trim
      inline.clear()
      t
    }

    try {
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            val name = r.getLocalName
            name match {
              case "body" => inBody = true
              case "section" if inBody => sectionDepth += 1
              case "title" if inBody =>
                inTitle = true; titleParts.clear(); inline.clear()
              case "book-title" => inline.clear()
              case "p" | "v" | "subtitle" | "text-author" => inline.clear()
              case "poem" => verseLines.clear()
              case "stanza" => verseLines.clear()
              case "cite" => inCite = true
              case "emphasis" => inline.append('*')
              case "strong" => inline.append("**")
              case "code" => inline.append('`')
              case "a" =>
                inline.append('[')
                linkTargets = DocxExtract.attr(r, "href") :: linkTargets
              case "image" =>
                val href = DocxExtract.attr(r, "href").stripPrefix("#")
                if (href.nonEmpty) blocks += s"![$href]($href)"
              case _ => ()
            }
            path += name
          case javax.xml.stream.XMLStreamConstants.CHARACTERS |
               javax.xml.stream.XMLStreamConstants.CDATA =>
            // binary payloads (base64) never reach inline: skipped by path
            if (!path.contains("binary")) inline.append(r.getText)
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            val name = r.getLocalName
            if (path.nonEmpty) path.remove(path.length - 1)
            name match {
              case "body" => inBody = false
              case "section" if inBody => sectionDepth -= 1
              case "book-title" =>
                val t = flushInline()
                if (t.nonEmpty) blocks += s"# $t"
              case "title" if inBody =>
                inTitle = false
                val t = titleParts.mkString(" ")
                if (t.nonEmpty)
                  blocks += ("#" * math.min(sectionDepth + 1, 6)) + " " + t
              case "p" =>
                val t = flushInline()
                if (t.nonEmpty) {
                  if (inTitle) titleParts += t
                  else if (inCite) blocks += s"> $t"
                  else blocks += t
                }
              case "subtitle" =>
                val t = flushInline()
                if (t.nonEmpty)
                  blocks += ("#" * math.min(sectionDepth + 2, 6)) + " " + t
              case "v" =>
                val t = flushInline()
                if (t.nonEmpty) verseLines += t
              case "stanza" =>
                if (verseLines.nonEmpty) {
                  blocks += verseLines.mkString("\n")
                  verseLines.clear()
                }
              case "text-author" =>
                val t = flushInline()
                if (t.nonEmpty) blocks += s"— $t"
              case "cite" => inCite = false
              case "emphasis" => inline.append('*')
              case "strong" => inline.append("**")
              case "code" => inline.append('`')
              case "a" =>
                val target = linkTargets.headOption.getOrElse("")
                linkTargets = linkTargets.drop(1)
                inline.append(s"]($target)")
              case _ => ()
            }
          case _ => ()
        }
      }
    } finally r.close()
    if (blocks.isEmpty) throw new IllegalArgumentException("fb2: no content")
    blocks.mkString("\n\n")
  }
}
