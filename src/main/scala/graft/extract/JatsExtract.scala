package graft.extract

import scala.collection.mutable.ArrayBuffer

/** JATS (Journal Article Tag Suite) XML → markdown.
  *
  * In the reference's supported surface: `application/x-jats+xml` sits in
  * its pandoc-supported MIME registry (`mime_types.py:96`); the reference
  * delegates to pandoc. From-scratch deterministic subset of the public
  * NISO JATS vocabulary, parsed with StAX:
  *
  *   - `front/article-meta/title-group/article-title` → `#` heading
  *   - `abstract` → `## Abstract` heading, then its paragraphs
  *   - `body`: `sec` nests; a `title` directly inside a `sec` renders at
  *     `1 + sec-nesting` (first-level sec title = `##`, capped `######`)
  *   - `p` → paragraph; `preformat` → fenced code
  *   - `list[@list-type]` + `list-item` → markdown lists (`order` →
  *     numbered), nested two spaces per level, one block per outermost
  *     list — the same shape as the DocBook route
  *   - inline: `italic` → `*..*`, `bold` → `**..**`,
  *     `monospace`/`code` → backticks, `ext-link@xlink:href` →
  *     `[text](href)`, `xref` passes its text through
  *   - `fig/graphic@xlink:href` → `![href](href)` reference;
  *     `fig/caption/p` renders as a normal paragraph after it
  *
  * All parse state is call-local. A document with no rendered block
  * throws (failure row).
  */
object JatsExtract {

  def toMarkdown(src: String): String = {
    val r = DocxExtract.reader(src.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val blocks = ArrayBuffer.empty[String]
    val path = ArrayBuffer.empty[String]
    val inline = new StringBuilder
    var secDepth = 0
    var abstractEmitted = false
    val list = new MdShared.ListBuilder // marker machine shared with DocBook
    var verbatim: StringBuilder = null
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
            if (verbatim == null) name match {
              case "sec" => secDepth += 1
              case "abstract" =>
                if (!abstractEmitted) { blocks += "## Abstract"; abstractEmitted = true }
              case "article-title" if path.contains("title-group") => inline.clear()
              case "title" if path.nonEmpty && path.last == "sec" => inline.clear()
              case "p" => inline.clear()
              case "preformat" => verbatim = new StringBuilder
              case "list" =>
                list.openList(ordered = DocxExtract.attr(r, "list-type") == "order")
              case "list-item" =>
                inline.clear()
                list.openItem()
              case "italic" => inline.append('*')
              case "bold" => inline.append("**")
              case "monospace" | "code" => inline.append('`')
              case "ext-link" =>
                inline.append('[')
                linkTargets = DocxExtract.attr(r, "href") :: linkTargets
              case "graphic" | "inline-graphic" =>
                val href = DocxExtract.attr(r, "href")
                if (href.nonEmpty) blocks += s"![$href]($href)"
              case _ => ()
            }
            path += name
          case javax.xml.stream.XMLStreamConstants.CHARACTERS |
               javax.xml.stream.XMLStreamConstants.CDATA =>
            if (verbatim != null) verbatim.append(r.getText)
            else inline.append(r.getText)
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            val name = r.getLocalName
            if (path.nonEmpty) path.remove(path.length - 1)
            if (verbatim != null) {
              if (name == "preformat") {
                val body = verbatim.toString.stripPrefix("\n").stripTrailing()
                blocks += MdShared.fence(body, "")
                verbatim = null
              }
            } else name match {
              case "sec" => secDepth -= 1
              case "article-title" if path.contains("title-group") =>
                val t = flushInline()
                if (t.nonEmpty) blocks += s"# $t"
              case "title" if path.nonEmpty && path.last == "sec" =>
                val t = flushInline()
                if (t.nonEmpty)
                  blocks += ("#" * math.min(secDepth + 1, 6)) + " " + t
              case "p" =>
                val t = flushInline()
                if (t.nonEmpty) {
                  if (list.inItem) list.text(t) else blocks += t
                }
              case "list-item" =>
                val t = flushInline()
                if (t.nonEmpty && list.itemPending) list.text(t)
                list.closeItem()
              case "list" =>
                list.closeList().foreach(blocks += _)
              case "italic" => inline.append('*')
              case "bold" => inline.append("**")
              case "monospace" | "code" => inline.append('`')
              case "ext-link" =>
                val target = linkTargets.headOption.getOrElse("")
                linkTargets = linkTargets.drop(1)
                inline.append(s"]($target)")
              case _ => ()
            }
          case _ => ()
        }
      }
    } finally r.close()
    if (blocks.isEmpty) throw new IllegalArgumentException("jats: no content")
    blocks.mkString("\n\n")
  }
}
