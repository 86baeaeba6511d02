package graft.extract

import scala.collection.mutable.ArrayBuffer

/** DocBook XML → markdown.
  *
  * In the reference's supported surface: `application/docbook+xml` sits
  * in its pandoc-supported MIME registry (`mime_types.py:84`); the
  * reference delegates to pandoc. From-scratch deterministic subset of
  * the public DocBook 4/5 vocabulary, parsed with StAX like the
  * OOXML/ODF routes:
  *
  *   - `article`/`book`/`chapter`/`section`/`sect1..5`/`appendix`/
  *     `preface`/`part` nest; a `title` directly inside one (or inside
  *     its transparent `info`/`articleinfo`/`bookinfo` wrapper) renders
  *     as a heading at the nesting depth (root title = `#`, capped `######`)
  *   - `para`/`simpara` → paragraphs; `programlisting`/`screen` →
  *     fenced code (language from `@language`; fence grows past any
  *     backtick run in the body)
  *   - `itemizedlist`/`orderedlist` + `listitem` → markdown lists,
  *     nested two spaces per level; an item's first `para` carries the
  *     marker, later paras continue indented under it so nested lists
  *     stay in document order, and the outermost list renders as ONE
  *     block (the same shape as the LaTeX and org routes)
  *   - inline: `emphasis` → `*..*` (`@role="bold"`/`"strong"` →
  *     `**..**`), `literal`/`code`/`command`/`filename`/`varname` →
  *     backticks, `ulink@url` / DocBook-5 `link@xlink:href` →
  *     `[text](url)`, `imagedata@fileref` → `![file](file)` block
  *
  * Unknown elements pass their content through. All parse state is local
  * to the call (executor-thread safe under local[32]). A document with
  * no rendered block throws (failure row).
  */
object DocbookExtract {

  private val SectionTags = Set("article", "book", "chapter", "section",
    "sect1", "sect2", "sect3", "sect4", "sect5", "appendix", "preface", "part")
  private val CodeTags = Set("literal", "code", "command", "filename", "varname")
  private val VerbatimTags = Set("programlisting", "screen")
  private val InfoTags = Set("info", "articleinfo", "bookinfo", "chapterinfo")

  def toMarkdown(src: String): String = {
    val r = DocxExtract.reader(src.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val blocks = ArrayBuffer.empty[String]
    val path = ArrayBuffer.empty[String]
    val inline = new StringBuilder
    var sectionDepth = 0
    // the outermost list renders as ONE block (same shape as the LaTeX
    // and org routes); the nesting/marker machine is shared with JATS
    val list = new MdShared.ListBuilder
    var linkTargets = List.empty[String]
    var emphMarks = List.empty[String]
    var verbatim: StringBuilder = null
    var verbLang = ""

    def flushInline(): String = {
      val t = DocxExtract.collapseWs(inline.toString).trim
      inline.clear()
      t
    }
    // effective parent of a just-closed/about-to-open element, with the
    // info wrappers transparent; `stack` must already end at the parent
    def sectionParent(stack: ArrayBuffer[String]): Boolean = {
      val eff = if (stack.nonEmpty && InfoTags.contains(stack.last))
        stack.dropRight(1) else stack
      eff.nonEmpty && SectionTags.contains(eff.last)
    }
    try {
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            val name = r.getLocalName
            if (verbatim == null) name match {
              case n if SectionTags.contains(n) => sectionDepth += 1
              case "title" if sectionParent(path) => inline.clear()
              case "para" | "simpara" => inline.clear()
              case n if VerbatimTags.contains(n) =>
                verbatim = new StringBuilder
                verbLang = DocxExtract.attr(r, "language")
              case "itemizedlist" => list.openList(ordered = false)
              case "orderedlist" => list.openList(ordered = true)
              case "listitem" =>
                inline.clear()
                list.openItem()
              case "emphasis" =>
                val role = DocxExtract.attr(r, "role")
                val m = if (role == "bold" || role == "strong") "**" else "*"
                inline.append(m)
                emphMarks = m :: emphMarks
              case n if CodeTags.contains(n) => inline.append('`')
              case "ulink" =>
                inline.append('[')
                linkTargets = DocxExtract.attr(r, "url") :: linkTargets
              case "link" =>
                inline.append('[')
                linkTargets = DocxExtract.attr(r, "href") :: linkTargets
              case "imagedata" =>
                val f = DocxExtract.attr(r, "fileref")
                if (f.nonEmpty) blocks += s"![$f]($f)"
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
              if (VerbatimTags.contains(name)) {
                val body = verbatim.toString.stripPrefix("\n").stripTrailing()
                blocks += MdShared.fence(body, verbLang)
                verbatim = null
              }
            } else name match {
              case n if SectionTags.contains(n) => sectionDepth -= 1
              case "title" if sectionParent(path) =>
                val t = flushInline()
                if (t.nonEmpty)
                  blocks += ("#" * math.min(math.max(sectionDepth, 1), 6)) + " " + t
              case "para" | "simpara" =>
                val t = flushInline()
                if (t.nonEmpty) {
                  if (list.inItem) list.text(t) else blocks += t
                }
              case "listitem" =>
                // a bare listitem with no para still renders its text
                val t = flushInline()
                if (t.nonEmpty && list.itemPending) list.text(t)
                list.closeItem()
              case "itemizedlist" | "orderedlist" =>
                list.closeList().foreach(blocks += _)
              case "emphasis" =>
                inline.append(emphMarks.headOption.getOrElse("*"))
                emphMarks = emphMarks.drop(1)
              case n if CodeTags.contains(n) => inline.append('`')
              case "ulink" | "link" =>
                val target = linkTargets.headOption.getOrElse("")
                linkTargets = linkTargets.drop(1)
                inline.append(s"]($target)")
              case _ => ()
            }
          case _ => ()
        }
      }
    } finally r.close()
    if (blocks.isEmpty) throw new IllegalArgumentException("docbook: no content")
    blocks.mkString("\n\n")
  }

}
