package graft.extract

import scala.collection.mutable.ArrayBuffer

/** Typst markup → markdown.
  *
  * In the reference's supported surface: `application/x-typst` sits in
  * its pandoc-supported MIME registry (`mime_types.py:99`); the reference
  * delegates to pandoc. From-scratch deterministic subset of the public
  * Typst markup syntax (typst.app/docs/reference/syntax), line-oriented:
  *
  *   - `= H` / `== H` / … → `#`/`##`/… headings (depth = `=` count,
  *     capped at 6)
  *   - `- item` bullet and `+ item` numbered lists; two-space indent
  *     nests; `+` items renumber 1..n per depth within one list block
  *   - triple-backtick raw blocks pass through as fences (language tag
  *     kept); inline `` `raw` `` stays
  *   - inline: `*bold*` → `**bold**`, `_emph_` → `*emph*`,
  *     `#link("url")[text]` → `[text](url)`, `#image("f.png")` →
  *     `![f.png](f.png)` as its own block
  *   - blank-line separated paragraphs; single newlines inside a
  *     paragraph join with a space
  *
  * Unknown `#function` calls pass through as text. A document rendering
  * no block throws (failure row).
  */
object TypstExtract {

  private val Heading = """^(=+)\s+(.*)$""".r
  private val Bullet = """^(\s*)-\s+(.*)$""".r
  private val Numbered = """^(\s*)\+\s+(.*)$""".r
  private val ImageCall = """^#image\("([^"]+)"[^)]*\)\s*$""".r
  private val LinkCall = """#link\("([^"]+)"\)\[([^\]]*)\]""".r
  // markers only trigger at word boundaries (typst syntax: *strong* /
  // _emph_ open after start/space/punct and close before end/space/punct)
  // — otherwise snake_case words and 2*3*4 arithmetic would corrupt, and
  // underscores inside already-rendered link URLs would re-process
  private val Bold = """(?<![\w*])\*(?=\S)((?:[^*\n]*?\S)?)\*(?![\w*])""".r
  private val Emph = """(?<![\w_])_(?=\S)((?:[^_\n]*?\S)?)_(?![\w_])""".r

  def toMarkdown(src: String): String = {
    val blocks = ArrayBuffer.empty[String]
    val para = ArrayBuffer.empty[String]
    val listLines = ArrayBuffer.empty[String]
    var counters = Map.empty[Int, Int] // numbered-list index per depth
    var fence: ArrayBuffer[String] = null
    var fenceLang = ""

    def flushPara(): Unit = if (para.nonEmpty) {
      blocks += para.mkString(" ")
      para.clear()
    }
    def flushList(): Unit = if (listLines.nonEmpty) {
      blocks += listLines.mkString("\n")
      listLines.clear()
      counters = Map.empty
    }
    def inline(s: String): String = {
      val linked = LinkCall.replaceAllIn(s, m =>
        java.util.regex.Matcher.quoteReplacement(s"[${m.group(2)}](${m.group(1)})"))
      val bolded = Bold.replaceAllIn(linked, m =>
        java.util.regex.Matcher.quoteReplacement(s"**${m.group(1)}**"))
      Emph.replaceAllIn(bolded, m =>
        java.util.regex.Matcher.quoteReplacement(s"*${m.group(1)}*")).trim
    }

    for (raw <- src.split("\n", -1)) {
      val line = raw.stripSuffix("\r")
      if (fence != null) {
        if (line.trim == "```") {
          blocks += MdShared.fence(fence.mkString("\n"), fenceLang)
          fence = null
        } else fence += line
      } else if (line.startsWith("```")) {
        flushPara(); flushList()
        fenceLang = line.drop(3).trim
        fence = ArrayBuffer.empty[String]
      } else line match {
        case Heading(eqs, text) =>
          flushPara(); flushList()
          blocks += ("#" * math.min(eqs.length, 6)) + " " + inline(text)
        case ImageCall(ref) =>
          flushPara(); flushList()
          blocks += s"![$ref]($ref)"
        case Bullet(indent, text) =>
          flushPara()
          val depth = indent.length / 2
          listLines += ("  " * depth) + "- " + inline(text)
        case Numbered(indent, text) =>
          flushPara()
          val depth = indent.length / 2
          val n = counters.getOrElse(depth, 0) + 1
          // a new item at this depth restarts any deeper numbering
          counters = counters.filter(_._1 <= depth).updated(depth, n)
          listLines += ("  " * depth) + s"$n. " + inline(text)
        case l if l.trim.isEmpty =>
          flushPara(); flushList()
        case l =>
          flushList()
          para += inline(l)
      }
    }
    if (fence != null) // unterminated raw block still renders
      blocks += MdShared.fence(fence.mkString("\n"), fenceLang)
    flushPara(); flushList()
    if (blocks.isEmpty) throw new IllegalArgumentException("typst: no content")
    blocks.mkString("\n\n")
  }
}
