package graft.extract

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** reStructuredText → markdown structure conversion (public docutils
  * grammar, not a port) — the reference routes `text/x-rst` through
  * MarkItDown/pandoc (markitdown_provider/provider.py:49); round 4 routed
  * it to `md_plain` verbatim. Now the structural constructs convert:
  *
  *  - section titles: an adornment line (`= - ` : ' " ~ ^ _ * + # < >`,
  *    length ≥ title) under — optionally also over — a title line becomes
  *    a `#`-heading; heading LEVELS are assigned by first appearance of
  *    each (char, overline?) style, exactly docutils' rule;
  *  - literal blocks: a paragraph ending `::` fences the following
  *    indented block as code (`Example::` → `Example:`, a bare `::` line
  *    drops);
  *  - directives: `.. code::`/`.. code-block::`/`.. sourcecode:: [lang]`
  *    fence their indented body with the language tag; `.. image::`/
  *    `.. figure:: path` → `![](path)`; admonitions and unknown
  *    directives keep their DEDENTED body (content, not syntax);
  *    `.. comment text` (no `::`) drops entirely;
  *  - transitions (a lone adornment line of 4+ chars between blank
  *    lines) → `---`;
  *  - inline: ``` ``literal`` ``` → `` `literal` ``, `` :role:`text` `` →
  *    text.
  * Everything else (bullet lists, field lists, plain paragraphs) passes
  * through — already markdown-compatible or content-preserving.
  */
object RstExtract {

  private val AdornChars = "=-`:'\"~^_*+#<>!$%&(),./;?@[\\]{|}".toSet

  private def isAdornment(line: String): Boolean = {
    val t = line.trim
    t.length >= 2 && t.forall(_ == t.head) && AdornChars.contains(t.head)
  }

  private def indentOf(s: String): Int = s.takeWhile(_ == ' ').length

  def toMarkdown(text: String): String = {
    val lines = text.split("\n", -1).toIndexedSeq
    val out = ArrayBuffer[String]()
    val styleLevel = mutable.LinkedHashMap[(Char, Boolean), Int]()
    def levelOf(ch: Char, over: Boolean): Int =
      styleLevel.getOrElseUpdate((ch, over), styleLevel.size + 1)

    def inline(s: String): String = {
      // :role:`x` -> x first (so its backticks cannot pair with others),
      // then ``x`` -> `x`
      val noRole = s.replaceAll(":[A-Za-z][\\w:+.-]*:`([^`]+)`", "$1")
      noRole.replaceAll("``([^`]+)``", "`$1`")
    }

    var i = 0
    def blankAt(k: Int): Boolean = k < 0 || k >= lines.length || lines(k).trim.isEmpty

    def collectIndented(from: Int): (Seq[String], Int) = {
      // the indented body following a directive/literal marker: skip blank
      // lead, then take while blank or more-indented than the marker column
      var j = from
      while (j < lines.length && lines(j).trim.isEmpty) j += 1
      if (j >= lines.length || indentOf(lines(j)) == 0) return (Nil, from)
      val bodyIndent = indentOf(lines(j))
      val body = ArrayBuffer[String]()
      var k = j
      while (k < lines.length &&
          (lines(k).trim.isEmpty || indentOf(lines(k)) >= bodyIndent)) {
        body += (if (lines(k).length >= bodyIndent) lines(k).substring(bodyIndent)
                 else "")
        k += 1
      }
      while (body.nonEmpty && body.last.trim.isEmpty) body.remove(body.length - 1)
      (body.toSeq, k)
    }

    val Directive = """^\.\.\s+([\w-]+)::\s*(.*)$""".r
    while (i < lines.length) {
      val line = lines(i)
      val t = line.trim
      line match {
        case _ if t.isEmpty =>
          out += ""
          i += 1
        case Directive(name, args) if indentOf(line) == 0 =>
          val (body, next) = collectIndented(i + 1)
          name match {
            case "code" | "code-block" | "sourcecode" =>
              out += s"```${args.trim}"
              out ++= body
              out += "```"
            case "image" | "figure" =>
              out += s"![](${args.trim})"
              // figure caption/body keeps as text
              out ++= body.filterNot(_.startsWith(":"))
            case _ =>
              // admonition/unknown: keep the dedented content
              out ++= body.map(inline)
          }
          i = next max (i + 1)
        case _ if (t == ".." || t.startsWith(".. ")) && indentOf(line) == 0 =>
          // comment: '..' + whitespace (docutils); '....' is NOT a comment
          // — it's a period adornment and must reach the transition and
          // overline cases below
          val (_, next) = collectIndented(i + 1)
          i = next max (i + 1)
        case _ if isAdornment(line) && blankAt(i - 1) &&
            i + 2 < lines.length && lines(i + 1).trim.nonEmpty &&
            !isAdornment(lines(i + 1)) && isAdornment(lines(i + 2)) &&
            lines(i + 2).trim.head == t.head &&
            lines(i + 2).trim.length >= lines(i + 1).trim.length =>
          // overline + title + underline
          val lvl = levelOf(t.head, over = true)
          out += ("#" * math.min(lvl, 6)) + " " + inline(lines(i + 1).trim)
          i += 3
        case _ if isAdornment(line) && t.length >= 4 && blankAt(i - 1) && blankAt(i + 1) =>
          out += "---" // transition
          i += 1
        case _ if i + 1 < lines.length && t.nonEmpty && !isAdornment(line) &&
            isAdornment(lines(i + 1)) &&
            lines(i + 1).trim.length >= t.length && blankAt(i - 1) =>
          val lvl = levelOf(lines(i + 1).trim.head, over = false)
          out += ("#" * math.min(lvl, 6)) + " " + inline(t)
          i += 2
        case _ if t.endsWith("::") && indentOf(line) == 0 =>
          // literal block introducer
          val intro = t.dropRight(2).trim
          if (intro.nonEmpty) out += inline(intro) + ":"
          val (body, next) = collectIndented(i + 1)
          if (body.nonEmpty) {
            out += "```"
            out ++= body
            out += "```"
          }
          i = next max (i + 1)
        case _ =>
          out += inline(line)
          i += 1
      }
    }
    // collapse runs of blank lines the conversions may have produced
    val sb = new StringBuilder
    var prevBlank = false
    out.foreach { l =>
      val blank = l.trim.isEmpty
      if (!(blank && prevBlank)) {
        sb ++= l
        sb += '\n'
      }
      prevBlank = blank
    }
    sb.toString.stripSuffix("\n").stripPrefix("\n")
  }
}
