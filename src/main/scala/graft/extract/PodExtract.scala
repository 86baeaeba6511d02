package graft.extract

import scala.collection.mutable.ArrayBuffer

/** Perl POD (Plain Old Documentation) → markdown.
  *
  * In the reference's supported surface: `text/x-pod` sits in its
  * pandoc-supported MIME registry (`mime_types.py:104`); the reference
  * delegates to pandoc. From-scratch deterministic subset of the public
  * perlpod spec:
  *
  *   - `=head1`..`=head4` → `#`..`####` headings
  *   - `=over [n]` / `=item` / `=back` → markdown lists, two spaces of
  *     indent per nesting level, one block per outermost list:
  *     `=item *` → bullet, `=item 1.`/`=item 2` → numbered (renumbered
  *     per depth), `=item text` → `- text`; an item's body paragraphs
  *     continue its line
  *   - verbatim paragraphs (lines starting with whitespace) → one
  *     fenced code block per contiguous run
  *   - `=begin fmt` … `=end fmt` and `=for fmt …` skip; `=pod` resumes,
  *     `=cut` suspends (the embedded-in-Perl idiom); `=encoding` drops
  *   - inline formatting codes, innermost-first so nesting works:
  *     `B<..>` → `**..**`, `I<..>`/`F<..>` → `*..*`, `C<..>` →
  *     backticks, `S<..>` keeps its text, `L<text|url>` → `[text](url)`,
  *     `L<url>` → `[url](url)`, `E<lt>/E<gt>/E<verbar>/E<sol>` and
  *     decimal `E<n>` escapes resolve after all codes
  *
  * A document rendering no block throws (failure row).
  */
object PodExtract {

  private val Cmd = """^=(\w+)\s*(.*)$""".r
  // innermost first: content may not contain < or > until escapes resolve
  private val Code = """([BICFSLEXZ])<([^<>]*)>""".r

  def toMarkdown(src: String): String = {
    val blocks = ArrayBuffer.empty[String]
    val para = ArrayBuffer.empty[String]
    val listLines = ArrayBuffer.empty[String]
    var counters = Map.empty[Int, Int]
    var overDepth = 0
    var itemOpen = false
    val verbatim = ArrayBuffer.empty[String]
    var cut = false // after =cut, outside a begin/end region
    var beginFmt = "" // inside =begin … =end
    var forSkip = false // inside a =for format-specific paragraph

    def flushPara(): Unit = if (para.nonEmpty) {
      val t = para.mkString(" ")
      para.clear()
      if (itemOpen && listLines.nonEmpty)
        listLines(listLines.length - 1) = listLines.last.stripTrailing() + " " + t
      else blocks += t
    }
    def flushVerbatim(): Unit = if (verbatim.nonEmpty) {
      blocks += MdShared.fence(verbatim.mkString("\n"), "")
      verbatim.clear()
    }
    def flushListIfDone(): Unit = if (overDepth == 0 && listLines.nonEmpty) {
      blocks += listLines.mkString("\n")
      listLines.clear()
      counters = Map.empty
      itemOpen = false
    }

    def inline(s: String): String = {
      var t = s
      var changed = true
      while (changed) {
        val next = Code.replaceAllIn(t, m => {
          val body = m.group(2)
          val rep = m.group(1) match {
            case "B" => s"**$body**"
            case "I" | "F" => s"*$body*"
            case "C" => s"`$body`"
            case "S" | "X" => body
            case "Z" => ""
            case "L" =>
              val bar = body.indexOf('|')
              if (bar >= 0) s"[${body.substring(0, bar)}](${body.substring(bar + 1)})"
              else s"[$body]($body)"
            case "E" => body match {
              case "lt" => "\u0001"
              case "gt" => "\u0002"
              case "verbar" => "\u0003"
              case "sol" => "\u0004"
              case d if d.nonEmpty && d.forall(_.isDigit) =>
                // numeric escapes resolve through the same placeholders:
                // E<60> is E<lt> by definition, and a literal < emitted
                // mid-loop would be re-parsed as a formatting code
                d.toInt.toChar match {
                  case '<' => "\u0001"
                  case '>' => "\u0002"
                  case '|' => "\u0003"
                  case '/' => "\u0004"
                  case c => c.toString
                }
              case other => other
            }
          }
          java.util.regex.Matcher.quoteReplacement(rep)
        })
        changed = next != t
        t = next
      }
      t.replace('\u0001', '<').replace('\u0002', '>')
        .replace('\u0003', '|').replace('\u0004', '/').trim
    }

    for (raw <- src.split("\n", -1)) {
      val line = raw.stripSuffix("\r")
      line match {
        case Cmd(cmd, rest) =>
          flushVerbatim()
          forSkip = false // a command line starts a new paragraph
          cmd match {
            case "begin" => flushPara(); beginFmt = rest.trim
            case "end" => beginFmt = ""
            case _ if beginFmt.nonEmpty => ()
            case "cut" => flushPara(); cut = true
            case "pod" => cut = false
            case "encoding" => flushPara()
            case "for" =>
              // the WHOLE =for paragraph (continuation lines up to the
              // next blank line) is format-specific and skips
              flushPara(); forSkip = true
            case "head1" | "head2" | "head3" | "head4" =>
              cut = false
              flushPara()
              blocks += ("#" * (cmd.last - '0')) + " " + inline(rest.trim)
            case "over" =>
              cut = false
              flushPara()
              overDepth += 1
            case "back" =>
              flushPara()
              overDepth = math.max(0, overDepth - 1)
              flushListIfDone()
            case "item" =>
              cut = false
              flushPara()
              val depth = math.max(overDepth, 1)
              val body = rest.trim
              val (marker, text) =
                if (body == "*" || body.isEmpty) ("- ", "")
                else if (body.matches("""\d+\.?""")) {
                  val n = counters.getOrElse(depth, 0) + 1
                  counters = counters.filter(_._1 <= depth).updated(depth, n)
                  (s"$n. ", "")
                } else ("- ", inline(body))
              listLines += ("  " * (depth - 1)) + marker + text
              itemOpen = true
            case _ => ()
          }
        case _ if beginFmt.nonEmpty || cut => ()
        case l if l.trim.isEmpty =>
          forSkip = false
          flushPara(); flushVerbatim()
        case _ if forSkip => () // continuation of a =for paragraph
        case l if l.head == ' ' || l.head == '\t' =>
          flushPara()
          verbatim += l
        case l =>
          flushVerbatim()
          para += inline(l.trim)
      }
    }
    flushPara(); flushVerbatim()
    if (listLines.nonEmpty) blocks += listLines.mkString("\n")
    if (blocks.isEmpty) throw new IllegalArgumentException("pod: no content")
    blocks.mkString("\n\n")
  }
}
