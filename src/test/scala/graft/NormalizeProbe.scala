package graft.extract

import graft.md.Markdown
import scala.util.matching.Regex

/** Profiling probe: the retired lookbehind-regex marker rewriter, kept to
  * compare against the line scanner (graft.ProfNorm2).
  */
object NormalizeProbe {
  private val Re: Regex = """(?:^|(?<=\n\n))\s*\{(\d+)\}\s*-+\s*(?:\n\n|\n?$)""".r
  def breaksOnly(content: String): String =
    Re.replaceAllIn(content, m =>
      Regex.quoteReplacement(Markdown.createPageBreak(m.group(1).toInt + 1, newlineSeparators = 2)))
}
