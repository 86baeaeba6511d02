package graft.extract

import scala.collection.mutable.ArrayBuffer

/** DokuWiki markup → markdown.
  *
  * In the reference's supported surface: `text/x-dokuwiki` sits in its
  * pandoc-supported MIME registry (`mime_types.py:100`); the reference
  * delegates to pandoc. From-scratch deterministic subset of the public
  * DokuWiki syntax (dokuwiki.org/wiki:syntax), line-oriented:
  *
  *   - `====== H ======` headings: six `=` is h1 down to two `=` is h5
  *   - lists: two spaces of indent per level, then `* ` (bullet) or
  *     `- ` (ordered, renumbered 1..n per depth); one block per list
  *   - `<code lang>` … `</code>` → fenced code block
  *   - inline: `**bold**` stays, `//italic//` → `*italic*`,
  *     `''mono''` → backticks, `[[url|text]]` → `[text](url)`,
  *     `[[url]]` → `[url](url)`, `{{img.png}}` → `![img.png](img.png)`
  *     (alignment padding and `?size` suffixes strip), `\\ ` forced
  *     line break joins with a space
  *   - blank-line separated paragraphs
  *
  * A document rendering no block throws (failure row).
  */
object DokuwikiExtract {

  private val Heading = """^(={2,6})\s*(.*?)\s*=+\s*$""".r
  private val ListItem = """^((?:  )+)([*-])\s+(.*)$""".r
  private val CodeOpen = """^<code(?:\s+(\w+))?>\s*$""".r
  private val Italic = """//([^/\n]+(?:/[^/\n]+)*)//""".r
  // DokuWiki special-cases URLs before emphasis: every slash of a
  // scheme://… token (bare, or inside an already-rendered markdown link)
  // is masked before the Italic pass so '//' runs inside URLs can never
  // open or close an emphasis span, then unmasked after
  private val UrlToken = """[a-zA-Z][\w+.-]*://[^\s)\]|]*""".r
  private val Mono = """''([^'\n]+)''""".r
  private val LinkText = """\[\[([^\]|]+)\|([^\]]+)\]\]""".r
  private val LinkBare = """\[\[([^\]|]+)\]\]""".r
  private val Media = """\{\{\s*([^}|?]+?)(?:\?[^}|]*)?\s*(?:\|[^}]*)?\}\}""".r

  def toMarkdown(src: String): String = {
    val blocks = ArrayBuffer.empty[String]
    val para = ArrayBuffer.empty[String]
    val listLines = ArrayBuffer.empty[String]
    var counters = Map.empty[Int, Int]
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
    def q(s: String): String = java.util.regex.Matcher.quoteReplacement(s)
    def inline(s: String): String = {
      var t = s.replace("\\\\ ", " ").replaceAll("""\\\\$""", "")
      t = Media.replaceAllIn(t, m => {
        val ref = m.group(1).trim
        q(s"![$ref]($ref)")
      })
      t = LinkText.replaceAllIn(t, m => q(s"[${m.group(2).trim}](${m.group(1).trim})"))
      t = LinkBare.replaceAllIn(t, m => { val u = m.group(1).trim; q(s"[$u]($u)") })
      t = UrlToken.replaceAllIn(t, m => q(m.matched.replace('/', '\u0005')))
      t = Italic.replaceAllIn(t, m => q(s"*${m.group(1)}*"))
      t = Mono.replaceAllIn(t, m => q(s"`${m.group(1)}`"))
      t.replace('\u0005', '/').trim
    }

    for (raw <- src.split("\n", -1)) {
      val line = raw.stripSuffix("\r")
      if (fence != null) {
        if (line.trim == "</code>") {
          blocks += MdShared.fence(fence.mkString("\n"), fenceLang)
          fence = null
        } else fence += line
      } else line match {
        case CodeOpen(lang) =>
          flushPara(); flushList()
          fenceLang = Option(lang).getOrElse("")
          fence = ArrayBuffer.empty[String]
        case Heading(eqs, text) =>
          flushPara(); flushList()
          val level = math.min(7 - eqs.length, 6) // ====== → 1, == → 5
          blocks += ("#" * level) + " " + inline(text)
        case ListItem(indent, kind, text) =>
          flushPara()
          val depth = indent.length / 2 - 1
          val head = if (kind == "*") "- " else {
            val n = counters.getOrElse(depth, 0) + 1
            counters = counters.filter(_._1 <= depth).updated(depth, n)
            s"$n. "
          }
          listLines += ("  " * depth) + head + inline(text)
        case l if l.trim.isEmpty =>
          flushPara(); flushList()
        case l =>
          flushList()
          para += inline(l)
      }
    }
    if (fence != null)
      blocks += MdShared.fence(fence.mkString("\n"), fenceLang)
    flushPara(); flushList()
    if (blocks.isEmpty) throw new IllegalArgumentException("dokuwiki: no content")
    blocks.mkString("\n\n")
  }
}
