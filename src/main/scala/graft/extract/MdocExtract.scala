package graft.extract

import scala.collection.mutable.ArrayBuffer

/** mdoc (BSD man) markup → markdown.
  *
  * In the reference's supported surface: `text/x-mdoc` sits in its
  * pandoc-supported MIME registry (`mime_types.py:103`); the reference
  * delegates to pandoc. From-scratch deterministic subset of the public
  * mdoc(7) semantic macro package:
  *
  *   - `.Dt TITLE sec` → `# TITLE(sec)`; `.Sh` → `##`, `.Ss` → `###`;
  *     `.Dd`/`.Os` prologue lines drop
  *   - `.Pp` → paragraph break; `.Nd desc` → `— desc` in the running
  *     paragraph (the NAME-section idiom)
  *   - `.Bl -bullet|-enum|-tag …` / `.It args` / `.El` → markdown
  *     lists (`-enum` numbered), nested two spaces per level, one block
  *     per outermost list; text lines inside an item continue that
  *     item's line
  *   - `.Bd -literal` … `.Ed` → fenced code; `.Dl line` → one-line fence
  *   - inline semantic macros (in macro lines, callable mid-sequence):
  *     `Fl w` → `**-w**`, `Ar`/`Em`/`Pa`/`Va` → `*w*`, `Cm`/`Ic`/`Sy` →
  *     `**w**`, `Li`/`Dv`/`Er`/`Ev` → `` `w` ``, `Xr name sec` →
  *     `name(sec)`, `Nm` → bold document name (first `.Nm` arg sticks);
  *     single-character punctuation args attach without a space
  *
  * Requests outside the subset are dropped (text lines still render).
  * A document rendering no block throws (failure row).
  */
object MdocExtract {

  private val Star = Set("Ar", "Em", "Pa", "Va")
  private val BoldM = Set("Cm", "Ic", "Sy")
  private val CodeM = Set("Li", "Dv", "Er", "Ev")
  private val AllMacros =
    Star ++ BoldM ++ CodeM ++ Set("Fl", "Nm", "Xr", "No")

  def toMarkdown(src: String): String = {
    val blocks = ArrayBuffer.empty[String]
    val para = ArrayBuffer.empty[String]
    val listLines = ArrayBuffer.empty[String]
    var listKinds = List.empty[Int] // -1 bullet/tag, >=0 next enum index
    var fence: ArrayBuffer[String] = null
    var docName = ""

    def flushPara(): Unit = if (para.nonEmpty) {
      blocks += para.mkString(" ")
      para.clear()
    }
    def flushListIfDone(): Unit =
      if (listKinds.isEmpty && listLines.nonEmpty) {
        blocks += listLines.mkString("\n")
        listLines.clear()
      }
    // request-line tokenizer shared with man(7) — same quoting grammar
    def split(rest: String): List[String] = MdShared.troffArgs(rest)
    // render a callable-macro token sequence into inline markdown
    def render(toks: List[String]): String = {
      val parts = ArrayBuffer.empty[String]
      var ts = toks
      def isMac(w: String) = AllMacros.contains(w)
      while (ts.nonEmpty) ts match {
        case "Xr" :: n :: s :: rest if !isMac(n) && !isMac(s) =>
          parts += s"$n($s)"; ts = rest
        case "Fl" :: w :: rest if !isMac(w) => parts += s"**-$w**"; ts = rest
        case "Fl" :: rest => parts += "**-**"; ts = rest
        case "Nm" :: w :: rest if !isMac(w) =>
          if (docName.isEmpty) docName = w
          parts += s"**$w**"; ts = rest
        case "Nm" :: rest => parts += s"**$docName**"; ts = rest
        case "No" :: w :: rest => parts += w; ts = rest
        case m :: w :: rest if isMac(m) && !isMac(w) =>
          parts += (if (Star(m)) s"*$w*"
                    else if (BoldM(m)) s"**$w**"
                    else s"`$w`")
          ts = rest
        case m :: rest if isMac(m) => ts = rest // dangling macro
        case w :: rest => parts += w; ts = rest
        case Nil => () // unreachable: loop guard
      }
      parts.foldLeft("") { (acc, p) =>
        if (acc.isEmpty) p
        else if (p.length == 1 && ",.;:)]".contains(p)) acc + p
        else acc + " " + p
      }
    }
    def appendText(t: String): Unit =
      if (listKinds.nonEmpty && listLines.nonEmpty)
        listLines(listLines.length - 1) = listLines.last.stripTrailing() + " " + t
      else para += t

    for (raw <- src.split("\n", -1)) {
      val line = raw.stripSuffix("\r")
      if (fence != null) {
        if (line == ".Ed") {
          blocks += MdShared.fence(fence.mkString("\n"), "")
          fence = null
        } else fence += line
      } else if (line.startsWith(".\\\"")) {
        () // comment
      } else if (line.startsWith(".")) {
        val toks = split(line.drop(1))
        (toks.headOption.getOrElse(""), toks.drop(1)) match {
          case ("Dd" | "Os", _) => ()
          case ("Dt", a) =>
            flushPara()
            if (a.nonEmpty)
              blocks += "# " + a.head + a.lift(1).map(s => s"($s)").getOrElse("")
          case ("Sh", a) =>
            flushPara()
            blocks += "## " + render(a)
          case ("Ss", a) =>
            flushPara()
            blocks += "### " + render(a)
          case ("Pp" | "Lp", _) => flushPara()
          case ("Nd", a) => appendText("— " + render(a))
          case ("Bl", a) =>
            flushPara()
            listKinds = (if (a.contains("-enum")) 0 else -1) :: listKinds
          case ("It", a) =>
            val depth = listKinds.length
            if (depth > 0) {
              val marker = listKinds.head match {
                case n if n >= 0 =>
                  listKinds = (n + 1) :: listKinds.tail
                  s"${n + 1}. "
                case _ => "- "
              }
              listLines += ("  " * (depth - 1)) + marker + render(a)
            }
          case ("El", _) =>
            listKinds = listKinds.drop(1)
            flushListIfDone()
          case ("Bd", _) =>
            flushPara()
            fence = ArrayBuffer.empty[String]
          case ("Dl" | "D1", a) =>
            flushPara()
            blocks += MdShared.fence(a.mkString(" "), "")
          case (m, a) if AllMacros.contains(m) =>
            appendText(render(m :: a))
          case _ => () // outside the subset
        }
      } else if (line.trim.isEmpty) {
        flushPara()
      } else {
        appendText(line.trim)
      }
    }
    if (fence != null) blocks += MdShared.fence(fence.mkString("\n"), "")
    flushPara()
    // an unclosed .Bl still renders its items
    if (listLines.nonEmpty) blocks += listLines.mkString("\n")
    if (blocks.isEmpty) throw new IllegalArgumentException("mdoc: no content")
    blocks.mkString("\n\n")
  }
}
