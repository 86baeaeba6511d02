package graft

import graft.extract.LatexExtract
import org.scalatest.funsuite.AnyFunSuite

/** LaTeX (.tex) extraction: the deterministic pandoc-shaped subset, through
  * the unit surface and the REAL ingestion route.
  */
class LatexSpec extends AnyFunSuite {

  test("document body, title via maketitle, headings at article levels") {
    val tex =
      """\documentclass{article}
        |\title{A Study of \textbf{Things}}
        |\begin{document}
        |\maketitle
        |\section{Intro}
        |Hello world.
        |\subsection{Detail}
        |More text.
        |\end{document}
        |""".stripMargin
    assert(LatexExtract.toMarkdown(tex) ==
      "# A Study of **Things**\n\n# Intro\n\nHello world.\n\n## Detail\n\nMore text.")
  }

  test("chapter presence shifts section to level 2 (pandoc behavior)") {
    val tex = "\\chapter{One}\n\n\\section{Two}\n\nBody."
    assert(LatexExtract.toMarkdown(tex) == "# One\n\n## Two\n\nBody.")
  }

  test("inline: styles, links, cites, refs, escapes, quotes, comments") {
    val tex =
      """Use \emph{style} and \texttt{code} at 100\% --- see
        |\href{https://x.org}{the site}, """.stripMargin +
        "\\" + """url{https://y.org},
        |\cite{knuth84} and \ref{fig:a}.\label{sec:x}
        |``Quoted'' text~here. % a comment
        |""".stripMargin
    val md = LatexExtract.toMarkdown(tex)
    assert(md.contains("*style*") && md.contains("`code`") && md.contains("100%"))
    assert(md.contains("[the site](https://x.org)") && md.contains("<https://y.org>"))
    assert(md.contains("[knuth84]") && md.contains("fig:a"))
    assert(!md.contains("label") && !md.contains("a comment"))
    assert(md.contains("\"Quoted\" text here."))
  }

  test("environments: verbatim, itemize, enumerate, equation, unknown recurse") {
    val tex =
      """\begin{verbatim}
        |x = 1 % kept
        |\end{verbatim}
        |
        |\begin{itemize}
        |\item first
        |\item second
        |\end{itemize}
        |
        |\begin{enumerate}
        |\item one
        |\item two
        |\end{enumerate}
        |
        |\begin{equation}
        |E = mc^2
        |\end{equation}
        |
        |\begin{center}
        |Centered para.
        |\end{center}
        |""".stripMargin
    val md = LatexExtract.toMarkdown(tex)
    assert(md.contains("```\nx = 1 % kept\n```")) // verbatim keeps comments
    assert(md.contains("- first\n- second"))
    assert(md.contains("1. one\n2. two"))
    assert(md.contains("$$\nE = mc^2\n$$"))
    assert(md.contains("Centered para."))
  }

  test("tabular becomes a pipe table; figure becomes image + caption") {
    val tex =
      """\begin{tabular}{|l|r|}
        |\hline
        |Name & Qty \\
        |alpha & 3 \\
        |beta & 7 \\
        |\hline
        |\end{tabular}
        |
        |\begin{figure}
        |\includegraphics[width=\textwidth]{plot.png}
        |\caption{The plot}
        |\end{figure}
        |""".stripMargin
    val md = LatexExtract.toMarkdown(tex)
    assert(md.contains("|Name|Qty|\n|---|---|\n|alpha|3|\n|beta|7|"))
    assert(md.contains("![plot.png](plot.png)"))
    assert(md.contains("The plot"))
  }

  test("tabular: escaped \\& is a literal ampersand, not a cell split") {
    val md = LatexExtract.toMarkdown(
      """\begin{tabular}{ll} A \& B & 1 \\ x & 2 \\ \end{tabular}""")
    assert(md == "|A & B|1|\n|---|---|\n|x|2|")
  }

  test("inline math passes through; unknown commands unwrap or drop") {
    val md = LatexExtract.toMarkdown(
      "The value $a_1 + b^2$ and \\mbox{boxed text} plus \\noindent rest.")
    assert(md.contains("$a_1 + b^2$"))
    assert(md.contains("boxed text"))
    assert(md.contains("rest."))
    assert(!md.contains("noindent"))
  }

  test("real ingestion route: .tex → spans with interleaved image") {
    val tex =
      """\section{S}
        |
        |Para text.
        |
        |\begin{figure}
        |\includegraphics{img.png}
        |\end{figure}
        |
        |Tail.
        |""".stripMargin
    val out = graft.pipeline.Pipeline.extractOne(
      graft.io.Ingest.toRawDoc("doc.tex", tex.getBytes("UTF-8")))
    assert(out.failure.isEmpty)
    assert(out.mime_type == "application/x-latex")
    assert(out.spans.map(s => (s.kind, s.text)) == Seq(
      ("text", "# S"), ("text", "Para text."),
      ("image", "img.png"), ("text", "Tail.")))
  }
}
