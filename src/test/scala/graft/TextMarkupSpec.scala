package graft

import graft.extract.{DokuwikiExtract, MdocExtract, PodExtract, TroffExtract, TypstExtract}
import org.scalatest.funsuite.AnyFunSuite

/** Typst / troff / DokuWiki / mdoc / POD extraction: the line-oriented
  * text-markup members of the reference's pandoc surface.
  */
class TextMarkupSpec extends AnyFunSuite {

  test("typst: headings, inline styles, lists, image, link, raw block") {
    val typ =
      """= Doc 3
        |== Part 1
        |Some *very* important _words_ here,
        |continuing on a second line.
        |
        |#image("plot.png")
        |
        |- alpha
        |- beta
        |  + one
        |  + two
        |+ top numbered
        |
        |```scala
        |val x = 1
        |```
        |See #link("http://e.x")[the docs] now.
        |""".stripMargin
    assert(TypstExtract.toMarkdown(typ) ==
      """# Doc 3
        |
        |## Part 1
        |
        |Some **very** important *words* here, continuing on a second line.
        |
        |![plot.png](plot.png)
        |
        |- alpha
        |- beta
        |  1. one
        |  2. two
        |1. top numbered
        |
        |```scala
        |val x = 1
        |```
        |
        |See [the docs](http://e.x) now.""".stripMargin)
  }

  test("troff: TH/SH/SS, font requests and escapes, TP tag, nf/fi") {
    val man =
      """.\" comment line
        |.TH GREP 1 "2024" "GNU"
        |.SH NAME
        |grep \- print lines
        |.SH "DESCRIPTION TEXT"
        |.PP
        |Searches with \fBbold\fR and \fIitalic\fP forms.
        |.TP
        |.B \-v
        |Invert the match.
        |.BR grep (1),
        |more text.
        |.nf
        |literal code
        |  kept
        |.fi
        |.SS Sub
        |Done.
        |""".stripMargin
    assert(TroffExtract.toMarkdown(man) ==
      "# GREP(1)\n\n## NAME\n\ngrep - print lines\n\n## DESCRIPTION TEXT\n\n" +
        "Searches with **bold** and *italic* forms.\n\n**-v**\n\n" +
        "Invert the match. **grep**(1), more text.\n\n" +
        "```\nliteral code\n  kept\n```\n\n### Sub\n\nDone.")
  }

  test("troff: .SH with the heading on the following line; unclosed .nf") {
    assert(TroffExtract.toMarkdown(".SH\nSEE ALSO\nBody.\n.nf\nraw") ==
      "## SEE ALSO\n\nBody.\n\n```\nraw\n```")
  }

  test("dokuwiki: headings, inline, links, media, lists, code block") {
    val doku =
      """====== Wiki 4 ======
        |===== Section =====
        |Some //italic// and **bold** with ''mono'' text.
        |Link [[http://a|site A]] and bare [[http://b]].
        |{{ image.png?200 |caption}}
        |
        |  * one
        |  * two
        |    - first
        |    - second
        |
        |<code python>
        |print(1)
        |</code>
        |""".stripMargin
    assert(DokuwikiExtract.toMarkdown(doku) ==
      "# Wiki 4\n\n## Section\n\n" +
        "Some *italic* and **bold** with `mono` text. " +
        "Link [site A](http://a) and bare [http://b](http://b). " +
        "![image.png](image.png)\n\n" +
        "- one\n- two\n  1. first\n  2. second\n\n" +
        "```python\nprint(1)\n```")
  }

  test("mdoc: prologue, Nm/Nd, callable macros, tag list, Bd/Dl") {
    val mdoc =
      """.\" comment
        |.Dd January 1, 2024
        |.Dt CAT 1
        |.Os
        |.Sh NAME
        |.Nm cat
        |.Nd concatenate files
        |.Sh DESCRIPTION
        |The
        |.Nm
        |utility reads
        |.Ar file
        |operands.
        |.Bl -tag -width x
        |.It Fl b
        |Number the lines.
        |.It Fl e
        |Display a dollar sign.
        |.El
        |.Pp
        |See
        |.Xr less 1 ,
        |then exit.
        |.Bd -literal
        |x = 1
        |.Ed
        |.Dl make install
        |""".stripMargin
    assert(MdocExtract.toMarkdown(mdoc) ==
      "# CAT(1)\n\n## NAME\n\n**cat** — concatenate files\n\n## DESCRIPTION\n\n" +
        "The **cat** utility reads *file* operands.\n\n" +
        "- **-b** Number the lines.\n- **-e** Display a dollar sign.\n\n" +
        "See less(1), then exit.\n\n```\nx = 1\n```\n\n```\nmake install\n```")
  }

  test("pod: heads, inline codes, E escapes, verbatim, lists, cut") {
    val pod =
      """=pod
        |
        |=head1 Tool 5
        |
        |Runs B<fast> with I<style> and C<cmd --x>.
        |See L<perldoc|http://p.example> or L<http://q.example>;
        |compare 1 E<lt> 2.
        |
        |    $ tool --run
        |    ok
        |
        |=over 4
        |
        |=item *
        |
        |First choice continues here.
        |
        |=item *
        |
        |Second choice.
        |
        |=back
        |
        |=head2 Options
        |
        |=over 4
        |
        |=item B<-v>
        |
        |Verbose output.
        |
        |=back
        |
        |=cut
        |
        |ignored text after cut
        |""".stripMargin
    assert(PodExtract.toMarkdown(pod) ==
      "# Tool 5\n\n" +
        "Runs **fast** with *style* and `cmd --x`. " +
        "See [perldoc](http://p.example) or [http://q.example](http://q.example); " +
        "compare 1 < 2.\n\n" +
        "```\n    $ tool --run\n    ok\n```\n\n" +
        "- First choice continues here.\n- Second choice.\n\n" +
        "## Options\n\n" +
        "- **-v** Verbose output.")
  }

  test("typst: emphasis needs word boundaries; URLs/snake_case/2*3*4 safe") {
    assert(TypstExtract.toMarkdown("run foo_bar_baz now and 2*3*4 stays") ==
      "run foo_bar_baz now and 2*3*4 stays")
    // an underscore-bearing URL inside an already-rendered link must not
    // be re-processed as emphasis
    assert(TypstExtract.toMarkdown("""see #link("http://e.x/a_b_c")[t] ok""") ==
      "see [t](http://e.x/a_b_c) ok")
    assert(TypstExtract.toMarkdown("real *bold* and _emph_ here") ==
      "real **bold** and *emph* here")
  }

  test("fences widen past backtick runs in the body (all five dialects)") {
    assert(TypstExtract.toMarkdown("```\n````x\n```")
      .startsWith("`````\n````x\n`````"))
    assert(DokuwikiExtract.toMarkdown("<code>\n```\ninner\n```\n</code>") ==
      "````\n```\ninner\n```\n````")
    assert(TroffExtract.toMarkdown(".nf\n```\nx\n.fi") == "````\n```\nx\n````")
    assert(MdocExtract.toMarkdown(".Dt X 1\n.Bd -literal\n```\n.Ed") ==
      "# X(1)\n\n````\n```\n````")
    assert(PodExtract.toMarkdown("=head1 H\n\n    ```\n    x\n") ==
      "# H\n\n````\n    ```\n    x\n````")
  }

  test("dokuwiki: slashes inside URLs never open or close emphasis") {
    assert(DokuwikiExtract.toMarkdown("see http://a//b then http://c//d") ==
      "see http://a//b then http://c//d")
    assert(DokuwikiExtract.toMarkdown("a //real// span and [[http://x//y|L]]") ==
      "a *real* span and [L](http://x//y)")
  }

  test("troff: an intervening request abandons a pending .TP tag") {
    assert(TroffExtract.toMarkdown(".TP\n.SH OPTIONS\nPlain paragraph.") ==
      "## OPTIONS\n\nPlain paragraph.")
    // a font request after argless .SH becomes the heading, not a tag
    assert(TroffExtract.toMarkdown(".SH\n.B LOUD\nBody.") ==
      "## **LOUD**\n\nBody.")
  }

  test("pod: numeric E escapes stay literal; =for skips its paragraph") {
    assert(PodExtract.toMarkdown("=head1 H\n\nIE<60>worksE<62> fine.") ==
      "# H\n\nI<works> fine.")
    assert(PodExtract.toMarkdown(
      "=head1 H\n\n=for html\n<div>raw</div>\n\nReal para.") ==
      "# H\n\nReal para.")
  }

  test("empty inputs throw; real ingestion routes by explicit MIME") {
    intercept[IllegalArgumentException](TypstExtract.toMarkdown(""))
    intercept[IllegalArgumentException](TroffExtract.toMarkdown(".\\\" only\n"))
    intercept[IllegalArgumentException](DokuwikiExtract.toMarkdown("\n\n"))
    intercept[IllegalArgumentException](MdocExtract.toMarkdown(".Dd x\n.Os\n"))
    intercept[IllegalArgumentException](PodExtract.toMarkdown("=cut\nhidden\n"))

    val cases = Seq(
      ("t.typ", "= T6\nBody.", "application/x-typst", Seq("# T6", "Body.")),
      ("m.1", ".TH M 1\nBody.", "text/troff", Seq("# M(1)", "Body.")),
      ("w.txt", "====== W ======\nBody.", "text/x-dokuwiki", Seq("# W", "Body.")),
      ("d.mdoc", ".Dt D 1\nBody.", "text/x-mdoc", Seq("# D(1)", "Body.")),
      ("p.pod", "=head1 P\n\nBody.", "text/x-pod", Seq("# P", "Body.")))
    for ((name, body, mime, expect) <- cases) {
      val out = graft.pipeline.Pipeline.extractOne(
        graft.io.Ingest.toRawDoc(name, body.getBytes("UTF-8"), mime))
      assert(out.failure.isEmpty, s"$mime: ${out.failure}")
      assert(out.mime_type == mime)
      assert(out.spans.map(_.text) == expect, mime)
    }
  }
}
