package graft

import graft.extract.OrgExtract
import org.scalatest.funsuite.AnyFunSuite

/** Org-mode → markdown structural conversion (reference surface:
  * `text/x-org` mime_types.py:109, `.org` mime_types.py:157).
  */
class OrgSpec extends AnyFunSuite {

  test("title keyword, star headlines, comments, inline markup") {
    val org =
      """#+TITLE: My Doc
        |#+AUTHOR: someone
        |
        |* Top
        |
        |** Second *bold* word
        |
        |# a comment line
        |Body with /italic/ and ~code~ and =verb=.
        |""".stripMargin
    assert(OrgExtract.toMarkdown(org) ==
      "# My Doc\n\n# Top\n\n## Second **bold** word\n\n" +
      "Body with *italic* and `code` and `verb`.")
  }

  test("src/example blocks fence with language; quote blocks prefix") {
    val org =
      """#+BEGIN_SRC scala
        |val x = 1
        |#+END_SRC
        |
        |#+BEGIN_EXAMPLE
        |raw ``` text
        |#+END_EXAMPLE
        |
        |#+BEGIN_QUOTE
        |quoted line
        |#+END_QUOTE
        |""".stripMargin
    assert(OrgExtract.toMarkdown(org) ==
      "```scala\nval x = 1\n```\n\n" +
      "````\nraw ``` text\n````\n\n" +
      "> quoted line")
  }

  test("org tables become pipe tables; the first rule is the separator") {
    val org =
      """|| Name | Qty |
        ||------+-----|
        || alpha | 3 |
        || beta | 7 |
        |""".stripMargin
    assert(OrgExtract.toMarkdown(org) ==
      "|Name|Qty|\n|---|---|\n|alpha|3|\n|beta|7|")
  }

  test("consecutive table rules emit exactly one separator") {
    val org = "| a |\n|---|\n|---|\n| b |\n"
    assert(OrgExtract.toMarkdown(org) == "|a|\n|---|\n|b|")
  }

  test("lists: +→-, N)→N., checkboxes normalize; unknown blocks unwrap") {
    val org =
      """- keep
        |+ plus item
        |1) numbered
        |2. dotted
        |- [X] done
        |- [ ] todo
        |
        |#+BEGIN_CENTER
        |centered text
        |#+END_CENTER
        |""".stripMargin
    assert(OrgExtract.toMarkdown(org) ==
      "- keep\n- plus item\n1. numbered\n2. dotted\n- [x] done\n- [ ] todo\n\ncentered text")
  }

  test("links: desc, bare, and file: image references") {
    val org =
      """See [[https://example.org][the site]] and [[https://plain.example]].
        |
        |[[file:chart.png]]
        |""".stripMargin
    assert(OrgExtract.toMarkdown(org) ==
      "See [the site](https://example.org) and <https://plain.example>.\n\n" +
      "![chart.png](chart.png)")
  }

  test("emphasis needs word boundaries; URLs and a*b stay untouched") {
    assert(OrgExtract.toMarkdown("x = a*b and 2*3*4 stay") == "x = a*b and 2*3*4 stay")
    assert(OrgExtract.toMarkdown("see http://e.org/p/q now") == "see http://e.org/p/q now")
    assert(OrgExtract.toMarkdown("*bold* at start") == "**bold** at start")
  }

  test("real ingestion route: .org → spans with an interleaved image") {
    val org =
      """* Head
        |
        |para
        |
        |[[file:img.png]]
        |""".stripMargin
    val out = graft.pipeline.Pipeline.extractOne(
      graft.io.Ingest.toRawDoc("notes.org", org.getBytes("UTF-8")))
    assert(out.failure.isEmpty, out.failure)
    assert(out.mime_type == "text/x-org")
    assert(out.spans.map(_.kind) == Seq("text", "text", "image"))
    assert(out.spans.head.text == "# Head")
  }
}
