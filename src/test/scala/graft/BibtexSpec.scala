package graft

import graft.extract.BibtexExtract
import org.scalatest.funsuite.AnyFunSuite

/** BibTeX (.bib) extraction: deterministic reference-list contract through
  * the unit surface and the REAL ingestion route.
  */
class BibtexSpec extends AnyFunSuite {

  test("entries render as one ordered list; field forms and accents") {
    val bib =
      """@article{knuth84,
        |  author = {Knuth, Donald E.},
        |  title = {Literate Programming},
        |  journal = {The Computer Journal},
        |  year = 1984
        |}
        |@inproceedings{broder97,
        |  author = "Broder, Andrei Z. and Glassman, Steven C.",
        |  title = {Syntactic clustering of the {Web}},
        |  booktitle = {WWW},
        |  year = {1997},
        |}
        |""".stripMargin
    assert(BibtexExtract.toMarkdown(bib) ==
      "- **knuth84** (article): Knuth, Donald E. (1984). *Literate Programming*. The Computer Journal.\n" +
      "- **broder97** (inproceedings): Broder, Andrei Z., Glassman, Steven C. (1997). *Syntactic clustering of the Web*. WWW.")
  }

  test("missing fields omit gracefully; comment/preamble/string skipped") {
    val bib =
      """@string{me = {Someone}}
        |@comment{ignore all this}
        |@misc{only-key}
        |@misc{titled, title = {Just a Title}}
        |""".stripMargin
    assert(BibtexExtract.toMarkdown(bib) ==
      "- **only-key** (misc)\n- **titled** (misc): *Just a Title*.")
  }

  test("brace-protected quotes inside a quoted value do not close it") {
    val bib = """@article{k, title = "The {"}quoted{"} word", year = 1999}"""
    assert(BibtexExtract.toMarkdown(bib) ==
      "- **k** (article): (1999). *The \"quoted\" word*.")
  }

  test("real ingestion route: .bib → one list span; empty file → failure row") {
    val bib = "@book{b1, author = {A. Author}, year = {2001}}"
    val out = graft.pipeline.Pipeline.extractOne(
      graft.io.Ingest.toRawDoc("refs.bib", bib.getBytes("UTF-8")))
    assert(out.failure.isEmpty)
    assert(out.mime_type == "application/x-bibtex")
    assert(out.spans.map(_.text) == Seq("- **b1** (book): A. Author (2001)."))

    val bad = graft.pipeline.Pipeline.extractOne(
      graft.io.Ingest.toRawDoc("none.bib", "just text".getBytes("UTF-8")))
    assert(bad.failure.nonEmpty)
  }
}
