package graft

import graft.extract.{Fb2Extract, JatsExtract, OpmlExtract}
import org.scalatest.funsuite.AnyFunSuite

/** FictionBook 2 / JATS / OPML extraction: the remaining XML members of
  * the reference's pandoc surface, each a deterministic StAX subset.
  */
class XmlMarkupSpec extends AnyFunSuite {

  test("fb2: book-title, body/section titles, poem, cite, image, binary skip") {
    val fb2 =
      """<FictionBook xmlns="http://www.gribuser.ru/xml/fictionbook/2.0"
        |             xmlns:l="http://www.w3.org/1999/xlink">
        |<description><title-info><book-title>War 1</book-title></title-info></description>
        |<body>
        | <title><p>Volume One</p></title>
        | <section>
        |  <title><p>Chapter 1</p></title>
        |  <p>It was <emphasis>a</emphasis> dark <strong>night</strong>.</p>
        |  <poem><stanza><v>line one</v><v>line two</v></stanza></poem>
        |  <cite><p>Quoted words.</p></cite>
        |  <image l:href="#pic1.png"/>
        | </section>
        |</body>
        |<binary id="pic1.png" content-type="image/png">aGVsbG8=</binary>
        |</FictionBook>""".stripMargin
    assert(Fb2Extract.toMarkdown(fb2) ==
      """# War 1
        |
        |# Volume One
        |
        |## Chapter 1
        |
        |It was *a* dark **night**.
        |
        |line one
        |line two
        |
        |> Quoted words.
        |
        |![pic1.png](pic1.png)""".stripMargin)
  }

  test("jats: front matter, abstract, nested secs, list, preformat, fig") {
    val jats =
      """<article xmlns:xlink="http://www.w3.org/1999/xlink">
        | <front><article-meta><title-group><article-title>Paper 7</article-title></title-group>
        |  <abstract><p>We study things.</p></abstract></article-meta></front>
        | <body>
        |  <sec><title>Methods</title>
        |   <p>See <ext-link xlink:href="http://z">site</ext-link> for <monospace>cmd</monospace>.</p>
        |   <list list-type="order"><list-item><p>first</p></list-item>
        |     <list-item><p>second</p></list-item></list>
        |   <sec><title>Detail</title>
        |    <p>Inner <italic>i</italic> and <bold>b</bold>.</p>
        |    <preformat>x = 1</preformat>
        |   </sec>
        |  </sec>
        |  <fig><graphic xlink:href="f1.png"/><caption><p>A figure.</p></caption></fig>
        | </body>
        |</article>""".stripMargin
    assert(JatsExtract.toMarkdown(jats) ==
      "# Paper 7\n\n## Abstract\n\nWe study things.\n\n## Methods\n\n" +
        "See [site](http://z) for `cmd`.\n\n1. first\n2. second\n\n" +
        "### Detail\n\nInner *i* and **b**.\n\n```\nx = 1\n```\n\n" +
        "![f1.png](f1.png)\n\nA figure.")
  }

  test("opml: head title, nested outlines, xmlUrl link, _note") {
    val opml =
      """<opml version="2.0">
        | <head><title>Plans 3</title></head>
        | <body>
        |  <outline text="Top A">
        |   <outline text="Sub A1"/>
        |   <outline text="Feed" xmlUrl="http://f/rss"/>
        |  </outline>
        |  <outline text="Top B" _note="remember"/>
        | </body>
        |</opml>""".stripMargin
    assert(OpmlExtract.toMarkdown(opml) ==
      "# Plans 3\n\n- Top A\n  - Sub A1\n  - [Feed](http://f/rss)\n- Top B — remember")
  }

  test("empty documents throw; real ingestion routes by explicit MIME") {
    intercept[IllegalArgumentException](
      Fb2Extract.toMarkdown("<FictionBook><body></body></FictionBook>"))
    intercept[IllegalArgumentException](
      JatsExtract.toMarkdown("<article><body></body></article>"))
    intercept[IllegalArgumentException](
      OpmlExtract.toMarkdown("<opml><body></body></opml>"))

    val cases = Seq(
      ("b.fb2", "<FictionBook><body><section><p>Text 1.</p></section></body></FictionBook>",
        "application/x-fictionbook+xml", Seq("Text 1.")),
      ("a.xml", "<article><body><sec><title>S</title><p>Text 2.</p></sec></body></article>",
        "application/x-jats+xml", Seq("## S", "Text 2.")),
      ("o.opml", """<opml><head><title>O</title></head><body><outline text="x"/></body></opml>""",
        "application/x-opml+xml", Seq("# O", "- x")))
    for ((name, body, mime, expect) <- cases) {
      val out = graft.pipeline.Pipeline.extractOne(
        graft.io.Ingest.toRawDoc(name, body.getBytes("UTF-8"), mime))
      assert(out.failure.isEmpty, s"$mime: ${out.failure}")
      assert(out.mime_type == mime)
      assert(out.spans.map(_.text) == expect, mime)
    }
  }
}
