package graft

import graft.extract.DocbookExtract
import org.scalatest.funsuite.AnyFunSuite

/** DocBook XML extraction: sections → headings, inline markup, verbatim
  * fences, nested lists in document order, and the real ingestion route.
  */
class DocbookSpec extends AnyFunSuite {

  test("sections, info-wrapped title, inline markup, verbatim, lists, image") {
    val xml =
      """<article>
        |  <info><title>Guide 1</title></info>
        |  <section>
        |    <title>Intro</title>
        |    <para>Hello <emphasis>world</emphasis> and
        |      <emphasis role="bold">bold</emphasis> text.</para>
        |    <para>See <ulink url="http://x.example">the site</ulink> or
        |      <literal>code</literal>.</para>
        |    <programlisting language="scala">val x = 1
        |val y = 2</programlisting>
        |    <itemizedlist>
        |      <listitem><para>first</para></listitem>
        |      <listitem><para>second</para>
        |        <orderedlist>
        |          <listitem><para>sub one</para></listitem>
        |          <listitem><para>sub two</para></listitem>
        |        </orderedlist>
        |      </listitem>
        |    </itemizedlist>
        |    <mediaobject><imageobject><imagedata fileref="fig.png"/></imageobject></mediaobject>
        |  </section>
        |</article>""".stripMargin
    assert(DocbookExtract.toMarkdown(xml) ==
      """# Guide 1
        |
        |## Intro
        |
        |Hello *world* and **bold** text.
        |
        |See [the site](http://x.example) or `code`.
        |
        |```scala
        |val x = 1
        |val y = 2
        |```
        |
        |- first
        |- second
        |  1. sub one
        |  2. sub two
        |
        |![fig.png](fig.png)""".stripMargin)
  }

  test("DocBook 5 link@xlink:href; sect1 depth; heading cap at 6") {
    val xml =
      """<book xmlns:xlink="http://www.w3.org/1999/xlink">
        |  <title>B</title>
        |  <chapter><title>C</title>
        |    <sect1><title>S1</title>
        |      <sect2><title>S2</title>
        |        <sect3><title>S3</title>
        |          <sect4><title>S4</title>
        |            <sect5><title>S5</title>
        |              <para>Read <link xlink:href="http://y">docs</link>.</para>
        |            </sect5></sect4></sect3></sect2></sect1></chapter>
        |</book>""".stripMargin
    assert(DocbookExtract.toMarkdown(xml) ==
      "# B\n\n## C\n\n### S1\n\n#### S2\n\n##### S3\n\n###### S4\n\n###### S5\n\n" +
        "Read [docs](http://y).")
  }

  test("screen verbatim with backticks grows the fence; CDATA passes") {
    val xml = "<article><title>T</title>" +
      "<screen><![CDATA[run ```x``` now]]></screen></article>"
    assert(DocbookExtract.toMarkdown(xml) ==
      "# T\n\n````\nrun ```x``` now\n````")
  }

  test("no content throws; real ingestion route by explicit MIME") {
    intercept[IllegalArgumentException](
      DocbookExtract.toMarkdown("<article><section></section></article>"))

    val out = graft.pipeline.Pipeline.extractOne(graft.io.Ingest.toRawDoc(
      "g.xml",
      "<article><title>Doc 9</title><para>Body here.</para></article>".getBytes("UTF-8"),
      "application/docbook+xml"))
    assert(out.failure.isEmpty, out.failure)
    assert(out.mime_type == "application/docbook+xml")
    assert(out.spans.map(_.text) == Seq("# Doc 9", "Body here."))
  }
}
