package graft

import graft.extract.IpynbExtract
import org.scalatest.funsuite.AnyFunSuite

/** Jupyter notebook (.ipynb) extraction: nbformat v4 and legacy v3 per the
  * public nbformat spec, through both the unit surface (toMarkdown) and the
  * REAL ingestion route (Ingest.toRawDoc → Pipeline.extractOne).
  */
class IpynbSpec extends AnyFunSuite {

  private def nb4(cells: String, langInfo: String = """"language_info":{"name":"python"}"""): String =
    s"""{"nbformat":4,"nbformat_minor":5,"metadata":{$langInfo},"cells":[$cells]}"""

  test("v4: markdown + code + stream/execute_result outputs") {
    val json = nb4(
      """{"cell_type":"markdown","source":["# Title\n","\n","Intro *text*.\n"]},
        |{"cell_type":"code","source":["x = 1\n","print(x)"],"outputs":[
        |  {"output_type":"stream","name":"stdout","text":["1\n"]},
        |  {"output_type":"execute_result","data":{"text/plain":["1"]}}]}""".stripMargin)
    val md = IpynbExtract.toMarkdown(json)
    assert(md ==
      "# Title\n\nIntro *text*.\n\n```python\nx = 1\nprint(x)\n```\n\n```\n1\n```\n\n```\n1\n```")
  }

  test("v4: error output strips ANSI escapes; display_data picks text/plain") {
    val esc = "\u001b" // decoded ESC (for the assertion below)
    val escJ = "\\" + "u001b" // the JSON escape form notebooks actually carry
    val json = nb4(
      s"""{"cell_type":"code","source":"1/0","outputs":[
         |  {"output_type":"error","ename":"ZeroDivisionError","evalue":"division by zero",
         |   "traceback":["${escJ}[0;31mZeroDivisionError${escJ}[0m: division by zero"]},
         |  {"output_type":"display_data","data":{"text/plain":"<Figure>","image/png":"aWdub3JlZA=="}}]}""".stripMargin)
    val md = IpynbExtract.toMarkdown(json)
    assert(md.contains(
      "```\nZeroDivisionError: division by zero\nZeroDivisionError: division by zero\n```"))
    assert(md.contains("```\n<Figure>\n```"))
    assert(!md.contains(esc))
    assert(!md.contains("aWdub3JlZA")) // binary mime payloads never surface
  }

  test("v4: language falls back kernelspec.language, then empty; raw verbatim") {
    val ks = nb4("""{"cell_type":"code","source":"a <- 1","outputs":[]}""",
      """"kernelspec":{"language":"r","name":"ir"}""")
    assert(IpynbExtract.toMarkdown(ks).startsWith("```r\n"))
    val none = nb4("""{"cell_type":"code","source":"?","outputs":[]}""", """"x":1""")
    assert(IpynbExtract.toMarkdown(none).startsWith("```\n"))
    val raw = nb4("""{"cell_type":"raw","source":"pass-through\nlines"}""")
    assert(IpynbExtract.toMarkdown(raw) == "pass-through\nlines")
  }

  test("fence widens past backtick runs inside a cell body") {
    val json = nb4(
      """{"cell_type":"code","source":"s = \"```\"\nprint(s)","outputs":[]}""")
    val md = IpynbExtract.toMarkdown(json)
    assert(md == "````python\ns = \"```\"\nprint(s)\n````")
  }

  test("v3: worksheets, heading cells, input field, pyout/pyerr outputs") {
    val json =
      """{"nbformat":3,"metadata":{"language":"python"},"worksheets":[{"cells":[
        |  {"cell_type":"heading","level":2,"source":["Old style"]},
        |  {"cell_type":"code","input":["y = 2"],"outputs":[
        |    {"output_type":"pyout","text":["2"]},
        |    {"output_type":"pyerr","ename":"E","evalue":"v","traceback":[]}]}
        |]}]}""".stripMargin
    val md = IpynbExtract.toMarkdown(json)
    assert(md == "## Old style\n\n```python\ny = 2\n```\n\n```\n2\n```\n\n```\nE: v\n```")
  }

  test("v3: display_data carries its text under 'text', not 'data'") {
    val json =
      """{"nbformat":3,"metadata":{"language":"python"},"worksheets":[{"cells":[
        |  {"cell_type":"code","input":["plot(x)"],"outputs":[
        |    {"output_type":"display_data","text":["<figure repr>"]}]}
        |]}]}""".stripMargin
    val md = IpynbExtract.toMarkdown(json)
    assert(md == "```python\nplot(x)\n```\n\n```\n<figure repr>\n```")
  }

  test("real ingestion route: .ipynb → spans; malformed JSON → failure row") {
    val json = nb4(
      """{"cell_type":"markdown","source":"# H\n\npara"},
        |{"cell_type":"code","source":"z=3","outputs":[]}""".stripMargin)
    val out = graft.pipeline.Pipeline.extractOne(
      graft.io.Ingest.toRawDoc("nb.ipynb", json.getBytes("UTF-8")))
    assert(out.failure.isEmpty)
    assert(out.mime_type == "application/x-ipynb+json")
    // blocks: "# H" / "para" / fenced code (no internal blank line) → 3 spans
    assert(out.spans.map(_.text) == Seq("# H", "para", "```python\nz=3\n```"))

    val bad = graft.pipeline.Pipeline.extractOne(
      graft.io.Ingest.toRawDoc("broken.ipynb", "{not json".getBytes("UTF-8")))
    assert(bad.failure.nonEmpty)
    val noCells = graft.pipeline.Pipeline.extractOne(
      graft.io.Ingest.toRawDoc("empty.ipynb", "{}".getBytes("UTF-8")))
    assert(noCells.failure.nonEmpty)
  }
}
