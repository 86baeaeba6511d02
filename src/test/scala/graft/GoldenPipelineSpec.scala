package graft

import graft.md.Markdown
import graft.model.{Doc, RawDoc}
import graft.ops.{DocOps, TextAnalysis}
import graft.pipeline.Pipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end golden check through the DISTRIBUTED path: the reference
  * goldens, inverse-transformed into provider-raw payloads, flow through
  * `Pipeline.extract` as table rows and must reproduce the golden span
  * sequences via the relational verification join — the same check
  * NormalizeSpec does pure-function-level, now over Spark.
  */
class GoldenPipelineSpec extends AnyFunSuite {

  lazy val spark = Pipeline.session("local[4]", 4, "graft-test")

  private val MarkerRe = """<!-- docler:page_break \{"next_page":(\d+)\} -->""".r

  test("golden-derived raw payloads reproduce golden spans through Pipeline.extract") {
    assume(AmbrGoldens.available)
    import spark.implicits._

    def invert(provider: String, golden: String): Option[RawDoc] = provider match {
      case "azure" =>
        var raw = MarkerRe.replaceAllIn(golden,
          m => if (m.group(1).toInt == 1) "" else "<!-- PageBreak -->")
        raw = """!\[img-\d+\]\(img-\d+\.png\)""".r
          .replaceAllIn(raw, "<figure>figure content</figure>")
        Some(RawDoc(s"golden-$provider", "md_azure", "application/pdf", raw, Nil, Nil))
      case "docling" =>
        var raw = MarkerRe.replaceAllIn(golden,
          m => if (m.group(1).toInt == 1) "" else "<!-- PageBreak -->")
        raw = """!\[img-\d+\]\(img-\d+\.png\)""".r.replaceAllIn(raw, "<!-- image -->")
        Some(RawDoc(s"golden-$provider", "md_docling", "application/pdf", raw, Nil, Nil))
      case "mistral" | "llamaparse" =>
        val parts = MarkerRe.split(golden).map(_.trim).filter(_.nonEmpty).toSeq
        Some(RawDoc(s"golden-$provider", "md_pages", "application/pdf", "", parts, Nil))
      case _ => None
    }

    val pairs = AmbrGoldens.markdownGoldens.toSeq.flatMap { case (p, g) =>
      val body = AmbrGoldens.body(g)
      invert(p, body).map(raw => (raw, Doc(raw.doc_id, Markdown.parse(body))))
    }
    assert(pairs.size >= 4)

    val rawDs = spark.createDataset(pairs.map(_._1))
    val expected = spark.createDataset(pairs.map(_._2)).toDF()
    val ours = Pipeline.toDocsDF(Pipeline.extract(rawDs))
    val verdicts = DocOps.verifyJoin(ours, expected)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(verdicts.nonEmpty && verdicts.values.forall(identity), verdicts)
  }
}

class TextAnalysisSpec extends AnyFunSuite {

  test("removeBoilerplateParagraphs: hot paragraphs vanish corpus-wide, order survives") {
    val spark = graft.pipeline.Pipeline.session("local[4]", 4, "graft-test")
    import spark.implicits._
    // 20 docs sharing a banner; doc-unique middles; one doc is ALL banner
    val docs = (0 until 20).map { i =>
      val paras =
        if (i == 19) Seq("BANNER", "BANNER")
        else Seq("BANNER", s"middle $i", "BANNER", s"tail $i")
      (i.toLong, paras.mkString("\n\n"))
    }.toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.removeBoilerplateParagraphs(docs, maxDocFreq = 5)
      .as[(Long, String)].collect().toMap
    (0 until 19).foreach { i =>
      assert(got(i.toLong) == s"middle $i\n\ntail $i", s"doc $i")
    }
    assert(!got.contains(19L), "all-boilerplate doc drops out")
    // below the cap nothing is removed
    val loose = graft.ops.TextAnalysis.removeBoilerplateParagraphs(docs, maxDocFreq = 1000)
      .as[(Long, String)].collect().toMap
    assert(loose(3L) == "BANNER\n\nmiddle 3\n\nBANNER\n\ntail 3")
  }
  lazy val spark = Pipeline.session("local[4]", 4, "graft-test")

  test("subwordCount upper-bounds tokenCount and splits long words") {
    import spark.implicits._
    val df = Seq("hello extraordinary a1b2", "", "short").toDF("text")
    val got = df.select(
      TextAnalysis.tokenCount(col("text")).as("t"),
      TextAnalysis.subwordCount(col("text")).as("s")).as[(Int, Int)].collect()
    assert(got(0)._1 == 3)
    // hell|o + extr|aord|inar|y + a|1|b|2 → more subwords than words
    assert(got(0)._2 > got(0)._1)
    assert(got(1) == ((0, 0)))
    assert(got(2) == ((1, 2))) // shor|t
  }

  test("qualityScore is bounded to [0,1] and favors alpha-rich longer text") {
    import spark.implicits._
    val df = Seq(
      "a" * 600,                       // long, all-alpha
      "12345 67890 !!!",               // junk
      "Normal sentence with words."    // short but clean
    ).toDF("text")
    val s = df.select(TextAnalysis.qualityScore(col("text"))).as[Double].collect()
    assert(s.forall(v => v >= 0.0 && v <= 1.0))
    assert(s(0) > s(1))
    assert(s(2) > s(1))
  }

  test("stopwordHits counts case-insensitive whole words") {
    import spark.implicits._
    val df = Seq("The cat and THE dog, theme park").toDF("text")
    val hits = df.select(TextAnalysis.stopwordHits(col("text"),
      TextAnalysis.StopwordSets("en"))).as[Int].collect().head
    assert(hits == 3) // The, THE, and — 'theme' not a whole-word match
  }

  test("fingerprint is stable under whitespace variation, distinct for edits") {
    import spark.implicits._
    val df = Seq("Some   document\ttext", "some document text", "some document texx")
      .toDF("text")
    val fp = df.select(TextAnalysis.fingerprint(col("text"))).as[Long].collect()
    assert(fp(0) == fp(1)) // case+whitespace normalized
    assert(fp(1) != fp(2))
  }
}
