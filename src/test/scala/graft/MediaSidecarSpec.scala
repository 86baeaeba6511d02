package graft

import graft.io.SyntheticDocs
import graft.model.SpanKind
import graft.ops.DocOps
import graft.pipeline.Pipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-2 feature specs: media sidecar emitted from extraction, document
  * metadata assembly (title / source_path / cost metadata), export payloads.
  */
class MediaSidecarSpec extends AnyFunSuite {

  lazy val spark = Pipeline.session("local[4]", 4, "graft-test")

  private lazy val gens = (0L until 400L).map(i => SyntheticDocs.generate(seed = 42, i))
  private lazy val docs = {
    import spark.implicits._
    Pipeline.toDocs(Pipeline.extract(spark.createDataset(gens.map(_.raw)))).collect()
      .map(d => d.doc_id -> d).toMap
  }

  test("data-URI media payloads round-trip from the source through extraction") {
    val datauri = gens.filter(_.raw.payload_kind == "md_datauri")
    assert(datauri.nonEmpty)
    datauri.foreach { g =>
      val d = docs(g.raw.doc_id)
      assert(d.media.nonEmpty, s"${g.raw.doc_id} has no media")
      val m = d.media.head
      assert(m.media_ref == "img-0.png" && m.mime_type == "image/png")
      // the generator embeds base64("<docId>-image-bytes") as the data URI
      assert(new String(m.content, "UTF-8") == s"${g.raw.doc_id}-image-bytes")
    }
  }

  test("every image span has a matching media sidecar row (ref-for-ref)") {
    gens.foreach { g =>
      val d = docs(g.raw.doc_id)
      val spanRefs = d.spans.filter(_.kind == SpanKind.Image).map(_.media_ref).sorted
      val mediaRefs = d.media.map(_.media_ref).sorted
      assert(spanRefs == mediaRefs, s"${g.raw.doc_id}: $spanRefs vs $mediaRefs")
    }
  }

  test("toMediaDF projects the sidecar table (doc_id, media_ref, mime_type, content)") {
    import spark.implicits._
    val df = Pipeline.toDocsDF(Pipeline.extract(spark.createDataset(gens.map(_.raw))))
    val media = Pipeline.toMediaDF(df)
    assert(media.columns.toSeq == Seq("doc_id", "media_ref", "mime_type", "content"))
    val expected = docs.values.map(_.media.size.toLong).sum
    assert(media.count() == expected)
    val withPayload = media.filter(length(col("content")) > 0).count()
    assert(withPayload == gens.count(_.raw.payload_kind == "md_datauri").toLong)
  }

  test("document title: HTML <title> else filename stem (base.py:208,285)") {
    val html = gens.find(_.raw.payload_kind == "html").get
    assert(docs(html.raw.doc_id).title == html.raw.doc_id) // synthetic <title> is the doc id
    val azure = gens.find(_.raw.payload_kind == "md_azure").get
    assert(docs(azure.raw.doc_id).title == azure.raw.doc_id) // stem fallback
    assert(graft.extract.HtmlExtract.extract(
      "<html><head><title>Real &amp; Title</title></head><body><p>Body text long enough.</p></body></html>")
      .title == "Real & Title")
  }

  test("source_path is populated and metadata carries cost fields for priced providers") {
    val azure = gens.find(_.raw.payload_kind == "md_azure").get
    val d = docs(azure.raw.doc_id)
    assert(d.source_path == s"synthetic://md_azure/${d.doc_id}.pdf")
    // base.py:214-223: conversion_cost_usd, price_per_page_usd, pages_processed
    assert(d.metadata("price_per_page_usd") == "0.00958")
    assert(d.metadata("pages_processed") == d.page_count.toString)
    val expected = java.math.BigDecimal.valueOf(0.00958)
      .multiply(java.math.BigDecimal.valueOf(d.page_count.toLong))
      .stripTrailingZeros.toPlainString
    assert(d.metadata("conversion_cost_usd") == expected)
    // unpriced providers carry no cost metadata (price_per_page is None)
    val slides = gens.find(_.raw.payload_kind == "md_slides").get
    assert(docs(slides.raw.doc_id).metadata.isEmpty)
  }

  test("exportToDirectory writes document.md + image files (test_output.py:41-49)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("export").toString
    val sample = gens.filter(_.raw.payload_kind == "md_datauri").take(3)
      .map(g => docs(g.raw.doc_id))
    DocOps.exportToDirectory(spark.createDataset(sample), base)
    sample.foreach { d =>
      val dir = java.nio.file.Paths.get(base, d.doc_id)
      // sorted file list matches the snapshot shape: document.md + images
      val files = dir.toFile.list().sorted.toSeq
      assert(files == Seq("document.md", "img-0.png"), files)
      val md = new String(java.nio.file.Files.readAllBytes(dir.resolve("document.md")), "UTF-8")
      assert(md.startsWith(s"---\ntitle: ${d.doc_id}\n"), md.take(80))
      assert(graft.md.Markdown.parse(md) == d.spans) // content round-trips
      val img = java.nio.file.Files.readAllBytes(dir.resolve("img-0.png"))
      assert(new String(img, "UTF-8") == s"${d.doc_id}-image-bytes") // real payload
    }
  }

  test("exportRows writes real image payloads (test_output.py:41-49 analog)") {
    import spark.implicits._
    val datauriDocs = gens.filter(_.raw.payload_kind == "md_datauri").map(g => docs(g.raw.doc_id))
    val rows = DocOps.exportRows(spark.createDataset(datauriDocs))
      .filter(col("filename") =!= "document.md")
      .select("doc_id", "content").as[(String, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, b64) =>
      assert(b64.nonEmpty, s"$id image row has empty payload")
      assert(new String(java.util.Base64.getDecoder.decode(b64), "UTF-8") == s"$id-image-bytes")
    }
    // frontmatter comes from the REAL assembly: title (stem) + source_path
    val md = DocOps.exportRows(spark.createDataset(datauriDocs.take(1)))
      .filter(col("filename") === "document.md")
      .select("content").as[String].head()
    val d = datauriDocs.head
    assert(md.startsWith(
      s"---\ntitle: ${d.doc_id}\nsource_path: synthetic://md_datauri/${d.doc_id}.md\n" +
        s"mime_type: text/markdown\npage_count: 1\n---\n\n"), md.take(200))
  }
}

/** TopKByScore aggregate: bounded partial top-k semantics. */
class TopKSpec extends AnyFunSuite {

  lazy val spark = Pipeline.session("local[4]", 4, "graft-test")

  test("top-k keeps (score desc, id asc) order with ties, across partitions") {
    import spark.implicits._
    val rows = Seq(
      (1L, 0.5, 10L), (1L, 0.9, 7L), (1L, 0.9, 3L), (1L, 0.1, 1L), (1L, 0.7, 2L),
      (2L, 0.2, 5L), (2L, 0.2, 4L))
      .toDF("query_id", "cosine", "corpus_id")
      .repartition(4) // force merge() across partial buffers
    val out = rows.groupBy(col("query_id"))
      .agg(graft.functions.TopKByScore.topK(col("cosine"), col("corpus_id"), 3).as("top"))
      .select(col("query_id"), col("top"))
      .as[(Long, Seq[(Double, Long)])].collect().toMap
    assert(out(1L) == Seq((0.9, 3L), (0.9, 7L), (0.7, 2L)))
    assert(out(2L) == Seq((0.2, 4L), (0.2, 5L)))
  }

  test("buffer insert/absorb is bounded and ordered (unit)") {
    def L(v: Long): AnyRef = java.lang.Long.valueOf(v)
    val b = new graft.functions.TopKBuf(2)
    b.insert(0.1, L(9)); b.insert(0.3, L(5)); b.insert(0.2, L(7)); b.insert(0.3, L(4))
    assert(b.n == 2)
    assert((b.scores.take(2).toSeq, b.ids.take(2).toSeq) == (Seq(0.3, 0.3), Seq(L(4), L(5))))
    val other = new graft.functions.TopKBuf(2)
    other.insert(0.9, L(1))
    other.absorb(b)
    assert((other.scores.take(2).toSeq, other.ids.take(2).toSeq) == (Seq(0.9, 0.3), Seq(L(1), L(4))))
  }

  test("top-k accepts string ids (doc_id shape), ordered lexicographically on ties") {
    import spark.implicits._
    val rows = Seq(("q", 0.8, "doc-b"), ("q", 0.8, "doc-a"), ("q", 0.9, "doc-z"), ("q", 0.1, "doc-c"))
      .toDF("query_id", "cosine", "corpus_id").repartition(3)
    val out = rows.groupBy(col("query_id"))
      .agg(graft.functions.TopKByScore.topK(col("cosine"), col("corpus_id"), 3).as("top"))
      .select(col("top")).as[Seq[(Double, String)]].head()
    assert(out == Seq((0.9, "doc-z"), (0.8, "doc-a"), (0.8, "doc-b")))
  }

  test("bruteForceTopK ranks match an explicit window-sort computation") {
    import spark.implicits._
    val vecs = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(d => math.sin(i * 13.7 + d * 3.1).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val got = graft.ops.Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") < 3), k = 4)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Double)].collect().toSeq
    // reference computation: per query, sort all candidates
    val data = vecs.as[(Long, Seq[Float])].collect()
    val expected = (0L until 3L).flatMap { q =>
      val qv = data.find(_._1 == q).get._2
      data.filter(_._1 != q).map { case (c, cv) =>
        val dot = qv.zip(cv).map { case (a, b) => a.toDouble * b.toDouble }.sum
        val na = math.sqrt(qv.map(x => x.toDouble * x.toDouble).sum)
        val nb = math.sqrt(cv.map(x => x.toDouble * x.toDouble).sum)
        val cos = java.math.BigDecimal.valueOf(dot / (na * nb))
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        (q, c, cos)
      }.sortBy { case (_, c, cos) => (-cos, c) }.take(4).zipWithIndex
        .map { case ((q2, c, cos), i) => (q2, i + 1, c, cos) }
    }
    assert(got == expected)
  }
}
