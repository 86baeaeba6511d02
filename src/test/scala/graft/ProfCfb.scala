package graft

/** Per-row cost probe for the legacy-format kernels (q_doc/q_ppt shape). */
object ProfCfb {
  def main(args: Array[String]): Unit = {
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e6}%.1f ms")
    }
    // warm
    (0 until 100).foreach { i =>
      graft.pipeline.Pipeline.extractOne(graft.io.Ingest.toRawDoc(s"w$i.doc",
        graft.extract.DocExtract.buildDoc(s"W $i", Seq(s"alpha $i", s"beta $i", s"gamma $i"), Seq(2))))
    }
    time("1000 x q_doc kernel") {
      (0 until 1000).foreach { i =>
        val out = graft.pipeline.Pipeline.extractOne(graft.io.Ingest.toRawDoc(s"d$i.doc",
          graft.extract.DocExtract.buildDoc(s"Word $i", Seq(s"Doc legacy alpha $i", s"Mid section $i", s"Tail words $i"), Seq(2))))
        require(out.failure.isEmpty)
      }
    }
    time("1000 x q_ppt kernel") {
      (0 until 1000).foreach { i =>
        val out = graft.pipeline.Pipeline.extractOne(graft.io.Ingest.toRawDoc(s"d$i.ppt",
          graft.extract.PptExtract.buildPpt(s"Deck $i", Seq((s"S $i", Seq(s"b $i"))), viaSlideListWithText = i % 3 == 0),
          "application/vnd.ms-powerpoint"))
        require(out.failure.isEmpty)
      }
    }
  }
}
