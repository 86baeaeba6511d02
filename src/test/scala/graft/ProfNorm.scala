package graft

import graft.extract.Normalize
import graft.io.SyntheticDocs
import graft.md.Markdown

/** Scratch: normalize-vs-parse split for the markdown dialects. */
object ProfNorm {
  def main(args: Array[String]): Unit = {
    val gens = (0L until 60000L).map(i => SyntheticDocs.generate(42L, i))
      .filter(g => g.raw.payload_kind.startsWith("md_"))
    val byKind = gens.groupBy(_.raw.payload_kind)
    // warm
    gens.take(4000).foreach(g => Normalize.dialect(g.raw.payload_kind, g.raw.raw, g.raw.pages).spans)
    byKind.toSeq.sortBy(_._1).foreach { case (kind, gs) =>
      var t0 = System.nanoTime()
      val normalized = gs.map(g => Normalize.dialect(g.raw.payload_kind, g.raw.raw, g.raw.pages))
      val tNorm = (System.nanoTime() - t0) / 1e3 / gs.size
      t0 = System.nanoTime()
      var n = 0
      normalized.foreach(nm => n += Markdown.parse(nm.content).length)
      val tParse = (System.nanoTime() - t0) / 1e3 / gs.size
      println(f"$kind%-12s norm ${tNorm}%7.1f us/doc   parse ${tParse}%7.1f us/doc  ($n)")
    }
    // datalab sub-steps
    val dl = byKind("md_datalab")
    var t0 = System.nanoTime()
    dl.foreach(g => Normalize.extractImageNames(g.raw.raw))
    println(f"datalab extractImageNames ${(System.nanoTime() - t0) / 1e3 / dl.size}%7.1f us/doc")
  }
}

/** Scratch: datalab sub-step timings. */
object ProfNorm2 {
  def main(args: Array[String]): Unit = {
    val dl = (0L until 60000L).map(i => SyntheticDocs.generate(42L, i))
      .filter(_.raw.payload_kind == "md_datalab")
    // warm
    dl.take(2000).foreach(g => Normalize.datalab(g.raw.raw, Normalize.extractImageNames(g.raw.raw)))
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e3 / dl.size}%7.1f us/doc")
    }
    t("break regex only") {
      dl.foreach(g => graft.extract.NormalizeProbe.breaksOnly(g.raw.raw))
    }
    t("full datalab (no images)") {
      dl.foreach(g => Normalize.datalab(g.raw.raw, Nil))
    }
    t("full datalab (with images)") {
      dl.foreach(g => Normalize.datalab(g.raw.raw, Normalize.extractImageNames(g.raw.raw)))
    }
  }
}
