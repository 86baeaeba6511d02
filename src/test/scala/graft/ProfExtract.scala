package graft

import graft.io.SyntheticDocs
import graft.pipeline.Pipeline

/** Scratch: per-payload-kind extractOne cost, single thread, no Spark. */
object ProfExtract {
  def main(args: Array[String]): Unit = {
    val gens = (0L until 40000L).map(i => SyntheticDocs.generate(42L, i))
    val byKind = gens.groupBy(_.raw.payload_kind)
    // warm
    gens.take(5000).foreach(g => Pipeline.extractOne(g.raw))
    byKind.toSeq.sortBy(_._1).foreach { case (kind, gs) =>
      val t0 = System.nanoTime()
      var spans = 0
      gs.foreach(g => spans += Pipeline.extractOne(g.raw).spans.length)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$kind%-12s ${gs.size}%6d docs  ${sec * 1e6 / gs.size}%8.1f us/doc  ($spans spans)")
    }
  }
}
