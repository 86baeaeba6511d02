package graft

/** Scratch: plain-JVM thread scaling of doc generation (no Spark). */
object ProfThreads {
  val sink = new java.util.concurrent.atomic.AtomicLong()
  def run(threads: Int, n: Int): Unit = {
    val per = n / threads
    val ts = (0 until threads).map { t =>
      new Thread(() => {
        var acc = 0L
        var i = t.toLong * per
        val end = i + per
        while (i < end) {
          val g = graft.io.SyntheticDocs.generate(42L, i)
          acc += g.raw.raw.length + g.raw.pages.length + g.raw.elements.length
          i += 1
        }
        sink.addAndGet(acc)
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
  }
  def main(args: Array[String]): Unit = {
    val n = 960000
    for (threads <- Seq(1, 4, 8, 16, 32)) {
      run(threads, 100000)
      val t0 = System.nanoTime()
      run(threads, n)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"threads=$threads%2d  ${n / sec}%.0f docs/s")
    }
  }
}
