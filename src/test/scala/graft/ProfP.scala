package graft

import graft.io.SyntheticDocs
import graft.model.RawDoc
import graft.pipeline.{Pipeline, SpanOps}

/** Scratch: extract+assemble scaling from a parquet-materialized corpus. */
object ProfP {
  def main(args: Array[String]): Unit = {
    val n = 960000L
    val corpus = "/tmp/graft_corpus"
    if (!new java.io.File(corpus + "/_SUCCESS").exists()) {
      val s = Pipeline.session("local[32]", 32, "gen")
      import s.implicits._
      s.range(n).map(i => SyntheticDocs.generate(42L, i).raw)
        .write.mode("overwrite").parquet(corpus)
      s.stop()
    }
    for (cpus <- args.headOption.map(_.split(',').toSeq).getOrElse(Seq("8", "32"))) {
      val spark = Pipeline.session(s"local[$cpus]", cpus.toInt, s"profp-$cpus")
      spark.sparkContext.setLogLevel("WARN")
      import spark.implicits._
      def job(): Long = {
        val raw = spark.read.parquet(corpus).as[RawDoc]
        val docs = Pipeline.toDocs(Pipeline.extract(raw))
        SpanOps.assembleSkewAware(SpanOps.explodeSpans(docs.toDF())).count()
      }
      // warm
      val w = spark.read.parquet(corpus).as[RawDoc].limit(5000)
      Pipeline.toDocs(Pipeline.extract(w)).count()
      for (r <- 1 to 2) {
        val t0 = System.nanoTime()
        val cnt = job()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"cpus=$cpus%3s run$r  $sec%6.2f s  ${cnt / sec}%.0f docs/s")
      }
      spark.stop()
    }
  }
}
