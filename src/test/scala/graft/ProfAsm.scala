package graft

import graft.model.RawDoc
import graft.pipeline.{Pipeline, SpanOps}

/** Scratch: plain vs skew-aware assemble on the (planted-skew) corpus. */
object ProfAsm {
  def main(args: Array[String]): Unit = {
    val spark = Pipeline.session("local[32]", 32, "prof-asm")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val raw = spark.read.parquet(sys.env.getOrElse("PROF_CORPUS", "/tmp/graft_bench_corpus_v3_960000")).as[RawDoc]
    val docs = Pipeline.toDocsDF(Pipeline.extract(raw)).cache()
    docs.count() // materialize extraction once
    val flat = SpanOps.explodeSpans(docs).cache()
    println("spans=" + flat.count())
    def time(name: String)(f: => Long): Unit = {
      (1 to 2).foreach { r =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$name run$r  ${(System.nanoTime() - t0) / 1e9}%.2f s  ($n docs)")
      }
    }
    time("assemble plain     ") { SpanOps.assemble(flat).count() }
    time("assemble skew-aware") { SpanOps.assembleSkewAware(flat).count() }
    // amplified skew: one doc with ~1M spans
    val skewed = flat.union(
      spark.range(1000000).select(
        org.apache.spark.sql.functions.lit("doc-MONSTER").as("doc_id"),
        org.apache.spark.sql.functions.lit("text").as("kind"),
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("block "),
          org.apache.spark.sql.functions.col("id")).as("text"),
        org.apache.spark.sql.functions.lit("").as("media_ref"),
        org.apache.spark.sql.functions.col("id").cast("int").as("offset"))).cache()
    skewed.count()
    time("amplified plain    ") { SpanOps.assemble(skewed).count() }
    time("amplified skew-aware") { SpanOps.assembleSkewAware(skewed).count() }
    spark.stop()
  }
}
