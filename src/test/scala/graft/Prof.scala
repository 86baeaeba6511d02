package graft

import graft.io.SyntheticDocs
import graft.ops.Dedup
import graft.pipeline.{Pipeline, SpanOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the API surface). */
object Prof {

  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def stageBreakdown(spark: SparkSession, n: Long, tag: String): Unit = {
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    val raw = spark.range(n).map(i => SyntheticDocs.generate(42L, i).raw)
    time(s"$tag gen-only ($n)") { raw.count() }
    time(s"$tag gen+extract") {
      Pipeline.extract(spark.range(n).map(i => SyntheticDocs.generate(42L, i).raw),
        repartitionTo = par * 2).count()
    }
    time(s"$tag gen+extract+assemble") {
      val docs = Pipeline.toDocs(Pipeline.extract(
        spark.range(n).map(i => SyntheticDocs.generate(42L, i).raw), repartitionTo = par * 2))
      SpanOps.assembleSkewAware(SpanOps.explodeSpans(docs.toDF())).count()
    }
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("minhash")
    if (mode == "minhash") {
      val spark = Pipeline.session("local[32]", 32, "prof")
      spark.sparkContext.setLogLevel("WARN")
      val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .repartition(32).cache()
      docs.count()
      time("warmup") { Dedup.minhashPairs(docs, 0.15, 32, 8).count() }
      time("minhashPairs") { println("pairs=" + Dedup.minhashPairs(docs, 0.15, 32, 8).count()) }
      time("simhashPairs") { println("pairs=" + Dedup.simhashPairs(docs, 8).count()) }
      time("jaccardPairs") { println("pairs=" + Dedup.jaccardPairs(docs, 0.18).count()) }
      spark.stop()
    } else {
      // scaling diagnosis
      for (cpus <- Seq(8, 32)) {
        val spark = Pipeline.session(s"local[$cpus]", cpus, s"prof-$cpus")
        spark.sparkContext.setLogLevel("WARN")
        stageBreakdown(spark, 2000, s"[$cpus] warm")
        stageBreakdown(spark, 960000, s"[$cpus] run1")
        stageBreakdown(spark, 960000, s"[$cpus] run2")
        spark.stop()
      }
    }
  }
}
