package graft
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Profiling harness for the q_jaccard_pairs tail: count-agg vs
  * prefix+positional paths at the driver row's exact config.
  */
object ProfJac {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = graft.pipeline.Pipeline.session("local[32]", 32, "prof-jac")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .filter(col("doc_id") < 500).repartition(32).cache()
    docs.count()
    time("warmup-count") { Dedup.jaccardPairsVia(docs, 0.05, 3, 50, "text", "doc_id", usePrefix = false).count() }
    for (i <- 1 to 2) {
      time(s"count-agg[$i]   ") { println("  pairs=" + Dedup.jaccardPairsVia(docs, 0.05, 3, 50, "text", "doc_id", usePrefix = false).count()) }
      time(s"prefix+pos[$i] ") { println("  pairs=" + Dedup.jaccardPairsVia(docs, 0.05, 3, 50, "text", "doc_id", usePrefix = true).count()) }
    }
    spark.stop()
  }
}
