package graft

import graft.io.SyntheticDocs
import graft.model.Doc
import graft.pipeline.Pipeline
import org.apache.spark.sql.functions._

/** Scratch: large-corpus extract-vs-expected sweep (beyond unit-test sizes). */
object ProfCheck {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(50000L)
    val spark = Pipeline.session("local[32]", 32, "check")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val ours = Pipeline.toDocsDF(Pipeline.extract(
      spark.range(n).map(i => SyntheticDocs.generate(42L, i).raw)))
    val expected = spark.range(n)
      .map { i => val g = SyntheticDocs.generate(42L, i); Doc(g.raw.doc_id, g.expected) }
      .toDF()
    val v = graft.ops.DocOps.verifyJoin(ours, expected)
    val bad = v.filter(!col("matches"))
    println(s"mismatches=${bad.count()} of $n")
    bad.limit(5).collect().foreach(r => println("BAD: " + r))
  }
}
