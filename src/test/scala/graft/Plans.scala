package graft

import graft.pipeline.Pipeline
import org.apache.spark.sql.functions._

/** Prints physical plans for the load-bearing queries so pushdown /
  * broadcast / codegen can be audited (kept as a main: plan drift is a
  * regression class worth re-checking every round).
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = Pipeline.session("local[8]", 8, "plans")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"

    def show(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n======================= $name =======================")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }

    show("q_token_count: projection pushdown")(
      SparkEntry.queries("q_token_count")(spark, dir))
    show("q_quality pushdown: doc_id<500 filter")(
      SparkEntry.queries("q_jaccard_pairs")(spark, dir))
    show("q_join_topn: broadcast join")(
      SparkEntry.queries("q_join_topn")(spark, dir))
    show("q_antijoin: anti join strategy")(
      SparkEntry.queries("q_antijoin")(spark, dir))
    show("assemble: two-phase skew-aware agg")(
      SparkEntry.queries("pipeline_assemble")(spark, dir))
    show("q_ann_topk: broadcast NL join + partial top-k agg")(
      SparkEntry.queries("q_ann_topk")(spark, dir))
    show("q_ann_ivf: zero-shuffle assignment + partial top-k")(
      SparkEntry.queries("q_ann_ivf")(spark, dir))
    show("q_minhash_pairs: banded self-join, no shingle payload")(
      SparkEntry.queries("q_minhash_pairs")(spark, dir))
    spark.stop()
  }
}
