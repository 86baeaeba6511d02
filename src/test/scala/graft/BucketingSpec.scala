package graft

import graft.io.SyntheticDocs
import graft.pipeline.Pipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing evidence: co-locating the docs and media tables on doc_id lets
  * the doc↔media join run with ZERO shuffle exchanges — the 100 TB plan for
  * repeated joins against the media side-table (SURVEY §1.1: payload bytes
  * live in a separate table keyed by doc_id).
  */
class BucketingSpec extends AnyFunSuite {

  // shared session (suites run in one JVM); broadcast threshold is toggled
  // per-test and restored so other suites are unaffected
  lazy val spark = Pipeline.session("local[4]", 4, "graft-test")

  test("doc↔media join on bucketed tables plans without a shuffle") {
    import spark.implicits._
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    // the in-memory catalog forgets tables between JVMs but their managed
    // locations persist — clear both
    for (t <- Seq("docs_bucketed", "media_bucketed")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
      }
      rm(loc)
    }
    try {
    val gens = (0L until 300L).map(i => SyntheticDocs.generate(seed = 17, i))
    val docs = spark.createDataset(gens.map(g => graft.model.Doc(g.raw.doc_id, g.expected))).toDF()
    val media = docs.select(col("doc_id"), explode(col("spans")).as("s"))
      .filter(col("s.kind") === "image")
      .select(col("doc_id"), col("s.media_ref").as("media_ref"))

    docs.write.mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id")
      .saveAsTable("docs_bucketed")
    media.write.mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id")
      .saveAsTable("media_bucketed")

    val joined = spark.table("docs_bucketed")
      .join(spark.table("media_bucketed"), Seq("doc_id"))
    val plan = joined.queryExecution.executedPlan.toString

    assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    assert(joined.count() ==
      gens.map(_.expected.count(_.kind == graft.model.SpanKind.Image)).sum)

    // control: the same join on unbucketed data DOES shuffle
    val unbucketed = docs.join(media, Seq("doc_id"))
    assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}

/** The media-sidecar-as-column design claim: span-only readers of the docs
  * table must never touch the payload bytes — parquet column pruning.
  */
class ColumnPruningSpec extends org.scalatest.funsuite.AnyFunSuite {

  lazy val spark = graft.pipeline.Pipeline.session("local[4]", 4, "graft-test")

  test("span-only reads of the docs table prune the media column (ReadSchema)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("prune").toString + "/docs"
    val gens = (0L until 50L).map(i => graft.io.SyntheticDocs.generate(seed = 42, i))
    graft.pipeline.Pipeline.toDocsDF(
      graft.pipeline.Pipeline.extract(spark.createDataset(gens.map(_.raw))))
      .write.parquet(dir)
    val plan = spark.read.parquet(dir).select("doc_id", "spans")
      .queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse(plan)
    assert(readSchema.contains("spans:array"), readSchema)
    assert(!readSchema.contains("media:array"), s"media column not pruned: $readSchema")
    // and the media projection reads media but not spans
    val mediaPlan = graft.pipeline.Pipeline.toMediaDF(spark.read.parquet(dir))
      .queryExecution.executedPlan.toString
    val mediaRead = mediaPlan.linesIterator.find(_.contains("ReadSchema")).getOrElse(mediaPlan)
    assert(mediaRead.contains("media:array") && !mediaRead.contains("spans"), mediaRead)
  }
}
