package graft.pipeline

import graft.io.TableIO
import graft.model.RawDoc
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The full north-rule orchestration as one callable: snapshot-aware resume →
  * salted repartition → extract → commit docs and per-partition lineage rows
  * under the SAME snapshot id → idempotent on rerun.
  *
  * Commit protocol (emulated Iceberg, TableIO): the docs snapshot is written
  * first; the lineage rows carry that snapshot id and are committed to the
  * metrics table second; the docs `current` pointer flips only after data is
  * durable. A crash between the two leaves the docs snapshot visible without
  * metrics — the lineage committer is re-run idempotently by keying metrics
  * on (snapshot_id, partition_id).
  */
object Runner {

  final case class RunResult(
      snapshotId: Long,
      docsProcessed: Long,
      spansWritten: Long,
      failures: Long,
      skippedAlreadyDone: Long)

  def run(
      input: Dataset[RawDoc],
      outTableDir: String,
      metricsTableDir: String,
      repartitionTo: Int = 0): RunResult = {
    val spark = input.sparkSession
    import spark.implicits._

    // 1. resume: drop already-committed doc_ids (snapshot-aware anti-join)
    val processed = Resume.processedIds(spark, outTableDir)
    val pending: Dataset[RawDoc] = processed match {
      case Some(ids) => Resume.filterProcessed(input.toDF(), ids).as[RawDoc]
      case None => input
    }
    val inputCount = input.count()

    // 2. extract with explicit pre-stage repartition + salting
    val par = if (repartitionTo > 0) repartitionTo
      else spark.sparkContext.defaultParallelism * 2
    val out = Pipeline.extract(pending, repartitionTo = par).cache()

    val pendingCount = out.count()
    if (pendingCount == 0) {
      out.unpersist()
      val snap = TableIO.currentSnapshot(outTableDir).map(_.snapshotId).getOrElse(-1L)
      return RunResult(snap, 0, 0, 0, inputCount)
    }

    // 3. commit docs; snapshot id anchors the lineage rows
    val snap = TableIO.commit(Pipeline.toDocsDF(out), outTableDir)

    // 4. commit lineage under the same snapshot id
    val lineage = Pipeline.lineage(out, snap.snapshotId).cache()
    TableIO.commit(lineage, metricsTableDir)
    val totals = lineage.agg(
      sum(col("doc_count")), sum(col("span_count")),
      sum(size(col("failures")))).collect().head
    lineage.unpersist()
    out.unpersist()

    RunResult(snap.snapshotId, totals.getLong(0), totals.getLong(1),
      totals.getLong(2), inputCount - pendingCount)
  }
}
