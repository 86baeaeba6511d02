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
  * durable. Crash windows and their repair:
  *   - inside the docs commit: invisible leftovers are cleaned by
  *     TableIO.commit's orphan sweep; the rerun re-processes the batch.
  *   - between the docs commit and the lineage commit: the rerun detects the
  *     visible docs snapshot with no metrics rows and reconstructs lineage
  *     from the committed snapshot itself (failure lists are not
  *     reconstructable post-hoc — failed docs were never committed, so they
  *     are re-extracted on the next batch anyway — and are recorded empty).
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

    // 0. repair the docs-committed-but-lineage-missing crash window FIRST —
    // unconditionally, not only on no-op reruns: a rerun with pending work
    // would otherwise commit snapshot N+1 and leave snapshot N's metrics
    // missing forever
    TableIO.currentSnapshot(outTableDir).foreach { s =>
      repairMissingLineage(spark, outTableDir, metricsTableDir, s.snapshotId)
    }

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
    val okCount = out.filter(_.failure.isEmpty).count()
    if (okCount == 0) {
      // nothing committable: either fully resumed, or only permanently
      // failing docs remain — committing an empty snapshot every rerun
      // would grow the chain unboundedly without converging
      val failures = pendingCount // every pending row is a failure row here
      out.unpersist()
      val snap = TableIO.currentSnapshot(outTableDir).map(_.snapshotId).getOrElse(-1L)
      return RunResult(snap, 0, 0, failures, inputCount - pendingCount)
    }

    // 3. commit docs; snapshot id anchors the lineage rows
    val snap = TableIO.commit(Pipeline.toDocsDF(out), outTableDir)

    // 4. commit lineage under the same snapshot id
    val lineage = Pipeline.lineage(out, snap.snapshotId).toDF().cache()
    TableIO.commit(lineage, metricsTableDir)
    val totals = lineage.agg(
      sum(col("doc_count")), sum(col("span_count")),
      sum(size(col("failures")))).collect().head
    lineage.unpersist()
    out.unpersist()

    RunResult(snap.snapshotId, totals.getLong(0), totals.getLong(1),
      totals.getLong(2), inputCount - pendingCount)
  }

  /** Repair the docs-committed-but-lineage-missing crash window: rebuild the
    * snapshot's metrics rows from the committed docs themselves.
    */
  private def repairMissingLineage(
      spark: SparkSession,
      outTableDir: String,
      metricsTableDir: String,
      docsSnapshotId: Long): Unit = {
    val hasRows = TableIO.read(spark, metricsTableDir)
      .exists(m => !m.filter(col("snapshot_id") === docsSnapshotId).isEmpty)
    if (!hasRows) {
      TableIO.readAsOf(spark, outTableDir, docsSnapshotId).foreach { docs =>
        // only the rows ADDED by this snapshot (not its ancestors)
        val prior = TableIO.readAsOf(spark, outTableDir, docsSnapshotId - 1)
        val added = prior match {
          case Some(p) => docs.join(p.select("doc_id"), Seq("doc_id"), "left_anti")
          case None => docs
        }
        val lineage = added
          .withColumn("partition_id", spark_partition_id())
          .groupBy(col("partition_id"))
          .agg(count(lit(1)).as("doc_count"),
            coalesce(sum(size(col("spans"))), lit(0L)).as("span_count"))
          .select(lit(docsSnapshotId).as("snapshot_id"), col("partition_id"),
            col("doc_count"), col("span_count"),
            array().cast("array<string>").as("failures"))
        if (!lineage.isEmpty) TableIO.commit(lineage, metricsTableDir)
      }
    }
  }
}
