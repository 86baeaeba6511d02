package graft

import graft.pipeline.Pipeline
import graft.streaming.EventStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {

  lazy val spark = Pipeline.session("local[4]", 4, "graft-test")

  // FileStreamSource requires a directory; testdata ships one file per table
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("windowed streaming counts equal the batch windowed aggregation") {
    val schema = spark.read.parquet(eventsDir + "/events.parquet").schema
    // Complete mode: with Append, windows still inside the watermark of the
    // final batch would be withheld from the memory sink
    val q = EventStream.runOnce(
      EventStream.windowedCounts(spark, eventsDir, schema), "win_counts",
      org.apache.spark.sql.streaming.OutputMode.Complete)
    try {
      val streamed = spark.sql(
        "SELECT sum(n) FROM win_counts").collect().head.getLong(0)
      val batch = spark.read.parquet(eventsDir + "/events.parquet").count()
      assert(streamed == batch)
      // per-window figures match the equivalent batch plan
      import org.apache.spark.sql.functions._
      val batchWin = spark.read.parquet(eventsDir + "/events.parquet")
        .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n")).count()
      val streamWin = spark.sql("SELECT count(*) FROM win_counts").collect().head.getLong(0)
      assert(streamWin == batchWin)
    } finally q.stop()
  }

  test("stateful per-user aggregation accumulates counts and values") {
    val schema = spark.read.parquet(eventsDir + "/events.parquet").schema
    val q = EventStream.runOnce(
      EventStream.statefulUserCounts(spark, eventsDir, schema), "user_state",
      org.apache.spark.sql.streaming.OutputMode.Update)
    try {
      val total = spark.sql("SELECT sum(n_events) FROM user_state").collect().head.getLong(0)
      assert(total == spark.read.parquet(eventsDir + "/events.parquet").count())
    } finally q.stop()
  }
}
