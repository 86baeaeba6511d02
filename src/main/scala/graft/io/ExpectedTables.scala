package graft.io

import graft.chunk.Chunkers
import graft.md.Markdown
import graft.model.{Doc, SpanKind}
import org.apache.spark.sql.SparkSession

/** Generator-truth side tables for the DuckDB oracle session.
  *
  * The synthetic corpus ([[SyntheticDocs]]) declares, for every doc, BOTH the
  * raw provider-shaped payload and the expected canonical span stream — the
  * same golden-fixture role the reference's snapshot files play
  * (tests/__snapshots__/test_output.ambr). DuckDB cannot call the Scala
  * generator, so `graft.Verify` materializes that truth as parquet and the
  * span-pipeline oracles read it directly (the relational form of the
  * reference's snapshot compare, tests/test_output.py:38-49).
  *
  * Provenance of each table:
  *   - `expected_spans` / `expected_docs`: pure generator output — fully
  *     independent of the pipeline under test.
  *   - `expected_chunks` / `expected_boundaries`: the generator's expected
  *     spans run through the SAME chunker code the pipeline uses. Circular
  *     for the chunker itself (the chunkers are golden-tested in ScalaTest:
  *     ChunkerSpec, GoldenPipelineSpec) but independent of the extract stage
  *     — which is what these oracles gate: a regression anywhere in
  *     extract/normalize changes the spans feeding the chunker and flips the
  *     compare red.
  */
object ExpectedTables {

  /** Materialize all four tables under `dir` for the `nDocs`-doc corpus
    * (seed 42, matching SparkEntry.rawDocs and Bench).
    */
  def materialize(spark: SparkSession, nDocs: Long, dir: String): Unit = {
    import spark.implicits._

    spark.range(nDocs).flatMap { i =>
      val g = SyntheticDocs.generate(SyntheticDocs.CorpusSeed, i)
      g.expected.map(sp => (g.raw.doc_id, sp.kind, sp.text, sp.media_ref, sp.offset))
    }.toDF("doc_id", "kind", "text", "media_ref", "offset")
      .write.mode("overwrite").parquet(s"$dir/expected_spans")

    spark.range(nDocs).map { i =>
      val g = SyntheticDocs.generate(SyntheticDocs.CorpusSeed, i)
      (g.raw.doc_id, g.raw.payload_kind, g.raw.mime_type)
    }.toDF("doc_id", "payload_kind", "mime_type")
      .write.mode("overwrite").parquet(s"$dir/expected_docs")

    // Pipeline.chunk defaults (maxChunkSize = 1500, overlap = 50)
    spark.range(nDocs).map { i =>
      val g = SyntheticDocs.generate(SyntheticDocs.CorpusSeed, i)
      val chunks = Chunkers.markdownChunks(Doc(g.raw.doc_id, g.expected))
      (g.raw.doc_id, chunks.length.toLong,
        chunks.map(_.media_refs.size.toLong).sum)
    }.toDF("doc_id", "n_chunks", "n_media")
      .write.mode("overwrite").parquet(s"$dir/expected_chunks")

    // per-chunk TokenAwareChunker truth (q_chunk_tokens): line ranges,
    // token counts and content lengths from the generator's expected spans
    // — independent of the extract stage the query runs through
    spark.range(nDocs).flatMap { i =>
      val g = SyntheticDocs.generate(SyntheticDocs.CorpusSeed, i)
      val chunks = Chunkers.tokenAwareChunks(
        Doc(g.raw.doc_id, g.expected), maxTokensPerChunk = 120)
      chunks.map(c => (g.raw.doc_id, c.chunk_index, c.start_line, c.end_line,
        c.token_count, c.content.length))
    }.toDF("doc_id", "chunk_index", "start_line", "end_line", "token_count", "content_len")
      .write.mode("overwrite").parquet(s"$dir/expected_token_chunks")

    // mirrors the pipeline_chunk_boundaries query's chunk → inject → reparse
    spark.range(nDocs).map { i =>
      val g = SyntheticDocs.generate(SyntheticDocs.CorpusSeed, i)
      val d = Doc(g.raw.doc_id, g.expected)
      val content = Markdown.render(d.spans).stripSuffix("\n")
      val chunks = Chunkers.tokenAwareChunks(d, maxTokensPerChunk = 120)
      val withB = Chunkers.addChunkBoundaries(content, chunks)
      (g.raw.doc_id, chunks.length,
        Markdown.parse(withB).count(_.kind == SpanKind.ChunkBoundary))
    }.toDF("doc_id", "n_chunks", "n_boundaries")
      .write.mode("overwrite").parquet(s"$dir/expected_boundaries")
  }

  /** Per-application tmp dirs this engine creates; all swept by
    * [[sweepStale]]. Shutdown hooks alone would leak them under SIGKILL
    * (which the kill/rerun harness exercises by design).
    */
  private val TmpPrefixes = Seq(
    "graft_expected_", "graft_ingest_fixture_", "graft_events_stream_",
    "graft_stream_raw_")

  /** Sweep this engine's per-application tmp dirs older than 6h — leftovers
    * of finished or SIGKILLed runs; the age guard keeps a concurrent run's
    * dirs alive. Called from Verify and Bench startup.
    */
  def sweepStale(): Unit = {
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    val cutoff = System.currentTimeMillis() - 6L * 3600 * 1000
    Option(tmp.listFiles()).getOrElse(Array.empty)
      .filter(f => TmpPrefixes.exists(f.getName.startsWith) && f.lastModified() < cutoff)
      .foreach(TableIO.deleteRecursively)
  }
}
