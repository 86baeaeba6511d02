package graft

import graft.io.SyntheticDocs
import graft.model._
import graft.ops.{Dedup, DocOps, Multimodal, Similarity, TextAnalysis}
import graft.pipeline.{Pipeline, SpanOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator family from SURVEY §2 surfaces here as a named query;
  * SQL-expressible ones carry a DuckDB oracle in [[oracleSql]] (column names
  * aligned on both sides — the driver sorts columns by name before hashing).
  * Span-pipeline queries run on the deterministic synthetic interleaved-doc
  * corpus (seeded, parallel-safe) and are verified span-for-span by the
  * ScalaTest suites instead (BASELINE.json: `sbt -batch test`).
  */
object SparkEntry {

  private def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Synthetic interleaved corpus sized off the documents table (~4×). */
  private def rawDocs(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val n = tbl(spark, dir, "documents").count() * 4
    spark.range(n).map(i => SyntheticDocs.generate(seed = 42L, i).raw)
  }

  /** Flagship: full extract → assemble → summarize pipeline on sf=0.001. */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val raw = spark.range(2000).map(i => SyntheticDocs.generate(42L, i).raw)
    val docs = Pipeline.toDocs(Pipeline.extract(raw, repartitionTo = 32)).toDF()
    docs.select(col("doc_id"), col("page_count"), size(col("spans")).as("n_spans"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ------------------------------------------------ relational shells
    "q1_agg" -> ((s, dir) => {
      tbl(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity").cast("decimal(18,2)")), 2).cast("double").as("sum_qty"),
          round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,6)")), 2).cast("double").as("revenue"),
          count(lit(1)).as("n_rows"))
    }),
    "q_join_topn" -> ((s, dir) => {
      val o = tbl(s, dir, "orders")
      val c = tbl(s, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_custkey"), col("c_mktsegment"))
        .agg(round(sum(col("o_totalprice").cast("decimal(18,2)")), 2).cast("double").as("total_spend"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("total_spend").desc, col("c_custkey"))
        .limit(20)
    }),
    "q_antijoin" -> ((s, dir) => {
      // customers with no large order — the resume-anti-join shape
      val c = tbl(s, dir, "customer")
      val o = tbl(s, dir, "orders").filter(col("o_totalprice") > 150000)
        .select(col("o_custkey").as("c_custkey"))
      c.join(o, Seq("c_custkey"), "left_anti").select(col("c_custkey"), col("c_acctbal"))
    }),
    "q_topk_sort" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(25)),
    "q_events_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      tbl(s, dir, "events")
        .withColumn("running_value",
          round(sum(col("value").cast("decimal(18,2)")).over(w), 2).cast("double"))
        .withColumn("event_rank", row_number().over(w))
        .select(col("user_id"), col("event_id"), col("event_rank"), col("running_value"))
    }),
    "q_events_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      tbl(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1).otherwise(0))
        .withColumn("session_id", sum(col("new_session")).over(w))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value").cast("decimal(18,2)")), 2).cast("double").as("session_value"))
    }),
    // ------------------------------------------------ text analysis
    "q_token_count" -> ((s, dir) =>
      tbl(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n_tokens"))),
    "q_quality" -> ((s, dir) =>
      TextAnalysis.withQualityFeatures(tbl(s, dir, "documents"))
        .select("doc_id", "n_tokens", "alpha_ratio", "punct_ratio", "mean_word_len")),
    "q_langid" -> ((s, dir) =>
      TextAnalysis.withLanguageId(tbl(s, dir, "documents"))
        .select("doc_id", "hits_en", "hits_de", "hits_fr", "hits_es", "lang_pred")),
    "q_fingerprint" -> ((s, dir) =>
      tbl(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))),
    "q_subword_count" -> ((s, dir) =>
      tbl(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.subwordCount(col("text")).as("n_subwords"))),
    "q_quality_score" -> ((s, dir) =>
      tbl(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("quality"))),
    // ------------------------------------------------ dedup family
    "q_dedup_exact" -> ((s, dir) =>
      tbl(s, dir, "documents")
        .groupBy(TextAnalysis.contentHash(col("text")).as("content_hash"))
        .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_docs"))),
    "q_dedup_survivors" -> ((s, dir) =>
      Dedup.exactSurvivors(tbl(s, dir, "documents"))
        .select(col("doc_id"), col("n_chars"))),
    // pair ops run on a fixed 500-doc calibration slice so cost is constant
    // across SFs (the operators themselves are shuffle-bounded for scale);
    // the small parquet arrives as ONE split, so spread it before the
    // per-row sketch work
    "q_jaccard_pairs" -> ((s, dir) =>
      Dedup.jaccardPairs(
        tbl(s, dir, "documents").filter(col("doc_id") < 500)
          .repartition(s.sparkContext.defaultParallelism),
        threshold = 0.18, shingleN = 3, maxDocFreq = 50)),
    "q_minhash_pairs" -> ((s, dir) =>
      Dedup.minhashPairs(
        tbl(s, dir, "documents").filter(col("doc_id") < 500)
          .repartition(s.sparkContext.defaultParallelism),
        threshold = 0.15, k = 32, bands = 8)),
    "q_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(
        tbl(s, dir, "documents").filter(col("doc_id") < 500)
          .repartition(s.sparkContext.defaultParallelism), maxHamming = 8)),
    "q_embed_neardups" -> ((s, dir) =>
      Dedup.embeddingNearDups(tbl(s, dir, "embeddings"), threshold = 0.2, planes = 6)),
    // ------------------------------------------------ similarity search
    "q_ann_topk" -> ((s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 20), k = 5)
    }),
    "q_ann_ivf" -> ((s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 20), k = 5, nCells = 8, nProbe = 3)
    }),
    // ------------------------------------------------ span pipeline (synthetic corpus)
    "pipeline_extract" -> ((s, dir) => {
      Pipeline.toDocs(Pipeline.extract(rawDocs(s, dir), repartitionTo = 32)).toDF()
        .select(col("doc_id"), col("mime_type"), col("page_count"),
          size(col("spans")).as("n_spans"))
    }),
    "pipeline_assemble" -> ((s, dir) => {
      val docs = Pipeline.toDocs(Pipeline.extract(rawDocs(s, dir))).toDF()
      SpanOps.assembleSkewAware(SpanOps.explodeSpans(docs))
        .select(col("doc_id"), size(col("spans")).as("n_spans"))
    }),
    "pipeline_renumber" -> ((s, dir) => {
      val docs = Pipeline.toDocs(Pipeline.extract(rawDocs(s, dir))).toDF()
      SpanOps.renumberPageBreaks(SpanOps.explodeSpans(docs))
        .filter(col("kind") === "page_break")
        .groupBy(col("doc_id")).agg(max(col("page_no")).as("n_pages"))
    }),
    "pipeline_page_filter" -> ((s, dir) => {
      val docs = Pipeline.toDocs(Pipeline.extract(rawDocs(s, dir))).toDF()
      SpanOps.filterPages(SpanOps.explodeSpans(docs), Set(1, 2))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_spans_p12"))
    }),
    "pipeline_chunks" -> ((s, dir) => {
      val docs = Pipeline.toDocs(Pipeline.extract(rawDocs(s, dir)))
      Pipeline.chunk(docs).toDF()
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"), sum(size(col("media_refs"))).as("n_media"))
    }),
    "pipeline_chunk_boundaries" -> ((s, dir) => {
      // chunk → re-inject chunk_boundary comment spans → re-parse: the
      // chunk_with_boundaries path (chunkers/base.py:79-223)
      import s.implicits._
      val docs = Pipeline.toDocs(Pipeline.extract(rawDocs(s, dir)))
      docs.map { d =>
        val content = graft.md.Markdown.render(d.spans).stripSuffix("\n")
        val chunks = graft.chunk.Chunkers.tokenAwareChunks(d, maxTokensPerChunk = 120)
        val withB = graft.chunk.Chunkers.addChunkBoundaries(content, chunks)
        val reparsed = graft.md.Markdown.parse(withB)
        (d.doc_id, chunks.length,
          reparsed.count(_.kind == graft.model.SpanKind.ChunkBoundary))
      }.toDF("doc_id", "n_chunks", "n_boundaries")
    }),
    "pipeline_lineage" -> ((s, dir) => {
      val out = Pipeline.extract(rawDocs(s, dir), repartitionTo = 16)
      Pipeline.lineage(out, snapshotId = 0L)
        .agg(sum(col("doc_count")).as("docs"), sum(col("span_count")).as("spans"),
          sum(size(col("failures"))).as("failures"))
    }),
    // ------------------------------------------------ doc-level operators
    "q_numbered_lines" -> ((s, dir) =>
      DocOps.numberedLines(tbl(s, dir, "documents").filter(col("doc_id") < 20))
        .select("doc_id", "line_idx", "numbered")),
    "q_cost" -> ((s, dir) =>
      DocOps.withCost(
        tbl(s, dir, "documents")
          .withColumn("provider",
            element_at(typedlit(Seq("azure", "upstage", "llamaparse", "datalab")),
              (pmod(col("doc_id"), lit(4)) + 1).cast("int")))
          .withColumn("page_count", (floor(col("n_chars") / 500) + 1).cast("int")),
        col("provider"), col("page_count"))
        .select("doc_id", "provider", "page_count", "cost_usd")),
    "q_mime_guess" -> ((s, dir) =>
      tbl(s, dir, "documents")
        .withColumn("path", concat(lit("docs/f"), col("doc_id"),
          element_at(typedlit(Seq(".pdf", ".html", ".png", ".weird")),
            (pmod(col("doc_id"), lit(4)) + 1).cast("int"))))
        .select(col("doc_id"), DocOps.guessMime(col("path")).as("mime"))),
    "q_export" -> ((s, dir) => {
      import s.implicits._
      val docs = Pipeline.toDocs(Pipeline.extract(rawDocs(s, dir)))
      DocOps.exportRows(docs).select(col("doc_id"), col("filename"),
        length(col("content")).as("content_len"))
    }),
    "q_files_list" -> ((s, dir) => {
      val docs = Pipeline.toDocs(Pipeline.extract(rawDocs(s, dir)))
      DocOps.filesList(docs).select(col("doc_id"), size(col("files")).as("n_files"))
    }),
    "q_verify_join" -> ((s, dir) => {
      // self-verification: pipeline output vs the generator's expected spans
      import s.implicits._
      val n = tbl(s, dir, "documents").count() * 4
      val expected = s.range(n)
        .map { i => val g = SyntheticDocs.generate(42L, i); Doc(g.raw.doc_id, g.expected) }
        .toDF()
      val ours = Pipeline.toDocsDF(Pipeline.extract(rawDocs(s, dir)))
      DocOps.verifyJoin(ours, expected)
        .groupBy(col("matches")).agg(count(lit(1)).as("n_docs"))
    }),
    // ------------------------------------------------ multimodal plumbing
    "q_media_features" -> ((s, dir) =>
      Multimodal.extractFeatures(
        Multimodal.docDerivedMediaTable(tbl(s, dir, "documents"))).toDF()
        .select("doc_id", "media_ref", "mime_type", "byte_len", "width", "height",
          "channels", "mean_luma", "phash")),
    "q_frame_sample" -> ((s, dir) =>
      Multimodal.sampleFrames(
        Multimodal.docDerivedMediaTable(tbl(s, dir, "documents")))),
    "q_media_table" -> ((s, dir) => {
      // the REAL extraction sidecar: (doc_id, media_ref, mime_type, content)
      // projected from the docs table's media column; summarized per mime.
      // No SQL oracle (input is the synthetic corpus) — payloads are golden-
      // verified in MediaSidecarSpec instead.
      val docs = Pipeline.toDocsDF(Pipeline.extract(rawDocs(s, dir)))
      Pipeline.toMediaDF(docs)
        .groupBy(col("mime_type"))
        .agg(count(lit(1)).as("n_media"),
          sum(when(length(col("content")) > 0, 1).otherwise(0)).as("n_with_payload"),
          sum(length(col("content"))).as("total_bytes"))
    }))

  /** DuckDB-runnable oracles, column-aligned with the Spark results. Queries
    * without an entry (xxhash64-based sketches, the synthetic span pipeline)
    * get the driver's rows-only check and are span-verified in ScalaTest.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
        |  CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "q_join_topn" ->
      """SELECT c_custkey, c_mktsegment,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_spend,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1, 2 ORDER BY total_spend DESC, c_custkey LIMIT 20""".stripMargin,
    "q_antijoin" ->
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 150000)""".stripMargin,
    "q_topk_sort" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 25""".stripMargin,
    "q_events_window" ->
      """SELECT user_id, event_id,
        |  CAST(row_number() OVER w AS INT) AS event_rank,
        |  CAST(round(sum(CAST(value AS DECIMAL(18,2))) OVER w, 2) AS DOUBLE) AS running_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_events_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_session,
        |    ts, event_id
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT user_id, value,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM g
        |)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS session_value
        |FROM s GROUP BY 1, 2""".stripMargin,
    "q_token_count" ->
      """SELECT doc_id,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS INT) END AS n_tokens
        |FROM documents""".stripMargin,
    "q_quality" ->
      """SELECT doc_id,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS INT) END AS n_tokens,
        |  round(length(regexp_replace(text, '[^\p{L}]', '', 'g')) / greatest(CAST(length(text) AS DOUBLE), 1.0), 4) AS alpha_ratio,
        |  round(length(regexp_replace(text, '[^.,;:!?''"()\-]', '', 'g')) / greatest(CAST(length(text) AS DOUBLE), 1.0), 4) AS punct_ratio,
        |  round(length(regexp_replace(text, '\s+', '', 'g')) /
        |    greatest(CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE len(string_split_regex(trim(text), '\s+')) END AS DOUBLE), 1.0), 4) AS mean_word_len
        |FROM documents""".stripMargin,
    "q_langid" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '(?i)\b(the|and|of|to|in|is|that|it|was|for)\b')) AS INT) AS hits_en,
        |    CAST(len(regexp_extract_all(text, '(?i)\b(der|die|und|das|ist|nicht|ein|mit|auf|sich)\b')) AS INT) AS hits_de,
        |    CAST(len(regexp_extract_all(text, '(?i)\b(le|la|les|des|est|dans|que|une|pour|qui)\b')) AS INT) AS hits_fr,
        |    CAST(len(regexp_extract_all(text, '(?i)\b(el|la|los|las|es|que|una|para|con|por)\b')) AS INT) AS hits_es
        |  FROM documents)
        |SELECT doc_id, hits_en, hits_de, hits_fr, hits_es,
        |  CASE WHEN greatest(hits_de, hits_en, hits_es, hits_fr) = 0 THEN 'und'
        |       WHEN hits_de = greatest(hits_de, hits_en, hits_es, hits_fr) THEN 'de'
        |       WHEN hits_en = greatest(hits_de, hits_en, hits_es, hits_fr) THEN 'en'
        |       WHEN hits_es = greatest(hits_de, hits_en, hits_es, hits_fr) THEN 'es'
        |       ELSE 'fr' END AS lang_pred
        |FROM h""".stripMargin,
    "q_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      [CAST(ascii(s[i]) AS BIGINT) FOR i IN generate_series(1, length(s))]),
        |    (h, c) -> (h * 31 + c) % 2147483647) AS fp
        |FROM (SELECT doc_id,
        |        substring(regexp_replace(lower(text), '\s+', ' ', 'g'), 1, 256) AS s
        |      FROM documents)""".stripMargin,
    "q_dedup_exact" ->
      """SELECT sha256(text) AS content_hash, min(doc_id) AS canonical_id,
        |  count(*) AS n_docs
        |FROM documents GROUP BY 1""".stripMargin,
    "q_dedup_survivors" ->
      """SELECT doc_id, n_chars FROM documents
        |QUALIFY row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) = 1""".stripMargin,
    "q_subword_count" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\p{L}{1,4}|\p{N}+|[^\p{L}\p{N}\s]')) AS INT) AS n_subwords
        |FROM documents""".stripMargin,
    "q_quality_score" ->
      """SELECT doc_id,
        |  greatest(least(
        |    (length(regexp_replace(text, '[^\p{L}]', '', 'g')) / greatest(CAST(length(text) AS DOUBLE), 1.0)) * 0.7
        |    + least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.3, 1.0), 0.0) AS quality
        |FROM documents""".stripMargin,
    "q_jaccard_pairs" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(ws[i:i+2], ' ') FOR i IN range(1, len(ws)-1)]) AS shs
        |  FROM (SELECT doc_id,
        |          string_split_regex(trim(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g')), '\s+') AS ws
        |        FROM documents WHERE doc_id < 500)
        |), inv0 AS (
        |  SELECT doc_id, unnest(shs) AS shingle FROM sh WHERE len(shs) > 0
        |), inv1 AS (
        |  SELECT doc_id, shingle FROM inv0
        |  WHERE shingle NOT IN (SELECT shingle FROM inv0 GROUP BY 1 HAVING count(*) > 50)
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n_sh FROM inv1 GROUP BY 1
        |), inv AS (
        |  SELECT inv1.doc_id, sizes.n_sh, inv1.shingle FROM inv1 JOIN sizes USING (doc_id)
        |)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(count(*) / (CAST(a.n_sh + b.n_sh - count(*) AS DOUBLE)), 6) AS jaccard
        |FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |GROUP BY 1, 2, a.n_sh, b.n_sh
        |HAVING round(count(*) / (CAST(a.n_sh + b.n_sh - count(*) AS DOUBLE)), 6) >= 0.18""".stripMargin,
    "q_numbered_lines" ->
      """SELECT doc_id,
        |  CAST(unnest(generate_series(1, len(string_split_regex(text, '\n')))) - 1 AS INT) AS line_idx,
        |  printf('%5d | %s',
        |    unnest(generate_series(1, len(string_split_regex(text, '\n')))),
        |    unnest(string_split_regex(text, '\n'))) AS numbered
        |FROM documents WHERE doc_id < 20""".stripMargin,
    "q_cost" ->
      """SELECT doc_id,
        |  ['azure','upstage','llamaparse','datalab'][CAST(doc_id % 4 + 1 AS INT)] AS provider,
        |  CAST(floor(n_chars / 500) + 1 AS INT) AS page_count,
        |  round(CASE ['azure','upstage','llamaparse','datalab'][CAST(doc_id % 4 + 1 AS INT)]
        |          WHEN 'azure' THEN 0.00958 WHEN 'upstage' THEN 0.01
        |          WHEN 'llamaparse' THEN 0.0045 WHEN 'datalab' THEN 0.0015 END
        |        * CAST(floor(n_chars / 500) + 1 AS INT), 6) AS cost_usd
        |FROM documents""".stripMargin,
    "q_mime_guess" ->
      """SELECT doc_id,
        |  CASE doc_id % 4 WHEN 0 THEN 'application/pdf' WHEN 1 THEN 'text/html'
        |       WHEN 2 THEN 'image/png' ELSE 'application/octet-stream' END AS mime
        |FROM documents""".stripMargin,
    "q_ann_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 20),
        |     c AS (SELECT vec_id AS corpus_id, CAST(embedding AS DOUBLE[]) AS cv
        |           FROM embeddings),
        |     scored AS (
        |       SELECT query_id, corpus_id,
        |         round(list_cosine_similarity(qv, cv), 6) AS cosine
        |       FROM q JOIN c ON corpus_id <> query_id)
        |SELECT query_id, CAST(rank AS INT) AS rank, corpus_id, cosine FROM (
        |  SELECT query_id, corpus_id, cosine,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS rank
        |  FROM scored) WHERE rank <= 5""".stripMargin)
}
