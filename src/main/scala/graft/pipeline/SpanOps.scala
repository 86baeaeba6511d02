package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational span operators over the exploded representation
  * `(doc_id, kind, text, media_ref, offset)` — everything here is built-in
  * Catalyst expressions (higher-order functions, windows, two-phase
  * aggregation); no UDFs, so the whole stage stays inside whole-stage codegen.
  */
object SpanOps {

  /** nested `(doc_id, spans[])` → flat `(doc_id, kind, text, media_ref, offset)`. */
  def explodeSpans(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(col("spans")).as("s"))
      .select(col("doc_id"), col("s.kind").as("kind"), col("s.text").as("text"),
        col("s.media_ref").as("media_ref"), col("s.offset").as("offset"))

  /** flat spans → nested, ordered by offset: the span-assemble stage
    * (the ordered-concat aggregation every provider performs, e.g.
    * mistral_provider/provider.py:122-135). `array_sort(collect_list(struct))`
    * sorts by the struct's leading `offset` field, so ordering never depends
    * on partition iteration order.
    */
  def assemble(flat: DataFrame): DataFrame =
    flat.groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(
        col("offset"), col("kind"), col("text"), col("media_ref")))).as("sorted"))
      .select(col("doc_id"), transform(col("sorted"), s =>
        struct(s("kind").as("kind"), s("text").as("text"),
          s("media_ref").as("media_ref"), s("offset").as("offset"))).as("spans"))

  /** Skew-aware assemble for pathologically long documents: ONE aggregation
    * whose map-side partial buffers sort before they ship and whose final
    * step linear-merges pre-sorted runs
    * ([[graft.functions.SortedStructCollect]]).
    *
    * Round-6 optimization (guide §2.3/§2.4): rounds 2-5 ran this as TWO
    * aggregations — `groupBy(doc_id, salt)` pre-sort, then `groupBy(doc_id)`
    * k-way merge — so every span payload crossed TWO exchanges. The
    * sort-on-serialize aggregate keeps the same work placement (sorting
    * parallel on the map side wherever the spans already sit, an O(n)
    * merge per document on the reduce side) while the payload crosses ONE
    * exchange: half the shuffle bytes, one less barrier. Plan shape:
    * 2 Exchanges → 1 (plans/r06/pipeline_assemble_*.txt).
    */
  def assembleSkewAware(flat: DataFrame): DataFrame =
    flat
      .groupBy(col("doc_id"))
      .agg(graft.functions.SortedStructCollect.sortedCollect(struct(
        col("offset"), col("kind"), col("text"), col("media_ref"))).as("sorted"))
      .select(col("doc_id"), transform(col("sorted"), s =>
        struct(s("kind").as("kind"), s("text").as("text"),
          s("media_ref").as("media_ref"), s("offset").as("offset"))).as("spans"))

  /** Renumber page_break spans 1..N per document in offset order — the
    * relational form of the providers' stateful marker renumbering
    * (azure_provider/utils.py:45-56) as a window function.
    */
  def renumberPageBreaks(flat: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("offset"))
    flat
      .withColumn("page_no",
        sum(when(col("kind") === "page_break", 1).otherwise(0)).over(w))
      .withColumn("text",
        when(col("kind") === "page_break",
          concat(lit("{\"next_page\":"), col("page_no"), lit("}")))
          .otherwise(col("text")))
  }

  /** Page number of every span = running count of page_break markers at or
    * before it (page 1 when no marker precedes). Enables page-range pushdown
    * before the heavy stages (the reference's extract_pdf_pages pruning,
    * pdf_utils.py:138-184).
    */
  def withPageNumber(flat: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("offset"))
    flat.withColumn("page_no",
      greatest(sum(when(col("kind") === "page_break", 1).otherwise(0)).over(w), lit(1)))
  }

  /** Keep only spans on the given pages (plus nothing else): the page-range
    * filter as a plain predicate the optimizer can push.
    */
  def filterPages(flat: DataFrame, pages: Set[Int]): DataFrame =
    withPageNumber(flat)
      .filter(col("page_no").isInCollection(pages))
      .drop("page_no")

  /** Derived page_count per doc = count of page_break spans, min 1
    * (converters/base.py:215-223 analog).
    */
  def pageCounts(flat: DataFrame): DataFrame =
    flat.groupBy(col("doc_id"))
      .agg(greatest(
        sum(when(col("kind") === "page_break", 1).otherwise(0)), lit(1)).as("page_count"))
}
