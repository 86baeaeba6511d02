package graft

import graft.functions.SortedStructCollect
import graft.pipeline.{Pipeline, SpanOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Focused checks for the round-6 single-exchange assemble: the
  * sort-on-serialize aggregate must reproduce `array_sort(collect_list(s))`
  * bit-for-bit (including duplicate sort keys and non-ASCII strings), and
  * the skew-aware assemble plan must carry exactly ONE exchange.
  */
class SortedCollectSpec extends AnyFunSuite {

  lazy val spark = Pipeline.session("local[4]", 4, "graft-test")

  test("sorted_struct_collect == array_sort(collect_list) on adversarial rows") {
    import spark.implicits._
    // duplicate offsets (ties fall through to kind/text), non-ASCII text,
    // empty strings, many groups (> the 128-group ObjectHashAggregate
    // fallback threshold), uneven group sizes
    val rows = (0 until 3000).map { i =>
      val g = i % 200
      val off = (i / 7) % 25 // heavy duplication of the leading key
      (s"doc-$g", "k" + (i % 3), if (i % 11 == 0) "" else s"tëxt-${i % 13}-é",
        s"m${i % 5}", off)
    }
    val flat = rows.toDF("doc_id", "kind", "text", "media_ref", "offset")
      .repartition(7) // spans of one group spread over several partials
    val s = struct(col("offset"), col("kind"), col("text"), col("media_ref"))
    val expected = flat.groupBy(col("doc_id"))
      .agg(array_sort(collect_list(s)).as("sorted"))
    val got = flat.groupBy(col("doc_id"))
      .agg(SortedStructCollect.sortedCollect(s).as("sorted"))
    val e = expected.orderBy("doc_id").collect()
    val g = got.orderBy("doc_id").collect()
    assert(e.length == g.length)
    e.zip(g).foreach { case (a, b) => assert(a == b, s"group ${a.get(0)}") }
  }

  test("empty group input yields empty array, null structs are skipped") {
    import spark.implicits._
    val flat = Seq(("a", Some(1)), ("a", None), ("b", None))
      .toDF("doc_id", "v")
      .select(col("doc_id"),
        when(col("v").isNotNull, struct(col("v").as("offset"))).as("s"))
    val got = flat.groupBy("doc_id")
      .agg(SortedStructCollect.sortedCollect(col("s")).as("arr"))
      .orderBy("doc_id")
      .select(size(col("arr")))
      .as[Int].collect()
    assert(got.toSeq == Seq(1, 0))
  }

  test("assembleSkewAware matches assemble and shuffles the payload once") {
    import spark.implicits._
    val docs = Pipeline.toDocsDF(Pipeline.extract(
      spark.createDataset((0L until 60L).map(i => graft.io.SyntheticDocs.generate(42, i).raw))))
    val flat = SpanOps.explodeSpans(docs)
    val a = SpanOps.assemble(flat).orderBy("doc_id").collect()
    val b = SpanOps.assembleSkewAware(flat).orderBy("doc_id").collect()
    assert(a.length == b.length && a.length > 0)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
    // ONE exchange between the span source and the assembled output
    val p = SpanOps.assembleSkewAware(flat).queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).size == 1, p)
  }
}
