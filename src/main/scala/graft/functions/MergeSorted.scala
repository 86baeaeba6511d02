package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StructType}

/** K-way merge of pre-sorted struct arrays by their leading `offset:int`
  * field.
  *
  * RETAINED DELIBERATELY (round 6): the production assemble moved to the
  * single-exchange [[SortedStructCollect]] aggregate, so this expression
  * no longer sits on the main span path — it stays as the tested
  * (FunctionsSpec) second implementation of the two-phase assemble shape,
  * available to callers that already hold pre-sorted sub-lists.
  *
  * Original role — the phase-2 of the two-phase skew-aware assemble: phase 1
  * pre-sorts each `(doc_id, salt)` sub-list in parallel; this expression
  * merges the ≤`salt` sub-lists in O(total · k) without re-sorting them
  * (the round-2 finding: `array_sort(flatten(...))` threw the phase-1 work
  * away and re-sorted the whole document in one task).
  *
  * Evaluated ONCE PER DOCUMENT in the final-aggregation projection — not per
  * span — so `CodegenFallback` costs one virtual call per doc, while the
  * per-span comparison loop below is branch-light JVM code. `k` is the salt
  * fan-out (16 by default): a linear arg-min scan beats a heap at that size.
  *
  * Input: `array<array<struct<offset:int, ...>>>` (each inner array sorted
  * by `offset` ascending). Output: `array<struct<...>>` merged ascending.
  * Ties (equal offsets across sub-lists) break by the FULL struct under
  * Catalyst's interpreted row ordering — the same total order `array_sort`
  * applies to struct elements — so the skew-aware assemble and the
  * single-phase `array_sort(collect_list(...))` assemble produce identical
  * span streams even when a document carries duplicate offsets.
  */
case class MergeSortedArrays(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ArrayType(st: StructType, _), _)
        if st.fields.nonEmpty && st.fields.head.dataType == IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"merge_sorted_arrays needs array<array<struct<offset:int, ...>>>, got ${other.sql}")
  }

  override def dataType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  private lazy val numFields: Int = child.dataType match {
    case ArrayType(ArrayType(st: StructType, _), _) => st.fields.length
    case _ => 0
  }

  /** array_sort's struct order (field-by-field, nulls first) for offset
    * ties; the common path stays on the primitive getInt(0) comparison.
    */
  private lazy val structOrdering
      : org.apache.spark.sql.catalyst.expressions.InterpretedOrdering = {
    val st = child.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    org.apache.spark.sql.catalyst.expressions.InterpretedOrdering
      .forSchema(st.fields.toIndexedSeq.map(_.dataType))
  }

  override def nullSafeEval(input: Any): Any = {
    val outer = input.asInstanceOf[ArrayData]
    val k = outer.numElements()
    val lists = new Array[ArrayData](k)
    val pos = new Array[Int](k)
    var total = 0
    var i = 0
    while (i < k) {
      // collect_list never emits null elements; guard anyway
      lists(i) = if (outer.isNullAt(i)) null else outer.getArray(i)
      if (lists(i) != null) total += lists(i).numElements()
      i += 1
    }
    val out = new Array[Any](total)
    var n = 0
    while (n < total) {
      var best = -1
      var bestOffset = 0
      var j = 0
      while (j < k) {
        val l = lists(j)
        if (l != null && pos(j) < l.numElements()) {
          val off = l.getStruct(pos(j), numFields).getInt(0)
          // best < 0 guard (not an Int.MaxValue sentinel): an element whose
          // offset IS Int.MaxValue must still be selectable
          if (best < 0 || off < bestOffset) { bestOffset = off; best = j }
          else if (off == bestOffset &&
              structOrdering.compare(
                l.getStruct(pos(j), numFields),
                lists(best).getStruct(pos(best), numFields)) < 0) {
            best = j // full-struct tie-break = array_sort parity
          }
        }
        j += 1
      }
      out(n) = lists(best).getStruct(pos(best), numFields)
      pos(best) += 1
      n += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MergeSortedArrays =
    copy(child = newChild)

  override def prettyName: String = "merge_sorted_arrays"
}

object MergeSorted {
  /** Column API: merge pre-sorted `array<struct<offset:int,...>>` sub-lists. */
  def mergeSortedArrays(c: Column): Column =
    GraftBridge.column(MergeSortedArrays(GraftBridge.expression(c)))
}
