package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, InterpretedOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Sort-on-serialize struct collector: `array_sort(collect_list(s))` as ONE
  * aggregate whose map-side partial buffers are ALREADY sorted when they
  * cross the shuffle, and whose final step BALANCED-merges the queued
  * pre-sorted runs in O(n log R).
  *
  * Motivation (optimization guide §2.3/§2.4 — shuffle fewer bytes, remove
  * exchanges): the round-2..5 skew-aware assemble was TWO aggregations —
  * `groupBy(doc_id, salt)` pre-sort then `groupBy(doc_id)` k-way merge —
  * which moves every span payload through TWO exchanges. This aggregate
  * keeps both halves of that design (parallel map-side sorting, merge-only
  * reduce side) inside one aggregation, so the payload crosses ONE
  * exchange: partial buffers sort in [[serialize]] (map side, parallel
  * across however many tasks hold the document's spans), and [[merge]]
  * (reduce side) only ever merges pre-sorted runs. A pathologically long
  * document still converges on a single reducer — exactly as the two-phase
  * version's final merge did — but its sort work stays spread across the
  * map tasks and its bytes now cross the wire once, not twice.
  *
  * Ordering is the full-struct interpreted ordering — field by field,
  * the identical total order `array_sort` applies to struct elements — so
  * the result is bit-for-bit the `array_sort(collect_list(...))` array even
  * when offsets collide.
  */
case class SortedStructCollect(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SortedRunsBuf] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StructType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sorted_struct_collect needs a struct input, got ${other.sql}")
  }

  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(child.dataType, containsNull = false)

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  // per-task-instance helpers (expressions are instantiated per task)
  @transient private lazy val toUnsafe: UnsafeProjection =
    UnsafeProjection.create(structType)
  @transient private lazy val ordering: Ordering[InternalRow] =
    InterpretedOrdering.forSchema(structType.fields.toIndexedSeq.map(_.dataType))
      .asInstanceOf[Ordering[InternalRow]]

  override def createAggregationBuffer(): SortedRunsBuf = new SortedRunsBuf

  override def update(buf: SortedRunsBuf, input: InternalRow): SortedRunsBuf = {
    val v = child.eval(input)
    if (v != null) {
      // UnsafeProjection re-targets a shared buffer per call — copy() makes
      // the row self-contained (and cheap to serialize: raw bytes)
      buf.append(toUnsafe(v.asInstanceOf[InternalRow]).copy())
    }
    buf
  }

  // O(1): incoming runs queue up; the balanced collapse happens once, in
  // eval/serialize — NOT pairwise per merge() call, which would cost
  // O(n·R) on a document scattered over R map partials
  override def merge(buf: SortedRunsBuf, other: SortedRunsBuf): SortedRunsBuf = {
    buf.absorb(other, ordering)
    buf
  }

  override def eval(buf: SortedRunsBuf): Any =
    new GenericArrayData(buf.collapsed(ordering).toArray[Any])

  override def serialize(buf: SortedRunsBuf): Array[Byte] = {
    val run = buf.collapsed(ordering) // map-side sort: partials ship pre-sorted
    val bos = new java.io.ByteArrayOutputStream(16 + run.length * 64)
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(run.length)
    run.foreach { r =>
      val bytes = r.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SortedRunsBuf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new SortedRunsBuf
    val run = new Array[UnsafeRow](n)
    var i = 0
    val fields = structType.length
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val row = new UnsafeRow(fields)
      row.pointTo(b, len)
      run(i) = row
      i += 1
    }
    buf.addRun(run) // serialize() sorted it before writing
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SortedStructCollect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SortedStructCollect =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SortedStructCollect =
    copy(child = newChildren.head)
  override def prettyName: String = "sorted_struct_collect"
}

/** Run accumulator: `update` appends to an unsorted tail, `merge` queues
  * whole pre-sorted runs in O(1), and `collapsed` folds everything into
  * ONE sorted run by BALANCED pairwise merging — O(n log R) over R queued
  * runs, never the O(n·R) a sequential fold would cost on a document
  * scattered across many map partials.
  */
final class SortedRunsBuf {
  private val runs = scala.collection.mutable.ArrayDeque.empty[Array[UnsafeRow]]
  private val cur = scala.collection.mutable.ArrayBuffer.empty[UnsafeRow]

  def append(r: UnsafeRow): Unit = cur += r

  def addRun(run: Array[UnsafeRow]): Unit = if (run.nonEmpty) runs += run

  /** Steal the other buffer's runs (plus its unsorted tail, sorted). */
  def absorb(other: SortedRunsBuf, ord: Ordering[InternalRow]): Unit = {
    other.flushCur(ord)
    runs ++= other.runs
    other.runs.clear()
  }

  private def flushCur(ord: Ordering[InternalRow]): Unit =
    if (cur.nonEmpty) {
      val arr = cur.toArray
      java.util.Arrays.sort(arr, ord.asInstanceOf[Ordering[UnsafeRow]])
      runs += arr
      cur.clear()
    }

  private def mergeTwo(a: Array[UnsafeRow], b: Array[UnsafeRow],
      ord: Ordering[InternalRow]): Array[UnsafeRow] = {
    val out = new Array[UnsafeRow](a.length + b.length)
    var i = 0; var j = 0; var k = 0
    while (i < a.length && j < b.length) {
      if (ord.compare(a(i), b(j)) <= 0) { out(k) = a(i); i += 1 }
      else { out(k) = b(j); j += 1 }
      k += 1
    }
    while (i < a.length) { out(k) = a(i); i += 1; k += 1 }
    while (j < b.length) { out(k) = b(j); j += 1; k += 1 }
    out
  }

  /** The single fully-sorted run; idempotent (the result is re-queued). */
  def collapsed(ord: Ordering[InternalRow]): Array[UnsafeRow] = {
    flushCur(ord)
    if (runs.isEmpty) return Array.empty
    // balanced fold: always merge the two FRONT runs and re-queue the
    // result at the BACK — every row participates in ~log R merges
    while (runs.length > 1) {
      val a = runs.removeHead()
      val b = runs.removeHead()
      runs += mergeTwo(a, b, ord)
    }
    runs.head
  }
}

object SortedStructCollect {
  /** Aggregate Column: the group's structs collected and sorted under the
    * full-struct order — `array_sort(collect_list(s))` with one exchange.
    */
  def sortedCollect(s: Column): Column =
    GraftBridge.column(SortedStructCollect(GraftBridge.expression(s))
      .toAggregateExpression())
}
