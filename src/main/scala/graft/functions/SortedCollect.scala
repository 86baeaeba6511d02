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
  * cross the shuffle, and whose final merge is a linear sorted-merge.
  *
  * Motivation (optimization guide §2.3/§2.4 — shuffle fewer bytes, remove
  * exchanges): the round-2..5 skew-aware assemble was TWO aggregations —
  * `groupBy(doc_id, salt)` pre-sort then `groupBy(doc_id)` k-way merge —
  * which moves every span payload through TWO exchanges. This aggregate
  * keeps both halves of that design (parallel map-side sorting, linear
  * reduce-side merging) inside one aggregation, so the payload crosses ONE
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

  override def merge(buf: SortedRunsBuf, other: SortedRunsBuf): SortedRunsBuf = {
    buf.mergeSorted(other, ordering)
    buf
  }

  override def eval(buf: SortedRunsBuf): Any = {
    buf.ensureSorted(ordering)
    new GenericArrayData(buf.rows.toArray[Any])
  }

  override def serialize(buf: SortedRunsBuf): Array[Byte] = {
    buf.ensureSorted(ordering) // map-side sort: partial runs ship pre-sorted
    val bos = new java.io.ByteArrayOutputStream(16 + buf.rows.length * 64)
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.rows.length)
    buf.rows.foreach { r =>
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
    buf.rows.sizeHint(n)
    var i = 0
    val fields = structType.length
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val row = new UnsafeRow(fields)
      row.pointTo(b, len)
      buf.rows += row
      i += 1
    }
    buf.sorted = true // serialize() sorted it before writing
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

/** Growable row buffer that tracks sortedness: `update` appends (unsorted),
  * `serialize`/`eval` sort once, `merge` linear-merges two sorted runs.
  */
final class SortedRunsBuf {
  val rows = scala.collection.mutable.ArrayBuffer.empty[UnsafeRow]
  var sorted = false

  def append(r: UnsafeRow): Unit = { rows += r; sorted = false }

  def ensureSorted(ord: Ordering[InternalRow]): Unit = {
    if (!sorted) {
      val arr = rows.toArray
      java.util.Arrays.sort(arr, ord.asInstanceOf[Ordering[UnsafeRow]])
      rows.clear()
      rows ++= arr
      sorted = true
    }
  }

  /** Merge `other` into this buffer; both are sorted afterwards. O(n + m). */
  def mergeSorted(other: SortedRunsBuf, ord: Ordering[InternalRow]): Unit = {
    if (other.rows.isEmpty) { sorted ||= rows.isEmpty; if (!sorted) ensureSorted(ord); return }
    ensureSorted(ord)
    other.ensureSorted(ord)
    if (rows.isEmpty) { rows ++= other.rows; sorted = true; return }
    val a = rows.toArray
    val b = other.rows.toArray
    rows.clear()
    rows.sizeHint(a.length + b.length)
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      if (ord.compare(a(i), b(j)) <= 0) { rows += a(i); i += 1 }
      else { rows += b(j); j += 1 }
    }
    while (i < a.length) { rows += a(i); i += 1 }
    while (j < b.length) { rows += b(j); j += 1 }
    sorted = true
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
