package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k aggregate: keeps the k best `(score, id)` pairs, ordered by
  * (score desc, id asc). A `TypedImperativeAggregate` so the heap participates
  * in PARTIAL aggregation — each map task reduces its rows to ≤ k entries
  * before the shuffle, and the exchange carries k rows per (group, partition)
  * instead of every candidate row through a window sort. This replaces the
  * `row_number().over(Window.partitionBy(query))` top-k (round-1 scale
  * finding: the window exchange sorts the full candidate set).
  *
  * Ids may be `bigint` or `string` (the engine's two id shapes: vec_id and
  * doc_id). Output: `array<struct<score:double, id:<id type>>>` in rank order.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] {

  require(k > 0, "k must be positive")

  private def stringIds: Boolean = id.dataType == StringType

  override def children: Seq[Expression] = Seq(score, id)
  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType &&
        (id.dataType == LongType || id.dataType == StringType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_k_by_score needs (double, bigint|string), got (${score.dataType.sql}, ${id.dataType.sql})")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", id.dataType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val idv: AnyRef = i match {
        // UTF8String from eval may point into a reused row buffer — copy
        case u: UTF8String => u.clone()
        case other => other.asInstanceOf[AnyRef]
      }
      buf.insert(s.asInstanceOf[Double], idv)
    }
    buf
  }

  override def merge(buf: TopKBuf, other: TopKBuf): TopKBuf = { buf.absorb(other); buf }

  override def eval(buf: TopKBuf): Any = {
    val rows = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      rows(i) = new GenericInternalRow(Array[Any](buf.scores(i), buf.ids(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(4 + buf.n * 24)
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.n)
    var i = 0
    while (i < buf.n) {
      out.writeDouble(buf.scores(i))
      buf.ids(i) match {
        case l: java.lang.Long => out.writeByte(0); out.writeLong(l)
        case u: UTF8String =>
          val b = u.getBytes
          out.writeByte(1); out.writeInt(b.length); out.write(b)
      }
      i += 1
    }
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKBuf(k)
    var i = 0
    while (i < n) {
      val s = in.readDouble()
      val idv: AnyRef = in.readByte() match {
        case 0 => java.lang.Long.valueOf(in.readLong())
        case _ =>
          val len = in.readInt()
          val b = new Array[Byte](len)
          in.readFully(b)
          UTF8String.fromBytes(b)
      }
      buf.insert(s, idv)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
  override def prettyName: String = "top_k_by_score"
}

/** Bounded sorted buffer: insertion keeps (score desc, id asc) order; at most
  * k entries ever held, so map-side partial state is O(k). Ids are boxed
  * longs or UTF8Strings (homogeneous per aggregate).
  */
final class TopKBuf(val k: Int) {
  var scores = new Array[Double](math.min(k, 16))
  var ids = new Array[AnyRef](math.min(k, 16))
  var n = 0

  private def idLt(a: AnyRef, b: AnyRef): Boolean = (a, b) match {
    case (x: java.lang.Long, y: java.lang.Long) => x.longValue() < y.longValue()
    case (x: UTF8String, y: UTF8String) => x.compareTo(y) < 0
    case _ => throw new IllegalStateException(s"mixed id types: $a / $b")
  }

  private def beats(s: Double, i: AnyRef, pos: Int): Boolean =
    s > scores(pos) || (s == scores(pos) && idLt(i, ids(pos)))

  def insert(s: Double, i: AnyRef): Unit = {
    if (n == k && !beats(s, i, n - 1)) return
    // binary search for the insertion point: the buffer is sorted, so
    // beats(s, i, ·) is monotone (false…false true…true) — O(log k)
    // comparisons even at large k (the shift below is a single arraycopy)
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (beats(s, i, mid)) hi = mid else lo = mid + 1
    }
    val pos = lo
    if (pos >= k) return
    if (n < k && n == scores.length) { // grow toward k
      scores = java.util.Arrays.copyOf(scores, math.min(k, scores.length * 2))
      ids = java.util.Arrays.copyOf(ids, math.min(k, ids.length * 2))
    }
    val newN = math.min(n + 1, k)
    if (newN - 1 > pos) {
      System.arraycopy(scores, pos, scores, pos + 1, newN - 1 - pos)
      System.arraycopy(ids, pos, ids, pos + 1, newN - 1 - pos)
    }
    scores(pos) = s
    ids(pos) = i
    n = newN
  }

  def absorb(other: TopKBuf): Unit = {
    var i = 0
    while (i < other.n) { insert(other.scores(i), other.ids(i)); i += 1 }
  }
}

object TopKByScore {
  /** Aggregate Column: top-k (score desc, id asc) pairs per group. */
  def topK(score: Column, id: Column, k: Int): Column =
    GraftBridge.column(TopKByScore(
      GraftBridge.expression(score), GraftBridge.expression(id), k)
      .toAggregateExpression())
}
