package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Bounded top-k aggregate: keeps the k best `(score, id)` pairs, ordered by
  * (score desc, id asc). A `TypedImperativeAggregate` so the heap participates
  * in PARTIAL aggregation — each map task reduces its rows to ≤ k entries
  * before the shuffle, and the exchange carries k rows per (group, partition)
  * instead of every candidate row through a window sort. This replaces the
  * `row_number().over(Window.partitionBy(query))` top-k (round-1 scale
  * finding: the window exchange sorts the full candidate set).
  *
  * Output: `array<struct<score:double, id:bigint>>` in rank order.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(score, id)
  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_k_by_score needs (double, bigint), got (${score.dataType.sql}, ${id.dataType.sql})")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
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
    val bb = java.nio.ByteBuffer.allocate(4 + buf.n * 16)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuf(k)
    var i = 0
    while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
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
  * k entries ever held, so map-side partial state is O(k).
  */
final class TopKBuf(val k: Int) {
  var scores = new Array[Double](math.min(k, 16))
  var ids = new Array[Long](math.min(k, 16))
  var n = 0

  private def beats(s: Double, i: Long, pos: Int): Boolean =
    s > scores(pos) || (s == scores(pos) && i < ids(pos))

  def insert(s: Double, i: Long): Unit = {
    if (n == k && !beats(s, i, n - 1)) return
    var pos = n
    while (pos > 0 && beats(s, i, pos - 1)) pos -= 1
    if (pos >= k) return
    if (n < k && n == scores.length) { // grow toward k
      scores = java.util.Arrays.copyOf(scores, math.min(k, scores.length * 2))
      ids = java.util.Arrays.copyOf(ids, math.min(k, ids.length * 2))
    }
    val newN = math.min(n + 1, k)
    var j = newN - 1
    while (j > pos) { scores(j) = scores(j - 1); ids(j) = ids(j - 1); j -= 1 }
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
