package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: whitespace-tokenize a (pre-normalized) string
  * and emit one 64-bit hash per word n-gram shingle, in one pass without
  * materializing shingle strings. Feeds [[MinHashSig]] / [[SimHash64]]; the
  * interpreted HOF pipeline (`transform(slice…concat_ws…xxhash64)`) spends
  * most of its time boxing per-element lambda results.
  *
  * Hash: per-word splitmix64 over the word's UTF-8 bytes (FNV-style byte
  * fold, splitmix finisher), shingle hash = splitmix-mix of its word hashes.
  *
  * @param n         shingle width in words (1 = token hashes)
  * @param maxTokens 0 = unlimited, else only the first maxTokens words
  */
case class ShingleHashes(child: Expression, n: Int, maxTokens: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ShingleHashes needs string, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ShingleHashes.compute(input.asInstanceOf[UTF8String], n, maxTokens))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.ShingleHashes.compute($str, $n, $maxTokens));")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  private def mix(z0: Long): Long = Hashing.splitmix64(z0)

  /** One pass: split on runs of whitespace, hash words, roll shingles. */
  def compute(str: UTF8String, n: Int, maxTokens: Int): Array[Long] = {
    val bytes = str.getBytes
    val wordHashes = new java.util.ArrayList[java.lang.Long](64)
    var h = 0x811c9dc5L
    var inWord = false
    var i = 0
    val len = bytes.length
    while (i < len && (maxTokens == 0 || wordHashes.size < maxTokens)) {
      val b = bytes(i)
      // match Java \s (Dedup.words splits on \s+): include \x0B and \f so the
      // hash-shingle and string-shingle tokenizations agree on all inputs
      val isWs = b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == 0x0b || b == 0x0c
      if (isWs) {
        if (inWord) { wordHashes.add(mix(h)); h = 0x811c9dc5L; inWord = false }
      } else {
        h = (h ^ (b & 0xffL)) * 0x100000001b3L
        inWord = true
      }
      i += 1
    }
    if (inWord && (maxTokens == 0 || wordHashes.size < maxTokens)) wordHashes.add(mix(h))
    val w = wordHashes.size
    if (w < n) return Array.emptyLongArray
    val out = new Array[Long](w - n + 1)
    var s = 0
    while (s <= w - n) {
      var sh = 0x51ed270b2f2c5115L
      var j = 0
      while (j < n) { sh = mix(sh ^ wordHashes.get(s + j)); j += 1 }
      out(s) = sh
      s += 1
    }
    out
  }

  def shingleHashes(normalizedText: Column, n: Int, maxTokens: Int = 0): Column =
    GraftBridge.column(ShingleHashes(GraftBridge.expression(normalizedText), n, maxTokens))
}
