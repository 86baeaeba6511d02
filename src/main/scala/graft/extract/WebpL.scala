package graft.extract

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** WebP-lossless (VP8L) codec — from-scratch implementation of the public
  * bitstream spec (RFC 9649 §3, the format PIL/libwebp write for
  * lossless images). The reference rewrites `data:image/png` payloads to
  * `data:image/webp` (utils.py:101-128); the JDK ships no WebP codec, so
  * until now that rewrite emitted PNG bytes under a documented partial.
  * This encoder produces REAL VP8L: any WebP decoder reads it back
  * pixel-exact.
  *
  * Encoder subset (always valid VP8L): no transforms, no color cache, no
  * LZ77 backward references — one prefix-code group with per-channel
  * codes built from the image's actual symbol frequencies (simple codes
  * for ≤2 distinct symbols, canonical length-limited prefix codes
  * otherwise). The decoder implements the same subset plus simple/normal
  * code reading generally, and is the round-trip half of the correctness
  * evidence (plus hand-computed header/bit goldens in WebpSpec — the
  * round-trip alone cannot catch a convention error that both sides
  * share, so the header layout and code-length-code order are pinned
  * against the published spec values).
  *
  * Bit conventions (per spec): the stream is LSB-first; ReadBits(n)
  * values arrive least-significant-bit first; prefix-code bits are read
  * one at a time building the canonical code MSB-first (the DEFLATE
  * convention libwebp reuses).
  *
  * Pixels are ARGB Ints, row-major.
  */
object WebpL {

  /** Code-length-code symbol order (RFC 9649 §3.5.2 kCodeLengthCodeOrder). */
  private[graft] val CodeLengthOrder: Array[Int] =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  private val GreenAlphabet = 256 + 24 // no color cache
  private val DistAlphabet = 40

  // ------------------------------------------------------------ bit I/O
  private final class BitWriterLsb {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    /** n value bits, least-significant first. */
    def writeBits(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) {
        cur |= ((v >>> i) & 1) << nbits
        nbits += 1
        if (nbits == 8) { out.write(cur); cur = 0; nbits = 0 }
        i += 1
      }
    }
    /** A prefix code: MSB of the canonical code first. */
    def writeCode(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { writeBits((code >>> i) & 1, 1); i -= 1 }
    }
    def toByteArray: Array[Byte] = {
      if (nbits > 0) { out.write(cur); cur = 0; nbits = 0 }
      out.toByteArray
    }
  }

  private final class BitReaderLsb(d: Array[Byte], var pos: Int = 0) {
    def eof: Boolean = pos >= d.length * 8
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val p = pos + i
        val bit = if (p < d.length * 8) (d(p >> 3) >>> (p & 7)) & 1 else 0
        v |= bit << i
        i += 1
      }
      pos += n
      v
    }
  }

  // -------------------------------------------------------- prefix codes
  /** Canonical code assignment from lengths (DEFLATE order: by length,
    * then symbol).
    */
  private def canonicalCodes(lengths: Array[Int]): Array[Int] = {
    val codes = new Array[Int](lengths.length)
    val maxLen = if (lengths.isEmpty) 0 else lengths.max
    var code = 0
    var len = 1
    while (len <= maxLen) {
      var sym = 0
      while (sym < lengths.length) {
        if (lengths(sym) == len) { codes(sym) = code; code += 1 }
        sym += 1
      }
      code <<= 1
      len += 1
    }
    codes
  }

  /** Length-limited prefix lengths from frequencies (simple Huffman with
    * a clamp-and-repair pass for the 15-bit limit; alphabets here are
    * ≤ 280 symbols so the repair rarely engages).
    */
  private def huffmanLengths(freq: Array[Int], maxLen: Int): Array[Int] = {
    val n = freq.length
    val used = (0 until n).filter(freq(_) > 0)
    val lengths = new Array[Int](n)
    if (used.isEmpty) return lengths
    if (used.size == 1) { lengths(used.head) = 1; return lengths }
    // (weight, node): leaves are symbol ids, internal nodes ≥ n
    case class Node(w: Long, id: Int, left: Int = -1, right: Int = -1)
    val nodes = ArrayBuffer.empty[Node]
    val heap = mutable.PriorityQueue.empty[(Long, Int)](Ordering.by(t => -t._1))
    used.foreach { s => nodes += Node(freq(s), s); heap += ((freq(s).toLong, nodes.length - 1)) }
    while (heap.size > 1) {
      val (w1, i1) = heap.dequeue()
      val (w2, i2) = heap.dequeue()
      nodes += Node(w1 + w2, -1, i1, i2)
      heap += ((w1 + w2, nodes.length - 1))
    }
    def depth(i: Int, d: Int): Unit = {
      val nd = nodes(i)
      if (nd.left < 0) lengths(nd.id) = math.max(d, 1)
      else { depth(nd.left, d + 1); depth(nd.right, d + 1) }
    }
    depth(heap.dequeue()._2, 0)
    // repair: clamp to maxLen and restore Kraft ≤ 1 by deepening the
    // shallowest repairable leaves
    if (lengths.exists(_ > maxLen)) {
      for (s <- used) if (lengths(s) > maxLen) lengths(s) = maxLen
      def kraft: Double = used.map(s => math.pow(2, -lengths(s))).sum
      var it = 0
      while (kraft > 1.0 && it < 10000) {
        val s = used.filter(lengths(_) < maxLen).minBy(lengths(_))
        lengths(s) += 1
        it += 1
      }
      require(kraft <= 1.0, "length-limit repair failed")
    }
    lengths
  }

  /** Bit-serial prefix decoder over (length, canonical code). */
  private final class PrefixCode(val lengths: Array[Int]) {
    private val codes = canonicalCodes(lengths)
    val singleSymbol: Int = {
      val used = lengths.indices.filter(lengths(_) > 0)
      if (used.size == 1) used.head else -1
    }
    // (len, code) → symbol
    private val table: Map[(Int, Int), Int] =
      lengths.indices.filter(lengths(_) > 0)
        .map(s => (lengths(s), codes(s)) -> s).toMap
    def code(sym: Int): (Int, Int) = (codes(sym), lengths(sym))
    def read(r: BitReaderLsb): Int = {
      if (singleSymbol >= 0) return singleSymbol
      var len = 0
      var code = 0
      while (len <= 15) {
        code = (code << 1) | r.readBits(1)
        len += 1
        table.get((len, code)) match {
          case Some(s) => return s
          case None => ()
        }
      }
      throw new IllegalStateException("bad prefix code")
    }
  }

  // --------------------------------------------------------------- write
  private def writePrefixCode(w: BitWriterLsb, freq: Array[Int]): PrefixCode = {
    val used = freq.indices.filter(freq(_) > 0)
    if (used.size <= 2 && used.forall(_ <= 255)) {
      // simple code
      w.writeBits(1, 1) // is_simple
      val syms = if (used.isEmpty) Seq(0) else used
      w.writeBits(syms.length - 1, 1) // num_symbols - 1
      if (syms.head <= 1) { w.writeBits(0, 1); w.writeBits(syms.head, 1) }
      else { w.writeBits(1, 1); w.writeBits(syms.head, 8) }
      if (syms.length == 2) w.writeBits(syms(1), 8)
      val lengths = new Array[Int](freq.length)
      if (syms.length == 1) lengths(syms.head) = 0 // zero-bit code
      else syms.foreach(s => lengths(s) = 1)
      // represent the 1-symbol case with the decoder's singleSymbol path
      val pc = new PrefixCode(
        if (syms.length == 1) { val l = new Array[Int](freq.length); l(syms.head) = 1; l }
        else lengths)
      pc
    } else {
      w.writeBits(0, 1) // normal code
      val symLengths = huffmanLengths(freq, maxLen = 15)
      // code-length alphabet: literal lengths only (no 16/17/18 reps) —
      // valid, just less compact
      val clFreq = new Array[Int](19)
      symLengths.foreach(l => clFreq(l) += 1)
      val clLengths = huffmanLengths(clFreq, maxLen = 7)
      val clCode = new PrefixCode(clLengths)
      // emit in kCodeLengthCodeOrder, trimming trailing zeros
      var numCl = CodeLengthOrder.length
      while (numCl > 4 && clLengths(CodeLengthOrder(numCl - 1)) == 0) numCl -= 1
      w.writeBits(numCl - 4, 4)
      var i = 0
      while (i < numCl) { w.writeBits(clLengths(CodeLengthOrder(i)), 3); i += 1 }
      w.writeBits(0, 1) // no max_symbol shortcut: all lengths coded
      // the 1-distinct-symbol code-length code reads zero bits per symbol,
      // which only terminates if every symbol shares that length — holds
      // by construction (clFreq has one nonzero bucket)
      symLengths.foreach { l =>
        if (clCode.singleSymbol >= 0) require(clCode.singleSymbol == l)
        else { val (c, n) = clCode.code(l); w.writeCode(c, n) }
      }
      new PrefixCode(symLengths)
    }
  }

  private def readPrefixCode(r: BitReaderLsb, alphabetSize: Int): PrefixCode = {
    if (r.readBits(1) == 1) { // simple
      val numSymbols = r.readBits(1) + 1
      val first =
        if (r.readBits(1) == 1) r.readBits(8) else r.readBits(1)
      val lengths = new Array[Int](alphabetSize)
      if (numSymbols == 1) { lengths(first) = 1; val pc = new PrefixCode(lengths); pc }
      else {
        val second = r.readBits(8)
        lengths(first) = 1; lengths(second) = 1
        new PrefixCode(lengths)
      }
    } else {
      val numCl = r.readBits(4) + 4
      val clLengths = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLengths(CodeLengthOrder(i)) = r.readBits(3); i += 1 }
      val clCode = new PrefixCode(clLengths)
      var maxSymbol = alphabetSize
      if (r.readBits(1) == 1) { // use max_symbol
        val nbits = 2 + 2 * r.readBits(3)
        maxSymbol = 2 + r.readBits(nbits)
      }
      val lengths = new Array[Int](alphabetSize)
      var sym = 0
      var prev = 8
      while (sym < alphabetSize && maxSymbol > 0) {
        maxSymbol -= 1
        val cl = clCode.read(r)
        cl match {
          case l if l < 16 =>
            lengths(sym) = l; sym += 1
            if (l != 0) prev = l
          case 16 =>
            val rep = 3 + r.readBits(2)
            for (_ <- 0 until rep if sym < alphabetSize) { lengths(sym) = prev; sym += 1 }
          case 17 =>
            sym += math.min(3 + r.readBits(3), alphabetSize - sym)
          case _ =>
            sym += math.min(11 + r.readBits(7), alphabetSize - sym)
        }
      }
      new PrefixCode(lengths)
    }
  }

  /** Encode ARGB pixels (row-major) as a complete WebP file (RIFF +
    * VP8L). Always lossless; any conforming WebP decoder reproduces the
    * exact pixels.
    */
  def encode(argb: Array[Int], width: Int, height: Int): Array[Byte] = {
    require(width > 0 && width <= (1 << 14), s"width $width")
    require(height > 0 && height <= (1 << 14), s"height $height")
    require(argb.length == width * height, "pixel buffer size")
    val w = new BitWriterLsb
    val alphaUsed = argb.exists(p => (p >>> 24) != 0xFF)
    w.writeBits(width - 1, 14)
    w.writeBits(height - 1, 14)
    w.writeBits(if (alphaUsed) 1 else 0, 1)
    w.writeBits(0, 3) // version
    w.writeBits(0, 1) // no transforms
    w.writeBits(0, 1) // no color cache
    w.writeBits(0, 1) // no meta prefix (one code group)
    val gFreq = new Array[Int](GreenAlphabet)
    val rFreq = new Array[Int](256)
    val bFreq = new Array[Int](256)
    val aFreq = new Array[Int](256)
    argb.foreach { p =>
      gFreq((p >>> 8) & 0xFF) += 1
      rFreq((p >>> 16) & 0xFF) += 1
      bFreq(p & 0xFF) += 1
      aFreq(p >>> 24) += 1
    }
    val dFreq = new Array[Int](DistAlphabet) // never used: literal-only
    val gc = writePrefixCode(w, gFreq)
    val rc = writePrefixCode(w, rFreq)
    val bc = writePrefixCode(w, bFreq)
    val ac = writePrefixCode(w, aFreq)
    writePrefixCode(w, dFreq)
    def emit(pc: PrefixCode, sym: Int): Unit =
      if (pc.singleSymbol < 0) { val (c, n) = pc.code(sym); w.writeCode(c, n) }
    argb.foreach { p =>
      emit(gc, (p >>> 8) & 0xFF)
      emit(rc, (p >>> 16) & 0xFF)
      emit(bc, p & 0xFF)
      emit(ac, p >>> 24)
    }
    val payload = Array[Byte](0x2F) ++ w.toByteArray
    val riff = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Unit = riff.write(s.getBytes("ISO-8859-1"))
    def u32(v: Int): Unit =
      riff.write(Array[Byte](v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte))
    val chunk = payload.length
    val padded = chunk + (chunk & 1)
    ascii("RIFF"); u32(4 + 8 + padded); ascii("WEBP"); ascii("VP8L"); u32(chunk)
    riff.write(payload)
    if ((chunk & 1) == 1) riff.write(0)
    riff.toByteArray
  }

  /** Decode a WebP-lossless file produced by a conforming encoder using
    * this codec's subset (no transforms, no color cache, no LZ77 refs —
    * anything else throws). Returns (argb row-major, width, height).
    */
  def decode(bytes: Array[Byte]): (Array[Int], Int, Int) = {
    require(bytes.length > 20, "short file")
    def tag(at: Int): String = new String(bytes, at, 4, "ISO-8859-1")
    require(tag(0) == "RIFF" && tag(8) == "WEBP" && tag(12) == "VP8L",
      "not a lossless WebP")
    require(bytes(20) == 0x2F, "bad VP8L signature")
    val r = new BitReaderLsb(bytes.drop(21))
    val width = r.readBits(14) + 1
    val height = r.readBits(14) + 1
    r.readBits(1) // alpha hint
    require(r.readBits(3) == 0, "unsupported VP8L version")
    require(r.readBits(1) == 0, "transforms unsupported in this subset")
    require(r.readBits(1) == 0, "color cache unsupported in this subset")
    require(r.readBits(1) == 0, "meta prefix unsupported in this subset")
    val gc = readPrefixCode(r, GreenAlphabet)
    val rc = readPrefixCode(r, 256)
    val bc = readPrefixCode(r, 256)
    val ac = readPrefixCode(r, 256)
    readPrefixCode(r, DistAlphabet)
    val out = new Array[Int](width * height)
    var i = 0
    while (i < out.length) {
      val g = gc.read(r)
      require(g < 256, "LZ77/cache symbols unsupported in this subset")
      val red = rc.read(r)
      val blue = bc.read(r)
      val alpha = ac.read(r)
      out(i) = (alpha << 24) | (red << 16) | (g << 8) | blue
      i += 1
    }
    (out, width, height)
  }
}
