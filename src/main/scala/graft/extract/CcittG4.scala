package graft.extract

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** CCITT Group 4 (ITU-T T.6, pure 2D/MMR) and Group 3 (ITU-T T.4) codecs —
  * the compressions scanned-PDF image streams use (`/CCITTFaxDecode`).
  * From-scratch implementation of the public Recommendations: per-row 2D
  * coding against the reference line with Vertical (V0/VR1-3/VL1-3), Pass,
  * and Horizontal modes, the T.4 modified-Huffman white/black run tables
  * (1D rows and Horizontal mode), the shared extended makeup codes
  * (1792-2560), and the T.4 EOL/tag-bit framing for G3:
  *
  *   - `/K < 0`  → [[decode]] (G4: pure 2D/MMR, EOFB-tolerant)
  *   - `/K = 0`  → [[decodeG3]] (pure 1D MH rows, optional EOLs)
  *   - `/K > 0`  → [[decodeG3]] (mixed: EOL + tag bit selects 1D/2D row)
  *
  * Decoder tolerance: input may end without EOFB/RTC (PDF streams
  * routinely omit them); `encodedByteAlign` restarts each row on a byte
  * boundary; K = 0 rows may arrive with or without EOLs.
  *
  * Pixel buffers are 1 byte/pixel, 1 = black, row-major `columns × rows`.
  * Correctness evidence: encoder↔decoder round-trip property tests PLUS
  * spot checks of individual codewords against the published T.4 tables
  * (the round-trip alone would not catch a mistranscribed table entry).
  */
object CcittG4 {

  // ------------------------------------------------------ T.4 MH tables
  // (run length, codeword bits as a string) — terminating + makeup
  private val WhiteCodes: Seq[(Int, String)] = Seq(
    0 -> "00110101", 1 -> "000111", 2 -> "0111", 3 -> "1000", 4 -> "1011",
    5 -> "1100", 6 -> "1110", 7 -> "1111", 8 -> "10011", 9 -> "10100",
    10 -> "00111", 11 -> "01000", 12 -> "001000", 13 -> "000011",
    14 -> "110100", 15 -> "110101", 16 -> "101010", 17 -> "101011",
    18 -> "0100111", 19 -> "0001100", 20 -> "0001000", 21 -> "0010111",
    22 -> "0000011", 23 -> "0000100", 24 -> "0101000", 25 -> "0101011",
    26 -> "0010011", 27 -> "0100100", 28 -> "0011000", 29 -> "00000010",
    30 -> "00000011", 31 -> "00011010", 32 -> "00011011", 33 -> "00010010",
    34 -> "00010011", 35 -> "00010100", 36 -> "00010101", 37 -> "00010110",
    38 -> "00010111", 39 -> "00101000", 40 -> "00101001", 41 -> "00101010",
    42 -> "00101011", 43 -> "00101100", 44 -> "00101101", 45 -> "00000100",
    46 -> "00000101", 47 -> "00001010", 48 -> "00001011", 49 -> "01010010",
    50 -> "01010011", 51 -> "01010100", 52 -> "01010101", 53 -> "00100100",
    54 -> "00100101", 55 -> "01011000", 56 -> "01011001", 57 -> "01011010",
    58 -> "01011011", 59 -> "01001010", 60 -> "01001011", 61 -> "00110010",
    62 -> "00110011", 63 -> "00110100",
    64 -> "11011", 128 -> "10010", 192 -> "010111", 256 -> "0110111",
    320 -> "00110110", 384 -> "00110111", 448 -> "01100100",
    512 -> "01100101", 576 -> "01101000", 640 -> "01100111",
    704 -> "011001100", 768 -> "011001101", 832 -> "011010010",
    896 -> "011010011", 960 -> "011010100", 1024 -> "011010101",
    1088 -> "011010110", 1152 -> "011010111", 1216 -> "011011000",
    1280 -> "011011001", 1344 -> "011011010", 1408 -> "011011011",
    1472 -> "010011000", 1536 -> "010011001", 1600 -> "010011010",
    1664 -> "011000", 1728 -> "010011011")

  private val BlackCodes: Seq[(Int, String)] = Seq(
    0 -> "0000110111", 1 -> "010", 2 -> "11", 3 -> "10", 4 -> "011",
    5 -> "0011", 6 -> "0010", 7 -> "00011", 8 -> "000101", 9 -> "000100",
    10 -> "0000100", 11 -> "0000101", 12 -> "0000111", 13 -> "00000100",
    14 -> "00000111", 15 -> "000011000", 16 -> "0000010111",
    17 -> "0000011000", 18 -> "0000001000", 19 -> "00001100111",
    20 -> "00001101000", 21 -> "00001101100", 22 -> "00000110111",
    23 -> "00000101000", 24 -> "00000010111", 25 -> "00000011000",
    26 -> "000011001010", 27 -> "000011001011", 28 -> "000011001100",
    29 -> "000011001101", 30 -> "000001101000", 31 -> "000001101001",
    32 -> "000001101010", 33 -> "000001101011", 34 -> "000011010010",
    35 -> "000011010011", 36 -> "000011010100", 37 -> "000011010101",
    38 -> "000011010110", 39 -> "000011010111", 40 -> "000001101100",
    41 -> "000001101101", 42 -> "000011011010", 43 -> "000011011011",
    44 -> "000001010100", 45 -> "000001010101", 46 -> "000001010110",
    47 -> "000001010111", 48 -> "000001100100", 49 -> "000001100101",
    50 -> "000001010010", 51 -> "000001010011", 52 -> "000000100100",
    53 -> "000000110111", 54 -> "000000111000", 55 -> "000000100111",
    56 -> "000000101000", 57 -> "000001011000", 58 -> "000001011001",
    59 -> "000000101011", 60 -> "000000101100", 61 -> "000001011010",
    62 -> "000001100110", 63 -> "000001100111",
    64 -> "0000001111", 128 -> "000011001000", 192 -> "000011001001",
    256 -> "000001011011", 320 -> "000000110011", 384 -> "000000110100",
    448 -> "000000110101", 512 -> "0000001101100", 576 -> "0000001101101",
    640 -> "0000001001010", 704 -> "0000001001011", 768 -> "0000001001100",
    832 -> "0000001001101", 896 -> "0000001110010", 960 -> "0000001110011",
    1024 -> "0000001110100", 1088 -> "0000001110101",
    1152 -> "0000001110110", 1216 -> "0000001110111",
    1280 -> "0000001010010", 1344 -> "0000001010011",
    1408 -> "0000001010100", 1472 -> "0000001010101",
    1536 -> "0000001011010", 1600 -> "0000001011011",
    1664 -> "0000001100100", 1728 -> "0000001100101")

  /** Extended makeup (T.4 §2, common to both colors). */
  private val ExtCodes: Seq[(Int, String)] = Seq(
    1792 -> "00000001000", 1856 -> "00000001100", 1920 -> "00000001101",
    1984 -> "000000010010", 2048 -> "000000010011", 2112 -> "000000010100",
    2176 -> "000000010101", 2240 -> "000000010110", 2304 -> "000000010111",
    2368 -> "000000011100", 2432 -> "000000011101", 2496 -> "000000011110",
    2560 -> "000000011111")

  /** Codeword bit-pattern lookup for the spot-check tests. */
  private[graft] def codeword(run: Int, black: Boolean): Option[String] =
    ((if (black) BlackCodes else WhiteCodes) ++ ExtCodes).collectFirst {
      case (r, bits) if r == run => bits
    }

  // decode maps: (bitLength, value) → run
  private def decodeMap(codes: Seq[(Int, String)]): Map[(Int, Int), Int] =
    codes.map { case (run, bits) =>
      (bits.length, Integer.parseInt(bits, 2)) -> run
    }.toMap
  private val WhiteDecode = decodeMap(WhiteCodes ++ ExtCodes)
  private val BlackDecode = decodeMap(BlackCodes ++ ExtCodes)

  private final class BitReader(d: Array[Byte]) {
    var pos = 0 // bit position
    def eof: Boolean = pos >= d.length * 8
    def bit(): Int = {
      val b = (d(pos >> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      b
    }
    def align(): Unit = pos = (pos + 7) & ~7
    def peek(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val p = pos + i
        v = (v << 1) | (if (p < d.length * 8) (d(p >> 3) >> (7 - (p & 7))) & 1 else 0)
        i += 1
      }
      v
    }
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    def put(bits: String): Unit = bits.foreach { c =>
      cur = (cur << 1) | (if (c == '1') 1 else 0)
      nbits += 1
      if (nbits == 8) { out.write(cur); cur = 0; nbits = 0 }
    }
    def toByteArray: Array[Byte] = {
      if (nbits > 0) { out.write(cur << (8 - nbits)); cur = 0; nbits = 0 }
      out.toByteArray
    }
  }

  /** One MH run of the given color; total = makeup(s) + terminating. */
  private def readRun(r: BitReader, black: Boolean): Int = {
    val table = if (black) BlackDecode else WhiteDecode
    var total = 0
    var guard = 0
    while (guard < 64) {
      guard += 1
      var len = 2
      var matched = -1
      while (len <= 13 && matched < 0) {
        table.get((len, r.peek(len))) match {
          case Some(run) => matched = run
          case None => len += 1
        }
      }
      if (matched < 0) throw new IllegalStateException("bad MH code")
      r.pos += len
      total += matched
      if (matched < 64) return total // terminating code ends the run
    }
    throw new IllegalStateException("runaway makeup chain")
  }

  /** Decode ONE 2D-coded row against the reference transitions. Returns
    * the row's transition positions, or null when the bits at the cursor
    * are an EOL/EOFB prefix (the caller decides what that means: EOFB in
    * G4, framing in mixed G3).
    */
  private def decode2DRow(r: BitReader, ref: Array[Int], columns: Int): Array[Int] = {
    val cur = ArrayBuffer[Int]()
    var a0 = -1
    var color = 0 // 0 = white
    while (a0 < columns) {
      // b1: first reference transition > a0 with opposite color to a0's
      // color; transitions alternate starting with white→black
      var bi = 0
      while (bi < ref.length && (ref(bi) <= a0 || (bi & 1) != color)) bi += 1
      val b1 = if (bi < ref.length) ref(bi) else columns
      val b2 = if (bi + 1 < ref.length) ref(bi + 1) else columns
      // mode dispatch by prefix
      val before = a0
      if (r.eof) return cur.toArray
      else if (r.peek(1) == 1) { // V0: 1
        r.pos += 1
        cur += b1; a0 = b1; color ^= 1
      } else if (r.peek(3) == 3) { // 011 VR1
        r.pos += 3
        cur += b1 + 1; a0 = b1 + 1; color ^= 1
      } else if (r.peek(3) == 2) { // 010 VL1
        r.pos += 3
        cur += b1 - 1; a0 = b1 - 1; color ^= 1
      } else if (r.peek(3) == 1) { // 001 Horizontal
        r.pos += 3
        val a0p = math.max(a0, 0)
        val r1 = readRun(r, color == 1)
        val r2 = readRun(r, color == 0)
        val a1 = a0p + r1
        val a2 = a1 + r2
        cur += a1; cur += a2
        a0 = a2 // color unchanged (two runs)
      } else if (r.peek(4) == 1) { // 0001 Pass
        r.pos += 4
        a0 = b2 // color unchanged, no transition recorded
      } else if (r.peek(6) == 3) { // 000011 VR2
        r.pos += 6
        cur += b1 + 2; a0 = b1 + 2; color ^= 1
      } else if (r.peek(6) == 2) { // 000010 VL2
        r.pos += 6
        cur += b1 - 2; a0 = b1 - 2; color ^= 1
      } else if (r.peek(7) == 3) { // 0000011 VR3
        r.pos += 7
        cur += b1 + 3; a0 = b1 + 3; color ^= 1
      } else if (r.peek(7) == 2) { // 0000010 VL3
        r.pos += 7
        cur += b1 - 3; a0 = b1 - 3; color ^= 1
      } else if (r.peek(12) == 1) { // EOL/EOFB prefix 000000000001
        return null
      } else throw new IllegalStateException(s"bad 2D mode code at bit ${r.pos}")
      // crafted streams can loop without advancing (e.g. VL on b1=a0+1)
      if (a0 <= before && a0 >= 0)
        throw new IllegalStateException("2D decoder made no progress")
    }
    cur.toArray
  }

  /** Decode ONE 1D (pure MH) row: alternating white-first runs until the
    * row is full. Returns the transition positions.
    */
  private def decode1DRow(r: BitReader, columns: Int): Array[Int] = {
    val cur = ArrayBuffer[Int]()
    var pos = 0
    var color = 0
    var guard = 0
    while (pos < columns && !r.eof) {
      guard += 1
      if (guard > columns + 8)
        throw new IllegalStateException("1D row made no progress")
      pos += readRun(r, color == 1)
      cur += math.min(pos, columns)
      color ^= 1
    }
    cur.toArray
  }

  /** Paint one row of `out` from its transition list. */
  private def paintRow(out: Array[Byte], row: Int, columns: Int,
      cur: Array[Int]): Unit = {
    var x = 0
    var c = 0
    var t = 0
    val base = row * columns
    while (x < columns) {
      val nextT = if (t < cur.length) math.min(cur(t), columns) else columns
      if (c == 1) java.util.Arrays.fill(out, base + x, base + math.max(x, nextT), 1.toByte)
      x = math.max(x, nextT)
      c ^= 1
      t += 1
    }
  }

  /** Consume an EOL (≥11 zero fill/sync bits then a 1). Restores the
    * cursor and returns false when the bits there are not an EOL.
    */
  private def consumeEol(r: BitReader): Boolean = {
    // T.4 allows arbitrary zero FILL before the EOL's 000000000001 (fax
    // minimum-scan-line padding); the scan is bounded by the input length.
    // No MH/2D codeword has >= 11 leading zeros, so the threshold cannot
    // swallow a data code.
    val start = r.pos
    var zeros = 0
    while (!r.eof && r.peek(1) == 0) { r.pos += 1; zeros += 1 }
    if (!r.eof && zeros >= 11) { r.pos += 1; true }
    else { r.pos = start; false }
  }

  /** G4 decode → 1 byte/pixel (1 = black). Throws on malformed input —
    * callers convert to the placeholder/failure channel.
    */
  /** Dimension guard shared by the decoders: per-axis bound plus a total
    * pixel cap (1<<26 ≈ 67M px covers a 600 dpi A4 scan) so a crafted
    * /Columns x /Rows cannot force a multi-GB allocation whose
    * OutOfMemoryError would escape callers' Exception handlers.
    */
  private def requireDims(columns: Int, rows: Int): Unit = {
    require(columns > 0 && columns <= (1 << 16), s"columns $columns")
    require(rows > 0 && rows <= (1 << 16), s"rows $rows")
    require(columns.toLong * rows <= (1L << 26),
      s"raster ${columns}x$rows exceeds the pixel cap")
  }

  def decode(data: Array[Byte], columns: Int, rows: Int,
      encodedByteAlign: Boolean = false): Array[Byte] = {
    requireDims(columns, rows)
    val out = new Array[Byte](columns * rows)
    val r = new BitReader(data)
    // reference transitions: positions where color changes, terminated
    // by two sentinels at `columns`
    var ref = Array(columns, columns)
    var row = 0
    while (row < rows && !r.eof) {
      if (encodedByteAlign) r.align()
      val cur = decode2DRow(r, ref, columns)
      if (cur == null) row = rows // EOFB: stop everything
      else {
        paintRow(out, row, columns, cur)
        ref = cur ++ Array(columns, columns)
        row += 1
      }
    }
    out
  }

  /** G3 decode (T.4) → 1 byte/pixel (1 = black): `k` = the PDF /K value.
    * k = 0: every row is 1D MH; EOLs optional (consumed when present).
    * k > 0: each row framed by EOL + a tag bit (1 → 1D, 0 → 2D against
    * the previous row); a missing first EOL is tolerated as 1D. Two
    * consecutive EOLs (RTC) end the image. Throws on malformed input.
    */
  def decodeG3(data: Array[Byte], columns: Int, rows: Int, k: Int = 0,
      encodedByteAlign: Boolean = false): Array[Byte] = {
    require(k >= 0, s"K $k is G4 — use decode")
    requireDims(columns, rows)
    val out = new Array[Byte](columns * rows)
    val r = new BitReader(data)
    var ref = Array(columns, columns)
    var row = 0
    var stop = false
    while (row < rows && !r.eof && !stop) {
      if (encodedByteAlign) r.align()
      val hadEol = consumeEol(r)
      if (r.eof || (hadEol && consumeEol(r))) stop = true // RTC / trailer
      else {
        val is1D =
          if (k == 0) true
          else if (!hadEol) true // tolerant first row without framing
          else r.bit() == 1 // tag bit after EOL
        val cur =
          if (is1D) decode1DRow(r, columns)
          else decode2DRow(r, ref, columns)
        if (cur == null) stop = true // unexpected EOL mid-row: treat as end
        else {
          paintRow(out, row, columns, cur)
          ref = cur ++ Array(columns, columns)
          row += 1
        }
      }
    }
    out
  }

  private def transitionsOf(pixels: Array[Byte], columns: Int, row: Int): Array[Int] = {
    if (row < 0) return Array(columns, columns)
    val base = row * columns
    val t = ArrayBuffer[Int]()
    var c = 0
    var x = 0
    while (x < columns) {
      if ((pixels(base + x) & 1) != c) { t += x; c ^= 1 }
      x += 1
    }
    t += columns
    t += columns
    t.toArray
  }

  private def runTo(w: BitWriter, run0: Int, black: Boolean): Unit = {
    var run = run0
    while (run >= 64) {
      // largest makeup ≤ run (makeups are multiples of 64 up to 2560)
      val mk = math.min(run - run % 64, 2560)
      w.put(codeword(mk, black).get)
      run -= mk
    }
    w.put(codeword(run, black).get)
  }

  private def encode2DRow(w: BitWriter, ref: Array[Int], cur: Array[Int],
      columns: Int): Unit = {
    var a0 = -1
    var color = 0
    var ti = 0
    while (a0 < columns) {
      val a1 = if (ti < cur.length) cur(ti) else columns
      var bi = 0
      while (bi < ref.length && (ref(bi) <= a0 || (bi & 1) != color)) bi += 1
      val b1 = if (bi < ref.length) ref(bi) else columns
      val b2 = if (bi + 1 < ref.length) ref(bi + 1) else columns
      if (b2 < a1) { // pass
        w.put("0001")
        a0 = b2
      } else if (math.abs(a1 - b1) <= 3) { // vertical
        (a1 - b1) match {
          case 0 => w.put("1")
          case 1 => w.put("011")
          case 2 => w.put("000011")
          case 3 => w.put("0000011")
          case -1 => w.put("010")
          case -2 => w.put("000010")
          case -3 => w.put("0000010")
        }
        a0 = a1; color ^= 1; ti += 1
      } else { // horizontal: two runs from max(a0,0)
        val a2 = if (ti + 1 < cur.length) cur(ti + 1) else columns
        w.put("001")
        val a0p = math.max(a0, 0)
        runTo(w, a1 - a0p, color == 1)
        runTo(w, a2 - a1, color == 0)
        a0 = a2; ti += 2
      }
    }
  }

  private def encode1DRow(w: BitWriter, cur: Array[Int], columns: Int): Unit = {
    var prev = 0
    var color = 0
    var i = 0
    while (prev < columns) {
      val next = math.min(if (i < cur.length) cur(i) else columns, columns)
      runTo(w, next - prev, color == 1)
      prev = next
      color ^= 1
      i += 1
    }
  }

  /** G4 encode of a 1-byte/pixel (1 = black) raster — the fixture writer
    * and the round-trip half of the correctness evidence.
    */
  def encode(pixels: Array[Byte], columns: Int, rows: Int): Array[Byte] = {
    require(pixels.length == columns * rows, "pixel buffer size")
    val w = new BitWriter
    var row = 0
    while (row < rows) {
      encode2DRow(w, transitionsOf(pixels, columns, row - 1),
        transitionsOf(pixels, columns, row), columns)
      row += 1
    }
    w.put("000000000001000000000001") // EOFB
    w.toByteArray
  }

  /** G3 encode (T.4): k = 0 emits EOL + a 1D MH row per line; k > 0 emits
    * EOL + tag bit with a 1D row at least every k lines (2D between) —
    * the round-trip half of [[decodeG3]]'s correctness evidence.
    */
  def encodeG3(pixels: Array[Byte], columns: Int, rows: Int, k: Int = 0): Array[Byte] = {
    require(k >= 0, s"K $k is G4 — use encode")
    require(pixels.length == columns * rows, "pixel buffer size")
    val w = new BitWriter
    var row = 0
    while (row < rows) {
      w.put("000000000001") // EOL
      val oneD = k == 0 || row % math.max(k, 1) == 0
      if (k > 0) w.put(if (oneD) "1" else "0")
      val cur = transitionsOf(pixels, columns, row)
      if (oneD) encode1DRow(w, cur, columns)
      else encode2DRow(w, transitionsOf(pixels, columns, row - 1), cur, columns)
      row += 1
    }
    // RTC: the trailing EOL pair ends the image for tolerant readers
    w.put("000000000001000000000001")
    w.toByteArray
  }
}
