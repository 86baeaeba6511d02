package graft.extract

import java.nio.charset.StandardCharsets
import scala.collection.mutable

/** Container-level PDF parsing from raw bytes — the byte-real analog of the
  * reference's `get_pdf_info` (pdf_utils.py:187-256, which delegates to
  * pypdf). From-scratch implementation of the public PDF 32000-1:2008 file
  * structure (§7.3 objects, §7.5 xref/trailer), NOT a port: classic xref
  * tables with /Prev chains, 1.5+ cross-reference STREAMS and object
  * streams (/Type/ObjStm), hybrid-reference /XRefStm precedence, the
  * §7.4 filter set (Flate with PNG predictors via the JDK Inflater, LZW,
  * ASCIIHex, ASCII85, RunLength, per-filter DecodeParms, /Crypt Identity
  * pass-through), page-tree walk with MediaBox inheritance,
  * Info-dictionary text strings (UTF-16BE BOM else PDFDocEncoding≈Latin-1).
  *
  * No raster/content decoding happens here — this is O(file) byte scanning
  * plus O(objects touched) parsing, a bounded per-row kernel safe to run in
  * `mapPartitions` over a binary column at scale. Golden-tested against the
  * reference's REAL fixture PDFs (tests/resources/pdf_sample*.pdf) with
  * expected values established by the independent second implementation in
  * `tools/pdf_info_oracle.py`.
  */
object PdfBytes {

  // ------------------------------------------------------------ object model
  sealed trait PObj
  case object PNull extends PObj
  final case class PBool(v: Boolean) extends PObj
  final case class PNum(v: Double) extends PObj
  final case class PStr(bytes: Array[Byte]) extends PObj
  final case class PName(v: String) extends PObj
  final case class PArr(items: Vector[PObj]) extends PObj
  final case class PDict(m: Map[String, PObj]) extends PObj
  final case class PRef(num: Int, gen: Int) extends PObj
  /** Stream dict + RAW (still-encoded) payload bytes. */
  final case class PStream(dict: PDict, data: Array[Byte]) extends PObj

  final case class PageDim(width: Double, height: Double)
  final case class PdfInfo(
      pageCount: Int,
      fileSize: Long,
      isEncrypted: Boolean,
      pageDims: Seq[PageDim],
      title: String,
      author: String)

  private val WS = " \t\r\n\u0000\f".getBytes
  private val Delim = "()<>[]{}/%".getBytes
  private def isWs(b: Byte) = WS.contains(b)
  private def isDelim(b: Byte) = Delim.contains(b)

  // ------------------------------------------------------------ lexer/parser
  /** Recursive-descent parser over the file buffer; `pos` is mutable.
    * Shared with [[PdfText]]'s content-stream tokenizer.
    */
  private[extract] final class Parser(val d: Array[Byte], var pos: Int) {

    def skipWs(): Unit = {
      while (pos < d.length) {
        if (d(pos) == '%') { while (pos < d.length && d(pos) != '\r' && d(pos) != '\n') pos += 1 }
        else if (isWs(d(pos))) pos += 1
        else return
      }
    }

    def peek: Int = if (pos < d.length) d(pos) & 0xff else -1

    /** Reads a bare word (number, keyword). */
    def word(): String = {
      val start = pos
      while (pos < d.length && !isWs(d(pos)) && !isDelim(d(pos))) pos += 1
      new String(d, start, pos - start, StandardCharsets.ISO_8859_1)
    }

    def expect(s: String): Unit = {
      skipWs()
      val w = word()
      if (w != s) throw new IllegalStateException(s"expected '$s' got '$w' at $pos")
    }

    def name(): PName = {
      pos += 1 // '/'
      val sb = new StringBuilder
      while (pos < d.length && !isWs(d(pos)) && !isDelim(d(pos))) {
        if (d(pos) == '#' && pos + 2 < d.length) {
          sb += Integer.parseInt(new String(d, pos + 1, 2, StandardCharsets.ISO_8859_1), 16).toChar
          pos += 3
        } else { sb += (d(pos) & 0xff).toChar; pos += 1 }
      }
      PName(sb.toString)
    }

    def literalString(): PStr = {
      pos += 1 // '('
      val out = new java.io.ByteArrayOutputStream()
      var depth = 1
      while (depth > 0 && pos < d.length) {
        val c = d(pos); pos += 1
        c match {
          case '\\' =>
            val e = d(pos); pos += 1
            e match {
              case 'n' => out.write('\n')
              case 'r' => out.write('\r')
              case 't' => out.write('\t')
              case 'b' => out.write('\b')
              case 'f' => out.write('\f')
              case '\r' => if (pos < d.length && d(pos) == '\n') pos += 1
              case '\n' => ()
              case o if o >= '0' && o <= '7' =>
                var v = o - '0'
                var k = 1
                while (k < 3 && pos < d.length && d(pos) >= '0' && d(pos) <= '7') {
                  v = v * 8 + (d(pos) - '0'); pos += 1; k += 1
                }
                out.write(v & 0xff)
              case other => out.write(other)
            }
          case '(' => depth += 1; out.write('(')
          case ')' => depth -= 1; if (depth > 0) out.write(')')
          case other => out.write(other)
        }
      }
      PStr(out.toByteArray)
    }

    def hexString(): PStr = {
      pos += 1 // '<'
      val sb = new StringBuilder
      while (pos < d.length && d(pos) != '>') {
        val c = (d(pos) & 0xff).toChar
        if (!isWs(d(pos))) sb += c
        pos += 1
      }
      pos += 1 // '>'
      val hx = if (sb.length % 2 == 1) sb.toString + "0" else sb.toString
      val out = new Array[Byte](hx.length / 2)
      var i = 0
      while (i < out.length) {
        out(i) = Integer.parseInt(hx.substring(2 * i, 2 * i + 2), 16).toByte
        i += 1
      }
      PStr(out)
    }

    /** One object; resolves `N G R` reference syntax via lookahead. */
    def obj(): PObj = {
      skipWs()
      peek match {
        case '/' => name()
        case '(' => literalString()
        case '[' =>
          pos += 1
          val items = Vector.newBuilder[PObj]
          skipWs()
          while (peek != ']') { items += obj(); skipWs() }
          pos += 1
          PArr(items.result())
        case '<' =>
          if (pos + 1 < d.length && d(pos + 1) == '<') {
            pos += 2
            val m = Map.newBuilder[String, PObj]
            skipWs()
            while (!(peek == '>' && pos + 1 < d.length && d(pos + 1) == '>')) {
              val k = obj().asInstanceOf[PName].v
              m += k -> obj()
              skipWs()
            }
            pos += 2
            PDict(m.result())
          } else hexString()
        case _ =>
          val w = word()
          w match {
            case "true" => PBool(true)
            case "false" => PBool(false)
            case "null" => PNull
            case _ if w.nonEmpty && w.forall(c => c.isDigit) =>
              // possible "N G R" indirect reference
              val save = pos
              skipWs()
              val w2 = word()
              if (w2.nonEmpty && w2.forall(_.isDigit)) {
                skipWs()
                val w3 = word()
                if (w3 == "R") return PRef(w.toInt, w2.toInt)
              }
              pos = save
              PNum(w.toDouble)
            case _ if w.nonEmpty => PNum(w.toDouble) // signed/real
            case _ => throw new IllegalStateException(s"parse error at $pos")
          }
      }
    }
  }

  // ------------------------------------------------------------ filters
  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 4))
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        // inflate()==0 before finished() means the input ran dry (or a
        // preset dictionary is demanded): the data is truncated/corrupt —
        // surface it rather than returning a silent prefix
        else if (!inf.finished()) throw new IllegalStateException("truncated flate data")
      }
      out.toByteArray
    } finally inf.end()
  }

  /** LZWDecode (§7.4.4): TIFF-convention LZW — 256 = ClearTable, 257 =
    * EOD, 9→12-bit variable codes with EarlyChange=1 (width grows one code
    * early, the PDF default). Legacy pre-Flate PDFs compress content
    * streams with this.
    */
  private[graft] def lzwDecode(data: Array[Byte], earlyChange: Int = 1): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 3))
    val dict = new Array[Array[Byte]](4096)
    var dictSize = 258
    def resetDict(): Unit = {
      var i = 0
      while (i < 256) { dict(i) = Array(i.toByte); i += 1 }
      dictSize = 258
    }
    resetDict()
    var width = 9
    var bitBuf = 0L
    var bitCnt = 0
    var pos = 0
    var prev: Array[Byte] = null
    while (pos < data.length || bitCnt >= width) {
      while (bitCnt < width && pos < data.length) {
        bitBuf = (bitBuf << 8) | (data(pos) & 0xffL); bitCnt += 8; pos += 1
      }
      if (bitCnt < width) return out.toByteArray // trailing padding
      val code = ((bitBuf >> (bitCnt - width)) & ((1 << width) - 1)).toInt
      bitCnt -= width
      if (code == 256) { resetDict(); width = 9; prev = null }
      else if (code == 257) return out.toByteArray
      else {
        val entry: Array[Byte] =
          if (code < dictSize && dict(code) != null) dict(code)
          else if (code == dictSize && prev != null) prev :+ prev(0) // KwKwK case
          else throw new IllegalStateException(s"bad LZW code $code")
        out.write(entry, 0, entry.length)
        if (prev != null && dictSize < 4096) {
          dict(dictSize) = prev :+ entry(0)
          dictSize += 1
        }
        // EarlyChange: width bumps when the NEXT code could overflow
        if (dictSize + earlyChange >= (1 << width) && width < 12) width += 1
        prev = entry
      }
    }
    out.toByteArray
  }

  /** ASCIIHexDecode (§7.4.2): hex pairs, whitespace ignored, '>' ends. */
  private[graft] def asciiHexDecode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 1)
    var hi = -1
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = (data(i) & 0xff).toChar
      if (c == '>') done = true
      else if (!isWs(data(i))) {
        val v = Character.digit(c, 16)
        if (v < 0) throw new IllegalStateException(s"bad hex char '$c'")
        if (hi < 0) hi = v else { out.write((hi << 4) | v); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4) // odd count: final digit followed by 0
    out.toByteArray
  }

  /** ASCII85Decode (§7.4.3): base-85 groups, 'z' = four zero bytes, ends
    * with '~>'; a partial final group drops its padding bytes.
    */
  private[graft] def ascii85Decode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 4 / 5 + 4)
    var tuple = 0L
    var count = 0
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = (data(i) & 0xff).toChar
      if (c == '~') done = true
      else if (c == 'z' && count == 0) out.write(Array[Byte](0, 0, 0, 0), 0, 4)
      else if (!isWs(data(i))) {
        if (c < '!' || c > 'u') throw new IllegalStateException(s"bad a85 char '$c'")
        tuple = tuple * 85 + (c - '!')
        count += 1
        if (count == 5) {
          out.write(((tuple >> 24) & 0xff).toInt); out.write(((tuple >> 16) & 0xff).toInt)
          out.write(((tuple >> 8) & 0xff).toInt); out.write((tuple & 0xff).toInt)
          tuple = 0; count = 0
        }
      }
      i += 1
    }
    if (count > 0) {
      // a single leftover char cannot encode any byte (§7.4.3) — corrupt
      // input is an error, not silent truncation
      if (count == 1) throw new IllegalStateException("truncated ascii85 group")
      // pad with 'u' (84) and keep count-1 bytes
      var k = count
      while (k < 5) { tuple = tuple * 85 + 84; k += 1 }
      val bytes = Array(((tuple >> 24) & 0xff).toByte, ((tuple >> 16) & 0xff).toByte,
        ((tuple >> 8) & 0xff).toByte, (tuple & 0xff).toByte)
      out.write(bytes, 0, count - 1)
    }
    out.toByteArray
  }

  /** RunLengthDecode (§7.4.5): length byte n<128 copies n+1 literals,
    * n>128 repeats the next byte 257−n times, 128 = EOD.
    */
  private[graft] def runLengthDecode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 2)
    var i = 0
    while (i < data.length) {
      val n = data(i) & 0xff
      i += 1
      if (n == 128) return out.toByteArray
      else if (n < 128) {
        val len = n + 1
        if (i + len > data.length) throw new IllegalStateException("truncated RLE literal")
        out.write(data, i, len); i += len
      } else {
        if (i >= data.length) throw new IllegalStateException("truncated RLE run")
        val b = data(i); i += 1
        var k = 0
        val len = 257 - n
        while (k < len) { out.write(b & 0xff); k += 1 }
      }
    }
    out.toByteArray
  }

  /** PNG predictors (per RFC 2083 §6, referenced by PDF §7.4.4.4).
    * `rowLen` = ceil(Columns×Colors×BitsPerComponent/8) bytes/row and the
    * left/upper-left references step by `bpp` = Colors×BitsPerComponent/8
    * bytes (min 1) — xref streams use Colors=1/BPC=8 (Predictor 12 / Up),
    * but image rasters routinely carry Predictor 15 with Colors=3, where a
    * 1-byte left reference would silently shear every row.
    */
  private def pngPredict(data: Array[Byte], rowLen: Int, bpp: Int = 1): Array[Byte] = {
    val nRows = data.length / (rowLen + 1)
    val out = new Array[Byte](nRows * rowLen)
    var r = 0
    while (r < nRows) {
      val ft = data(r * (rowLen + 1)) & 0xff
      val src = r * (rowLen + 1) + 1
      val dst = r * rowLen
      var c = 0
      while (c < rowLen) {
        val raw = data(src + c) & 0xff
        val left = if (c >= bpp) out(dst + c - bpp) & 0xff else 0
        val up = if (r > 0) out(dst - rowLen + c) & 0xff else 0
        val ul = if (r > 0 && c >= bpp) out(dst - rowLen + c - bpp) & 0xff else 0
        val v = ft match {
          case 0 => raw
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + (left + up) / 2
          case 4 => // Paeth
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            raw + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          case other => throw new IllegalStateException(s"png filter $other")
        }
        out(dst + c) = (v & 0xff).toByte
        c += 1
      }
      r += 1
    }
    out
  }

  // ------------------------------------------------------------ document
  /** Either-style result so a bad file is a row-level failure, not a task
    * failure (same error-channel contract as the media codecs).
    */
  def pdfInfo(data: Array[Byte], password: Option[String] = None): Either[String, PdfInfo] =
    try Right(parseInfo(data, password))
    catch { case e: Exception => Left(s"pdf_parse_error: ${e.getClass.getSimpleName}: ${e.getMessage}") }

  private[extract] final class Doc(data: Array[Byte]) {
    /** obj num → either (file offset, generation) (Left) or
      * (objstm num, index) (Right). [[FreeEntry]] (offset -1) is the
      * free-entry tombstone: a newer revision's deletion must beat older
      * sections' stale entries.
      */
    private val xref = mutable.Map[Int, Either[(Long, Int), (Int, Int)]]()
    private val FreeEntry: Either[(Long, Int), (Int, Int)] = Left((-1L, 0))
    var trailer: Map[String, PObj] = Map.empty
    private val cache = mutable.Map[Int, PObj]()

    /** Set (by the entry points) after password verification: stream
      * payloads of direct objects decrypt under their carrier's key before
      * any filter runs; xref streams are exempt (never encrypted, and
      * parsed before the key exists anyway).
      */
    private[extract] var fileCrypto: Option[(Array[Byte], Boolean)] = None
    private val objStmCarried = mutable.Set[Int]()
    /** Objects inside object streams are NOT individually encrypted
      * (§7.5.7) — string decryption must skip them.
      */
    private[extract] def isFromObjStm(num: Int): Boolean = objStmCarried.contains(num)

    /** The xref generation of an in-use direct object (0 for ObjStm-carried
      * objects, whose implicit generation is 0 per §7.5.7). Per-object
      * crypto keys (Algorithm 1) hash this, so a gen>0 object must not be
      * keyed as gen 0.
      */
    private[extract] def genOf(num: Int): Int = xref.get(num) match {
      case Some(Left((off, g))) if off >= 0 => g
      case _ => 0
    }

    /** Every xref-section offset ever visited — /Prev chains AND /XRefStm
      * recursion both guard on it, so mutually-referencing sections in a
      * corrupt file terminate instead of overflowing the stack (a
      * StackOverflowError would escape the Exception-only failure-row
      * catch).
      */
    private val xrefSeen = mutable.Set[Long]()

    locally {
      val sxAt = lastIndexOf(data, "startxref".getBytes)
      if (sxAt < 0) throw new IllegalStateException("no startxref")
      val p = new Parser(data, sxAt + "startxref".length)
      p.skipWs()
      var off = p.word().toLong
      while (off > 0) off = readXrefSection(off.toInt)
    }

    private def lastIndexOf(hay: Array[Byte], needle: Array[Byte]): Int = {
      var i = hay.length - needle.length
      while (i >= 0) {
        var j = 0
        while (j < needle.length && hay(i + j) == needle(j)) j += 1
        if (j == needle.length) return i
        i -= 1
      }
      -1
    }

    /** Reads one xref section (classic table or xref stream) at `off`;
      * returns the /Prev offset or 0.
      */
    private def readXrefSection(off: Int): Long = {
      if (!xrefSeen.add(off.toLong)) return 0L // already visited: cycle/dup
      val p = new Parser(data, off)
      p.skipWs()
      if (p.peek == 'x') { // classic: "xref" then subsections then "trailer"
        p.expect("xref")
        var localTrailer: Map[String, PObj] = Map.empty
        // buffered, NOT installed inline: in hybrid-reference files
        // (§7.5.8.4) the classic table marks ObjStm-compressed objects as
        // FREE and their real type-2 entries live in the /XRefStm stream,
        // which takes precedence over this section's own entries — so the
        // stream must install first or its entries get tombstone-shadowed
        val sectionEntries = mutable.ArrayBuffer[(Int, Either[(Long, Int), (Int, Int)])]()
        var done = false
        while (!done) {
          p.skipWs()
          if (p.peek == 't') {
            p.expect("trailer")
            localTrailer = p.obj().asInstanceOf[PDict].m
            localTrailer.foreach { case (k, v) => if (!trailer.contains(k)) trailer += k -> v }
            done = true
          } else {
            val start = p.word().toInt
            p.skipWs()
            val count = p.word().toInt
            var n = 0
            while (n < count) {
              // entries are nominally fixed 20 bytes, but the 19-byte
              // single-EOL variant is a widespread real-world deviation —
              // parse tokens, not fixed slices
              p.skipWs()
              val offTok = p.word()
              p.skipWs()
              val genTok = p.word()
              p.skipWs()
              val ty = p.word()
              if (ty == "n") sectionEntries += ((start + n, Left((offTok.toLong, genTok.toInt))))
              else sectionEntries += ((start + n, FreeEntry)) // a newer revision freed it: tombstone beats older sections
              n += 1
            }
          }
        }
        // hybrid-reference files: THIS section's /XRefStm reads BEFORE the
        // section's own entries install (first-wins stays intact across
        // /Prev revisions because both go through getOrElseUpdate)
        localTrailer.get("XRefStm") match {
          case Some(PNum(v)) => readXrefSection(v.toInt)
          case _ => ()
        }
        sectionEntries.foreach { case (num, e) => xref.getOrElseUpdate(num, e) }
        localTrailer.get("Prev") match { case Some(PNum(v)) => v.toLong; case _ => 0L }
      } else { // 1.5+ xref STREAM: "N G obj << /Type /XRef ... >> stream"
        p.word(); p.skipWs(); p.word(); p.skipWs(); p.expect("obj")
        val stream = parseStreamAt(p)
        val dict = stream.dict.m
        dict.foreach { case (k, v) => if (!trailer.contains(k)) trailer += k -> v }
        val decoded = decode(stream)
        val w = dict("W").asInstanceOf[PArr].items.map(_.asInstanceOf[PNum].v.toInt)
        val size = dict("Size").asInstanceOf[PNum].v.toInt
        val index: Seq[(Int, Int)] = dict.get("Index") match {
          case Some(PArr(items)) =>
            items.map(_.asInstanceOf[PNum].v.toInt).grouped(2).map(g => (g(0), g(1))).toSeq
          case _ => Seq((0, size))
        }
        val rowLen = w.sum
        var rowAt = 0
        def field(row: Int, fi: Int): Long = {
          var o = rowAt + w.take(fi).sum
          var v = 0L
          var k = 0
          while (k < w(fi)) { v = (v << 8) | (decoded(o) & 0xffL); o += 1; k += 1 }
          v
        }
        index.foreach { case (start, count) =>
          var n = 0
          while (n < count && rowAt + rowLen <= decoded.length) {
            val ty = if (w(0) == 0) 1L else field(n, 0)
            val f2 = field(n, 1)
            val f3 = field(n, 2)
            val num = start + n
            if (!xref.contains(num)) ty match {
              case 1 => xref += num -> Left((f2, f3.toInt)) // f3 = generation
              case 2 => xref += num -> Right((f2.toInt, f3.toInt))
              case _ => xref += num -> FreeEntry // tombstone (see classic branch)
            }
            rowAt += rowLen
            n += 1
          }
        }
        dict.get("Prev") match { case Some(PNum(v)) => v.toLong; case _ => 0L }
      }
    }

    /** Parses `<< dict >> stream ... endstream` with the cursor after "obj". */
    private def parseStreamAt(p: Parser): PStream = {
      val dict = p.obj().asInstanceOf[PDict]
      p.skipWs()
      p.expect("stream")
      if (p.peek == '\r') p.pos += 1
      if (p.peek == '\n') p.pos += 1
      val len = numOf(resolve(dict.m("Length"))).toInt
      val payload = java.util.Arrays.copyOfRange(p.d, p.pos, p.pos + len)
      PStream(dict, payload)
    }

    /** Applies the /Filter chain (Flate/LZW with per-filter /DecodeParms
      * predictors, the ASCII and RunLength transports) after the file-key
      * decryption pass — which is SKIPPED for streams whose chain names a
      * /Crypt Identity filter: those bytes are stored plaintext (§7.4.10),
      * so decrypting them first would corrupt them.
      */
    private def decode(s: PStream, carrierNum: Option[Int] = None): Array[Byte] = {
      val filters: Seq[String] = resolve(s.dict.m.getOrElse("Filter", PNull)) match {
        case PName(n) => Seq(n)
        case PArr(items) => items.map(resolve(_)).collect { case PName(n) => n }
        case PNull => Nil
        case other => throw new IllegalStateException(s"filter $other")
      }
      // per-filter parms: a bare dict applies to a single-filter chain, an
      // array aligns positionally (§7.3.8.2)
      val parms: Seq[Option[PDict]] =
        resolve(s.dict.m.getOrElse("DecodeParms", s.dict.m.getOrElse("DP", PNull))) match {
          case d: PDict => Seq(Some(d))
          case PArr(items) => items.map(resolve(_)).map {
            case d: PDict => Some(d)
            case _ => None
          }
          case _ => Nil
        }
      def parmAt(i: Int): Option[PDict] = parms.lift(i).flatten
      val identityCrypt = {
        val ci = filters.indexOf("Crypt")
        ci >= 0 && parmAt(ci).forall(
          _.m.get("Name").map(resolve(_)).forall(_ == PName("Identity")))
      }
      var out = (fileCrypto, carrierNum) match {
        case (Some((k, aes)), Some(num)) if !identityCrypt =>
          PdfCrypt.decryptData(k, aes, num, genOf(num), s.data)
        case _ => s.data
      }
      def applyPredictor(b: Array[Byte], i: Int): Array[Byte] = parmAt(i) match {
        case Some(d) =>
          val pred = d.m.get("Predictor").map(v => numOf(v).toInt).getOrElse(1)
          if (pred >= 10) {
            val cols = d.m.get("Columns").map(v => numOf(v).toInt).getOrElse(1)
            val colors = d.m.get("Colors").map(v => numOf(v).toInt).getOrElse(1)
            val bitsPc = d.m.get("BitsPerComponent").map(v => numOf(v).toInt).getOrElse(8)
            val rowLen = (cols * colors * bitsPc + 7) / 8
            // libpng convention: the left-reference stride rounds UP
            // ((pixel_depth + 7) >> 3) — floor would shear 12-bit pixels
            val bpp = math.max(1, (colors * bitsPc + 7) / 8)
            pngPredict(b, rowLen, bpp)
          } else if (pred != 1) throw new IllegalStateException(s"predictor $pred")
          else b
        case None => b
      }
      filters.zipWithIndex.foreach {
        case ("FlateDecode" | "Fl", i) => out = applyPredictor(inflate(out), i)
        case ("LZWDecode" | "LZW", i) =>
          val early = parmAt(i).flatMap(_.m.get("EarlyChange").map(v => numOf(v).toInt))
            .getOrElse(1)
          out = applyPredictor(lzwDecode(out, early), i)
        case ("ASCIIHexDecode" | "AHx", _) => out = asciiHexDecode(out)
        case ("ASCII85Decode" | "A85", _) => out = ascii85Decode(out)
        case ("RunLengthDecode" | "RL", _) => out = runLengthDecode(out)
        case ("Crypt", _) => () // Identity pass-through (decryption skipped
                                // above); StdCF data decrypts under the
                                // file crypto like any other stream
        case (other, _) => throw new IllegalStateException(s"unsupported filter $other")
      }
      out
    }

    private def numOf(o: PObj): Double = resolve(o) match {
      case PNum(v) => v
      case other => throw new IllegalStateException(s"expected number, got $other")
    }

    /** Resolves indirect references (with memoization); plain objects pass
      * through. Depth-guarded against reference cycles.
      */
    def resolve(o: PObj, depth: Int = 0): PObj = o match {
      case PRef(num, _) =>
        if (depth > 32) throw new IllegalStateException("reference cycle")
        resolve(loadObj(num), depth + 1)
      case other => other
    }

    private def loadObj(num: Int): PObj = cache.getOrElseUpdate(num, {
      xref.get(num) match {
        case Some(Left((offset, _))) =>
          if (offset < 0) return PNull // freed in a newer revision
          val p = new Parser(data, offset.toInt)
          p.skipWs(); p.word(); p.skipWs(); p.word(); p.skipWs(); p.expect("obj")
          val o = p.obj()
          p.skipWs()
          if (p.peek == 's') { p.pos -= 0; parseStreamTail(p, o) } else o
        case Some(Right((stmNum, idx))) =>
          val stm = resolve(PRef(stmNum, 0)) match {
            case s: PStream => s
            case other => throw new IllegalStateException(s"objstm $stmNum is $other")
          }
          val decoded = decode(stm, carrierNum = Some(stmNum))
          objStmCarried += num
          val n = numOf(stm.dict.m("N")).toInt
          val first = numOf(stm.dict.m("First")).toInt
          val hp = new Parser(decoded, 0)
          var target = -1
          var i = 0
          while (i < n) {
            hp.skipWs(); val on = hp.word().toInt
            hp.skipWs(); val ooff = hp.word().toInt
            if (i == idx) { target = ooff; if (on != num) () }
            i += 1
          }
          if (target < 0) throw new IllegalStateException(s"objstm index $idx out of range")
          new Parser(decoded, first + target).obj()
        case None => PNull
      }
    })

    /** If the object is followed by `stream`, attach its payload. */
    private def parseStreamTail(p: Parser, o: PObj): PObj = o match {
      case dict: PDict =>
        val save = p.pos
        p.skipWs()
        val w = p.word()
        if (w == "stream") {
          if (p.peek == '\r') p.pos += 1
          if (p.peek == '\n') p.pos += 1
          val len = numOf(resolve(dict.m("Length"))).toInt
          PStream(dict, java.util.Arrays.copyOfRange(p.d, p.pos, p.pos + len))
        } else { p.pos = save; dict }
      case other => other
    }

    /** The object body at `num` WITHOUT resolving nested references — the
      * copy unit for [[PdfRewrite]].
      */
    private[extract] def rawObject(num: Int): PObj = loadObj(num)

    /** Resolves `ref` to a stream and returns its fully-decoded payload
      * (decrypted under the stream object's own key when the file is
      * encrypted, then de-filtered) — the content-stream read path for
      * [[PdfText]].
      */
    private[extract] def decodedStream(ref: PObj): Option[Array[Byte]] = resolve(ref) match {
      case s: PStream =>
        val num = ref match { case PRef(n, _) => Some(n); case _ => None }
        Some(decode(s, carrierNum = num))
      case _ => None
    }

    /** Resolves `ref` to a stream and returns its DECRYPTED but still
      * filter-compressed payload — the image-sidecar path: a /DCTDecode
      * stream's decrypted payload IS the JPEG file, byte-for-byte, no
      * raster codec needed.
      */
    private[extract] def decryptedPayload(ref: PObj): Option[(PDict, Array[Byte])] =
      resolve(ref) match {
        case s: PStream =>
          val num = ref match { case PRef(n, _) => Some(n); case _ => None }
          val data = (fileCrypto, num) match {
            case (Some((k, aes)), Some(n)) => PdfCrypt.decryptData(k, aes, n, genOf(n), s.data)
            case _ => s.data
          }
          Some((s.dict, data))
        case _ => None
      }

    def dict(o: PObj): Map[String, PObj] = resolve(o) match {
      case PDict(m) => m
      case PStream(PDict(m), _) => m
      case PNull => Map.empty
      case other => throw new IllegalStateException(s"expected dict, got $other")
    }
  }

  /** PDF text string → java String (§7.9.2.2): UTF-16BE with BOM, else
    * UTF-8 with BOM (PDF 2.0), else PDFDocEncoding (≈ Latin-1 for the
    * printable range — the same approximation pypdf applies).
    */
  def decodeTextString(bytes: Array[Byte]): String =
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xfe && (bytes(1) & 0xff) == 0xff)
      new String(bytes, 2, bytes.length - 2, StandardCharsets.UTF_16BE)
    else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xef && (bytes(1) & 0xff) == 0xbb && (bytes(2) & 0xff) == 0xbf)
      new String(bytes, 3, bytes.length - 3, StandardCharsets.UTF_8)
    else new String(bytes, StandardCharsets.ISO_8859_1)

  private[extract] sealed trait KeyResult
  private[extract] case object NotEncrypted extends KeyResult
  /** empty password failed and none was provided */
  private[extract] case object Locked extends KeyResult
  /** Non-Standard security handlers (public-key etc.) */
  private[extract] case object UnsupportedHandler extends KeyResult
  private[extract] final case class Opened(
      key: Array[Byte], aes: Boolean, encryptMetadata: Boolean = true) extends KeyResult

  /** Standard-handler RC4 (V=1/2) password resolution — the reference's
    * semantics (pdf_utils.py:205-225): a provided password verifies or
    * THROWS "Incorrect password"; otherwise the empty user password is
    * tried (the owner-locked case).
    */
  private[extract] def encryptionKey(doc: Doc, password: Option[String]): KeyResult =
    doc.trailer.get("Encrypt") match {
      case None => NotEncrypted
      case Some(encRef) =>
        val enc = doc.dict(encRef)
        def num(k: String, dflt: Double): Double = enc.get(k).map(doc.resolve(_)) match {
          case Some(PNum(v)) => v
          case _ => dflt
        }
        val v = num("V", 0).toInt
        if (!enc.get("Filter").contains(PName("Standard"))) return UnsupportedHandler
        def strOf(k: String): Array[Byte] = enc.get(k).map(doc.resolve(_)) match {
          case Some(PStr(b)) => b
          case _ => Array.emptyByteArray
        }
        if (v == 5) {
          // AES-256 (AESV3, ISO 32000-2 §7.6.4): SHA-2 password hash
          // (Algorithm 2.B for R6, plain SHA-256 for the withdrawn R5),
          // /UE//OE unwrap the 32-byte FILE key — no per-object keys.
          // Passwords are UTF-8, capped at 127 bytes (§7.6.4.3.2).
          val rV5 = num("R", 6).toInt
          val u = strOf("U"); val ue = strOf("UE")
          val o = strOf("O"); val oe = strOf("OE")
          val em = enc.get("EncryptMetadata").map(doc.resolve(_)) match {
            case Some(PBool(b)) => b
            case _ => true
          }
          def open(pw: Array[Byte]): Option[Array[Byte]] =
            PdfCrypt.verifyUserPasswordV5(pw, u, ue, rV5)
              .orElse(PdfCrypt.verifyOwnerPasswordV5(pw, o, oe, u, rV5))
          return password match {
            case Some(pw) =>
              open(pw.getBytes(StandardCharsets.UTF_8).take(127)) match {
                case Some(k) => Opened(k, aes = true, em)
                case None => throw new IllegalStateException("Incorrect password for encrypted PDF")
              }
            case None =>
              open(Array.emptyByteArray) match {
                case Some(k) => Opened(k, aes = true, em)
                case None => Locked
              }
          }
        }
        // V1/V2 = RC4; V4 dispatches on the /StdCF crypt filter: AESV2
        // (AES-128-CBC) or V2 (RC4 under crypt-filter framing).
        val aes = v match {
          case 1 | 2 => false
          case 4 =>
            val cfm = for {
              cf <- enc.get("CF").map(doc.resolve(_))
              std <- cf match { case PDict(m) => m.get("StdCF").map(doc.resolve(_)); case _ => None }
              n <- std match { case PDict(m) => m.get("CFM").map(doc.resolve(_)); case _ => None }
            } yield n
            cfm match {
              case Some(PName("AESV2")) => true
              case Some(PName("V2")) => false
              case _ => return UnsupportedHandler
            }
          case _ => return UnsupportedHandler
        }
        val o = doc.resolve(enc("O")).asInstanceOf[PStr].bytes
        val u = doc.resolve(enc("U")).asInstanceOf[PStr].bytes
        // /P is often serialized as an unsigned 32-bit value (e.g.
        // 4294967292 for -4); Double→Int SATURATES at Int.MaxValue, so go
        // through Long to get two's-complement wrapping
        val p = num("P", -1).toLong.toInt
        val r = num("R", 2).toInt
        val keyLen =
          if (v == 1) 5
          else if (v == 4) num("Length", 128).toInt / 8
          else num("Length", 40).toInt / 8
        val encryptMetadata = enc.get("EncryptMetadata").map(doc.resolve(_)) match {
          case Some(PBool(b)) => b
          case _ => true
        }
        val id0 = doc.trailer.get("ID").map(doc.resolve(_)) match {
          case Some(PArr(items)) if items.nonEmpty =>
            doc.resolve(items.head).asInstanceOf[PStr].bytes
          case _ => Array.emptyByteArray
        }
        def verify(pw: Array[Byte]) =
          PdfCrypt.verifyUserPassword(pw, o, u, p, id0, r, keyLen, encryptMetadata)
        password match {
          case Some(pw) =>
            verify(pw.getBytes(StandardCharsets.ISO_8859_1)) match {
              case Some(k) => Opened(k, aes, encryptMetadata)
              case None => throw new IllegalStateException("Incorrect password for encrypted PDF")
            }
          case None =>
            verify(Array.emptyByteArray) match {
              case Some(k) => Opened(k, aes, encryptMetadata) // empty-password docs open as not-encrypted
              case None => Locked
            }
        }
    }

  private def parseInfo(data: Array[Byte], password: Option[String]): PdfInfo = {
    val doc = new Doc(data)
    val fileKey: Option[(Array[Byte], Boolean)] = encryptionKey(doc, password) match {
      case NotEncrypted => None
      case Opened(k, aes, _) => Some((k, aes))
      case Locked | UnsupportedHandler =>
        // the reference's basic encrypted shape (pdf_utils.py:217-225)
        return PdfInfo(0, data.length.toLong, isEncrypted = true, Nil, "", "")
    }
    doc.fileCrypto = fileKey // ObjStm payloads decrypt from here on
    val root = doc.dict(doc.trailer("Root"))
    val dims = Vector.newBuilder[PageDim]
    var count = 0
    val visited = mutable.Set[PObj]()
    def walk(node: PObj, inheritedMb: Option[PObj]): Unit = {
      if (!visited.add(node)) throw new IllegalStateException("page tree cycle")
      val m = doc.dict(node)
      val mb = m.get("MediaBox").orElse(inheritedMb)
      m.get("Type") match {
        case Some(PName("Page")) =>
          count += 1
          val box = doc.resolve(mb.getOrElse(throw new IllegalStateException("page without MediaBox")))
          val nums = box.asInstanceOf[PArr].items.map(v =>
            doc.resolve(v).asInstanceOf[PNum].v)
          dims += PageDim(math.abs(nums(2) - nums(0)), math.abs(nums(3) - nums(1)))
        case _ =>
          doc.resolve(m.getOrElse("Kids", PArr(Vector.empty))) match {
            case PArr(kids) => kids.foreach(walk(_, mb))
            case _ => ()
          }
      }
    }
    walk(root("Pages"), None)
    val infoRef = doc.trailer.get("Info")
    val info = infoRef.map(doc.dict).getOrElse(Map.empty)
    // strings are encrypted with the per-OBJECT key of their carrier;
    // the generation comes from the XREF entry (authoritative), not the
    // trailer's reference syntax
    val infoNum = infoRef match {
      case Some(PRef(n, _)) => n
      case _ => 0
    }
    def text(key: String): String = info.get(key).map(doc.resolve(_)) match {
      case Some(PStr(b)) =>
        val plain = fileKey match {
          case Some((k, aes)) if !doc.isFromObjStm(infoNum) =>
            PdfCrypt.decryptData(k, aes, infoNum, doc.genOf(infoNum), b)
          case _ => b // ObjStm-carried strings are already plaintext (§7.5.7)
        }
        decodeTextString(plain)
      case _ => ""
    }
    PdfInfo(count, data.length.toLong, isEncrypted = false, dims.result(), text("Title"), text("Author"))
  }

  // ------------------------------------------------------------ writer
  /** Minimal deterministic PDF writer (classic xref, one empty content
    * stream per page) — the encode side of the round-trip fixtures, same
    * pattern as `WavCodec.encodeWav`. Strings are written as literals with
    * the required escapes; non-Latin-1 titles get the UTF-16BE BOM form.
    */
  def buildPdf(pages: Seq[(Double, Double)], title: String, author: String): Array[Byte] =
    buildPdf(pages, title, author, None)

  /** `encryptWith = Some((userPassword, r))` (r = 2 → RC4-40/V1, r = 3 →
    * RC4-128/V2, r = 4 → AES-128/V4/AESV2, r = 5/6 → AES-256/V5/AESV3)
    * emits the Standard-handler /Encrypt dict with O/U (+OE/UE/Perms for
    * V5) entries from `PdfCrypt` and encrypts the Info strings — the
    * encode side of the decryption round-trip tests.
    */
  def buildPdf(
      pages: Seq[(Double, Double)],
      title: String,
      author: String,
      encryptWith: Option[(String, Int)]): Array[Byte] = {
    require(pages.nonEmpty, "at least one page")
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    val offsets = mutable.ArrayBuffer[Int]()
    def beginObj(num: Int): Unit = { offsets += out.size(); w(s"$num 0 obj\n") }

    def fmt(v: Double): String =
      if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
      // PDF numbers have no exponent syntax (§7.3.3): plain decimal only
      else java.math.BigDecimal.valueOf(v).stripTrailingZeros.toPlainString
    def pdfString(s: String): String = {
      val needsUtf16 = s.exists(_ > 0xff)
      if (needsUtf16) {
        val bytes = s.getBytes(StandardCharsets.UTF_16BE)
        "<FEFF" + bytes.map(b => f"${b & 0xff}%02X").mkString + ">"
      } else
        "(" + s.flatMap {
          case '(' => "\\("
          case ')' => "\\)"
          case '\\' => "\\\\"
          case c => c.toString
        } + ")"
    }

    // encryption state when requested: r=2/3 RC4, r=4 AES-128/AESV2,
    // r=5/6 AES-256/AESV3 (V5: /UE//OE carry the wrapped 32-byte file key)
    val enc = encryptWith.map { case (userPwd, r) =>
      val id0 = PdfCrypt.md5(s"$title/$author/${pages.length}".getBytes(StandardCharsets.UTF_8))
      val perm = -44
      if (r >= 5) {
        val pw = userPwd.getBytes(StandardCharsets.UTF_8).take(127)
        val fileKey = PdfCrypt.md5("v5-key-a".getBytes, pw) ++
          PdfCrypt.md5("v5-key-b".getBytes, pw) // deterministic 32 bytes
        val (u, ue, o, oe) = PdfCrypt.computeV5Entries(pw, pw, fileKey, r)
        (fileKey, id0, o, u, perm, r, Some((oe, ue)))
      } else {
        val pw = userPwd.getBytes(StandardCharsets.ISO_8859_1)
        val keyLen = if (r == 2) 5 else 16
        val oEntry = PdfCrypt.computeO(pw, pw, r, keyLen)
        val key = PdfCrypt.fileKey(pw, oEntry, perm, id0, r, keyLen)
        val uRaw = PdfCrypt.computeU(key, id0, r)
        val uEntry = if (r == 2) uRaw else uRaw ++ new Array[Byte](16) // pad to 32
        (key, id0, oEntry, uEntry, perm, r, None)
      }
    }
    def hex(b: Array[Byte]): String = "<" + b.map(x => f"${x & 0xff}%02X").mkString + ">"
    def textStringBytes(s: String): Array[Byte] =
      if (s.exists(_ > 0xff)) Array(0xfe.toByte, 0xff.toByte) ++ s.getBytes(StandardCharsets.UTF_16BE)
      else s.getBytes(StandardCharsets.ISO_8859_1)
    /** Info strings: encrypted under the carrier object's key (RC4, or
      * AES-CBC when r = 4), hex-emitted.
      */
    def infoString(s: String, objNum: Int): String = enc match {
      case Some((key, _, _, _, _, r, _)) if r >= 5 =>
        hex(PdfCrypt.encryptAesFileKey(key, textStringBytes(s)))
      case Some((key, _, _, _, _, r, _)) if r == 4 =>
        hex(PdfCrypt.encryptAes(key, objNum, 0, textStringBytes(s)))
      case Some((key, _, _, _, _, _, _)) =>
        hex(PdfCrypt.encryptString(key, objNum, 0, textStringBytes(s)))
      case None => pdfString(s)
    }

    w("%PDF-1.4\n")
    val nPages = pages.length
    // object numbering: 1 = Catalog, 2 = Pages, 3..(2+n) = Page, then one
    // shared empty content stream, then Info (then Encrypt when present)
    val contentNum = 3 + nPages
    val infoNum = contentNum + 1
    val encNum = infoNum + 1
    beginObj(1); w("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    beginObj(2)
    w(s"<< /Type /Pages /Count $nPages /Kids [ ${(0 until nPages).map(i => s"${3 + i} 0 R").mkString(" ")} ] >>\nendobj\n")
    pages.zipWithIndex.foreach { case ((pw, ph), i) =>
      beginObj(3 + i)
      w(s"<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 ${fmt(pw)} ${fmt(ph)} ] /Contents $contentNum 0 R >>\nendobj\n")
    }
    beginObj(contentNum); w("<< /Length 0 >>\nstream\n\nendstream\nendobj\n")
    beginObj(infoNum)
    w(s"<< /Title ${infoString(title, infoNum)} /Author ${infoString(author, infoNum)} >>\nendobj\n")
    enc.foreach { case (key, _, oEntry, uEntry, perm, r, v5) =>
      beginObj(encNum)
      val vLen =
        if (r >= 5)
          "/V 5 /Length 256 /CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen /Length 32 >> >> /StmF /StdCF /StrF /StdCF"
        else if (r == 2) "/V 1"
        else if (r == 4)
          "/V 4 /Length 128 /CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen /Length 16 >> >> /StmF /StdCF /StrF /StdCF"
        else "/V 2 /Length 128"
      val v5Entries = v5.map { case (oe, ue) =>
        s" /OE ${hex(oe)} /UE ${hex(ue)} /Perms ${hex(PdfCrypt.computePerms(key, perm, encryptMetadata = true))}"
      }.getOrElse("")
      w(s"<< /Filter /Standard $vLen /R $r /O ${hex(oEntry)} /U ${hex(uEntry)} /P $perm$v5Entries >>\nendobj\n")
    }
    val xrefAt = out.size()
    val n = offsets.length + 1
    w(s"xref\n0 $n\n")
    w("0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    val encTrailer = enc match {
      case Some((_, id0, _, _, _, _, _)) => s" /Encrypt $encNum 0 R /ID [ ${hex(id0)} ${hex(id0)} ]"
      case None => ""
    }
    w(s"trailer\n<< /Size $n /Root 1 0 R /Info $infoNum 0 R$encTrailer >>\nstartxref\n$xrefAt\n"); w("%%EOF\n")
    out.toByteArray
  }
}
