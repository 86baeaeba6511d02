package graft.extract

import scala.collection.mutable

/** Embedded TrueType font-program decode — the wild-PDF slice: subsetted
  * fonts shipped as /FontFile2 frequently drop /ToUnicode and /Encoding, so
  * their codes are meaningless without the font's own `cmap` and `post`
  * tables. Built from the PUBLIC sfnt structure (Apple TrueType Reference
  * Manual / OpenType spec ISO 14496-22: offset table + table directory,
  * `cmap` subtable formats 0/4/6, `post` formats 1.0/2.0 with the standard
  * 258-name Macintosh glyph order) — NOT a port of any font library. The
  * reference reads such PDFs through its external ML providers
  * (marker_provider/provider.py:37-126); here the decode is in-engine.
  *
  * Decode contract (mirrored EXACTLY by `tools/pdf_text_oracle.py`, the
  * independent second implementation — change BOTH or neither):
  *   1. code → glyph via the first present cmap subtable in priority order
  *      (1,0) → (3,0) → (3,1); a (3,0) symbol subtable is probed at `code`
  *      then `0xF000|code`; glyph 0 (.notdef) is a failure;
  *   2. glyph → text via the inverse Unicode cmap — (3,1) if present, else
  *      any (0,*) — taking the SMALLEST code point mapped to the glyph;
  *   3. else glyph → name via `post` (format 1.0 = standard order identity;
  *      format 2.0 = index < 258 → standard name, else the embedded Pascal
  *      string), then name → text via the AGL subset
  *      ([[Encodings.glyphChar]], incl. uniXXXX/uXXXX and single-char
  *      names); U+FFFD means failure (fall through to the caller's chain).
  * Unsupported cmap formats and malformed tables are skipped, never thrown:
  * a bad font degrades to the pre-round-5 behavior.
  */
object TrueType {

  /** Standard Macintosh glyph ordering (258 names) per the public TrueType
    * `post` table spec; one whitespace-joined constant so the Python oracle
    * can carry the byte-identical string.
    */
  private val MacNamesStr: String =
    ".notdef .null nonmarkingreturn space exclam quotedbl numbersign dollar percent ampersand quotesingle parenleft parenright asterisk plus comma hyphen period slash zero one two three four five six seven eight nine colon semicolon less equal greater question at A B C D E F G H I J K L M N O P Q R S T U V W X Y Z bracketleft backslash bracketright asciicircum underscore grave a b c d e f g h i j k l m n o p q r s t u v w x y z braceleft bar braceright asciitilde Adieresis Aring Ccedilla Eacute Ntilde Odieresis Udieresis aacute agrave acircumflex adieresis atilde aring ccedilla eacute egrave ecircumflex edieresis iacute igrave icircumflex idieresis ntilde oacute ograve ocircumflex odieresis otilde uacute ugrave ucircumflex udieresis dagger degree cent sterling section bullet paragraph germandbls registered copyright trademark acute dieresis notequal AE Oslash infinity plusminus lessequal greaterequal yen mu partialdiff summation product pi integral ordfeminine ordmasculine Omega ae oslash questiondown exclamdown logicalnot radical florin approxequal Delta guillemotleft guillemotright ellipsis nonbreakingspace Agrave Atilde Otilde OE oe endash emdash quotedblleft quotedblright quoteleft quoteright divide lozenge ydieresis Ydieresis fraction currency guilsinglleft guilsinglright fi fl daggerdbl periodcentered quotesinglbase quotedblbase perthousand Acircumflex Ecircumflex Aacute Edieresis Egrave Iacute Icircumflex Idieresis Igrave Oacute Ocircumflex apple Ograve Uacute Ucircumflex Ugrave dotlessi circumflex tilde macron breve dotaccent ring cedilla hungarumlaut ogonek caron Lslash lslash Scaron scaron Zcaron zcaron brokenbar Eth eth Yacute yacute Thorn thorn minus multiply onesuperior twosuperior threesuperior onehalf onequarter threequarters franc Gbreve gbreve Idotaccent Scedilla scedilla Cacute cacute Ccaron ccaron dcroat"

  private[extract] val MacGlyphNames: Array[String] = {
    val a = MacNamesStr.split(' ')
    require(a.length == 258, s"standard glyph order must have 258 names, got ${a.length}")
    a
  }

  /** Parsed decode maps; see the object scaladoc for the resolution order. */
  final class Embedded(
      private val codeToGlyph: Map[Int, Int],
      private val symbolCmap: Boolean,
      private val glyphToUni: Map[Int, Int],
      private val glyphNames: Map[Int, String]) {

    /** code → text, or None when this font program cannot resolve it. */
    def decode(code: Int): Option[String] = {
      val g = codeToGlyph.get(code)
        .orElse(if (symbolCmap) codeToGlyph.get(0xF000 | code) else None)
      g.filter(_ != 0).flatMap { glyph =>
        glyphToUni.get(glyph)
          .map(cp => new String(Character.toChars(cp)))
          .orElse(glyphNames.get(glyph).map(Encodings.glyphChar)
            .filter(s => s.nonEmpty && s != "�"))
      }
    }
  }

  // ------------------------------------------------------------ parser
  private final class R(val d: Array[Byte]) {
    def u8(p: Int): Int = d(p) & 0xff
    def u16(p: Int): Int = ((d(p) & 0xff) << 8) | (d(p + 1) & 0xff)
    def s16(p: Int): Int = u16(p).toShort.toInt
    def u32(p: Int): Long =
      ((d(p) & 0xffL) << 24) | ((d(p + 1) & 0xffL) << 16) |
        ((d(p + 2) & 0xffL) << 8) | (d(p + 3) & 0xffL)
    def tag(p: Int): String = new String(d, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
  }

  /** Never throws: a malformed program yields None (caller falls back). */
  def parse(data: Array[Byte]): Option[Embedded] =
    try parseUnsafe(data) catch { case _: Exception => None }

  private def parseUnsafe(data: Array[Byte]): Option[Embedded] = {
    val r = new R(data)
    if (data.length < 12) return None
    val version = r.u32(0)
    // 0x00010000, 'true', 'OTTO' (CFF glyphs still carry cmap/post)
    if (version != 0x00010000L && version != 0x74727565L && version != 0x4f54544fL)
      return None
    val numTables = r.u16(4)
    var cmapOff = -1; var postOff = -1
    var i = 0
    while (i < numTables) {
      val p = 12 + 16 * i
      if (p + 16 > data.length) return None
      r.tag(p) match {
        case "cmap" => cmapOff = r.u32(p + 8).toInt
        case "post" => postOff = r.u32(p + 8).toInt
        case _ => ()
      }
      i += 1
    }
    if (cmapOff < 0 && postOff < 0) return None

    // -------- cmap: collect (platform, encoding) → code→glyph map
    var mac10: Map[Int, Int] = null      // (1,0)
    var win30: Map[Int, Int] = null      // (3,0) symbol
    var win31: Map[Int, Int] = null      // (3,1) unicode BMP
    var uni0x: Map[Int, Int] = null      // (0,*) unicode
    if (cmapOff >= 0 && cmapOff + 4 <= data.length) {
      val n = r.u16(cmapOff + 2)
      var k = 0
      while (k < n) {
        val e = cmapOff + 4 + 8 * k
        val plat = r.u16(e); val enc = r.u16(e + 2)
        val sub = cmapOff + r.u32(e + 4).toInt
        val m = parseCmapSubtable(r, sub)
        if (m != null) {
          if (plat == 1 && enc == 0 && mac10 == null) mac10 = m
          else if (plat == 3 && enc == 0 && win30 == null) win30 = m
          else if (plat == 3 && enc == 1 && win31 == null) win31 = m
          else if (plat == 0 && uni0x == null) uni0x = m
        }
        k += 1
      }
    }
    val (codeToGlyph, symbol) =
      if (mac10 != null) (mac10, false)
      else if (win30 != null) (win30, true)
      else if (win31 != null) (win31, false)
      else if (uni0x != null) (uni0x, false)
      else (Map.empty[Int, Int], false)

    // -------- inverse unicode cmap: glyph → smallest code point
    val uniSrc = if (win31 != null) win31 else uni0x
    val glyphToUni: Map[Int, Int] =
      if (uniSrc == null) Map.empty
      else {
        val inv = mutable.Map[Int, Int]()
        uniSrc.foreach { case (cp, g) =>
          if (g != 0 && (!inv.contains(g) || cp < inv(g))) inv(g) = cp
        }
        inv.toMap
      }

    // -------- post: glyph → name
    val glyphNames: Map[Int, String] =
      if (postOff < 0 || postOff + 34 > data.length) Map.empty
      else r.u32(postOff) match {
        case 0x00010000L =>
          MacGlyphNames.zipWithIndex.map { case (nm, g) => g -> nm }.toMap
        case 0x00020000L =>
          val numGlyphs = r.u16(postOff + 32)
          val idx = new Array[Int](numGlyphs)
          var g = 0
          while (g < numGlyphs) { idx(g) = r.u16(postOff + 34 + 2 * g); g += 1 }
          // Pascal-string pool follows the index array
          val custom = mutable.ArrayBuffer[String]()
          var p = postOff + 34 + 2 * numGlyphs
          while (p < data.length && custom.length < numGlyphs) {
            val len = r.u8(p)
            if (p + 1 + len > data.length) p = data.length
            else {
              custom += new String(data, p + 1, len,
                java.nio.charset.StandardCharsets.US_ASCII)
              p += 1 + len
            }
          }
          idx.zipWithIndex.flatMap { case (ix, g2) =>
            if (ix < 258) Some(g2 -> MacGlyphNames(ix))
            else custom.lift(ix - 258).map(g2 -> _)
          }.toMap
        case _ => Map.empty // 2.5/3.0: no names (3.0 is explicit "no names")
      }

    if (codeToGlyph.isEmpty && glyphToUni.isEmpty && glyphNames.isEmpty) None
    else Some(new Embedded(codeToGlyph, symbol, glyphToUni, glyphNames))
  }

  /** Formats 0/4/6; anything else → null (subtable skipped). */
  private def parseCmapSubtable(r: R, off: Int): Map[Int, Int] = {
    if (off < 0 || off + 2 > r.d.length) return null
    r.u16(off) match {
      case 0 =>
        if (off + 6 + 256 > r.d.length) return null
        (0 until 256).iterator.map(c => c -> r.u8(off + 6 + c))
          .filter(_._2 != 0).toMap
      case 4 =>
        val segX2 = r.u16(off + 6)
        val segs = segX2 / 2
        val endP = off + 14
        val startP = endP + segX2 + 2
        val deltaP = startP + segX2
        val rangeP = deltaP + segX2
        if (rangeP + segX2 > r.d.length) return null
        val out = mutable.Map[Int, Int]()
        // iteration cap: a crafted font can declare thousands of
        // overlapping full-range segments (segs × 65536 ≈ 2e9 loops — a
        // CPU DoS inside the per-row kernel); a legitimate BMP cmap needs
        // ≤ 65536 total code visits, so 2^20 is generous. Past it, keep
        // what is mapped (bounded-work degradation, mirrored by the
        // Python oracle).
        val iterCap = 1 << 20
        var iters = 0
        var s = 0
        while (s < segs && iters < iterCap) {
          val end = r.u16(endP + 2 * s)
          val start = r.u16(startP + 2 * s)
          val delta = r.s16(deltaP + 2 * s)
          val ro = r.u16(rangeP + 2 * s)
          if (start != 0xffff && start <= end) {
            var c = start
            while (c <= end && iters < iterCap) {
              iters += 1
              val g =
                if (ro == 0) (c + delta) & 0xffff
                else {
                  val gp = rangeP + 2 * s + ro + 2 * (c - start)
                  if (gp + 2 > r.d.length) 0
                  else {
                    val raw = r.u16(gp)
                    if (raw == 0) 0 else (raw + delta) & 0xffff
                  }
                }
              if (g != 0) out(c) = g
              c += 1
            }
          }
          s += 1
        }
        out.toMap
      case 6 =>
        val first = r.u16(off + 6)
        val count = r.u16(off + 8)
        if (off + 10 + 2 * count > r.d.length) return null
        (0 until count).iterator.map(i => (first + i) -> r.u16(off + 10 + 2 * i))
          .filter(_._2 != 0).toMap
      case _ => null
    }
  }

  // ------------------------------------------------------------ writer
  /** Deterministic minimal TrueType program for fixtures: a `cmap` with a
    * (1,0) format-0/6 code table and/or a (3,1) format-4 Unicode table,
    * plus a `post` 2.0 name table. Only what the decode chain reads —
    * `glyf`/`head`/`maxp` are irrelevant to text extraction and omitted
    * (the parser requires only the directory, cmap, post).
    */
  def build(
      codeToGlyph: Seq[(Int, Int)] = Nil,
      glyphNames: Map[Int, String] = Map.empty,
      unicodeToGlyph: Seq[(Int, Int)] = Nil,
      macCmapFormat: Int = 6): Array[Byte] = {
    require(macCmapFormat == 0 || macCmapFormat == 6, "fixture cmap format 0 or 6")

    def be16(v: Int): Array[Byte] = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def cat(parts: Array[Byte]*): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream(); parts.foreach(o.write); o.toByteArray
    }

    val sub10: Array[Byte] =
      if (codeToGlyph.isEmpty) null
      else if (macCmapFormat == 0) {
        val ids = new Array[Byte](256)
        codeToGlyph.foreach { case (c, g) =>
          require(c < 256 && g < 256, "format 0 is byte-to-byte")
          ids(c) = g.toByte
        }
        cat(be16(0), be16(262), be16(0), ids)
      } else {
        val sorted = codeToGlyph.sortBy(_._1)
        val first = sorted.head._1
        val count = sorted.last._1 - first + 1
        val ids = new Array[Int](count)
        sorted.foreach { case (c, g) => ids(c - first) = g }
        cat(be16(6), be16(10 + 2 * count), be16(0), be16(first), be16(count),
          cat(ids.map(be16).toSeq: _*))
      }

    val sub31: Array[Byte] =
      if (unicodeToGlyph.isEmpty) null
      else {
        // format 4 with one segment per contiguous code run + the required
        // terminal 0xFFFF segment; glyphs via idRangeOffset=0 (delta form)
        // only when the run's (glyph − code) is constant — build one
        // segment PER entry for simplicity (fixtures are tiny)
        val entries = unicodeToGlyph.sortBy(_._1)
        val segs = entries.map { case (c, g) => (c, c, (g - c) & 0xffff) } :+
          ((0xffff, 0xffff, 1))
        val segCount = segs.length
        val segX2 = segCount * 2
        val sr = {
          var x = 1; while (x * 2 <= segCount) x *= 2
          x * 2
        }
        val entrySel = (math.log(sr / 2.0) / math.log(2.0)).toInt
        val body = cat(
          cat(segs.map(s => be16(s._2)): _*), be16(0),
          cat(segs.map(s => be16(s._1)): _*),
          cat(segs.map(s => be16(s._3)): _*),
          cat(segs.map(_ => be16(0)): _*))
        cat(be16(4), be16(16 + body.length - 2), be16(0),
          be16(segX2), be16(sr), be16(entrySel), be16(segX2 - sr), body)
      }

    val subs = Seq(
      Option(sub10).map((1, 0, _)),
      Option(sub31).map((3, 1, _))).flatten
    val cmapHeader = cat(be16(0), be16(subs.length))
    var subOff = 4 + 8 * subs.length
    val encRecs = subs.map { case (p, e, b) =>
      val rec = cat(be16(p), be16(e), be32(subOff.toLong))
      subOff += b.length
      rec
    }
    val cmap = cat((cmapHeader +: encRecs) ++ subs.map(_._3): _*)

    val post: Array[Byte] = {
      val maxG = (glyphNames.keys ++ Seq(0)).max
      val numGlyphs = maxG + 1
      val customNames = mutable.ArrayBuffer[String]()
      val idx = (0 until numGlyphs).map { g =>
        glyphNames.get(g) match {
          case Some(nm) =>
            val std = MacGlyphNames.indexOf(nm)
            if (std >= 0) std
            else { customNames += nm; 258 + customNames.length - 1 }
          case None => 0 // .notdef
        }
      }
      cat(be32(0x00020000L), be32(0), be16(0), be16(0), be32(0),
        be32(0), be32(0), be32(0), be32(0),
        be16(numGlyphs),
        cat(idx.map(be16): _*),
        cat(customNames.map { nm =>
          val b = nm.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
          cat(Array(b.length.toByte), b)
        }.toSeq: _*))
    }

    val tables = Seq(("cmap", cmap), ("post", post))
    val numTables = tables.length
    var off = 12 + 16 * numTables
    val dir = tables.map { case (tag, b) =>
      val entry = cat(tag.getBytes(java.nio.charset.StandardCharsets.US_ASCII),
        be32(0), be32(off.toLong), be32(b.length.toLong))
      off += b.length
      entry
    }
    cat((cat(be32(0x00010000L), be16(numTables), be16(16 * 2), be16(1), be16(16))
      +: dir) ++ tables.map(_._2): _*)
  }
}
