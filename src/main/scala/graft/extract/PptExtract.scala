package graft.extract

import scala.collection.mutable.ArrayBuffer

/** Legacy PowerPoint binary (.ppt) text extraction ([MS-PPT], public spec)
  * over the [[CfbExtract]] container — the reference routes
  * `application/vnd.ms-powerpoint` through MarkItDown
  * (`markitdown_provider/provider.py:41`). The PowerPoint Document stream
  * is a record tree (8-byte headers: recVerAndInstance, recType, recLen LE;
  * containers have recVer 0xF); text lives in TextCharsAtom (0x0FA0,
  * UTF-16LE) / TextBytesAtom (0x0FA8, low-byte Unicode) records, each
  * governed by the preceding TextHeaderAtom (0x0F9F) whose type 0/6 marks
  * title text. One Slide container (0x03EE) = one page; title text becomes
  * a `# ` heading span, everything else body paragraphs (atom-internal \r
  * separates paragraphs). Shapes/styling records carry no text and are
  * skipped structurally. Title from the SummaryInformation property set,
  * falling back to the first slide title.
  */
object PptExtract {

  final case class PptSlide(title: String, blocks: Seq[String])
  final case class PptDoc(title: String, slides: Seq[PptSlide])

  private val SlideContainer = 0x03EE
  private val SlideListWithText = 0x0FF0
  private val SlidePersistAtom = 0x03F3
  private val TextHeaderAtom = 0x0F9F
  private val TextCharsAtom = 0x0FA0
  private val TextBytesAtom = 0x0FA8

  private def u16(d: Array[Byte], p: Int): Int =
    (d(p) & 0xff) | ((d(p + 1) & 0xff) << 8)
  private def u32(d: Array[Byte], p: Int): Long =
    (d(p) & 0xffL) | ((d(p + 1) & 0xffL) << 8) |
      ((d(p + 2) & 0xffL) << 16) | ((d(p + 3) & 0xffL) << 24)

  def extract(bytes: Array[Byte]): Either[String, PptDoc] =
    CfbExtract.readStreams(bytes).flatMap { streams =>
      try {
        val ppt = streams.getOrElse("PowerPoint Document",
          throw new IllegalStateException("no PowerPoint Document stream"))
        val slides = ArrayBuffer[PptSlide]()
        // real PowerPoint keeps placeholder text OUTSIDE the slide
        // drawings, in DocumentContainer > SlideListWithText, grouped by
        // SlidePersistAtom in slide order (the drawings reference it via
        // OutlineTextRefAtom); both carriers are read, SLWT groups filling
        // slides whose drawing carried no text (positional mapping — the
        // persist-id indirection is 1:1 in practice, documented subset)
        val slwtGroups = ArrayBuffer[ArrayBuffer[(Boolean, String)]]()

        def decodeChars(body: Int, bodyEnd: Int): String =
          new String(ppt, body, bodyEnd - body,
            java.nio.charset.StandardCharsets.UTF_16LE)
        def decodeBytes(body: Int, bodyEnd: Int): String = {
          // low bytes of UTF-16: each byte IS the code point
          val sb = new StringBuilder(bodyEnd - body)
          var k = body
          while (k < bodyEnd) { sb += (ppt(k) & 0xff).toChar; k += 1 }
          sb.toString
        }

        // walk one container's records; `sink` gathers (isTitle, text) —
        // null at the top level, a slide buffer inside Slide containers,
        // and the current SLWT group inside SlideListWithText
        def walk(start: Int, end: Int, sink: ArrayBuffer[(Boolean, String)],
            inSlwt: Boolean): Unit = {
          var p = start
          var pendingTitle = false
          while (p + 8 <= end) {
            val verInst = u16(ppt, p)
            val recType = u16(ppt, p + 2)
            val len = u32(ppt, p + 4).toInt
            val body = p + 8
            val bodyEnd = math.min(body + len, end)
            if (len < 0 || body > end) return // truncated record: stop
            val isContainer = (verInst & 0xF) == 0xF
            if (recType == SlideContainer && sink == null && !inSlwt) {
              val texts = ArrayBuffer[(Boolean, String)]()
              walk(body, bodyEnd, texts, inSlwt = false)
              val title = texts.collectFirst { case (true, t) if t.nonEmpty => t }
              val blocks = texts.collect { case (false, t) if t.nonEmpty => t }
              slides += PptSlide(title.getOrElse(""),
                blocks.flatMap(_.split('\r').map(DocxExtract.collapseWs).filter(_.nonEmpty)).toSeq)
            } else if (recType == SlideListWithText && sink == null) {
              walk(body, bodyEnd, null, inSlwt = true)
            } else if (isContainer) {
              walk(body, bodyEnd, sink, inSlwt)
            } else if (inSlwt && recType == SlidePersistAtom) {
              slwtGroups += ArrayBuffer()
            } else if (sink != null || (inSlwt && slwtGroups.nonEmpty)) {
              def put(isTitle: Boolean, text: String): Unit =
                if (sink != null) sink += ((isTitle, text))
                else slwtGroups.last += ((isTitle, text))
              recType match {
                case TextHeaderAtom =>
                  val txType = if (len >= 4) u32(ppt, body).toInt else -1
                  pendingTitle = txType == 0 || txType == 6
                case TextCharsAtom =>
                  put(pendingTitle, decodeChars(body, bodyEnd))
                  pendingTitle = false
                case TextBytesAtom =>
                  put(pendingTitle, decodeBytes(body, bodyEnd))
                  pendingTitle = false
                case _ => ()
              }
            }
            p = body + len
          }
        }
        walk(0, ppt.length, null, inSlwt = false)

        def groupSlide(g: Seq[(Boolean, String)]): PptSlide = {
          val title = g.collectFirst { case (true, t) if t.nonEmpty => t }
          val blocks = g.collect { case (false, t) if t.nonEmpty => t }
          PptSlide(title.getOrElse(""),
            blocks.flatMap(_.split('\r').map(DocxExtract.collapseWs).filter(_.nonEmpty)).toSeq)
        }
        if (slides.isEmpty) slwtGroups.foreach(g => slides += groupSlide(g.toSeq))
        else slides.indices.foreach { idx =>
          if (slides(idx).title.isEmpty && slides(idx).blocks.isEmpty &&
              idx < slwtGroups.length)
            slides(idx) = groupSlide(slwtGroups(idx).toSeq)
        }
        require(slides.nonEmpty, "no Slide containers or SlideListWithText")
        val psTitle = streams.get("\u0005SummaryInformation")
          .map(CfbExtract.summaryTitle).getOrElse("")
        val title = if (psTitle.nonEmpty) psTitle
          else slides.collectFirst { case s if s.title.nonEmpty => s.title }.getOrElse("")
        Right(PptDoc(title, slides.toSeq))
      } catch {
        case e: Exception =>
          Left(s"ppt_parse_error: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }

  /** Same span grammar as [[OfficeExtract.pptxSpans]]: per slide a
    * page_break, the title as `# ` heading, then body paragraphs.
    */
  def toSpans(doc: PptDoc): Seq[graft.model.Span] = {
    import graft.model.{Span, SpanKind}
    val out = ArrayBuffer[Span]()
    doc.slides.zipWithIndex.foreach { case (slide, i) =>
      out += Span(SpanKind.PageBreak, s"""{"next_page":${i + 1}}""", "", out.length)
      if (slide.title.nonEmpty)
        out += Span(SpanKind.Text, "# " + slide.title, "", out.length)
      slide.blocks.foreach(b => out += Span(SpanKind.Text, b, "", out.length))
    }
    out.toSeq
  }

  // ------------------------------------------------------------ writer
  /** Deterministic .ppt fixture: a Document container wrapping one Slide
    * container per slide; titles as TextHeaderAtom(type 0) + TextCharsAtom
    * (UTF-16LE), body paragraphs as TextHeaderAtom(type 1) + TextBytesAtom
    * — both decode paths exercised in every deck. With
    * `viaSlideListWithText` the text moves where REAL PowerPoint puts
    * placeholder text: a SlideListWithText container (SlidePersistAtom per
    * slide) inside the Document container, with EMPTY Slide containers.
    */
  def buildPpt(title: String, slides: Seq[(String, Seq[String])],
      viaSlideListWithText: Boolean = false): Array[Byte] = {
    require(slides.nonEmpty, "at least one slide")
    def rec(verInst: Int, recType: Int, body: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(body.length + 8)
      def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      w16(verInst); w16(recType)
      val len = body.length.toLong
      out.write((len & 0xff).toInt); out.write(((len >> 8) & 0xff).toInt)
      out.write(((len >> 16) & 0xff).toInt); out.write(((len >> 24) & 0xff).toInt)
      out.write(body)
      out.toByteArray
    }
    def cat(parts: Array[Byte]*): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream(); parts.foreach(o.write); o.toByteArray
    }
    def headerAtom(txType: Int): Array[Byte] =
      rec(0x0000, TextHeaderAtom, Array(
        (txType & 0xff).toByte, ((txType >> 8) & 0xff).toByte, 0, 0))

    def textRecs(st: String, blocks: Seq[String]): Array[Byte] = {
      val titleRecs =
        if (st.isEmpty) Array.emptyByteArray
        else cat(headerAtom(0),
          rec(0x0000, TextCharsAtom,
            st.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)))
      val bodyRecs = blocks.map { b =>
        require(b.forall(_ < 256), "TextBytesAtom is low-byte text")
        cat(headerAtom(1),
          rec(0x0000, TextBytesAtom,
            b.map(c => c.toByte).toArray))
      }
      cat((titleRecs +: bodyRecs): _*)
    }
    val docStream =
      if (viaSlideListWithText) {
        val groups = slides.map { case (st, blocks) =>
          cat(rec(0x0000, SlidePersistAtom, new Array[Byte](20)), textRecs(st, blocks))
        }
        val slwt = rec(0x000F, SlideListWithText, cat(groups: _*))
        val emptySlides = slides.map(_ => rec(0x000F, SlideContainer, Array.emptyByteArray))
        rec(0x000F, 0x03E8, cat((slwt +: emptySlides): _*))
      } else {
        val slideRecs = slides.map { case (st, blocks) =>
          rec(0x000F, SlideContainer, textRecs(st, blocks))
        }
        rec(0x000F, 0x03E8, cat(slideRecs: _*)) // DocumentContainer
      }
    CfbExtract.build(Seq(
      "PowerPoint Document" -> docStream,
      "\u0005SummaryInformation" -> CfbExtract.buildSummary(title)))
  }
}
