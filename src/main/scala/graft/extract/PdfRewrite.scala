package graft.extract

import java.nio.charset.StandardCharsets
import scala.collection.mutable

/** Byte-level PDF re-emission over the [[PdfBytes]] object model — the
  * analogs of the reference's `extract_pdf_pages` (pdf_utils.py:138-184,
  * pypdf PdfWriter page subset) and `decrypt_pdf` (pdf_utils.py:90-135,
  * decrypt + re-emit). Both copy the transitive object closure from their
  * roots into a fresh classic-xref document with renumbered objects;
  * Standard-handler files (RC4, AES-128/AESV2, AES-256/AESV3) are
  * decrypted during the copy (strings and stream payloads under each
  * carrier object's key, or the file key for V5), so the output never
  * carries /Encrypt.
  *
  * Faithfulness bounds (documented, not faked): per-object decryption keys
  * use each object's XREF generation (gen>0 objects key correctly); the
  * OUTPUT renumbers everything to generation 0 as any fresh writer does.
  * /Annots and /Outlines are dropped on page extraction so links cannot
  * drag excluded pages into the closure (pypdf rewrites such references
  * instead). When /EncryptMetadata is false the XMP /Metadata stream is
  * stored plaintext and is copied verbatim, as is any stream whose /Filter
  * chain carries a /Crypt Identity filter (§7.4.10).
  */
object PdfRewrite {

  import PdfBytes._

  /** The reference's `extract_pdf_pages`: keep the given 0-based page
    * indices (in document order). Errors are Left — bad indices, locked or
    * unsupported-encryption documents, parse failures.
    */
  def extractPages(
      data: Array[Byte],
      keep: Seq[Int],
      password: Option[String] = None): Either[String, Array[Byte]] =
    try {
      val doc = new Doc(data)
      val (key, encryptMeta) = PdfBytes.encryptionKey(doc, password) match {
        case NotEncrypted => (None, true)
        case Opened(k, aes, em) => (Some((k, aes)), em)
        case Locked => return Left("pdf_encrypted: password required")
        case UnsupportedHandler => return Left("pdf_encrypted: unsupported handler")
      }
      doc.fileCrypto = key // ObjStm payloads decrypt from here on
      val pages = collectPages(doc, forExtraction = true)
      // out-of-range indices are SILENTLY skipped — exact reference parity
      // (pdf_utils.py:172-176: `if 0 <= i < len(reader.pages)`)
      val kept = keep.filter(i => i >= 0 && i < pages.length).map(pages)
      Right(emit(doc, kept, key, encryptMeta = encryptMeta))
    } catch {
      case e: Exception => Left(s"pdf_parse_error: ${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  /** The reference's `decrypt_pdf`: unencrypted input returns the ORIGINAL
    * bytes unchanged (pdf_utils.py:104-106); an encrypted document that the
    * password (or the empty password) opens is re-emitted decrypted; a
    * wrong password is an error.
    */
  def decryptPdf(data: Array[Byte], password: String): Either[String, Array[Byte]] =
    try {
      val doc = new Doc(data)
      PdfBytes.encryptionKey(doc, if (password.isEmpty) None else Some(password)) match {
        case NotEncrypted => Right(data)
        case Opened(k, aes, em) =>
          doc.fileCrypto = Some((k, aes))
          Right(emit(doc, collectPages(doc, forExtraction = false), Some((k, aes)),
            includeInfo = true, encryptMeta = em))
        case Locked => Left("pdf_encrypted: password required")
        case UnsupportedHandler => Left("pdf_encrypted: unsupported handler")
      }
    } catch {
      case e: Exception => Left(s"pdf_parse_error: ${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  /** One kept page: its source ref (for per-object decryption keys) and the
    * page dict with inheritable attributes MATERIALIZED (MediaBox,
    * Resources, Rotate, CropBox walk down from /Pages nodes — §7.7.3.4) and
    * tree/link plumbing removed.
    */
  private final case class SrcPage(num: Int, dict: Map[String, PObj])

  private val Inheritable = Seq("MediaBox", "Resources", "Rotate", "CropBox")
  /** Page extraction drops link/structure plumbing so references cannot
    * drag EXCLUDED pages into the closure; decryption keeps every page, so
    * only the tree pointer is replaced and annotations survive (the
    * reference's decrypt preserves them too).
    */
  private val ExtractionDropped = Set("Parent", "Annots", "StructParents", "B", "Tabs")
  private val DecryptDropped = Set("Parent")

  private def collectPages(doc: Doc, forExtraction: Boolean): Vector[SrcPage] = {
    val dropped = if (forExtraction) ExtractionDropped else DecryptDropped
    val out = Vector.newBuilder[SrcPage]
    val visited = mutable.Set[PObj]()
    def walk(node: PObj, inherited: Map[String, PObj]): Unit = {
      if (!visited.add(node)) throw new IllegalStateException("page tree cycle")
      val m = doc.dict(node)
      val inh = inherited ++ Inheritable.flatMap(k => m.get(k).map(k -> _))
      m.get("Type") match {
        case Some(PName("Page")) =>
          val num = node match {
            case PRef(n, _) => n
            case _ => throw new IllegalStateException("page is not an indirect object")
          }
          val materialized = (m -- dropped) ++
            Inheritable.flatMap(k => inh.get(k).map(k -> _))
          out += SrcPage(num, materialized)
        case _ =>
          doc.resolve(m.getOrElse("Kids", PArr(Vector.empty))) match {
            case PArr(kids) => kids.foreach(walk(_, inh))
            case _ => ()
          }
      }
    }
    walk(doc.dict(doc.trailer("Root"))("Pages"), Map.empty)
    out.result()
  }

  /** True when the stream's /Filter chain includes a /Crypt filter whose
    * /DecodeParms /Name is Identity (or absent — Identity is the §7.4.10
    * default): such a stream's bytes are stored UNencrypted even in an
    * encrypted document.
    */
  private def hasIdentityCryptFilter(doc: Doc, m: Map[String, PObj]): Boolean = {
    val filters: Seq[String] = m.get("Filter").map(doc.resolve(_)) match {
      case Some(PName(n)) => Seq(n)
      case Some(PArr(items)) => items.map(doc.resolve(_)).collect { case PName(n) => n }
      case _ => Nil
    }
    val cryptIdx = filters.indexOf("Crypt")
    if (cryptIdx < 0) return false
    val parms: Seq[PObj] = m.get("DecodeParms").orElse(m.get("DP")).map(doc.resolve(_)) match {
      case Some(PArr(items)) => items.map(doc.resolve(_))
      case Some(d: PDict) => Seq(d)
      case _ => Nil
    }
    parms.lift(cryptIdx) match {
      case Some(PDict(dm)) => dm.get("Name").forall(doc.resolve(_) == PName("Identity"))
      case _ => true // no parms dict ⇒ Identity default
    }
  }

  private def refsOf(o: PObj, acc: mutable.Set[Int]): Unit = o match {
    case PRef(n, _) => acc += n
    case PArr(items) => items.foreach(refsOf(_, acc))
    case PDict(m) => m.values.foreach(refsOf(_, acc))
    case PStream(PDict(m), _) => m.values.foreach(refsOf(_, acc))
    case _ => ()
  }

  /** Builds the output document: fresh Catalog + Pages, the kept pages, and
    * the transitive closure of everything they reference, renumbered.
    */
  private def emit(
      doc: Doc,
      kept: Seq[SrcPage],
      key: Option[(Array[Byte], Boolean)],
      includeInfo: Boolean = false,
      encryptMeta: Boolean = true): Array[Byte] = {
    // decryptPdf (includeInfo) preserves the document XMP /Metadata stream
    // through the rebuilt Catalog; page extraction matches the reference's
    // fresh-PdfWriter behavior and drops it
    val rootMetadataNum: Option[Int] = doc.dict(doc.trailer("Root")).get("Metadata") match {
      case Some(PRef(n, _)) => Some(n)
      case _ => None
    }
    val keptMetadataNum: Option[Int] = if (includeInfo) rootMetadataNum else None
    // /EncryptMetadata false ⇒ the XMP /Metadata stream is stored PLAINTEXT
    // in an otherwise-encrypted file — copy it verbatim
    val plainMetadataNum: Option[Int] = if (encryptMeta) None else rootMetadataNum
    // decryptPdf preserves the (decrypted) Info dict; page extraction
    // matches the reference's fresh-PdfWriter behavior and drops it
    val infoNum: Option[Int] = if (includeInfo) doc.trailer.get("Info") match {
      case Some(PRef(n, _)) => Some(n)
      case _ => None
    } else None
    // transitive closure over source object numbers
    val needed = mutable.LinkedHashSet[Int]()
    val queue = mutable.Queue[Int]()
    infoNum.foreach { n => needed.add(n); queue += n }
    keptMetadataNum.foreach { n => if (needed.add(n)) queue += n }
    kept.foreach { p =>
      val acc = mutable.Set[Int]()
      refsOf(PDict(p.dict), acc)
      acc.foreach { n => if (needed.add(n)) queue += n }
    }
    while (queue.nonEmpty) {
      val n = queue.dequeue()
      val acc = mutable.Set[Int]()
      refsOf(doc.rawObject(n), acc)
      acc.foreach { m => if (needed.add(m)) queue += m }
    }
    // new numbering: 1=Catalog, 2=Pages, 3..=kept pages, then the closure
    val renumber = mutable.Map[Int, Int]()
    kept.zipWithIndex.foreach { case (p, i) => renumber(p.num) = 3 + i }
    var next = 3 + kept.length
    needed.toSeq.sorted.foreach { n =>
      if (!renumber.contains(n)) { renumber(n) = next; next += 1 }
    }

    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    val offsets = mutable.ArrayBuffer[(Int, Int)]() // (newNum, offset)
    def beginObj(num: Int): Unit = { offsets += ((num, out.size())); w(s"$num 0 obj\n") }

    def fmt(v: Double): String =
      if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
      // PDF numbers have no exponent syntax (§7.3.3): plain decimal only
      else java.math.BigDecimal.valueOf(v).stripTrailingZeros.toPlainString
    def nameEsc(s: String): String = s.flatMap { c =>
      if (c <= ' ' || c == '#' || "()<>[]{}/%".contains(c)) f"#${c.toInt}%02X" else c.toString
    }
    def hexStr(b: Array[Byte]): String = "<" + b.map(x => f"${x & 0xff}%02X").mkString + ">"

    /** Serializes a copied object; `srcNum` drives string decryption. */
    def ser(o: PObj, srcNum: Int): String = o match {
      case PNull => "null"
      case PBool(b) => if (b) "true" else "false"
      case PNum(v) => fmt(v)
      case PName(n) => "/" + nameEsc(n)
      case PStr(b) =>
        val plain = key match {
          case Some((k, aes)) if !doc.isFromObjStm(srcNum) =>
            PdfCrypt.decryptData(k, aes, srcNum, doc.genOf(srcNum), b)
          case _ => b // ObjStm-carried strings are already plaintext (§7.5.7)
        }
        hexStr(plain)
      case PRef(n, _) =>
        s"${renumber.getOrElse(n, throw new IllegalStateException(s"dangling ref $n"))} 0 R"
      case PArr(items) => items.map(ser(_, srcNum)).mkString("[ ", " ", " ]")
      case PDict(m) => serDict(m, srcNum)
      case PStream(PDict(m), raw) =>
        // plaintext-in-encrypted-file carve-outs: the unencrypted XMP
        // /Metadata stream (EncryptMetadata false) and any stream whose
        // /Filter chain names a /Crypt filter with the Identity CF (§7.4.10
        // — the Identity filter means "data not encrypted")
        val storedPlain =
          plainMetadataNum.contains(srcNum) || hasIdentityCryptFilter(doc, m)
        val payload = key match {
          case Some((k, aes)) if !storedPlain =>
            PdfCrypt.decryptData(k, aes, srcNum, doc.genOf(srcNum), raw)
          case _ => raw // streams cannot live in ObjStm, so no other skip here
        }
        val dict = m.updated("Length", PNum(payload.length.toDouble))
        serDict(dict, srcNum) + "\nstream\n" +
          new String(payload, StandardCharsets.ISO_8859_1) + "\nendstream"
    }
    def serDict(m: Map[String, PObj], srcNum: Int): String =
      m.toSeq.sortBy(_._1).map { case (k, v) => s"/${nameEsc(k)} ${ser(v, srcNum)}" }
        .mkString("<< ", " ", " >>")

    w("%PDF-1.4\n")
    beginObj(1)
    val catMeta = keptMetadataNum.map(n => s" /Metadata ${renumber(n)} 0 R").getOrElse("")
    w(s"<< /Type /Catalog /Pages 2 0 R$catMeta >>\nendobj\n")
    beginObj(2)
    w(s"<< /Type /Pages /Count ${kept.length} /Kids [ ${kept.indices.map(i => s"${3 + i} 0 R").mkString(" ")} ] >>\nendobj\n")
    kept.zipWithIndex.foreach { case (p, i) =>
      beginObj(3 + i)
      // Parent was dropped at collection; point it at the NEW pages node
      val body = serDict(p.dict, p.num)
      w(body.stripSuffix(" >>") + " /Parent 2 0 R >>" + "\nendobj\n")
    }
    needed.toSeq.sorted.foreach { n =>
      if (renumber(n) >= 3 + kept.length) { // not a kept page (those are emitted above)
        beginObj(renumber(n))
        w(ser(doc.rawObject(n), n) + "\nendobj\n")
      }
    }
    val xrefAt = out.size()
    val total = offsets.length + 1
    val byNum = offsets.sortBy(_._1)
    w(s"xref\n0 $total\n")
    w("0000000000 65535 f \n")
    byNum.foreach { case (_, o) => w(f"$o%010d 00000 n \n") }
    val infoEntry = infoNum.map(n => s" /Info ${renumber(n)} 0 R").getOrElse("")
    w(s"trailer\n<< /Size $total /Root 1 0 R$infoEntry >>\nstartxref\n$xrefAt\n"); w("%%EOF\n")
    out.toByteArray
  }
}
