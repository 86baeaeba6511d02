package graft.extract

import scala.collection.mutable.ArrayBuffer

/** RIS (Research Information Systems) bibliography → markdown reference
  * list.
  *
  * In the reference's supported surface: `application/x-research-info-
  * systems` sits in its pandoc-supported MIME registry (`mime_types.py:
  * 98`); the reference delegates to pandoc (citeproc). RIS is a flat
  * line-tag format (public spec): each line `TAG  - value`, records open
  * with `TY  - <type>` and close with `ER  -`. Normalized into the shared
  * bibliography render shape ([[BibtexExtract.render]]):
  *
  *   - authors: every `AU`/`A1` line, joined `, ` in file order
  *   - year: `PY`/`Y1` (first 4-digit prefix — RIS dates are
  *     `YYYY/MM/DD/other`)
  *   - title: `TI`/`T1`; venue: `JO`/`T2`/`JF`
  *   - the list key is `ID` when present, else `ref-N` by position
  *   - unknown tags skip; a file with no `TY` record throws (failure row)
  */
object RisExtract {

  private val TagLine = """^([A-Z][A-Z0-9])\s\s-\s?(.*)$""".r

  def toMarkdown(src: String): String = {
    val recs = ArrayBuffer.empty[String]
    var fields: scala.collection.mutable.Map[String, ArrayBuffer[String]] = null
    var kind = ""
    def close(): Unit = if (fields != null) {
      def first(tags: String*): Option[String] =
        tags.iterator.flatMap(t => fields.get(t).flatMap(_.headOption)).
          find(_.nonEmpty)
      val authors = (fields.getOrElse("AU", ArrayBuffer.empty) ++
        fields.getOrElse("A1", ArrayBuffer.empty)).filter(_.nonEmpty)
      val year = first("PY", "Y1").map(_.takeWhile(_.isDigit)).filter(_.nonEmpty)
      val key = first("ID").getOrElse(s"ref-${recs.size + 1}")
      val slots = Map(
        "author" -> authors.mkString(", "),
        "year" -> year.getOrElse(""),
        "title" -> first("TI", "T1").getOrElse(""),
        "journal" -> first("JO", "T2", "JF").getOrElse(""))
      recs += BibtexExtract.render(kind.toLowerCase, key, slots)
      fields = null
    }
    src.split("\n", -1).foreach { raw =>
      val line = raw.stripSuffix("\r")
      line match {
        case TagLine("TY", v) =>
          close()
          kind = v.trim
          fields = scala.collection.mutable.Map.empty
        case TagLine("ER", _) => close()
        case TagLine(tag, v) if fields != null =>
          fields.getOrElseUpdate(tag, ArrayBuffer.empty) += v.trim
        case _ => () // continuation/garbage lines outside a record skip
      }
    }
    close()
    if (recs.isEmpty) throw new IllegalArgumentException("ris: no TY records")
    recs.mkString("\n")
  }
}
