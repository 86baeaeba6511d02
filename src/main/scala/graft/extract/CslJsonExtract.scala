package graft.extract

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** CSL-JSON bibliography → markdown reference list.
  *
  * In the reference's supported surface: `application/csl+json` sits in
  * its pandoc-supported MIME registry (`mime_types.py:83`); the reference
  * delegates to pandoc (citeproc). CSL-JSON (the citeproc interchange
  * format, public spec) is an array of item objects; the fields used:
  *
  *   - `id` → list key (else `ref-N`); `type` → kind
  *   - `author`: array of `{family, given}` (or `literal`), rendered
  *     `Family, Given` joined `, `
  *   - `issued.date-parts[0][0]` (or `issued.literal`) → year
  *   - `title` → title; `container-title` → venue
  *
  * Items normalize into the shared bibliography render shape
  * ([[BibtexExtract.render]]). A root that is not a non-empty array
  * throws (failure row). Parsed with Jackson (Spark's own runtime).
  */
object CslJsonExtract {

  private val mapper = new ObjectMapper()

  def toMarkdown(json: String): String = {
    val root = mapper.readTree(json)
    if (root == null || !root.isArray || root.size() == 0)
      throw new IllegalArgumentException("csl-json: not a non-empty array")
    val items = root.elements().asScala.toSeq
    items.zipWithIndex.map { case (it, i) =>
      val key = text(it, "id").getOrElse(s"ref-${i + 1}")
      val kind = text(it, "type").getOrElse("entry")
      val authors = Option(it.get("author")).filter(_.isArray).toSeq
        .flatMap(_.elements().asScala)
        .flatMap { a =>
          val lit = text(a, "literal")
          val fam = text(a, "family")
          val giv = text(a, "given")
          lit.orElse((fam, giv) match {
            case (Some(f), Some(g)) => Some(s"$f, $g")
            case (Some(f), None) => Some(f)
            case (None, Some(g)) => Some(g)
            case _ => None
          })
        }
      val year = Option(it.get("issued")).flatMap { d =>
        val parts = d.get("date-parts")
        if (parts != null && parts.isArray && parts.size() > 0 &&
            parts.get(0).isArray && parts.get(0).size() > 0)
          Some(parts.get(0).get(0).asText(""))
        else text(d, "literal").map(_.takeWhile(_.isDigit)).filter(_.nonEmpty)
      }
      BibtexExtract.render(kind, key, Map(
        "author" -> authors.mkString(", "),
        "year" -> year.getOrElse(""),
        "title" -> text(it, "title").getOrElse(""),
        "journal" -> text(it, "container-title").getOrElse("")))
    }.mkString("\n")
  }

  private def text(n: JsonNode, field: String): Option[String] = {
    val v = n.get(field)
    if (v == null || v.isNull) None
    else Some(v.asText("")).filter(_.nonEmpty)
  }
}
