package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Loads the reference converters' golden snapshots
  * (/root/reference/tests/__snapshots__/test_output.ambr, syrupy format) at
  * test runtime — the data, never the code, is the verification target per
  * the north rule ("span-sequence equality vs the reference converters'
  * golden fixtures").
  *
  * Syrupy .ambr grammar: `# name: <key>` then a `'''`-fenced block indented
  * by two spaces, terminated by `# ---`.
  */
object AmbrGoldens {
  val AmbrPath = "/root/reference/tests/__snapshots__/test_output.ambr"

  lazy val available: Boolean = Files.exists(Paths.get(AmbrPath))

  /** name → golden string (dedented). */
  lazy val goldens: Map[String, String] = {
    if (!available) Map.empty
    else {
      val lines = Files.readAllLines(Paths.get(AmbrPath)).asScala.toVector
      val out = Map.newBuilder[String, String]
      var i = 0
      while (i < lines.length) {
        val l = lines(i)
        if (l.startsWith("# name: ")) {
          val name = l.stripPrefix("# name: ").trim
          i += 1
          if (i < lines.length && lines(i).trim == "'''") {
            i += 1
            val buf = Vector.newBuilder[String]
            while (i < lines.length && lines(i).trim != "'''") {
              buf += lines(i).stripPrefix("  ")
              i += 1
            }
            out += name -> buf.result().mkString("\n")
          }
        }
        i += 1
      }
      out.result()
    }
  }

  /** Provider → markdown golden content (frontmatter kept; Markdown.parse
    * skips it).
    */
  lazy val markdownGoldens: Map[String, String] =
    goldens.collect {
      case (name, content) if name.endsWith("[markdown_content]") =>
        name.stripPrefix("test_").stripSuffix("_export[markdown_content]") -> content
    }

  private val FmRe = """(?s)^---\n(.*?)\n---\n""".r

  def frontmatterField(golden: String, field: String): Option[String] =
    FmRe.findFirstMatchIn(golden).flatMap { m =>
      m.group(1).split('\n').collectFirst {
        case l if l.startsWith(s"$field: ") => l.stripPrefix(s"$field: ").trim
      }
    }

  def body(golden: String): String = FmRe.replaceFirstIn(golden, "")
}
