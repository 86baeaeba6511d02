package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL hygiene operators for a web-scale training pipeline (public
  * technique: the URL/domain filtering stage of C4, RefinedWeb §3.1 and
  * Dolma — drop documents whose source domain sits on a blocklist before
  * any expensive text work runs).
  *
  * Everything is codegen'd built-ins (`parse_url`, `split`,
  * `element_at`); the blocklist join broadcasts by construction, so the
  * filter is a map-side stage with zero shuffle of the corpus.
  */
object WebOps {

  /** Host part of a URL (`https://a.b.com/p?q` → `a.b.com`). */
  def urlHost(url: Column): Column = parse_url(url, lit("HOST"))

  /** The common multi-label public suffixes: when a host's last two
    * labels land here, the registered domain needs THREE labels
    * (`badsite.co.uk`, not `co.uk`). A full public-suffix-list lookup is
    * the production refinement; this built-in core covers the major
    * ccTLD second-level registries so a blocklist entry like
    * `badsite.co.uk` is not silently unmatched.
    */
  val MultiLabelSuffixes: Set[String] = Set(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gen.in", "firm.in",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "co.za", "org.za", "net.za", "com.mx", "org.mx",
    "co.nz", "net.nz", "org.nz", "com.ar", "com.tr", "com.tw",
    "co.kr", "or.kr", "com.sg", "com.hk", "com.my", "co.id",
    "com.eg", "com.sa", "co.th", "com.vn", "com.ph", "com.pk")

  /** Registered domain approximation: the last two host labels — or the
    * last three when the final two form a known multi-label public
    * suffix ([[MultiLabelSuffixes]]). Single-label hosts pass through
    * unchanged (try_element_at past the head is null — ANSI-safe — and
    * concat_ws skips nulls).
    */
  def registeredDomain(url: Column): Column = {
    val parts = split(urlHost(url), "\\.")
    val lastTwo =
      concat_ws(".", try_element_at(parts, lit(-2)), try_element_at(parts, lit(-1)))
    when(lastTwo.isInCollection(MultiLabelSuffixes),
      concat_ws(".", try_element_at(parts, lit(-3)), lastTwo))
      .otherwise(lastTwo)
  }

  /** Add `host` and `domain` columns derived from `urlCol`. */
  def withUrlParts(docs: DataFrame, urlCol: String = "url"): DataFrame =
    docs
      .withColumn("host", urlHost(col(urlCol)))
      .withColumn("domain", registeredDomain(col(urlCol)))

  /** Drop every document whose registered domain appears in `blocklist`
    * (a one-column DataFrame of domains). The blocklist is broadcast —
    * at 100 TB the corpus never shuffles for this filter; each task
    * probes a local hash map.
    */
  def filterBlockedDomains(
      docs: DataFrame,
      blocklist: DataFrame,
      urlCol: String = "url"): DataFrame = {
    // no dedup: LEFT ANTI drops a row on ANY right-side match, so
    // duplicate blocklist keys are harmless — deduping would only add an
    // aggregate + exchange to the broadcast side
    val block = broadcast(blocklist.toDF("domain"))
    withUrlParts(docs, urlCol).join(block, Seq("domain"), "left_anti")
  }
}
