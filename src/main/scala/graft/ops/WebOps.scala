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

  /** Registered domain approximation: the last two host labels
    * (`news.site4.com` → `site4.com`). A public-suffix-list lookup is the
    * production refinement; two labels is the deterministic, dependency-
    * free core that matches the common .com/.org/.net case. Single-label
    * hosts pass through unchanged (try_element_at past the head is null —
    * ANSI-safe — and concat_ws skips nulls).
    */
  def registeredDomain(url: Column): Column = {
    val parts = split(urlHost(url), "\\.")
    concat_ws(".", try_element_at(parts, lit(-2)), try_element_at(parts, lit(-1)))
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
    val block = broadcast(blocklist.toDF("domain").dropDuplicates("domain"))
    withUrlParts(docs, urlCol).join(block, Seq("domain"), "left_anti")
  }
}
