package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline, built
  * entirely from codegen'd built-in expressions (no UDFs) so they stay inside
  * whole-stage codegen and push down cleanly.
  *
  * All operators take the `documents` table shape
  * `(doc_id, text, lang, source, n_chars)`.
  */
object TextAnalysis {

  /** Whitespace token count (the deterministic stand-in for a tokenizer —
    * matches the DuckDB oracle exactly).
    */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword estimate: word-chunks of ≤4 chars + digit runs +
    * punctuation, counted via regexp — an upper-bound proxy for BPE vocab
    * tokenization that needs no model file.
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("""\p{L}{1,4}|\p{N}+|[^\p{L}\p{N}\s]"""), lit(0)))

  /** Quality-score features: length, alpha ratio, punctuation ratio, mean
    * word length, uppercase ratio — the standard boilerplate/quality signals
    * (C4/Gopher-style heuristics from public literature).
    */
  def withQualityFeatures(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val len = length(t).cast("double")
    docs
      .withColumn("n_tokens", tokenCount(t))
      .withColumn("alpha_ratio",
        round(length(regexp_replace(t, "[^\\p{L}]", "")) / greatest(len, lit(1.0)), 4))
      .withColumn("punct_ratio",
        round(length(regexp_replace(t, "[^.,;:!?'\"()\\-]", "")) / greatest(len, lit(1.0)), 4))
      .withColumn("upper_ratio",
        round(length(regexp_replace(t, "[^A-Z]", "")) / greatest(len, lit(1.0)), 4))
      .withColumn("mean_word_len",
        round(length(regexp_replace(t, "\\s+", "")) / greatest(tokenCount(t).cast("double"), lit(1.0)), 4))
  }

  /** Composite quality score in [0,1]: favors mid-length docs with high
    * alpha ratio and sane punctuation. Deterministic, codegen-only.
    * Unrounded: the IEEE double is bit-identical across engines evaluating
    * the same op order, whereas rounding at a .xxxx5 boundary is not.
    */
  def qualityScore(text: Column): Column = {
    val len = length(text).cast("double")
    val alpha = length(regexp_replace(text, "[^\\p{L}]", "")) / greatest(len, lit(1.0))
    val lenScore = least(len / lit(500.0), lit(1.0))
    greatest(least(alpha * lit(0.7) + lenScore * lit(0.3), lit(1.0)), lit(0.0))
  }

  /** Stopword-hit language ID: counts hits against small built-in stopword
    * sets (n-gram-heuristic class of language ID; sets chosen to be
    * SQL-expressible for the oracle). Returns the argmax language or 'und'.
    */
  val StopwordSets: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "sich"),
    "fr" -> Seq("le", "la", "les", "des", "est", "dans", "que", "une", "pour", "qui"),
    "es" -> Seq("el", "la", "los", "las", "es", "que", "una", "para", "con", "por"))

  def stopwordHits(text: Column, words: Seq[String]): Column = {
    val pattern = words.mkString("(?i)\\b(", "|", ")\\b")
    size(regexp_extract_all(text, lit(pattern), lit(0)))
  }

  def withLanguageId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val withHits = StopwordSets.foldLeft(docs) { case (df, (lang, words)) =>
      df.withColumn(s"hits_$lang", stopwordHits(t, words))
    }
    val langs = StopwordSets.keys.toSeq.sorted
    val best = langs.foldLeft((lit("und"), lit(0))) { case ((bl, bh), lang) =>
      val h = col(s"hits_$lang")
      (when(h > bh, lit(lang)).otherwise(bl), greatest(h, bh))
    }
    withHits.withColumn("lang_pred", best._1)
  }

  /** Rolling polynomial document fingerprint (Rabin-Karp style, base 31 mod
    * 2^31-1 over code points of the whitespace-normalized text prefix) —
    * cheap near-exact identity for resumable dedup ledgers. Implemented with
    * `aggregate`/`transform` higher-order functions: codegen'd, no UDF. The
    * prefix bound (default 256 chars) keeps per-row cost constant at scale.
    */
  def fingerprint(text: Column, prefixLen: Int = 256): Column = {
    val s = substring(regexp_replace(lower(text), "\\s+", " "), 1, prefixLen)
    aggregate(
      transform(sequence(lit(1), length(s)), i => ascii(substr(s, i, lit(1))).cast("long")),
      lit(0L),
      (h, c) => pmod(h * lit(31L) + c, lit(2147483647L)))
  }

  /** SHA-256 content hash for exact dedup (matches DuckDB's sha256). */
  def contentHash(text: Column): Column = sha2(text, 256)

  // ------------------------------------------------------------- PII scrub
  // The standard pre-training scrub pass (public technique: Dolma,
  // Soldaini et al. 2024 §PII; CCNet-descendant pipelines): emails, North
  // American phone shapes, and IPv4 literals mask to fixed placeholder
  // tokens so downstream dedup/quality stages see stable text. Chained
  // regexp_replace stays inside whole-stage codegen — no UDF.
  val EmailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  // both alternatives boundary-terminated: '(555) 123-45678' (five-digit
  // tail — not a NANP number) must not partial-mask to '|||PHONE|||8'
  val PhoneRe = """\(\d{3}\) \d{3}-\d{4}\b|\b\d{3}-\d{3}-\d{4}\b"""
  // octets range-checked (0-255, no leading zeros): '999.999.999.999' and
  // long version strings stay text; a 4-part version that IS a valid
  // dotted quad still masks — inherent to regex PII, as in the reference
  // pipelines
  private val Octet = """(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"""
  val Ipv4Re = s"""\\b$Octet(?:\\.$Octet){3}\\b"""

  /** Mask emails → `|||EMAIL|||`, phones → `|||PHONE|||`, IPv4 →
    * `|||IP|||`. Email first (an address may embed digits), phone before
    * IP (the dotted-quad pattern could otherwise eat a phone's area code
    * in pathological inputs).
    */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "|||EMAIL|||"),
        PhoneRe, "|||PHONE|||"),
      Ipv4Re, "|||IP|||")

  /** Per-kind PII hit counts (audit columns a scrub job reports per
    * partition alongside the masked text).
    */
  def withPiiCounts(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("n_emails", size(regexp_extract_all(t, lit(EmailRe), lit(0))))
      .withColumn("n_phones", size(regexp_extract_all(t, lit(PhoneRe), lit(0))))
      .withColumn("n_ips", size(regexp_extract_all(t, lit(Ipv4Re), lit(0))))
  }

  // -------------------------------------------------- repetition signals
  /** Gopher-style repetition/quality signals (public technique: Rae et
    * al. 2021, "Scaling Language Models" §A1.1 repetition filters; reused
    * by Dolma/RefinedWeb): fraction of duplicate lines, fraction of lines
    * covered by the single most frequent line, bullet-start and
    * ellipsis-end line fractions. All higher-order array functions over
    * one split — codegen'd, per-row bounded (the top-line scan is
    * O(distinct·lines) on one document, not a corpus shuffle).
    *
    * Lines split CRLF-safely and BLANK lines are excluded before any
    * fraction — a clean multi-paragraph document's blank separators must
    * not register as "duplicate lines" (the published filters compute
    * over content lines). Fractions are emitted UNROUNDED: a single
    * int/int division and subtraction produce bit-identical IEEE doubles
    * across engines (see [[qualityScore]]).
    */
  def withRepetitionSignals(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val lines = filter(split(col(textCol), "\r?\n"), l => trim(l) =!= "")
    val n = greatest(size(lines).cast("double"), lit(1.0))
    val topCount = array_max(transform(array_distinct(lines),
      l => size(filter(lines, x => x === l))))
    docs
      .withColumn("n_lines", size(lines))
      .withColumn("dup_line_frac",
        lit(1.0) - size(array_distinct(lines)).cast("double") / n)
      .withColumn("top_line_frac", topCount.cast("double") / n)
      .withColumn("bullet_line_frac",
        size(filter(lines, l =>
          l.startsWith("- ") || l.startsWith("* ") || l.startsWith("• ")))
          .cast("double") / n)
      .withColumn("ellipsis_line_frac",
        size(filter(lines, l => l.endsWith("...") || l.endsWith("…")))
          .cast("double") / n)
  }

  /** The Gopher repetition gate over [[withRepetitionSignals]] — keep a
    * document only when every signal sits under its cap. The dup-line
    * (0.30), bullet (0.90), and ellipsis (0.30) caps are the paper's;
    * the top-line cap guards the same failure mode as its duplicate-
    * paragraph family with this operator's line-level signal. Documents
    * under `minLines` bypass the gate entirely: top_line_frac ≥ 1/n makes
    * the caps meaningless on very short documents, which the published
    * pipelines handle with a separate length gate first.
    */
  def gopherRepetitionFilter(
      docs: DataFrame,
      maxDupLineFrac: Double = 0.30,
      maxTopLineFrac: Double = 0.30,
      maxBulletFrac: Double = 0.90,
      maxEllipsisFrac: Double = 0.30,
      minLines: Int = 4,
      textCol: String = "text"): DataFrame =
    withRepetitionSignals(docs, textCol)
      .filter(col("n_lines") < minLines ||
        (col("dup_line_frac") <= maxDupLineFrac &&
          col("top_line_frac") <= maxTopLineFrac &&
          col("bullet_line_frac") <= maxBulletFrac &&
          col("ellipsis_line_frac") <= maxEllipsisFrac))

  /** Deterministic content-hash sampling for corpus mixing: keep a
    * document when the hex prefix of sha256(text) sorts below the
    * threshold (e.g. "29" keeps ≈ 0x29/0x100 ≈ 16%). Reproducible across
    * runs, partitionings, and cluster sizes — the property a training-mix
    * recipe needs (random() is not) — and engine-portable for the oracle
    * (DuckDB's sha256 emits the same lowercase hex). Pure projection +
    * filter: no shuffle, pushes past column pruning.
    */
  def sampleByContentHash(
      docs: DataFrame,
      keepHexBelow: String,
      textCol: String = "text"): DataFrame = {
    require(keepHexBelow.nonEmpty &&
      keepHexBelow.forall(c => c.isDigit || ('a' to 'f').contains(c)),
      s"lowercase hex threshold required: $keepHexBelow")
    docs.filter(
      substring(sha2(col(textCol), 256), 1, keepHexBelow.length) < keepHexBelow)
  }

  /** Corpus-level boilerplate-paragraph removal — the CCNet-style
    * line/paragraph dedup a web-scale training pipeline runs before
    * document-level dedup (public technique: CCNet, Wenzek et al. 2019;
    * "Deduplicating Training Data Makes Language Models Better", Lee et
    * al. 2021): any paragraph occurring more than `maxDocFreq` times
    * ACROSS the corpus (cookie banners, nav footers, license headers) is
    * dropped from every document; surviving paragraphs reassemble in
    * their original order.
    *
    * Scale shape: one explode, one paragraph-frequency aggregation, one
    * LEFT ANTI join against the (small) hot-paragraph list — AQE
    * broadcasts it — and one per-doc reassembly aggregate. No windows, no
    * all-pairs anything; the hot list is bounded by the number of
    * paragraphs whose df exceeds the cap, tiny by construction.
    *
    * @return (doc_id, clean_text); documents whose every paragraph was
    *         boilerplate drop out (their clean text would be empty).
    */
  def removeBoilerplateParagraphs(
      docs: DataFrame,
      maxDocFreq: Int,
      textCol: String = "text",
      idCol: String = "doc_id",
      sep: String = "\n\n"): DataFrame = {
    val paras = docs.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("pos", "para")))
    // DOCUMENT frequency (CCNet semantics): one vote per (doc, para) —
    // a single document repeating its own unique paragraph must not push
    // it over the corpus-wide cap
    val hot = paras.groupBy(col("para"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") > maxDocFreq)
      .select("para")
    paras.join(hot, Seq("para"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("para")))),
          s => s("para")), sep).as("clean_text"))
  }
}
