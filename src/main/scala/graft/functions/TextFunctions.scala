package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for LLM-data-pipeline work.
  *
  * Everything here is a composition of `org.apache.spark.sql.functions`
  * (whole-stage-codegen'd, no UDFs): at 100 TB these run inside the scan
  * stage with zero extra shuffles. The reference's equivalent surface is
  * "whatever JS you write inside a map closure" (SURVEY §2.6); these are
  * the declarative replacements for the string ops its tests exercise
  * (split/filter/parseInt/toLowerCase, test/mr.test.js:101-113) plus the
  * quality/langid/fingerprint operators a training-data pipeline needs.
  */
object TextFunctions {

  /** Explicit whitespace class, identical under Java regex and RE2:
    * Java's \s includes vertical tab, RE2's does not — an oracle-parity
    * landmine on any corpus containing U+000B. Spark code and every
    * DuckDB oracle use this same class.
    */
  val WhitespaceRegex: String = "[ \\t\\n\\u000B\\f\\r]+"

  /** Whitespace tokens, empties dropped (reference word-count map shape,
    * test/mr.test.js:166-176).
    */
  def tokens(text: Column): Column =
    filter(split(text, WhitespaceRegex), t => t =!= lit(""))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Characters belonging to tokens (whitespace removed). */
  def tokenChars(text: Column): Column =
    length(regexp_replace(text, "\\s+", ""))

  /** BPE-ish subword segmentation: runs of alphanumerics, or single
    * non-space punctuation chars — a cheap proxy for a tokenizer's
    * pre-tokenization pass (GPT-2-style regex, simplified to a match-based
    * pattern both Java regex and RE2 support — RE2 has no lookarounds).
    */
  def subwordTokens(text: Column): Column =
    regexp_extract_all(text, lit("[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]"), lit(0))

  /** Real BPE segmentation: [[subwordTokens]]-style pre-tokens of the
    * LOWERCASED text, each word then merged per the fixed ranked table
    * [[graft.expr.BpeOps.Merges]] (leftmost occurrence of the
    * lowest-ranked adjacent pair, one merge per step, until no table
    * pair remains) — a genuine iterated-merge BPE apply, not a regex
    * proxy. Native kernel inside whole-stage codegen; the t13 oracle
    * replays the identical merge loop in a DuckDB recursive CTE with
    * the table inlined.
    */
  def bpeTokens(text: Column): Column =
    graft.expr.nat(graft.expr.BpeExpressions.BpeSubwords(
      graft.expr.toExpr(
        regexp_extract_all(lower(text),
          lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0)))))

  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[.,;:!?]"), lit(0)))

  /** Per-language stopword lists (tiny public lists; the heuristic only
    * needs relative hit counts). Order = deterministic tie-break priority.
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans"),
    "es" -> Seq("el", "los", "las", "y", "es", "una", "que"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Space-delimited languages get \b word boundaries; CJK text has no
    * word chars under Java/RE2 ASCII \w, so adjacent CJK characters have
    * no \b between them and boundary anchors would make the pattern
    * unmatchable — CJK stopwords match bare.
    */
  private def hitPattern(words: Seq[String]): String =
    if (words.exists(_.exists(_ > '⹿'))) "(" + words.mkString("|") + ")"
    else "\\b(" + words.mkString("|") + ")\\b"

  /** Stopword hits for one language. */
  def stopwordHits(text: Column, lang: String): Column =
    size(regexp_extract_all(lower(text),
      lit(hitPattern(stopwords.toMap.apply(lang))), lit(0)))

  /** n-gram/stopword language-ID heuristic: argmax of per-language
    * stopword hits, ties broken by list order ("und" beats "unknown").
    * Returns "unknown" when nothing hits.
    */
  def langId(text: Column): Column = {
    val hits = stopwords.map { case (lang, _) => lang -> stopwordHits(text, lang) }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    hits.foldRight(lit("unknown"): Column) { case ((lang, h), els) =>
      when(h > 0 && h === best, lit(lang)).otherwise(els)
    }
  }

  /** English stopword ratio — a standard quality signal. */
  def stopwordRatio(text: Column): Column =
    when(tokenCount(text) > 0,
      stopwordHits(text, "en").cast("double") / tokenCount(text).cast("double"))
      .otherwise(lit(0.0))

  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      punctCount(text).cast("double") / length(text).cast("double"))
      .otherwise(lit(0.0))

  def avgTokenLen(text: Column): Column =
    when(tokenCount(text) > 0,
      tokenChars(text).cast("double") / tokenCount(text).cast("double"))
      .otherwise(lit(0.0))

  /** Composite quality score in [0,1]: length signal + stopword signal +
    * punctuation sanity. Weights are arbitrary but fixed; the operator
    * contract is determinism, not linguistics.
    */
  def qualityScore(text: Column): Column = {
    val lenSig = least(tokenCount(text).cast("double") / lit(50.0), lit(1.0))
    val stopSig = least(stopwordRatio(text) * lit(4.0), lit(1.0))
    val punctSig = lit(1.0) - least(punctRatio(text) * lit(10.0), lit(1.0))
    round(lenSig * lit(0.4) + stopSig * lit(0.3) + punctSig * lit(0.3), 6)
  }

  /** Whitespace-normalized lowercase form — canonical text for exact-dup
    * fingerprinting.
    */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Content fingerprint of the normalized text (md5 — the analog of the
    * reference's content-addressed getID, util/id.js:72-78).
    */
  def fingerprint(text: Column): Column = md5(normalized(text))

  // ------------------------------------------------------------- PII
  // Patterns restricted to the Java-regex ∩ RE2 common subset (no
  // backreferences, no lookaround), so SQL oracles match byte-for-byte.

  /** Email address shape. */
  val EmailRegex: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 shape (word-bounded). */
  val Ipv4Regex: String = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"

  /** Occurrence count of a PII pattern. */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Text with emails then IPv4s replaced by typed placeholder tags —
    * the redaction pass a curation pipeline runs before publishing.
    * Replacement order is fixed (emails first) so engines agree even on
    * pathological overlaps.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailRegex, "<EMAIL>"),
      Ipv4Regex, "<IP>")

  /** k-token shingles ("n-gram documents") as an array<string>; documents
    * shorter than k shingle to their whole normalized text.
    */
  def shingles(text: Column, k: Int): Column = {
    val toks = tokens(normalized(text))
    when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
      .otherwise(array(normalized(text)))
  }

  /** Distinct 64-bit-hashed shingles, sorted ascending — the set
    * MinHash/Jaccard operate on. Native kernel
    * ([[graft.expr.SigOps.hashedShingleSet]]): hashes each token's bytes
    * once, folds k-grams arithmetically (no shingle strings built), and
    * returns the set sorted so pairwise verification can use the
    * allocation-free merge-walk `intersect_card_sorted`. MinHash is
    * order-insensitive, so sorting has no semantic effect.
    */
  def hashedShingles(text: Column, k: Int): Column =
    graft.expr.nat(graft.expr.SignatureExpressions.HashedShingleSet(
      graft.expr.toExpr(tokens(normalized(text))), k))

  /** Composed-builtin formulation of the shingle set (string k-grams,
    * xxhash64 each) — the differential oracle for the native kernel's
    * cardinality behavior in tests.
    */
  def hashedShinglesComposed(text: Column, k: Int): Column =
    sort_array(array_distinct(transform(shingles(text, k), s => xxhash64(s))))

  /** Alphabetic words ([a-z]+ runs of the lowercased text) — the counting
    * unit for readability metrics; digits and punctuation never form
    * words, so "3.5%" contributes zero words while "it's" contributes two
    * ("it", "s"). Same [a-z]+ class under Java regex and RE2.
    */
  def alphaWords(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+"), lit(0))

  /** Heuristic syllable count of one LOWERCASE word: the number of vowel
    * groups ([aeiouy]+ runs), floored at 1 — the standard cheap
    * approximation Flesch-style readability scores are built on ("data"
    * → 2, "queue" → 2, "rhythm" → 1 via the floor).
    */
  def syllableCount(word: Column): Column =
    greatest(lit(1), size(regexp_extract_all(word, lit("[aeiouy]+"), lit(0))))

  /** Sentence count: non-blank segments between [.!?]+ runs, floored at 1
    * so fragment-only documents still divide (readability ratios need
    * sentences >= 1). Trailing-empty handling is irrelevant because
    * blanks are filtered on both the Spark and oracle sides.
    */
  def sentenceCount(text: Column): Column =
    greatest(lit(1),
      size(filter(split(text, "[.!?]+"), s => trim(s) =!= lit(""))))
}
