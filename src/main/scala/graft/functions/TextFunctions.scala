package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline
  * (SURVEY.md §7.5): normalization, tokenization, shingling, token
  * counting, quality scoring, language ID, fingerprinting.
  *
  * Everything is a Column expression over built-in functions — no UDFs —
  * so text cleaning stays inside whole-stage codegen and the regex work
  * uses Spark's compiled-pattern cache. The regex dialect is kept to the
  * portable intersection of Java regex (Spark) and RE2 (DuckDB) so every
  * function here can be oracle-checked 1:1.
  */
object TextFunctions {

  /** Canonical normalization: lowercase, collapse every non-alphanumeric
    * run to a single space, trim. The base for fingerprints and token
    * sets. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Distinct alphanumeric tokens (set semantics, for Jaccard). */
  def tokenSet(text: Column): Column =
    array_distinct(regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0)))

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column =
    regexp_count(text, lit("\\S+")).cast("long")

  /** BPE-ish token count: letter runs, single digits, or single
    * non-alphanumeric marks — the classic pre-tokenizer shape. An upper
    * bound proxy for LLM token budgeting without a vocab file. */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")).cast("long")

  /** n-word shingles over a token array (for MinHash). */
  def shingles(tokens: Column, n: Int): Column =
    when(size(tokens) < n, array(concat_ws(" ", tokens)))
      .otherwise(transform(
        sequence(lit(0), size(tokens) - lit(n)),
        i => concat_ws(" ", slice(tokens, i + 1, lit(n)))))

  /** Document fingerprint: md5 of the normalized text — the exact-dedup
    * key that is robust to case/punctuation/whitespace variance. */
  def fingerprint(text: Column): Column = md5(normalize(text))

  // -- PII-style redaction ----------------------------------------------

  /** Patterns kept in the Java∩RE2 dialect (no backreferences or
    * lookarounds — these specific shapes match identically under Java's
    * leftmost-first and RE2's leftmost-longest). */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipRe = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val phoneRe = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"

  /** Scrub emails, IPv4s and phone-like digit runs to typed tags — the
    * standard corpus-cleaning pass ahead of training. Order matters
    * (emails before IPs before phones: an email's host must not be
    * half-eaten as an IP) and is mirrored verbatim in the oracle. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "[EMAIL]"),
        ipRe, "[IP]"),
      phoneRe, "[PHONE]")

  // -- language ID ------------------------------------------------------

  /** Per-language stopword alternations (whole-word). Tiny on purpose:
    * language ID here is an n-gram/stopword heuristic, not a model. */
  val langMarkers: Seq[(String, String)] = Seq(
    "de" -> "\\b(der|die|das|und|ist|nicht|mit|ein|zu|den)\\b",
    "en" -> "\\b(the|a|of|and|to|in|is|it|that|for)\\b",
    "es" -> "\\b(el|los|las|es|una|del|por|para|con|se)\\b",
    "fr" -> "\\b(le|les|et|est|une|dans|que|pour|sur|avec)\\b",
    "zh" -> "[\\x{4e00}-\\x{9fff}]")

  /** Stopword-hit score for one language. */
  def langScore(text: Column, lang: String): Column =
    regexp_count(lower(text), lit(langMarkers.toMap.apply(lang))).cast("long")

  /** Argmax language with deterministic tie-break: first language in
    * [[langMarkers]] order wins ties. Expressed as a nested CASE so the
    * DuckDB oracle can replicate it verbatim. */
  def langPredict(scores: Seq[(String, Column)]): Column = {
    val ordered = scores // caller passes in langMarkers order
    ordered.init.reverse.foldLeft(lit(ordered.last._1)) {
      case (elseCol, (lang, score)) =>
        val others = ordered.filter(_._1 != lang)
        val isMax = others.map(o => score >= o._2).reduce(_ && _)
        when(isMax, lit(lang)).otherwise(elseCol)
    }
  }
}
