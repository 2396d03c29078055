package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text analysis for large-scale document pipelines:
  * normalization, tokenization, shingling, fingerprinting, language ID,
  * and quality scoring. Built-in functions only — every expression here
  * participates in whole-stage codegen (plain string ops) or evaluates as
  * a JVM higher-order function (array ops); there are no UDFs and no
  * driver-side work, so everything scales linearly with executors.
  *
  * Oracle parity: each op has an equivalent DuckDB SQL formulation used by
  * `graft.SparkEntry.oracleSql` — math is integer/double deterministic.
  */
object TextFunctions {

  /** Lowercase, collapse whitespace runs to single spaces, trim. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Whitespace tokens of the normalized text. Empty input → empty array. */
  def tokens(c: Column): Column = {
    val n = normalizeText(c)
    when(n === "", array().cast("array<string>")).otherwise(split(n, " "))
  }

  /** Whitespace token count (the cheap token counter). */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword count: word characters grouped in runs of ≤4 plus
    * standalone non-space symbols — a deterministic, tokenizer-free
    * approximation of subword token counts (ratio ~chars/4 for prose). */
  def subwordCount(c: Column): Column = {
    val n = normalizeText(c)
    // count of [A-Za-z0-9]{1,4} runs + count of other non-space chars
    val wordRuns = size(regexp_extract_all(n, lit("[A-Za-z0-9]{1,4}"), lit(0)))
    val symbols  = size(regexp_extract_all(n, lit("[^A-Za-z0-9\\s]"), lit(0)))
    when(n === "", lit(0)).otherwise(wordRuns + symbols)
  }

  /** Word n-gram shingles over normalized tokens. Documents shorter than
    * `n` tokens yield a single shingle (the whole text) so they still
    * participate in dedup. */
  def wordShingles(c: Column, n: Int): Column = {
    val t = tokens(c)
    when(size(t) <= n, array(concat_ws(" ", t)))
      .otherwise(
        transform(sequence(lit(1), size(t) - (n - 1)),
          i => concat_ws(" ", slice(t, i, lit(n)))))
  }

  /** Character n-gram shingles of the normalized text. */
  def charShingles(c: Column, n: Int): Column = {
    val s = normalizeText(c)
    when(length(s) <= n, array(s))
      .otherwise(
        transform(sequence(lit(1), length(s) - (n - 1)),
          i => s.substr(i, lit(n))))
  }

  /** Document fingerprint: md5 of the normalized text — stable across
    * engines (DuckDB md5 produces identical hex), usable as an exact-dup
    * key that's cheap to shuffle (32 bytes vs full text). */
  def fingerprint(c: Column): Column = md5(normalizeText(c))

  /** 64-bit rolling-style content hash (xxhash64 of normalized text) for
    * engine-internal use (cheaper joins than md5 strings). */
  def fingerprint64(c: Column): Column = xxhash64(normalizeText(c))

  // ---------------------------------------------------------------- lang id

  /** Stopword tables for the n-gram/stopword language heuristic. */
  val StopwordsEn: Seq[String] = Seq("the", "and", "of", "to", "a", "in", "is", "it", "that", "for")
  val StopwordsDe: Seq[String] = Seq("der", "die", "und", "das", "ist", "nicht", "ein", "zu", "mit", "den")
  val StopwordsFr: Seq[String] = Seq("le", "la", "les", "et", "des", "est", "un", "une", "du", "que")
  val StopwordsEs: Seq[String] = Seq("el", "los", "las", "y", "es", "que", "de", "un", "una", "por")

  private def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  /** Language ID heuristic: CJK characters dominate → zh; otherwise the
    * language whose stopword list scores the most token hits, ties broken
    * in fixed order en > de > fr > es. Deterministic and fully
    * SQL-expressible (mirrored in the DuckDB oracle). */
  def langId(c: Column): Column = {
    val toks = tokens(c)
    val zh = size(regexp_extract_all(c, lit("[\\u4e00-\\u9fff]"), lit(0)))
    val en = stopwordHits(toks, StopwordsEn)
    val de = stopwordHits(toks, StopwordsDe)
    val fr = stopwordHits(toks, StopwordsFr)
    val es = stopwordHits(toks, StopwordsEs)
    when(zh > 0, "zh")
      .when(en >= de && en >= fr && en >= es, "en")
      .when(de >= fr && de >= es, "de")
      .when(fr >= es, "fr")
      .otherwise("es")
  }

  // ---------------------------------------------------------- quality score

  /** Ratio of punctuation chars to total chars (0 for empty docs). */
  def punctRatio(c: Column): Column = {
    val n = normalizeText(c)
    when(length(n) === 0, 0.0d).otherwise(
      size(regexp_extract_all(n, lit("[\\.,;:!\\?'\"()\\[\\]{}-]"), lit(0)))
        .cast("double") / length(n))
  }

  /** Ratio of (english) stopword tokens to all tokens (0 for empty docs). */
  def stopwordRatio(c: Column): Column = {
    val t = tokens(c)
    when(size(t) === 0, 0.0d)
      .otherwise(stopwordHits(t, StopwordsEn).cast("double") / size(t))
  }

  /** Mean token length in characters (0 for empty docs). */
  def meanTokenLength(c: Column): Column = {
    val t = tokens(c)
    when(size(t) === 0, 0.0d).otherwise(
      aggregate(t, lit(0.0d), (acc, x) => acc + length(x)) / size(t))
  }

  /** Heuristic document-quality score in [0,1]: favors mid-length docs,
    * modest punctuation, presence of stopwords, word-like token lengths —
    * the classic cheap pre-filter before expensive dedup/training steps. */
  def qualityScore(c: Column): Column = {
    val nTok    = tokenCount(c).cast("double")
    val lenTerm = least(nTok / 64.0d, lit(1.0d))            // enough text
    val punct   = punctRatio(c)
    val punTerm = when(punct <= 0.2d, 1.0d).otherwise(greatest(lit(0.0d), lit(1.0d) - (punct - 0.2d) * 4.0d))
    val stoTerm = least(stopwordRatio(c) * 5.0d, lit(1.0d)) // natural language-ness
    val mtl     = meanTokenLength(c)
    val mtlTerm = when(mtl.between(3.0d, 10.0d), 1.0d).otherwise(0.5d)
    round((lenTerm * 0.4d + punTerm * 0.2d + stoTerm * 0.2d + mtlTerm * 0.2d), 6)
  }
}
