package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Gopher-style document-quality verdict (Rae et al. 2021, "Scaling
  * Language Models: Methods, Analysis & Insights from Training Gopher",
  * table A1), composed from the engine's existing signals into ONE
  * keep/drop decision per document — the filter stack a pre-training
  * pipeline runs before dedup:
  *
  *   1. scan-stage rule metrics (no shuffle, codegen'd string exprs):
  *      word count bounds, mean word length bounds, alphabetic-word
  *      fraction, symbol-to-word ratio (`#` + `...`), distinct-stopword
  *      requirement;
  *   2. repetition gates from [[TextAnalysis.repetitionProfile]]
  *      (dup-line fractions ride the scan; top-bigram coverage is one
  *      keyed shuffle with map-side combine);
  *   3. an LM fluency gate from [[LanguageModel.stupidBackoffScores]]
  *      (CCNet-style: train once on a reference split — one aggregate —
  *      then score via broadcastable count-table joins).
  *
  * Every gate compares against the 6-dp ROUNDED metric, so an engine
  * recomputing the same doubles (the driver's DuckDB oracle does) reaches
  * the identical verdict — no ULP boundary flips. At 100 TB the stack is
  * scan-bound: stage 1 is embarrassingly parallel, stage 2 shuffles
  * ~distinct bigrams per doc, stage 3 joins against count tables that are
  * tiny relative to the corpus. Nothing collects to the driver.
  *
  * Thresholds default to the published Gopher values; callers tune them
  * per corpus (the fixture query does — synthetic docs are single-line
  * token soup, so e.g. the stopword set collapses to "the"). */
object Quality {

  /** Gopher's stop set (table A1: "contains at least 2 of ..."). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Per-document quality verdict over `docs`, LM-scored against a model
    * trained on `lmTrain` (pass a held-out/reference split of the same
    * corpus, or a trusted corpus — CCNet uses Wikipedia).
    *
    * Output per doc: the rounded metrics, `n_failed` (how many gates
    * failed — the triage column), and the final `keep`. */
  def verdict(
      docs: DataFrame,
      lmTrain: DataFrame,
      textCol: String,
      idCol: String,
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      minAlphaWordFrac: Double = 0.8,
      maxSymbolWordRatio: Double = 0.1,
      minStopHits: Int = 2,
      maxDupLineFrac: Double = 0.3,
      maxDupLineCharFrac: Double = 0.2,
      maxTopBigramCharFrac: Double = 0.18,
      minAvgLogprob: Double = -10.0): DataFrame = {
    val toks = col("__toks"); val norm = col("__norm")
    val nw = size(toks)
    // Normalized text is single-space-joined, so Σ len(word) recovers as
    // len(norm) − (n−1) — no per-word aggregate needed.
    val meanLen = when(nw === 0, 0.0d)
      .otherwise((length(norm) - (nw - 1)).cast("double") / nw)
    val alphaFrac = when(nw === 0, 0.0d)
      .otherwise(size(filter(toks, t => t.rlike("[a-z]"))).cast("double") / nw)
    // '#' by length-difference (exact, cross-engine); '...' as leftmost
    // non-overlapping regex matches (Java and RE2 agree).
    val symbols = (length(norm) - length(regexp_replace(norm, "#", ""))) +
      size(regexp_extract_all(norm, lit("\\.\\.\\."), lit(0)))
    val symbolRatio = when(nw === 0, 0.0d)
      .otherwise(symbols.cast("double") / nw)
    val stopHits = size(array_intersect(
      array_distinct(toks), array(GopherStopwords.map(lit): _*)))

    val rules = TextAnalysis.withNormToks(docs, textCol).select(
      col(idCol),
      nw.cast("long").as("n_words"),
      round(meanLen, 6).as("mean_word_len"),
      round(alphaFrac, 6).as("alpha_word_frac"),
      round(symbolRatio, 6).as("symbol_word_ratio"),
      stopHits.cast("long").as("n_stop_hits"))

    val rep = TextAnalysis.repetitionProfile(docs, textCol, idCol)
      .select(col(idCol), col("dup_line_frac"), col("dup_line_char_frac"),
        col("top_bigram_char_frac"))
    val lm = LanguageModel.stupidBackoffScores(lmTrain, docs, textCol, idCol)
      .select(col(idCol), col("avg_logprob"))

    val failed: Seq[Column] = Seq(
      col("n_words") < minWords || col("n_words") > maxWords,
      col("mean_word_len") < minMeanWordLen || col("mean_word_len") > maxMeanWordLen,
      col("alpha_word_frac") < minAlphaWordFrac,
      col("symbol_word_ratio") > maxSymbolWordRatio,
      col("n_stop_hits") < minStopHits,
      col("dup_line_frac") > maxDupLineFrac,
      col("dup_line_char_frac") > maxDupLineCharFrac,
      col("top_bigram_char_frac") > maxTopBigramCharFrac,
      // NULL avg_logprob (empty doc) fails the fluency gate.
      !(col("avg_logprob") >= minAvgLogprob) || col("avg_logprob").isNull)

    rules
      .join(rep, Seq(idCol))
      .join(lm, Seq(idCol))
      .withColumn("n_failed",
        failed.map(f => when(f, 1).otherwise(0)).reduce(_ + _).cast("long"))
      .withColumn("keep", col("n_failed") === 0L)
  }
}
