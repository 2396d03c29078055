package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Per-document text profiling: one narrow projection producing the
  * standard pre-training corpus statistics. Single scan, no shuffle, fully
  * codegen-able string expressions — at 100 TB this is I/O-bound, which is
  * the best case. Column pruning pushes down to (idCol, textCol) only. */
object TextAnalysis {

  def profile(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(
      col(idCol),
      length(col(textCol)).as("n_chars"),
      tokenCount(col(textCol)).as("n_tokens"),
      subwordCount(col(textCol)).as("n_subwords"),
      langId(col(textCol)).as("pred_lang"),
      round(punctRatio(col(textCol)), 6).as("punct_ratio"),
      round(stopwordRatio(col(textCol)), 6).as("stopword_ratio"),
      round(meanTokenLength(col(textCol)), 6).as("mean_token_len"),
      qualityScore(col(textCol)).as("quality"),
      fingerprint(col(textCol)).as("fingerprint"))

  /** Corpus-level language distribution from the lang-ID heuristic. */
  def langDistribution(df: DataFrame, textCol: String): DataFrame =
    df.groupBy(langId(col(textCol)).as("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))

  /** Documents passing a minimum quality bar — the cheap corpus filter
    * applied before expensive dedup/embedding stages. */
  def qualityFilter(df: DataFrame, textCol: String, minQuality: Double): DataFrame =
    df.filter(qualityScore(col(textCol)) >= minQuality)
}
