package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Text relevance ranking: BM25 (Robertson & Spärck Jones; the Okapi
  * formulation with the log(1 + …) idf floor Lucene uses, so scores stay
  * positive even for terms in most documents).
  *
  * Scale shape — one tokenize pass, no per-term jobs:
  *   1. explode normalized tokens once; per-doc aggregate computes doc
  *     length AND each query term's tf as conditional sums in a single
  *     keyed shuffle (terms become fixed columns, not rows — the query
  *     term set is small by construction);
  *   2. corpus stats (N, avg doc length, each term's df) reduce that
  *     per-doc frame to ONE row, broadcast back with a cross join;
  *   3. the score is a single codegen'd expression with a FIXED
  *     left-to-right term order — deterministic float addition, so two
  *     engines computing the same formula agree bit-for-bit (modulo the
  *     final ln ULP, absorbed by rounding at the caller).
  * Documents containing none of the query terms are dropped (their
  * score is identically 0 and at corpus scale they are almost all rows).
  */
object Ranking {

  def bm25(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      queryTerms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 requires at least one query term")
    require(queryTerms.distinct.size == queryTerms.size,
      s"duplicate query terms: $queryTerms")

    val tfCols = queryTerms.indices.map(i => s"__tf_$i")
    val toks = docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("__t"))
    val perDoc = toks.groupBy(idCol).agg(
      count(lit(1)).as("__dl"),
      queryTerms.zip(tfCols).map { case (t, c) =>
        sum(when(col("__t") === t, 1L).otherwise(0L)).as(c)
      }: _*)

    val dfCols = queryTerms.indices.map(i => s"__df_$i")
    val corpus = perDoc.agg(
      count(lit(1)).as("__n_docs"),
      sum(col("__dl")).as("__sum_dl") +: tfCols.zip(dfCols).map { case (tf, c) =>
        sum(when(col(tf) > 0L, 1L).otherwise(0L)).as(c)
      }: _*)

    val scored = perDoc.crossJoin(broadcast(corpus))
    val avgdl = col("__sum_dl").cast("double") / col("__n_docs")
    val contribs: Seq[Column] = queryTerms.indices.map { i =>
      val tf = col(s"__tf_$i").cast("double")
      val dfT = col(s"__df_$i").cast("double")
      val idf = log(
        (col("__n_docs") - dfT + lit(0.5)) / (dfT + lit(0.5)) + lit(1.0))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) +
          lit(b) * col("__dl").cast("double") / avgdl))
    }
    scored
      .where(tfCols.map(c => col(c) > 0L).reduce(_ || _))
      .withColumn("bm25", contribs.reduceLeft(_ + _))
      .select(col(idCol), col("bm25"))
  }
}
