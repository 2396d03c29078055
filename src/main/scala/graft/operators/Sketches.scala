package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Mergeable distinct-count sketch stores (Apache DataSketches HLL,
  * through Spark's own `hll_sketch_agg` / `hll_union_agg` /
  * `hll_sketch_estimate` — codegen'd aggregates, no UDFs).
  *
  * The scale seam: corpus-wide distinct statistics (vocabulary size per
  * language, distinct URLs per domain, ...) are a full-corpus
  * aggregation, but HLL sketches are MERGEABLE — so each ingest batch
  * summarizes itself once into a KB-sized sketch row, and any later
  * "distinct across everything so far" question is answered by
  * union-merging the stored sketches, never by rescanning the corpus.
  * At 100 TB that turns a recurring corpus pass into a metadata-sized
  * read, the same cost-tracks-churn shape as the minhash signature
  * store and [[Versioned.changes]]. Error is the standard HLL bound
  * (~1.04/√2^lgK ≈ 1.6% at the default lgK=12), and union-of-sketches
  * is EXACTLY the sketch of the union — no double-counting across
  * batches, which naive per-batch distinct counts cannot offer.
  */
object Sketches {

  /** Summarize one batch: per-`groupCol` HLL sketches of the tokens of
    * `textCol`, written to `path` as `(group, sketch BINARY)` — one
    * narrow row per group. Tokens ride [[TextFunctions.tokens]], the
    * same normalization as every other token operator. */
  def writeTokenSketches(
      df: DataFrame,
      textCol: String,
      groupCol: String,
      path: String,
      lgK: Int = 12): Unit =
    df.select(col(groupCol).as("group"),
        explode(tokens(col(textCol))).as("__tok"))
      .groupBy("group")
      .agg(hll_sketch_agg(col("__tok"), lit(lgK)).as("sketch"))
      .write.mode("overwrite").parquet(path)

  /** The general (non-text) flavor: per-`groupCol` HLL sketches of ANY
    * value column — distinct customers per order status, distinct URLs
    * per crawl partition, distinct session ids per day. Same store
    * contract as [[writeTokenSketches]] (`(group, sketch BINARY)`, one
    * narrow row per group), same merge path, so token and value stores
    * compose through the one [[mergedDistinct]]. */
  def writeValueSketches(
      df: DataFrame,
      valueCol: String,
      groupCol: String,
      path: String,
      lgK: Int = 12): Unit =
    df.select(col(groupCol).as("group"), col(valueCol).as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy("group")
      .agg(hll_sketch_agg(col("__v"), lit(lgK)).as("sketch"))
      .write.mode("overwrite").parquet(path)

  /** Merge any number of sketch stores into per-group distinct-count
    * estimates: `(group, est_distinct LONG)`. Input is sketch rows (one
    * per group per store), so the merge cost is O(groups × stores) —
    * independent of corpus size. */
  def mergedDistinct(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "at least one sketch store required")
    spark.read.parquet(paths: _*)
      .groupBy("group")
      .agg(hll_sketch_estimate(
        hll_union_agg(col("sketch"), lit(false))).as("est_distinct"))
  }
}
