package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.operators.Checkpoints.CapOps

/** EXACT top-k most frequent values without a full-vocabulary shuffle —
  * the heavy-hitter shape for corpus statistics at 100 TB, where a
  * plain `groupBy(token).count().orderBy(...)` must shuffle every
  * distinct token (trillions of singletons in web-scale text) just to
  * discard all but k of them.
  *
  * Two passes, both exact in the end:
  *  1. CANDIDATES: per-partition Misra–Gries summaries (Misra & Gries
  *     1982, "Finding repeated elements"; mergeability per Agarwal et
  *     al. 2012, "Mergeable summaries") merged with `treeAggregate` —
  *     never more than ~2·sketchSize counters per task, a few KB on the
  *     driver. The merged summary carries an explicit `slack`: the
  *     total decrement mass applied, which upper-bounds the true count
  *     of ANY value absent from the candidate set.
  *  2. RECOUNT: one exact count restricted to the candidates (broadcast
  *     semi-join, so the shuffle carries at most ~2·sketchSize distinct
  *     keys instead of the vocabulary), then top-k by
  *     `(count DESC, value ASC)`.
  *
  * The result is PROVEN exact per run: if the k-th candidate's exact
  * count exceeds the merged slack, no non-candidate can displace it —
  * that gate is checked on the (bounded, k-row) head of the recount,
  * and on the rare failure (sketchSize too small for the distribution's
  * tail) the operator falls back to the full groupBy, so the contract
  * is ALWAYS exact top-k, never approximate. Choose
  * `sketchSize >> k / skew`: for Zipfian text, 64–128× k is generous.
  */
object HeavyHitters {

  /** Mergeable Misra–Gries summary with an explicit undercount bound.
    * `slack` grows by the cutoff each time a batch decrement trims the
    * map back to `size` counters; any value absent from the map has
    * true count ≤ `slack`. */
  private[graft] final class MgSummary(val size: Int) extends Serializable {
    require(size >= 1)
    val counts = new scala.collection.mutable.HashMap[String, Long]
    var slack = 0L

    def add(v: String, c: Long = 1L): this.type = {
      counts.update(v, counts.getOrElse(v, 0L) + c)
      if (counts.size > 2 * size) trim()
      this
    }

    /** Batch decrement: subtract the (size+1)-th largest count from
      * every counter and drop the non-positive ones — at most `size`
      * survive, and every dropped/zeroed value's undercount grows by
      * exactly the cutoff. */
    private def trim(): Unit = {
      val vs = counts.values.toArray
      java.util.Arrays.sort(vs)
      val cut = vs(vs.length - size - 1)
      slack += cut
      counts.filterInPlace((_, c) => c > cut)
    }

    def merge(other: MgSummary): this.type = {
      other.counts.foreach { case (v, c) =>
        counts.update(v, counts.getOrElse(v, 0L) + c)
      }
      slack += other.slack
      if (counts.size > 2 * size) trim()
      this
    }
  }

  /** Exact top-k most frequent non-null values of `valueCol`.
    * Returns `(value, n)` ordered by `(n DESC, value ASC)`, exactly
    * `min(k, |distinct|)` rows. */
  def exactTopK(
      df: DataFrame,
      valueCol: String,
      k: Int,
      sketchSize: Int = 4096): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(sketchSize >= k, s"sketchSize ($sketchSize) must be >= k ($k)")
    val spark = df.sparkSession
    import spark.implicits._
    val values: Dataset[String] =
      df.select(col(valueCol).cast("string")).filter(col(valueCol).isNotNull)
        .as[String]
    val summary = values.rdd.treeAggregate(new MgSummary(sketchSize))(
      (s, v) => s.add(v), (a, b) => a.merge(b), depth = 2)

    def fullTopK: DataFrame =
      df.filter(col(valueCol).isNotNull)
        .groupBy(col(valueCol).cast("string").as("value"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("value").asc)
        .limit(k)

    if (summary.counts.isEmpty) return fullTopK // empty input
    val cand = summary.counts.keys.toSeq.toDF("value")
    val recount = df
      .select(col(valueCol).cast("string").as("value"))
      .join(broadcast(cand), Seq("value"), "left_semi")
      .groupBy("value").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("value").asc)
      .limit(k)
      .capLineage()
    // Exactness gate on the bounded k-row head: the weakest returned
    // count must beat the largest count any NON-candidate could hide
    // (= slack). Fewer than k candidates with slack 0 means fewer than
    // k distinct values exist at all — still exact.
    val head = recount.collect()
    val provablyExact =
      if (summary.slack == 0L) true
      else head.length == k && head.last.getLong(1) > summary.slack
    if (provablyExact) recount else fullTopK
  }
}
