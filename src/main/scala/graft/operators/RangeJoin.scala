package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) joins without a cross product.
  *
  * Spark plans a plain non-equi join (`p >= lo && p < hi`) as a broadcast
  * nested loop — O(|L|·|R|) comparisons, the classic 100 TB cliff. The
  * standard scalable rewrite (used by every interval-join engine, e.g.
  * Flink's interval join and the published overlap-join literature) is
  * BINNING: quantize the value domain into fixed-width bins, explode each
  * interval to the bins it overlaps, map each point to its single bin,
  * then EQUI-join on the bin id and apply the exact predicate as a
  * residual filter. The join becomes a hash/sort-merge join that
  * partitions by bin — fully parallel, skew-safe under AQE, and the
  * comparison count drops from |L|·|R| to pairs sharing a bin.
  *
  * `binWidth` tuning: an interval of length len lands in ~len/binWidth+1
  * bins, so rows blow up by that factor; a bin of width w collects all
  * points within w of an interval as candidates. Set `binWidth` near the
  * TYPICAL interval length — that bounds both the explode factor (~2×)
  * and false candidates (~1 bin's worth per interval end).
  *
  * Interval-overlap pairs can share many bins; instead of a `distinct`
  * (an extra full shuffle of the result), each pair is kept only in the
  * FIRST bin both sides share — `bin == max(floor(ls/w), floor(rs/w))` —
  * which is computable per joined row, so each pair survives exactly
  * once with zero extra shuffles.
  */
object RangeJoin {

  /** Point-in-interval join: rows of `points` paired with rows of
    * `intervals` where `startCol <= point < endCol` (half-open, the
    * usual windowing convention). Degenerate intervals (start >= end)
    * match nothing. Output: all point columns then all interval columns.
    */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val p = points.withColumn("__bin",
      floor(col(pointCol).cast("double") / binWidth).cast("long"))
    val iv = intervals
      .where(col(startCol) < col(endCol))
      .withColumn("__bin", explode(sequence(
        floor(col(startCol).cast("double") / binWidth).cast("long"),
        floor(col(endCol).cast("double") / binWidth).cast("long"))))
    // The point's bin is unique, so each matching pair meets in exactly
    // one bin: no dedup needed.
    p.join(iv, Seq("__bin"))
      .where(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bin")
  }

  /** Interval-overlap join: pairs where `[lStart, lEnd)` and
    * `[rStart, rEnd)` intersect (`lStart < rEnd && rStart < lEnd`).
    * Column names must not collide between the two sides. Output: all
    * left columns then all right columns, each overlapping pair exactly
    * once. */
  def intervalOverlap(
      left: DataFrame,
      lStart: String,
      lEnd: String,
      right: DataFrame,
      rStart: String,
      rEnd: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def binned(df: DataFrame, s: String, e: String): DataFrame = df
      .where(col(s) < col(e))
      .withColumn("__bin", explode(sequence(
        floor(col(s).cast("double") / binWidth).cast("long"),
        floor(col(e).cast("double") / binWidth).cast("long"))))
    val l = binned(left, lStart, lEnd)
    val r = binned(right, rStart, rEnd)
    l.join(r, Seq("__bin"))
      .where(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      // First-shared-bin dedup: both sides overlap every bin from
      // max(floor(ls/w), floor(rs/w)) up to the end of the intersection,
      // so keeping the pair only there keeps it exactly once.
      .where(col("__bin") === greatest(
        floor(col(lStart).cast("double") / binWidth).cast("long"),
        floor(col(rStart).cast("double") / binWidth).cast("long")))
      .drop("__bin")
  }
}
