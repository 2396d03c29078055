package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-ORDER (Morton-curve) clustering at
  * write time, so that scans filtering on ANY of the layout dimensions
  * skip most of the data — the standard answer (Delta OPTIMIZE ZORDER
  * BY, Iceberg sort orders) to "we sorted by date, so every query on
  * customer still reads 100 TB".
  *
  * A single-column sort concentrates that column's values per file but
  * leaves every other column's min/max spanning the full domain — file
  * and row-group statistics (the pruning unit at scale) only help on the
  * sort column. Interleaving the bits of several columns' EQUI-DEPTH
  * bucket ranks gives each file a small hyper-rectangle of the combined
  * domain, so min/max stats stay narrow on every layout dimension at
  * once: a predicate on any of them prunes ~n^((d-1)/d) of the files.
  *
  * Scale shape: one `approxQuantile` pass per dimension for the bucket
  * boundaries (equi-depth ranks, so skewed columns still spread across
  * the curve — linear min/max scaling would collapse a heavy hitter into
  * one bucket), then a single range-repartition + in-partition sort on
  * the z-value — the exact pay-once shuffle a bucketed write does. The
  * z-value itself is pure codegen arithmetic (shift/and/or), no UDFs.
  */
object Layout {

  /** Z-value column: interleaved bits of the equi-depth bucket ranks of
    * `dims` (numeric columns; nulls rank lowest). `boundaries(d)` are the
    * ascending bucket edges for dimension d (size 2^bitsPerDim - 1, from
    * [[boundariesFor]]'s quantile pass). Shared by [[zorderWrite]] and
    * [[graft.operators.Versioned.cluster]]. */
  private[graft] def zvalue(
      dims: Seq[String],
      boundaries: Seq[Array[Double]],
      bitsPerDim: Int): Column = {
    val d = dims.size
    val buckets = dims.zip(boundaries).map { case (c, bs) =>
      // Rank = how many boundaries lie at or below the value: a
      // higher-order filter over a literal array — interpreted, but this
      // runs once, at write time, inside the pay-once layout shuffle.
      val arr = array(bs.map(lit(_)): _*)
      val x = coalesce(col(c).cast("double"), lit(Double.NegativeInfinity))
      size(filter(arr, b => b <= x)).cast("long")
    }
    buckets.zipWithIndex.foldLeft(lit(0L)) { case (acc, (b, dim)) =>
      (0 until bitsPerDim).foldLeft(acc) { (a, i) =>
        a.bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * d + dim))
      }
    }
  }

  /** Write `df` to `path` as parquet, z-order-clustered on `dims`
    * (numeric columns). `numFiles` bounds the file count — at cluster
    * scale set it so files land near the row-group/HDFS-block sweet spot
    * (~128 MB–1 GB). `bitsPerDim` trades curve resolution against the
    * quantile pass (2^bits boundaries per dimension); 8 bits = 256
    * equi-depth buckets per dimension is plenty below ~10⁵ files. */
  /** Equi-depth bucket boundaries for every layout dimension in ONE
    * quantile pass (one job, not one per dim — at 100 TB each quantile
    * pass is a full scan). Boundary precision only needs to resolve
    * bucket edges, so the relative error tracks the bucket width
    * (quarter-bucket): tighter bits → tighter summaries, and a coarse
    * curve never pays for precision it cannot encode. */
  private[graft] def boundariesFor(
      df: DataFrame, dims: Seq[String], bitsPerDim: Int): Seq[Array[Double]] = {
    require(dims.nonEmpty, "z-order requires at least one dimension")
    require(bitsPerDim >= 1 && dims.size * bitsPerDim <= 63,
      s"dims*bitsPerDim must fit a long, got ${dims.size}*$bitsPerDim")
    val nb = (1 << bitsPerDim) - 1
    val probs = (1 to nb).map(_.toDouble / (nb + 1)).toArray
    val err = 0.25 / (nb + 1)
    df.stat.approxQuantile(dims.toArray, probs, err).toSeq
  }

  def zorderWrite(
      df: DataFrame,
      dims: Seq[String],
      path: String,
      numFiles: Int,
      bitsPerDim: Int = 8): Unit = {
    val boundaries = boundariesFor(df, dims, bitsPerDim)
    df.withColumn("__z", zvalue(dims, boundaries, bitsPerDim))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file [min, max] of `valueCol` in a parquet directory — the
    * statistics a pruning scan consults. One column-pruned footer-cheap
    * aggregate per file; used by specs (and operators sizing a layout)
    * to measure how many files a predicate would actually touch. */
  def fileRanges(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      valueCol: String): Seq[(String, Double, Double)] = {
    spark.read.parquet(path)
      .select(input_file_name().as("f"), col(valueCol).cast("double").as("v"))
      .groupBy("f").agg(min("v").as("lo"), max("v").as("hi"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .toSeq
  }
}
