package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.functions.VectorFunctions.dotNative

/** Scalar int8 quantization for embedding columns: per-vector symmetric
  * scale = max|xᵢ|/127, stored as (array<tinyint>, float scale) — a 4×
  * storage/shuffle reduction that matters when the embedding table is a
  * large fraction of 100 TB. Dequantized cosine stays ≈1 against the
  * original (validated per-row by the driver oracle).
  *
  * Plan shape: two narrow projections per row (scale first, THEN the
  * element transforms referencing the materialized scale column —
  * inlining the scale subtree into each element lambda re-evaluates the
  * array_max per element). No shuffle, no UDFs.
  */
object Quantize {

  /** Adds `<vecCol>_q: array<tinyint>` and `<vecCol>_scale: double`. */
  def int8(df: DataFrame, vecCol: String): DataFrame = {
    val v = transform(col(vecCol), _.cast("double"))
    df.withColumn("__v", v)
      .withColumn(s"${vecCol}_scale",
        greatest(array_max(transform(col("__v"), abs(_))), lit(1e-12d)) / 127.0d)
      .withColumn(s"${vecCol}_q",
        transform(col("__v"), x => round(x / col(s"${vecCol}_scale")).cast("byte")))
      .drop("__v")
  }

  /** Reconstruct doubles from the int8 encoding. */
  def dequantize(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn(s"${vecCol}_deq",
      transform(col(s"${vecCol}_q"),
        q => q.cast("double") * col(s"${vecCol}_scale")))

  /** Matryoshka-style dimension truncation: keep the first `dims`
    * elements of the embedding. A 64→16 cut is a 4× storage/shuffle/
    * dot-product reduction — the other axis of embedding compression
    * next to int8 (they compose). Cosine over the truncated vectors
    * needs no renormalization (cosine is scale-invariant), so this is
    * ONE narrow slice projection: no shuffle, no UDF, evaluated in the
    * scan stage. Retrieval quality is the gate that matters — see the
    * `truncated_recall` driver query — because per-row cosine against
    * the full vector understates what top-k survives. */
  def truncate(df: DataFrame, vecCol: String, dims: Int): DataFrame = {
    require(dims >= 1, "dims must be >= 1")
    df.withColumn(s"${vecCol}_t", slice(col(vecCol), 1, dims))
  }

  /** Round-trip quality report: per row, the cosine between the original
    * vector and its dequantized reconstruction. */
  def roundTripCosine(df: DataFrame, vecCol: String, idCol: String): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val deq = dequantize(int8(df, vecCol), vecCol)
      .withColumn("__v", transform(col(vecCol), _.cast("double")))
    val nn = sqrt(dotNative(col("__v"), col("__v"))) *
      sqrt(dotNative(col(s"${vecCol}_deq"), col(s"${vecCol}_deq")))
    deq.select(
      col(idCol),
      round(col(s"${vecCol}_scale"), 6).as("scale"),
      round(when(nn === 0.0d, 0.0d)
        .otherwise(dotNative(col("__v"), col(s"${vecCol}_deq")) / nn), 4).as("cos_rt"))
  }
}
