package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Streaming-ingest flavor of the [[graft.operators.Sketches]] store:
  * each micro-batch writes ITS OWN per-group HLL token sketch rows
  * (append) through `foreachBatch` — the summarize-once-per-batch
  * contract applied at ingest time, so the sketch store grows by one
  * KB-sized row set per micro-batch and
  * [[graft.operators.Sketches.mergedDistinct]] answers "distinct across
  * everything ingested so far" at any point WITHOUT rescanning the
  * corpus. Mergeability is what makes the parity exact: the union of
  * per-micro-batch sketches IS the sketch of the union, so the
  * streaming store's merged estimate equals the batch-computed one
  * bit-for-bit (pinned in SketchesSpec and gated by the identical
  * oracle as `sketch_store`). The checkpoint guarantees each batch
  * contributes exactly once across restarts. */
object StreamingSketches {

  /** Drain `batches` as checkpointed AvailableNow micro-batch runs,
    * appending each micro-batch's sketch rows to `path`. */
  def sketchDrain(
      spark: SparkSession,
      batches: Seq[DataFrame],
      textCol: String,
      groupCol: String,
      path: String,
      lgK: Int = 12): Unit =
    StagedDrain.runForeach(spark, batches, (df: DataFrame, _: Long) =>
      df.select(col(groupCol).as("group"),
          explode(tokens(col(textCol))).as("__tok"))
        .groupBy("group")
        .agg(hll_sketch_agg(col("__tok"), lit(lgK)).as("sketch"))
        .write.mode("append").parquet(path))
}
