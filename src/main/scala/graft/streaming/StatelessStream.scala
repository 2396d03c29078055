package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Checkpoints.CapOps

/** Run a STATELESS transform (projections/filters only — no aggregation,
  * no state) over a parquet file source through Structured Streaming to
  * COMPLETION, and return the materialized result.
  *
  * This is the unified-model guarantee for the curation stack: a
  * scan-stage operator (line rules, quality metrics, PII redaction,
  * fingerprinting) written once against the DataFrame API runs
  * unchanged over a stream. Stateless transforms need no watermark and
  * emit every result row in the draining micro-batch, so batch/stream
  * parity is EXACT — the driver oracle asserts it with the batch
  * query's SQL. At scale the file source partitions work exactly like
  * the batch scan; nothing accumulates in the state store. */
object StatelessStream {

  def transformAvailableNow(
      spark: SparkSession,
      sourceDir: String,
      transform: DataFrame => DataFrame): DataFrame = {
    val sink =
      s"graft_stream_stateless_${java.util.UUID.randomUUID().toString.take(8)}"
    val schema = spark.read.parquet(sourceDir).schema
    // The file-stream source wants a directory; a single-file input
    // becomes its parent dir + a glob filter for just that file.
    val f = new java.io.File(sourceDir)
    val reader =
      if (f.isFile)
        spark.readStream.schema(schema)
          .option("pathGlobFilter", f.getName).parquet(f.getParent)
      else spark.readStream.schema(schema).parquet(sourceDir)
    val q = transform(reader)
      .writeStream
      .format("memory")
      .queryName(sink)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // The memory sink pins the full result in driver memory for as long
    // as its temp view exists; repeated invocations (Verify + Bench both
    // drive this) would accumulate. Eagerly checkpoint the result into
    // block storage (released by the ContextCleaner once the returned
    // frame is unreferenced) and drop the view immediately.
    val out = spark.table(sink).capLineage()
    spark.catalog.dropTempView(sink)
    out
  }
}
