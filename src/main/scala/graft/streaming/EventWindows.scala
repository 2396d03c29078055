package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamReader, StreamingQuery}
import org.apache.spark.sql.SparkSession

/** Time-window aggregation over the `events` table — written once against
  * the DataFrame API so the SAME code runs in batch (parquet scan) and in
  * Structured Streaming (readStream + watermark): Spark's unified model.
  *
  * Scale: windowed groupBy is a keyed shuffle on (window, event_type);
  * streaming state is bounded by the watermark (late data beyond it is
  * dropped and its state evicted). */
object EventWindows {

  /** Tumbling windows: count/sum/avg of `value` per (window, event_type).
    * Works on both batch and streaming inputs. */
  def tumbling(events: DataFrame, tsCol: String, duration: String): DataFrame =
    events
      .groupBy(window(col(tsCol), duration).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum("value"), 4).as("sum_value"),
        round(avg("value"), 6).as("avg_value"))
      .select(
        col("w.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"), col("avg_value"))

  /** Sliding windows (duration, slide). */
  def sliding(events: DataFrame, tsCol: String, duration: String, slide: String): DataFrame =
    events
      .groupBy(window(col(tsCol), duration, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("sum_value"))
      .select(col("w.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Session windows per user: gap-based sessionization (session_window). */
  def sessions(events: DataFrame, tsCol: String, gap: String): DataFrame =
    events
      .groupBy(session_window(col(tsCol), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("sum_value"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Streaming variant: parquet-file source → watermarked tumbling agg.
    * Returns the running query writing to an in-memory sink table
    * (`sinkTable`) in Append mode. */
  def streamTumblingToMemory(
      spark: SparkSession,
      sourceDir: String,
      tsCol: String,
      duration: String,
      watermark: String,
      sinkTable: String): StreamingQuery =
    startToMemory(spark, sourceDir, tsCol, sinkTable,
      s => tumbling(s.withWatermark(tsCol, watermark), tsCol, duration))

  /** Streaming gap-sessionization: same session_window code as batch, with
    * watermark-driven state eviction (a session closes — and its state is
    * dropped — once the watermark passes its end + gap). */
  def streamSessionsToMemory(
      spark: SparkSession,
      sourceDir: String,
      tsCol: String,
      gap: String,
      watermark: String,
      sinkTable: String): StreamingQuery =
    startToMemory(spark, sourceDir, tsCol, sinkTable,
      s => sessions(s.withWatermark(tsCol, watermark), tsCol, gap))

  /** Run the SAME tumbling aggregation through Structured Streaming to
    * COMPLETION and return the materialized result: file source →
    * watermarked windowed agg → memory sink, `Trigger.AvailableNow` (the
    * stream drains every available file, then stops). Output mode is
    * `complete`, so every window is emitted when the stream finishes —
    * append mode would hold back windows the final watermark hasn't
    * passed, which can never reach parity with batch over a finite
    * fixture. A single parquet file drains in one micro-batch (the
    * watermark trails a batch behind, so nothing is late-dropped) —
    * batch/streaming parity is exact, which the driver oracle asserts
    * with the batch query's SQL. */
  def tumblingAvailableNow(
      spark: SparkSession,
      sourceDir: String,
      tsCol: String,
      duration: String,
      watermark: String): DataFrame = {
    val sink = s"graft_stream_tumbling_${java.util.UUID.randomUUID().toString.take(8)}"
    val q = startToMemory(spark, sourceDir, tsCol, sink,
      s => tumbling(s.withWatermark(tsCol, watermark), tsCol, duration),
      outputMode = "complete", availableNow = true)
    q.awaitTermination()
    spark.table(sink)
  }

  /** Sliding windows through Structured Streaming to COMPLETION — the
    * sliding twin of [[tumblingAvailableNow]] (complete mode, finite
    * source drains, exact batch parity the driver oracle asserts with
    * the batch query's SQL). */
  def slidingAvailableNow(
      spark: SparkSession,
      sourceDir: String,
      tsCol: String,
      duration: String,
      slide: String,
      watermark: String): DataFrame = {
    val sink = s"graft_stream_sliding_${java.util.UUID.randomUUID().toString.take(8)}"
    val q = startToMemory(spark, sourceDir, tsCol, sink,
      s => sliding(s.withWatermark(tsCol, watermark), tsCol, duration, slide),
      outputMode = "complete", availableNow = true)
    q.awaitTermination()
    spark.table(sink)
  }

  /** Gap-sessionization through Structured Streaming to COMPLETION —
    * the session twin of [[tumblingAvailableNow]]: file source →
    * watermarked `session_window` agg → memory sink, complete mode so
    * every closed-or-open session is emitted when the finite source
    * drains, giving exact batch parity the driver oracle can assert
    * with the batch query's SQL. */
  def sessionsAvailableNow(
      spark: SparkSession,
      sourceDir: String,
      tsCol: String,
      gap: String,
      watermark: String): DataFrame = {
    val sink = s"graft_stream_sessions_${java.util.UUID.randomUUID().toString.take(8)}"
    val q = startToMemory(spark, sourceDir, tsCol, sink,
      s => sessions(s.withWatermark(tsCol, watermark), tsCol, gap),
      outputMode = "complete", availableNow = true)
    q.awaitTermination()
    spark.table(sink)
  }

  /** LATE-DATA AUDIT: the tumbling aggregation drained INCREMENTALLY —
    * one `Trigger.AvailableNow` run per input batch against a PERSISTENT
    * CHECKPOINT, the standard production shape for a periodic job over
    * an arriving feed. This structure is what makes late-dropping
    * deterministic AND real: each run's trailing no-data batch commits
    * the advanced watermark and EVICTS closed windows, so the next run
    * restores wm_k = max(event time of batches < k) − delay from the
    * commit log and drops batch-k rows whose window is closed
    * (window.end ≤ wm_k; EventWindowsLateDataSpec pins the row-level
    * semantics). A single AvailableNow run over the same files would
    * drop NOTHING — eviction lags the watermark by a batch, so late
    * rows merge into still-live state (measured: 0 dropped over a
    * 2-file drain); the per-run commit is the fence that closes windows.
    *
    * Returns ONE row (n_windows, n_events, n_dropped_late) aggregated
    * over every run's append-mode output; the dropped count is the
    * state operator's own `numRowsDroppedByWatermark` metric summed
    * over runs — the engine's counter, not a recomputation, which is
    * what makes the oracle cross-check a real gate on watermark
    * behavior. The metric fires at the stateful operator, which sits
    * AFTER the partial aggregate and its exchange — what it counts is
    * late (window, group) MERGED ROWS, i.e. distinct late groups per
    * run, not late input rows (measured: 499 late input rows across
    * 497 groups → metric 497). The oracle recomputes exactly that. */
  def tumblingLateAudit(
      spark: SparkSession,
      batches: Seq[DataFrame],
      tsCol: String,
      duration: String,
      watermark: String): DataFrame = {
    val (emitted, dropped) = StagedDrain.run(spark, batches,
      s => tumbling(s.withWatermark(tsCol, watermark), tsCol, duration))
    emitted.agg(
      count(lit(1)).as("n_windows"),
      coalesce(sum(col("n_events")), lit(0L)).as("n_events"))
      .withColumn("n_dropped_late", lit(dropped))
  }

  private def startToMemory(
      spark: SparkSession,
      sourceDir: String,
      tsCol: String,
      sinkTable: String,
      transform: DataFrame => DataFrame,
      outputMode: String = "append",
      availableNow: Boolean = false): StreamingQuery = {
    // events.parquet has shipped as both TIMESTAMP(NANOS) and
    // timestamp[us] across fixture regenerations — infer the schema under
    // the nanos-tolerant conf and let Tables.adaptEventTs normalize ts to
    // a session-TZ timestamp whichever encoding this fixture carries.
    graft.Tables.withNanosAsLong(spark) {
      val schema = spark.read.parquet(sourceDir).schema
      // The file-stream source wants a directory; a single-file input
      // becomes its parent dir + a glob filter for just that file.
      val f = new java.io.File(sourceDir)
      val reader =
        if (f.isFile)
          spark.readStream.schema(schema)
            .option("pathGlobFilter", f.getName).parquet(f.getParent)
        else spark.readStream.schema(schema).parquet(sourceDir)
      val stream = graft.Tables.adaptEventTs(reader, tsCol)
      val writer = transform(stream)
        .writeStream
        .format("memory")
        .queryName(sinkTable)
        .outputMode(outputMode)
      (if (availableNow)
         writer.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
       else writer)
        .start()
    }
  }
}
