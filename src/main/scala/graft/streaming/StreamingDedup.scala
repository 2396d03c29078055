package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import graft.functions.TextFunctions

/** Streaming exact-dedup: emit only the FIRST document seen per content
  * fingerprint, across micro-batches, using keyed state
  * (`flatMapGroupsWithState`) — the streaming complement of
  * `Dedup.exactText`.
  *
  * Scale: state is one boolean per distinct fingerprint, partitioned by
  * the state-store key (the md5 fingerprint — uniform, no skew). Payload
  * never enters state. The same code path runs in batch (each group sees
  * all its rows at once, state starts empty) and streaming (state carries
  * across micro-batches), which is how the spec validates it.
  */
object StreamingDedup {

  /** (fingerprint, id) of first-seen docs. Works on batch or streaming
    * input. First-arrival order within a micro-batch is source order —
    * deterministic only if the source is (single-file streams are). */
  def firstPerFingerprint(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val keyed = docs
      .select(TextFunctions.fingerprint(col(textCol)).as("fp"),
        col(idCol).cast("long").as("id"))
      .as[(String, Long)]
    keyed
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (String, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (fp: String, rows: Iterator[(String, Long)], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            rows.take(1).map { case (_, id) => (fp, id) }
          }
      }
      .toDF("fp", idCol)
  }

  /** Streaming variant over a parquet file source → in-memory sink table.
    * Mirrors EventWindows.streamTumblingToMemory's single-file handling. */
  def streamToMemory(
      spark: SparkSession,
      sourceDir: String,
      textCol: String,
      idCol: String,
      sinkTable: String,
      availableNow: Boolean = false): StreamingQuery = {
    val schema = spark.read.parquet(sourceDir).schema
    val f = new java.io.File(sourceDir)
    val reader =
      if (f.isFile)
        spark.readStream.schema(schema)
          .option("pathGlobFilter", f.getName).parquet(f.getParent)
      else spark.readStream.schema(schema).parquet(sourceDir)
    val writer = firstPerFingerprint(reader, textCol, idCol)
      .writeStream
      .format("memory")
      .queryName(sinkTable)
      .outputMode("append")
    (if (availableNow)
       writer.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else writer)
      .start()
  }

  /** Run the streaming dedup to COMPLETION (Trigger.AvailableNow) and
    * return the emitted (fp, id) rows. Which id represents a fingerprint
    * depends on shuffle arrival order, but the emitted FINGERPRINT SET is
    * exactly the distinct fingerprints of the input — one row each, which
    * is the invariant a value oracle can pin across engines. */
  def dedupAvailableNow(
      spark: SparkSession,
      sourceDir: String,
      textCol: String,
      idCol: String): DataFrame = {
    val sink = s"graft_stream_dedup_${java.util.UUID.randomUUID().toString.take(8)}"
    val q = streamToMemory(spark, sourceDir, textCol, idCol, sink, availableNow = true)
    q.awaitTermination()
    spark.table(sink)
  }
}
