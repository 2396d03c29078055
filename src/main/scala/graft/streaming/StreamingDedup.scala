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

  /** BOUNDED-STATE streaming dedup — the 100 TB fix for
    * [[firstPerFingerprint]]'s structural flaw: `NoTimeout` state grows
    * by one entry per distinct key FOREVER, which on an unbounded stream
    * is an unbounded state store. Here each key's state carries only its
    * max event time and an EVENT-TIME TIMEOUT at `maxTs + retentionMs`:
    * once the watermark passes that, the state is evicted, and a key
    * seen again AFTER eviction emits again. Semantics: "emit the first
    * event per key per retention epoch" — alert suppression / feed
    * dedup with a TTL, state bounded by keys ACTIVE within the
    * retention window, not keys ever seen.
    *
    * Determinism contract (what the driver oracle recomputes exactly):
    *   - emission picks the MIN `idCol` among the key's rows in the
    *     batch (never arrival order);
    *   - state max-ts is the max over ALL of the key's batch rows
    *     (the group iterator sees the whole batch — not arrival order);
    *   - timestamps are ms-floored (`Timestamp.getTime`), matching the
    *     engine's ms-granular watermark;
    *   - a timeout fires in the first batch where watermark >
    *     maxTs + retention AND the key has no data (Spark calls the
    *     timeout path only for data-less groups; an incremental drain's
    *     trailing no-data batch is what makes eviction deterministic —
    *     see [[StagedDrain]]);
    *   - input rows below the watermark are late-filtered before the
    *     operator (counted row-wise in numRowsDroppedByWatermark).
    * Output: one (`key`, idCol) row per emission, `key` the
    * `\u0001`-joined key columns. */
  def firstPerKeyTtl(
      docs: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      idCol: String,
      watermarkDelay: String,
      retentionMs: Long): DataFrame = {
    require(keyCols.nonEmpty, "ttl dedup needs at least one key column")
    require(retentionMs > 0, s"retention must be positive: $retentionMs")
    val spark = docs.sparkSession
    import spark.implicits._
    // The watermarked TIMESTAMP column must survive UNTRANSFORMED to
    // the stateful operator: projecting it away — or even wrapping it in
    // a cast — strips the watermark metadata from the attribute and
    // analysis fails with "Watermark must be specified". A bare alias
    // preserves it; ms-flooring happens in the lambda via
    // Timestamp.getTime.
    val keyed = docs
      .withWatermark(tsCol, watermarkDelay)
      .select(
        concat_ws("\u0001", keyCols.map(c => col(c).cast("string")): _*).as("k"),
        col(tsCol).as("__ts"),
        col(idCol).cast("long").as("__id"))
      .as[(String, java.sql.Timestamp, Long)]
    keyed
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (String, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (k: String, rows: Iterator[(String, java.sql.Timestamp, Long)],
         state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val rs = rows.toSeq
            val batchMax = rs.iterator.map(_._2.getTime).max
            val newMax = if (state.exists) math.max(state.get, batchMax) else batchMax
            val out =
              if (state.exists) Iterator.empty
              else Iterator((k, rs.iterator.map(_._3).min))
            state.update(newMax)
            state.setTimeoutTimestamp(newMax + retentionMs)
            out
          }
      }
      .toDF("key", idCol)
  }

  /** [[firstPerKeyTtl]] drained incrementally over staged batches (one
    * checkpointed AvailableNow run each — [[StagedDrain]]), aggregated to
    * ONE auditable row: emissions, distinct keys (emissions − keys =
    * re-emissions after TTL eviction), an id checksum pinning EXACTLY
    * which rows were emitted, and the engine's late-row counter. Every
    * number is a deterministic function of the batch contents, which the
    * driver oracle recomputes in DuckDB. */
  def ttlDedupAudit(
      spark: SparkSession,
      batches: Seq[DataFrame],
      keyCols: Seq[String],
      tsCol: String,
      idCol: String,
      watermarkDelay: String,
      retentionMs: Long): DataFrame = {
    val (emitted, late) = StagedDrain.run(spark, batches,
      df => firstPerKeyTtl(df, keyCols, tsCol, idCol, watermarkDelay, retentionMs))
    emitted.agg(
      count(lit(1)).as("n_emitted"),
      countDistinct(col("key")).as("n_keys"),
      coalesce(sum(col(idCol)), lit(0L)).as("id_checksum"))
      .withColumn("n_late_rows", lit(late))
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
