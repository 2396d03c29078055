package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared machinery for DETERMINISTIC incremental streaming drains: each
  * input DataFrame is staged as one parquet file and drained by its own
  * `Trigger.AvailableNow` run against a persistent checkpoint and a
  * parquet FILE sink (the memory sink cannot recover a checkpoint; the
  * file sink is the fault-tolerant one a real periodic job uses).
  *
  * The per-run commit is what makes event-time semantics reproducible:
  * each run's trailing no-data batch commits the advanced watermark,
  * evicts closed windows / fires expired state timeouts, and the NEXT
  * run restores that watermark from the commit log — so late-drop and
  * state-TTL outcomes are pure functions of the batch contents, which an
  * external engine can recompute. (A single AvailableNow run over the
  * same files drops nothing: eviction lags the watermark by a batch.)
  *
  * TEST HARNESS ONLY — the `coalesce(1)` staging that makes batch
  * contents deterministic serializes each batch through one task; a
  * production ingest path must keep the source's natural parallelism
  * (plain `readStream` over the landing directory, no staging), where
  * the same transforms run unchanged. */
private[graft] object StagedDrain {

  /** Drain `batches` through `transform` one checkpointed AvailableNow
    * run each. Returns (all emitted rows, Σ numRowsDroppedByWatermark
    * across runs — for stateful aggregations the metric counts late
    * POST-SHUFFLE GROUPS; for row-level state ops it counts rows). */
  def run(
      spark: SparkSession,
      batches: Seq[DataFrame],
      transform: DataFrame => DataFrame): (DataFrame, Long) = {
    require(batches.nonEmpty, "staged drain needs at least one batch")
    val stage = java.nio.file.Files.createTempDirectory("graft_staged_drain")
    val ckpt = stage.resolve("__checkpoint").toString
    val out = stage.resolve("__out").toString
    var dropped = 0L
    batches.zipWithIndex.foreach { case (b, i) =>
      stageBatch(stage, b, i)
      val src = spark.readStream.schema(b.schema)
        .option("pathGlobFilter", "batch_*.parquet")
        .parquet(stage.toString)
      val q = transform(src)
        .writeStream.format("parquet").outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      dropped += q.recentProgress.toSeq
        .flatMap(_.stateOperators.toSeq).map(_.numRowsDroppedByWatermark).sum
    }
    (spark.read.parquet(out), dropped)
  }

  /** Same staging + checkpointed AvailableNow drains, but each
    * micro-batch is handed to `handler` (the `foreachBatch` sink) — for
    * ingest paths whose per-batch output is a SIDE artifact (sketch
    * rows, signature stores) rather than a row stream. The checkpoint
    * still guarantees each staged batch is processed exactly once
    * across the runs. */
  def runForeach(
      spark: SparkSession,
      batches: Seq[DataFrame],
      handler: (DataFrame, Long) => Unit): Unit = {
    require(batches.nonEmpty, "staged drain needs at least one batch")
    val stage = java.nio.file.Files.createTempDirectory("graft_staged_drain")
    val ckpt = stage.resolve("__checkpoint").toString
    batches.zipWithIndex.foreach { case (b, i) =>
      stageBatch(stage, b, i)
      val src = spark.readStream.schema(b.schema)
        .option("pathGlobFilter", "batch_*.parquet")
        .parquet(stage.toString)
      val q = src.writeStream
        .foreachBatch { (df: DataFrame, id: Long) => handler(df, id) }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
  }

  private def stageBatch(
      stage: java.nio.file.Path, b: DataFrame, i: Int): Unit = {
    val tmp = stage.resolve(s"__tmp_$i")
    b.coalesce(1).write.parquet(tmp.toString)
    val part = tmp.toFile.listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(s"no part file under $tmp"))
    val dest = new java.io.File(stage.toFile, f"batch_$i%03d.parquet")
    java.nio.file.Files.move(part.toPath, dest.toPath)
    tmp.toFile.listFiles().foreach(_.delete())
    tmp.toFile.delete()
  }
}
