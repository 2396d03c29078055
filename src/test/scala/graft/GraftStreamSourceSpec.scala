package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Versioned

/** `spark.readStream.format("graft")` — the manifest-driven streaming
  * source ([[graft.sources.GraftStreamSource]]): schema from the
  * manifest, offsets = versions, batches planned from version ranges.
  * Pins the contracts the file-stream flavor could not give:
  * written-but-unpublished groups NEVER emit, rewrites fail loudly at
  * plan time, checkpointed re-drains are exactly-once, startingVersion
  * and maxVersionsPerBatch admission. */
class GraftStreamSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tbl() = Files.createTempDirectory("graft-ssrc").toString + "/t"

  private def scratch(): (String, String) = {
    val d = Files.createTempDirectory("graft-ssrc-io")
    (d.resolve("sink").toString, d.resolve("ckpt").toString)
  }

  private def drain(dir: String, sink: String, ckpt: String,
      options: Map[String, String] = Map.empty): Unit = {
    val reader = spark.readStream.format("graft")
    options.foreach { case (k, v) => reader.option(k, v) }
    val q = reader.load(dir)
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  private def sinkIds(sink: String): Seq[Long] =
    spark.read.parquet(sink).select("id").as[Long].collect().toSeq.sorted

  test("drain from genesis equals the table; incremental appends arrive once") {
    val dir = tbl()
    Versioned.commit((0L until 10L).map(i => (i, s"v$i")).toDF("id", "v"), dir)
    Versioned.append((10L until 20L).map(i => (i, s"v$i")).toDF("id", "v"), dir)
    val (sink, ckpt) = scratch()
    drain(dir, sink, ckpt)
    assert(sinkIds(sink) == (0L until 20L))
    // no new data: a re-drain on the same checkpoint emits NOTHING
    drain(dir, sink, ckpt)
    assert(sinkIds(sink) == (0L until 20L), "re-drain must be exactly-once")
    // new append arrives exactly once
    Versioned.append((20L until 25L).map(i => (i, s"v$i")).toDF("id", "v"), dir)
    drain(dir, sink, ckpt)
    assert(sinkIds(sink) == (0L until 25L))
  }

  test("schema comes from the manifest — no user schema needed; a conflicting one refuses") {
    val dir = tbl()
    Versioned.commit(Seq((1L, "a")).toDF("id", "v"), dir)
    val df = spark.readStream.format("graft").load(dir)
    assert(df.schema.fieldNames.toSeq == Seq("id", "v"))
    val e = intercept[IllegalArgumentException] {
      spark.readStream.format("graft")
        .schema(org.apache.spark.sql.types.StructType.fromDDL("x INT"))
        .load(dir)
    }
    assert(e.getMessage.contains("manifest already carries"))
  }

  test("a group written but UNPUBLISHED never emits (the changesStream race, closed)") {
    val dir = tbl()
    Versioned.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    // simulate a writer mid-commit: data files durable under files/,
    // manifest not yet published — a file-listing stream would emit
    // these rows; the manifest-driven source must not see them
    Seq((99L, "torn")).toDF("id", "v")
      .write.parquet(s"$dir/files/unpublished-${java.util.UUID.randomUUID()}")
    val (sink, ckpt) = scratch()
    drain(dir, sink, ckpt)
    assert(sinkIds(sink) == Seq(1L, 2L),
      "an unpublished group must be invisible to the stream")
  }

  test("a rewrite version fails the query loudly at plan time; no rewrite row emits") {
    val dir = tbl()
    Versioned.commit((0L until 6L).map(i => (i, s"v$i")).toDF("id", "v"), dir)
    val (sink, ckpt) = scratch()
    drain(dir, sink, ckpt)
    assert(sinkIds(sink) == (0L until 6L))
    Versioned.append((6L until 8L).map(i => (i, s"v$i")).toDF("id", "v"), dir)
    Versioned.compact(spark, dir) // rewrite: repacks ALL rows into one group
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(dir, sink, ckpt)
    }
    assert(e.getMessage.contains("not an append") ||
      Option(e.getCause).exists(_.getMessage.contains("not an append")))
    // the failed batch committed nothing: neither the append the compact
    // swallowed nor the repacked rows reached the sink
    assert(sinkIds(sink) == (0L until 6L),
      "a failing guard must not half-emit the offending range")
  }

  test("constraint DDL versions are metadata-only and stream through") {
    val dir = tbl()
    Versioned.commit(Seq((1L, 5L)).toDF("id", "w"), dir)
    Versioned.addConstraint(spark, dir, "w_pos", "w > 0")
    Versioned.append(Seq((2L, 6L)).toDF("id", "w"), dir)
    val (sink, ckpt) = scratch()
    drain(dir, sink, ckpt)
    assert(sinkIds(sink) == Seq(1L, 2L))
  }

  test("startingVersion: a number tails from that version; 'latest' only new commits") {
    val dir = tbl()
    Versioned.commit(Seq((1L, "a")).toDF("id", "v"), dir)  // v0
    Versioned.append(Seq((2L, "b")).toDF("id", "v"), dir)  // v1
    Versioned.append(Seq((3L, "c")).toDF("id", "v"), dir)  // v2
    locally {
      val (sink, ckpt) = scratch()
      drain(dir, sink, ckpt, Map("startingVersion" -> "1"))
      assert(sinkIds(sink) == Seq(2L, 3L),
        "startingVersion=1 must skip v0's groups")
    }
    locally {
      val (sink, ckpt) = scratch()
      val reader = spark.readStream.format("graft")
        .option("startingVersion", "latest")
      val q = reader.load(dir)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // nothing committed after stream start → nothing emitted (the
      // sink directory may not even exist yet)
      val emitted = scala.util.Try(sinkIds(sink)).getOrElse(Seq.empty)
      assert(emitted.isEmpty, s"latest must skip the backlog: $emitted")
      Versioned.append(Seq((4L, "d")).toDF("id", "v"), dir)
      drain(dir, sink, ckpt, Map("startingVersion" -> "latest"))
      assert(sinkIds(sink) == Seq(4L), "only the post-start append emits")
    }
  }

  test("maxVersionsPerBatch: the backlog drains in capped per-batch slices") {
    val dir = tbl()
    (0 until 5).foreach { i =>
      if (i == 0) Versioned.commit(Seq((i.toLong, "x")).toDF("id", "v"), dir)
      else Versioned.append(Seq((i.toLong, "x")).toDF("id", "v"), dir)
    }
    val (sink, ckpt) = scratch()
    // AvailableNow keeps triggering until the cached end offset is
    // reached, so the capped batches still drain everything — in ≥3
    // batches (the parquet sink commits per batch, visible as job dirs)
    val src = new graft.sources.GraftStreamSource(
      spark, dir, Map("maxVersionsPerBatch" -> "2"))
    // drive the Source API directly: offsets must advance by ≤2 versions
    val o1 = src.getOffset.get // first offer is uncapped by design (restart safety)
    assert(graft.sources.GraftStreamSource.versionOf(o1) == 4L)
    val b = src.getBatch(None, o1)
    assert(b.isStreaming, "getBatch must return a streaming frame")
    val fresh = new graft.sources.GraftStreamSource(
      spark, dir, Map("maxVersionsPerBatch" -> "2", "startingVersion" -> "0"))
    val first = fresh.getBatch(None,
      org.apache.spark.sql.execution.streaming.runtime.LongOffset(1L))
    // after a served batch the next offer is capped relative to it
    val next = fresh.getOffset.get
    assert(graft.sources.GraftStreamSource.versionOf(next) == 3L,
      s"offer after version 1 with cap 2 must be 3, got $next")
    assert(first.isStreaming)
    // and the full checkpointed drain still delivers everything once
    drain(dir, sink, ckpt, Map("maxVersionsPerBatch" -> "2"))
    assert(sinkIds(sink) == (0L until 5L))
    // FRESH stream (this instance created the metadata marker — no
    // checkpoint can exist): the FIRST offer is capped too
    val meta1 = java.nio.file.Files
      .createTempDirectory("graft-stream-meta").toString
    val freshMeta = new graft.sources.GraftStreamSource(
      spark, dir, Map("maxVersionsPerBatch" -> "2"), Some(meta1))
    val f1 = freshMeta.getOffset.get
    assert(graft.sources.GraftStreamSource.versionOf(f1) == 1L,
      s"fresh first offer must cap at startingVersion-1+2 = 1, got $f1")
    // RESTART against the same metadata dir (marker already exists):
    // the first offer is uncapped — the checkpoint may be ahead
    val restarted = new graft.sources.GraftStreamSource(
      spark, dir, Map("maxVersionsPerBatch" -> "2"), Some(meta1))
    val r1 = restarted.getOffset.get
    assert(graft.sources.GraftStreamSource.versionOf(r1) == 4L,
      s"restart first offer must be uncapped, got $r1")
    // a capped fresh drain still delivers everything exactly once —
    // and actually in SLICES: 5 versions / cap 2 = 3 micro-batches
    // (one offset file per batch in the engine's checkpoint), which is
    // the AvailableNow + admission-control interplay this source
    // implements SupportsTriggerAvailableNow for (the engine's generic
    // wrapper would have latched the capped FIRST offer as the run's
    // end and stopped after one slice)
    val (sink2, ckpt2) = scratch()
    drain(dir, sink2, ckpt2, Map("maxVersionsPerBatch" -> "2"))
    assert(sinkIds(sink2) == (0L until 5L))
    val batches = new java.io.File(s"$ckpt2/offsets").listFiles()
      .map(_.getName).count(!_.startsWith("."))
    assert(batches == 3, s"5 versions at cap 2 must drain in 3 batches, got $batches")
  }

  test("readChangeFeed: inserts, DV deletes and DV update pairs stream; exactly-once") {
    val dir = tbl()
    Versioned.commit((0L until 100L).map(i => (i, 0L)).toDF("id", "n"), dir) // v0
    Versioned.append((100L until 200L).map(i => (i, 0L)).toDF("id", "n"), dir) // v1
    Versioned.delete(spark, dir)(col("id").isin(7L, 150L)) // v2: pure DV
    Versioned.update(spark, dir, col("id") === 8L, "n" -> lit(5L)) // v3: DV update
    val (sink, ckpt) = scratch()
    def drainCdf(): Unit = {
      val q = spark.readStream.format("graft")
        .option("readChangeFeed", "true").load(dir)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drainCdf()
    def rows(): Set[(Long, Long, String, Long)] =
      spark.read.parquet(sink)
        .select("id", "n", "_change_type", "_commit_version")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getString(2), r.getLong(3))).toSet
    val expected: Set[(Long, Long, String, Long)] =
      (0L until 100L).map(i => (i, 0L, "insert", 0L)).toSet ++
        (100L until 200L).map(i => (i, 0L, "insert", 1L)).toSet ++
        Set((7L, 0L, "delete", 2L), (150L, 0L, "delete", 2L),
          (8L, 0L, "update_preimage", 3L), (8L, 5L, "update_postimage", 3L))
    assert(rows() == expected)
    // exactly-once across a re-drain; a later DV delete arrives alone
    drainCdf()
    assert(rows() == expected, "re-drain must emit nothing")
    Versioned.delete(spark, dir)(col("id") === 9L) // v4
    drainCdf()
    assert(rows() == expected + ((9L, 0L, "delete", 4L)))
    // a MIXED DV merge (delete claim + update claim + insert) STREAMS
    // as correctly-attributed change rows — kind-tagged positions +
    // the manifest's copies annotation
    locally {
      import Versioned.MergeClause._
      Versioned.mergeClauses(spark, dir,
        Seq((10L, -1L), (11L, 7L), (900L, 1L)).toDF("id", "n"), Seq("id"),
        Seq(MatchedDelete(Some(col("SRC.n") < 0L)),
          MatchedUpdate(Seq("n" -> col("SRC.n"))),
          NotMatchedInsert())) // v5: mode 'merge', DV-backed
    }
    drainCdf()
    assert(rows() == expected + ((9L, 0L, "delete", 4L)) ++ Set(
      (10L, 0L, "delete", 5L),
      (11L, 0L, "update_preimage", 5L), (11L, 7L, "update_postimage", 5L),
      (900L, 1L, "insert", 5L)))
    // TWO CONSECUTIVE pure-DV mutations (a delete then an update) land
    // in ONE micro-batch: the batch builds the CONSOLIDATED run frames
    // (single artifact scan + min-attribution preimages, map-attributed
    // postimages), which must satisfy the source's strict non-null CDF
    // schema (_change_type/_commit_version ride a join + min()
    // aggregate — regression pin for the nullability coalesces) and
    // attribute each row to its own version
    Versioned.delete(spark, dir)(col("id") === 20L)                  // v6
    Versioned.update(spark, dir, col("id") === 21L, "n" -> lit(9L))  // v7
    drainCdf()
    assert(rows() == expected + ((9L, 0L, "delete", 4L)) ++ Set(
      (10L, 0L, "delete", 5L),
      (11L, 0L, "update_preimage", 5L), (11L, 7L, "update_postimage", 5L),
      (900L, 1L, "insert", 5L),
      (20L, 0L, "delete", 6L),
      (21L, 0L, "update_preimage", 7L), (21L, 9L, "update_postimage", 7L)))
    // a REWRITE still fails the CDF stream loudly
    spark.conf.set("spark.graft.dv.maxDeleteFraction", "0")
    try Versioned.delete(spark, dir)(col("id") < 50L) // v8: COW rewrite
    finally spark.conf.unset("spark.graft.dv.maxDeleteFraction")
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("graft")
        .option("readChangeFeed", "true").load(dir)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    assert(e.getMessage.contains("rewrite") || e.getCause.getMessage.contains("rewrite"))
  }

  test("readChangeFeed: startingVersion skips history; CDF schema adds the three columns") {
    val dir = tbl()
    Versioned.commit((0L until 10L).map(i => (i, 0L)).toDF("id", "n"), dir) // v0
    Versioned.append((10L until 20L).map(i => (i, 0L)).toDF("id", "n"), dir) // v1
    Versioned.delete(spark, dir)(col("id") === 3L) // v2 (DV)
    val df = spark.readStream.format("graft")
      .option("readChangeFeed", "true").load(dir)
    assert(df.schema.fieldNames.toSeq ==
      Seq("id", "n", "_change_type", "_commit_version", "_commit_timestamp"))
    val (sink, ckpt) = scratch()
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true").option("startingVersion", "2")
      .load(dir)
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.read.parquet(sink)
      .select("id", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // startingVersion=2 reads version 2's OWN changes (the delete)
    assert(got == Set((3L, "delete", 2L)))
  }

  test("a vacuumed range fails loudly instead of silently skipping rows") {
    val dir = tbl()
    Versioned.commit(Seq((1L, "a")).toDF("id", "v"), dir)  // v0
    Versioned.append(Seq((2L, "b")).toDF("id", "v"), dir)  // v1
    Versioned.append(Seq((3L, "c")).toDF("id", "v"), dir)  // v2
    Versioned.vacuum(spark, dir, keepFrom = 2L)
    val src = new graft.sources.GraftStreamSource(spark, dir, Map.empty)
    val e = intercept[IllegalStateException] {
      src.getBatch(None,
        org.apache.spark.sql.execution.streaming.runtime.LongOffset(2L))
    }
    assert(e.getMessage.contains("vacuumed"))
    // startingVersion=2 ALSO refuses: version 2's introduced groups are
    // a set difference against v1's manifest, which retention dropped —
    // manifests are full snapshots, so the predecessor is required (the
    // documented resync path is a batch read of the latest version)
    val ok = new graft.sources.GraftStreamSource(
      spark, dir, Map("startingVersion" -> "2"))
    val e2 = intercept[IllegalStateException] {
      ok.getBatch(None,
        org.apache.spark.sql.execution.streaming.runtime.LongOffset(2L))
    }
    assert(e2.getMessage.contains("no longer retained"))
    assert(Versioned.read(spark, dir).count() == 3L,
      "the batch-read resync path stays available")
  }

  test("startingVersion=earliest resyncs past a vacuumed prefix: the boundary " +
      "version's content once, exact increments after, exactly-once on restart") {
    val dir = tbl()
    Versioned.commit((0L until 10L).map(i => (i, s"v$i")).toDF("id", "v"), dir) // v0
    Versioned.append((10L until 20L).map(i => (i, s"v$i")).toDF("id", "v"), dir) // v1
    spark.conf.set("spark.graft.dv.maxDeleteFraction", "0.5")
    try Versioned.delete(spark, dir)(col("id") === 15L) // v2: pure DV
    finally spark.conf.unset("spark.graft.dv.maxDeleteFraction")
    Versioned.append((20L until 30L).map(i => (i, s"v$i")).toDF("id", "v"), dir) // v3
    Versioned.vacuum(spark, dir, keepFrom = 2L) // v0, v1 gone
    // append-rows mode: the new genesis (v2 — a DV-delete boundary,
    // mode-exempt as genesis) serves the full file set WITH its
    // deletion vectors applied: the deleted row must not resurrect
    val (sink, ckpt) = scratch()
    drain(dir, sink, ckpt, Map("startingVersion" -> "earliest"))
    assert(sinkIds(sink) == (0L until 30L).filterNot(_ == 15L),
      "boundary content once, DV applied")
    // increments after the resync arrive exactly once across a restart
    Versioned.append((30L until 35L).map(i => (i, s"v$i")).toDF("id", "v"), dir) // v4
    drain(dir, sink, ckpt, Map("startingVersion" -> "earliest"))
    assert(sinkIds(sink) == (0L until 35L).filterNot(_ == 15L),
      "only v4's rows arrived")
    // CDF mode: the boundary snapshot lands as inserts @boundary with
    // its deletion vectors APPLIED, increments keep exact attribution
    val dir2 = tbl()
    Versioned.commit((0L until 10L).map(i => (i, s"v$i")).toDF("id", "v"), dir2) // v0
    Versioned.append((10L until 20L).map(i => (i, s"v$i")).toDF("id", "v"), dir2) // v1
    spark.conf.set("spark.graft.dv.maxDeleteFraction", "0.5")
    try Versioned.delete(spark, dir2)(col("id") === 5L) // v2: pure DV
    finally spark.conf.unset("spark.graft.dv.maxDeleteFraction")
    Versioned.append((20L until 25L).map(i => (i, s"v$i")).toDF("id", "v"), dir2) // v3
    Versioned.vacuum(spark, dir2, keepFrom = 2L)
    val (sink2, ckpt2) = scratch()
    drain(dir2, sink2, ckpt2,
      Map("startingVersion" -> "earliest", "readChangeFeed" -> "true"))
    val got = spark.read.parquet(sink2)
      .select("id", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val want = ((0L until 20L).filterNot(_ == 5L)
      .map(i => (i, "insert", 2L)) ++
      (20L until 25L).map(i => (i, "insert", 3L))).toSet
    assert(got == want, s"got $got")
    // a NUMERIC start past a vacuumed parent still refuses (pinned above)
    val strict = new graft.sources.GraftStreamSource(
      spark, dir2, Map("startingVersion" -> "2", "readChangeFeed" -> "true"))
    intercept[IllegalStateException] {
      strict.getBatch(None,
        org.apache.spark.sql.execution.streaming.runtime.LongOffset(3L))
    }
  }

  test("empty table refuses with a clear message; schema evolution mid-stream refuses") {
    val dir = tbl()
    val e = intercept[IllegalArgumentException] {
      spark.readStream.format("graft").load(dir)
    }
    assert(e.getMessage.contains("no versions committed"))
    // evolution: pin the stream's schema, evolve the table, next batch refuses
    Versioned.commit(Seq((1L, "a")).toDF("id", "v"), dir)
    val src = new graft.sources.GraftStreamSource(spark, dir, Map.empty)
    Versioned.append(
      Seq((2L, "b", 9L)).toDF("id", "v", "extra"), dir, evolveSchema = true)
    val err = intercept[IllegalStateException] {
      src.getBatch(None,
        org.apache.spark.sql.execution.streaming.runtime.LongOffset(1L))
    }
    assert(err.getMessage.contains("schema evolved"))
  }

  private implicit class StreamingDF(df: DataFrame) {
    def isStreaming: Boolean = df.queryExecution.logical.isStreaming
  }
}
