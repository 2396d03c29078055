package graft

import org.apache.spark.sql.functions._
import graft.streaming.StreamingDedup

class StreamingDedupSpec extends SparkSpec {

  private val docsPath = "/root/testdata/sf0.001/documents.parquet"

  test("batch mode keeps exactly one doc per fingerprint") {
    val docs = spark.read.parquet(docsPath)
    val kept = StreamingDedup.firstPerFingerprint(docs, "text", "doc_id")
    val expectedGroups = docs
      .select(graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
      .distinct().count()
    assert(kept.count() == expectedGroups)
    // one row per fingerprint, and every kept id is a real doc id
    assert(kept.select("fp").distinct().count() == expectedGroups)
    assert(kept.join(docs, kept("doc_id") === docs("doc_id"), "left_anti").isEmpty)
  }

  test("ttl dedup: eviction re-emits, live state suppresses, late rows filtered — hand-verified") {
    import spark.implicits._
    // 15-min-aligned base; minutes offsets. retention 60 min, delay 10.
    def ts(min: Int) = new java.sql.Timestamp(1699999200000L + min * 60000L)
    // run-1: A@0 (emit id 2), B@{100,90} (emit min id 4; maxTs 100).
    // wm1 = 100 − 10 = 90. Eviction: A (0+60 < 90) gone, B (160 > 90) live.
    val b1 = Seq(("A", ts(0), 2L), ("B", ts(100), 4L), ("B", ts(90), 6L))
      .toDF("k1", "ts", "event_id")
    // run-2: A@95 id 1 → re-emit (evicted); B@96 id 3 → suppressed;
    // C@94 id 5 → new, emit; A@50 id 7 and D@80 id 9 → late (< wm1 90),
    // filtered BEFORE the operator (D emits nothing at all, and A's
    // min-id must ignore the late id 7).
    val b2 = Seq(("A", ts(95), 1L), ("B", ts(96), 3L), ("C", ts(94), 5L),
      ("A", ts(50), 7L), ("D", ts(80), 9L))
      .toDF("k1", "ts", "event_id")
    val row = StreamingDedup.ttlDedupAudit(spark, Seq(b1, b2),
      Seq("k1"), "ts", "event_id",
      watermarkDelay = "10 minutes", retentionMs = 60L * 60000).collect().head
    assert(row.getLong(0) == 4, s"n_emitted: $row")   // A,B run1; A,C run2
    assert(row.getLong(1) == 3, s"n_keys: $row")      // A emitted twice
    assert(row.getLong(2) == 2 + 4 + 1 + 5, s"id_checksum: $row")
    assert(row.getLong(3) == 2, s"n_late_rows: $row")
  }

  test("streaming mode agrees with batch on the dedup group structure") {
    val sink = "stream_dedup_sink"
    val q = StreamingDedup.streamToMemory(spark, docsPath, "text", "doc_id", sink)
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table(sink)
    val batch = StreamingDedup.firstPerFingerprint(
      spark.read.parquet(docsPath), "text", "doc_id")
    // same fingerprint set survives either way (first-arrival winner may
    // differ between modes; the group structure must not)
    assert(streamed.select("fp").except(batch.select("fp")).isEmpty)
    assert(batch.select("fp").except(streamed.select("fp")).isEmpty)
    assert(streamed.count() == batch.count())
  }
}
