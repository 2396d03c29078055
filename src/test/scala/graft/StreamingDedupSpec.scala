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
