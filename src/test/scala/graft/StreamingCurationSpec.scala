package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling
import graft.functions.TextFunctions

/** The stateless curation stages — quality scoring, language ID,
  * deterministic sampling, split assignment — are pure projections and
  * filters, so the SAME Column expressions run unchanged over a stream.
  * This spec pins that: a streaming pass over the documents parquet
  * produces exactly the batch result, row for row. (The stateful stages
  * — dedup — have their own streaming formulation in StreamingDedup.)
  */
class StreamingCurationSpec extends SparkSpec {

  private val docsPath = "/root/testdata/sf0.001/documents.parquet"

  private def curate(df: org.apache.spark.sql.DataFrame) = {
    val scored = df
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .filter(col("quality") >= 0.5)
    Sampling.assignSplits(
      Sampling.deterministicSample(scored, "doc_id", 0.5, seed = 3L),
      "doc_id", Seq("train" -> 0.9, "val" -> 0.1), seed = 4L)
      .select("doc_id", "lang", "quality", "split")
  }

  test("native row-local minhash signature equals the batch signature store") {
    import graft.operators.Dedup
    val docs = spark.read.parquet(docsPath).limit(200).select("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft-sig").toString + "/sigs"
    Dedup.writeMinHashSignatures(docs, "text", "doc_id", tmp, numHashes = 32)
    graft.functions.GraftFunctions.register(spark)
    val rowLocal = docs.select(col("doc_id").as("id"),
      Dedup.rowLocalMinhashSig(col("text"), 3, 32).as("rsig"))
    val stored = spark.read.parquet(tmp)
    assert(stored.count() == 200)
    val mismatched = stored.join(rowLocal, "id")
      .filter(not(col("sig") === col("rsig")))
    assert(mismatched.count() == 0,
      "row-local signature must be bit-identical to the batch signature store")
    // The store itself is native since round 9, so the line above alone
    // would be native-vs-native: pin the native projection against the
    // independent explode+aggregate formulation too.
    val agg = Dedup.wordSigsAggregateProbe(docs, "text", "doc_id", 3, 32)
      .select(col("__id").as("id"), col("__sig").as("asig"))
    val aggMismatch = agg.join(rowLocal, "id")
      .filter(not(col("asig") === col("rsig")))
    assert(aggMismatch.count() == 0,
      "native word signature must be bit-identical to the aggregate twin")
  }

  test("streaming incremental curation: exact-dup keeper, store match, TTL suppression") {
    import spark.implicits._
    import graft.operators.Dedup
    import graft.streaming.StreamingCuration
    val stable = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "totally different words here for doc two ok"))
      .toDF("doc_id", "text")
    val sigs = java.nio.file.Files.createTempDirectory("graft-curs").toString + "/sigs"
    Dedup.writeMinHashSignatures(stable, "text", "doc_id", sigs, numHashes = 32)
    def b(ts: String, rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")
      .withColumn("__ts", lit(ts).cast("timestamp"))
    val b0 = b("2024-01-01 00:00:00",
      10L -> "alpha beta gamma delta epsilon zeta eta theta", // = stable 1
      11L -> "unique fresh content nobody else shares at all",
      12L -> "alpha beta gamma delta epsilon zeta eta theta") // exact dup of 10
    val b1 = b("2024-01-01 01:00:00",
      13L -> "alpha beta gamma delta epsilon zeta eta theta", // suppressed (state)
      14L -> "another unique thing entirely with its own words")
    val out = StreamingCuration.curate(spark, Seq(b0, b1), stable, sigs,
      "text", "doc_id", "__ts", minQuality = -1.0)
    assertRows(out,
      Seq("doc_id", "n_batch_dups", "n_store_matches", "best_jaccard", "kept"),
      Set(
        Seq(10L, 1, 1, 1.0, false), // keeper of {10,12}, struck by stable 1
        Seq(11L, 0, 0, null, true),
        Seq(14L, 0, 0, null, true))) // emitted in batch 1; 13 suppressed
  }

  test("streaming curation equals batch curation row-for-row") {
    // single-FILE parquet source: stream the parent dir with a glob
    // (readStream.parquet requires a directory)
    val batchSchema = spark.read.parquet(docsPath).schema
    val f = new java.io.File(docsPath)
    val stream = spark.readStream.schema(batchSchema)
      .option("pathGlobFilter", f.getName).parquet(f.getParent)
    val sink = "stream_curation_sink"
    val q = curate(stream).writeStream
      .format("memory").queryName(sink).outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table(sink)
    val batch = curate(spark.read.parquet(docsPath))
    assert(streamed.count() == batch.count() && batch.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }
}
