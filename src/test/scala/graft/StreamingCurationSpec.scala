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
