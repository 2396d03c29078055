package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def store() = Files.createTempDirectory("graft-sketch").toString + "/s"

  test("union of per-batch sketches equals the sketch of the union — no double counting") {
    // batches OVERLAP: 'shared token alpha' appears in both. A naive
    // per-batch distinct sum would double-count; the merged sketch must
    // not (exact in HLL's small-cardinality mode).
    val b1 = Seq(("g1", "shared token alpha beta"), ("g2", "one two three")).toDF("g", "text")
    val b2 = Seq(("g1", "shared token alpha gamma"), ("g2", "three four")).toDF("g", "text")
    val p1 = store(); val p2 = store()
    Sketches.writeTokenSketches(b1, "text", "g", p1)
    Sketches.writeTokenSketches(b2, "text", "g", p2)
    val est = Sketches.mergedDistinct(spark, Seq(p1, p2))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // g1: shared, token, alpha, beta, gamma = 5; g2: one two three four = 4
    assert(est == Map("g1" -> 5L, "g2" -> 4L), est.toString)
  }

  test("estimate tracks exact distinct within the lgK=12 bound on a larger corpus") {
    val docs = spark.range(2000)
      .select((col("id") % 4).cast("string").as("g"),
        concat_ws(" ",
          concat(lit("tok"), col("id") * 7 % 5000),
          concat(lit("tok"), col("id") * 13 % 5000),
          concat(lit("tok"), col("id") * 29 % 5000)).as("text"))
    val p = store()
    Sketches.writeTokenSketches(docs, "text", "g", p)
    val est = Sketches.mergedDistinct(spark, Seq(p))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = docs.select(col("g"), explode(split(col("text"), " ")).as("t"))
      .groupBy("g").agg(countDistinct("t").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, n) =>
      val e = est(g)
      assert(math.abs(e - n).toDouble / n <= 0.05, s"group $g: est $e vs exact $n")
    }
  }

  test("streaming drain's merged estimate equals the batch store's exactly") {
    val b1 = Seq(("g1", "alpha beta gamma delta"), ("g2", "one two")).toDF("g", "text")
    val b2 = Seq(("g1", "alpha epsilon zeta"), ("g2", "two three")).toDF("g", "text")
    val batchP1 = store(); val batchP2 = store(); val streamP = store()
    Sketches.writeTokenSketches(b1, "text", "g", batchP1)
    Sketches.writeTokenSketches(b2, "text", "g", batchP2)
    graft.streaming.StreamingSketches.sketchDrain(
      spark, Seq(b1, b2), "text", "g", streamP)
    val batchEst = Sketches.mergedDistinct(spark, Seq(batchP1, batchP2))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val streamEst = Sketches.mergedDistinct(spark, Seq(streamP))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamEst == batchEst, s"stream $streamEst vs batch $batchEst")
    // the streaming store accumulated one row set per micro-batch
    assert(spark.read.parquet(streamP).count() == 4L) // 2 groups × 2 batches
  }

  test("sketch rows are narrow and per-group — the store is metadata-sized") {
    val docs = spark.range(500)
      .select(lit("g").as("g"), concat(lit("w"), col("id")).as("text"))
    val p = store()
    Sketches.writeTokenSketches(docs, "text", "g", p)
    val rows = spark.read.parquet(p)
    assert(rows.count() == 1, "one sketch row per group")
    val bytes = rows.select(length(col("sketch"))).as[Int].head()
    assert(bytes < 64 * 1024, s"sketch must be KB-sized, got $bytes bytes")
    // empty store path set rejected loudly
    intercept[IllegalArgumentException] { Sketches.mergedDistinct(spark, Seq.empty) }
  }
}
