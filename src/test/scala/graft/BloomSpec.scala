package graft

import org.apache.spark.sql.functions._
import graft.operators.{BloomPrune, Contamination}

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("build/prune: no false negatives, real pruning, codegen'd probe") {
    val small = (0L until 100L).map(i => i * 7L).toDF("k")
    // spark.range stays a Range leaf in the optimized plan — a local Seq
    // would collapse to LocalTableScan with the filter pre-evaluated,
    // hiding the probe this test pins.
    val big = spark.range(10000).select($"id".as("k"))
    val bloom = BloomPrune.build(small, $"k", estItems = 100L).get
    val pruned = BloomPrune.prune(big, $"k", bloom)
    val kept = pruned.as[Long].collect().toSet
    // every true member survives (bloom filters never false-negative)
    (0L until 100L).map(_ * 7L).filter(_ < 10000L)
      .foreach(k => assert(kept.contains(k), s"true member $k pruned"))
    // and the prune is real: the vast majority of non-members drop
    assert(kept.size < 500, s"prune kept ${kept.size}/10000 — filter ineffective")
    // the probe is Spark's own BloomFilterMightContain (codegen'd), a
    // scan-stage filter with no exchange
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(500))
    assert(!plan.contains("Exchange"), "prune must not shuffle")
  }

  test("empty build side returns None; caller contract") {
    assert(BloomPrune.build(Seq.empty[Long].toDF("k"), $"k", 1L).isEmpty)
  }

  private val leaked =
    "the capital of france is paris and the capital of spain is madrid " +
      "while the capital of italy is rome"

  private def train = Seq(
    (0L, s"encyclopedia entry: $leaked plus unrelated trailing commentary"),
    (1L, "a clean training document about gardening tomatoes in summer heat"),
    (2L, "another clean document entirely about bicycle maintenance and chains")
  ).toDF("doc_id", "text")

  private def bench = Seq(
    (100L, leaked),
    (101L, "what is the airspeed velocity of an unladen swallow exactly")
  ).toDF("doc_id", "text")

  test("bloom-pruned passage overlap is pair-identical to the exact operator") {
    val exact = Contamination.passageOverlap(train, bench, "text", "doc_id")
      .orderBy("bench_id", "train_id").collect().toSeq
    val bloom = Contamination.passageOverlapBloom(train, bench, "text", "doc_id")
      .orderBy("bench_id", "train_id").collect().toSeq
    assert(bloom == exact)
    assert(exact.nonEmpty, "fixture must produce at least one overlap pair")
  }

  test("bloom-pruned overlap matches on the documents fixture, all verdict columns") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val b = d.filter(graft.operators.Sampling.bucket(col("doc_id"), 17L) < 300)
      .select(col("doc_id"), substring(col("text"), 40, 400).as("text"))
    val exact = Contamination.passageOverlap(d, b, "text", "doc_id",
        minShared = 2, maxTrainDf = 100)
      .orderBy("bench_id", "train_id").collect().toSeq
    val bloom = Contamination.passageOverlapBloom(d, b, "text", "doc_id",
        minShared = 2, maxTrainDf = 100)
      .orderBy("bench_id", "train_id").collect().toSeq
    assert(bloom == exact)
    assert(exact.nonEmpty)
  }

  test("decontaminateBloom strikes exactly the same documents") {
    val exact = Contamination.decontaminate(train, bench, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    val bloom = Contamination.decontaminateBloom(train, bench, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(bloom == exact)
    assert(exact == Set(1L, 2L), "doc 0 carries the leak and must be struck")
  }
}
