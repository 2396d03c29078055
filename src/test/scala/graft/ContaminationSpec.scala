package graft

import org.apache.spark.sql.functions._
import graft.operators.Contamination

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  private val leaked =
    "the capital of france is paris and the capital of spain is madrid " +
      "while the capital of italy is rome"

  private def train = Seq(
    (0L, s"encyclopedia entry: $leaked plus unrelated trailing commentary"),
    (1L, "a clean training document about gardening tomatoes in summer heat"),
    (2L, "another clean document entirely about bicycle maintenance and chains")
  ).toDF("doc_id", "text")

  private def bench = Seq(
    (100L, leaked), // verbatim leak of an 18-token span
    (101L, "what is the airspeed velocity of an unladen swallow exactly")
  ).toDF("doc_id", "text")

  test("verbatim leak is detected; clean bench doc is not flagged") {
    val pairs = Contamination.ngramOverlap(train, bench, "text", "doc_id", n = 8)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((100L, 0L)))
    // a 20-token shared span yields 20-8+1 = 13 shared 8-grams
    assert(pairs.head._3 == 13L)
  }

  test("report aggregates per bench doc") {
    val rep = Contamination.contaminationReport(train, bench, "text", "doc_id", n = 8)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rep == Seq((100L, 1L, 13L, 13L)))
  }

  test("passage overlap flags the leaked span via shared winnow fingerprints") {
    // The leaked span is far longer than w + k - 1 chars, so winnowing
    // guarantees >= 1 shared fingerprint; minShared=2 still passes because
    // the span covers many windows. The clean bench doc must not pair.
    val pairs = Contamination.passageOverlap(train, bench, "text", "doc_id")
      .select("bench_id", "train_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((100L, 0L)))
    assert(!pairs.exists(_._1 == 101L))
    val frac = Contamination.passageOverlap(train, bench, "text", "doc_id")
      .filter(col("bench_id") === 100L && col("train_id") === 0L)
      .select("overlap_frac").as[Double].head()
    assert(frac > 0.5 && frac <= 1.0) // bench doc is contained in train doc 0
  }

  test("decontaminate strikes the leaking doc and keeps the clean ones") {
    val cleaned = Contamination.decontaminate(train, bench, "text", "doc_id")
    val keptIds = cleaned.select("doc_id").as[Long].collect().toSet
    assert(keptIds == Set(1L, 2L), s"kept: $keptIds")
    // All original columns survive the strike.
    assert(cleaned.columns.toSeq == train.columns.toSeq)
  }

  test("passage overlap stays out of interpreted eval on real documents") {
    // r7 regression guard: without the localCheckpoint lineage cut this
    // plan shape fell out of codegen into interpreted eval that re-ran
    // split() per rolling-hash term — O(k·n²)/doc, 18+ min at sf0.01.
    // With the cut, sf0.001 runs in a few seconds; budget is 10× that.
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val benchDocs = docs.filter(col("doc_id") % 97 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val t0 = System.nanoTime()
    Contamination.passageOverlap(docs, benchDocs, "text", "doc_id")
      .queryExecution.toRdd.foreach(_ => ())
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 60.0, f"passage_overlap took $secs%.1f s at sf0.001 — interpreted-eval blowup is back")
  }

  test("document-frequency guard drops boilerplate grams") {
    // the same 8-gram in ALL train docs → df=3 > maxTrainDf=2 → ignored
    val boiler = "all rights reserved unauthorized reproduction strictly prohibited worldwide"
    val trainB = Seq(
      (0L, s"doc one $boiler"),
      (1L, s"doc two $boiler"),
      (2L, s"doc three $boiler")
    ).toDF("doc_id", "text")
    val benchB = Seq((100L, boiler)).toDF("doc_id", "text")
    val flagged = Contamination.ngramOverlap(
      trainB, benchB, "text", "doc_id", n = 8, maxTrainDf = 2)
    assert(flagged.count() == 0)
    val unguarded = Contamination.ngramOverlap(
      trainB, benchB, "text", "doc_id", n = 8, maxTrainDf = 1000)
    assert(unguarded.count() == 3)
  }
}
