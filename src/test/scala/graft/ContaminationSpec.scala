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
