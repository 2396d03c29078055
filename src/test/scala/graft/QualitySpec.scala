package graft

import org.apache.spark.sql.functions._
import graft.operators.Quality

class QualitySpec extends SparkSpec {
  import spark.implicits._

  // A fluent reference corpus for the LM gate: word soup reusing a small
  // vocabulary, so in-vocab docs score well and gibberish scores the
  // uniform-backoff floor.
  private val fluent =
    "the quick brown fox jumps over the lazy dog and that is the story of the day with no end"

  private def mkDocs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private def verdictOf(docs: org.apache.spark.sql.DataFrame) =
    Quality.verdict(docs, mkDocs(1000L -> fluent, 1001L -> fluent),
      "text", "doc_id",
      minWords = 5, minStopHits = 1, minAvgLogprob = -6.0)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_failed"), r.getAs[Boolean]("keep"))).toMap

  test("a clean fluent document passes every gate") {
    val v = verdictOf(mkDocs(1L -> fluent))
    assert(v(1L) == (0L, true), s"verdict: $v")
  }

  test("word-count, stopword, and symbol gates fail independently") {
    val docs = mkDocs(
      2L -> "too few words here",                       // < 5 words
      3L -> "quick brown fox jumps over lazy dog day story end", // no stopword
      4L -> s"$fluent ... ... ... ... ... ... ... ... ... ... ... ...")  // symbol spam
    val v = verdictOf(docs)
    assert(!v(2L)._2); assert(!v(3L)._2); assert(!v(4L)._2)
    // The symbol doc trips the symbol gate specifically (it also tanks
    // alpha-word fraction and the top-bigram metric — "..." tokens are
    // non-alphabetic and "... ..." dominates — which is correct behavior,
    // so pin the metric rather than the gate count).
    val sym = Quality.verdict(docs, mkDocs(1000L -> fluent), "text", "doc_id",
      minWords = 5, minStopHits = 1, minAvgLogprob = -6.0)
      .filter(col("doc_id") === 4L)
      .select("symbol_word_ratio").as[Double].head()
    assert(sym > 0.1, s"symbol_word_ratio $sym should exceed the 0.1 gate")
  }

  test("repetition gates catch duplicated lines and bigram loops") {
    val line = "the cat sat on the mat and that was that."
    val v = verdictOf(mkDocs(
      5L -> Seq.fill(10)(line).mkString("\n"),          // dup lines
      6L -> ("the " + Seq.fill(30)("buy now").mkString(" "))))  // one bigram dominates
    assert(!v(5L)._2, "dup-line doc must fail")
    assert(!v(6L)._2, "bigram-loop doc must fail")
  }

  test("LM fluency gate fails out-of-vocabulary gibberish") {
    val v = Quality.verdict(
      mkDocs(7L -> fluent, 8L -> ("the " + (1 to 20).map(i => s"zxqv$i").mkString(" "))),
      mkDocs(1000L -> fluent, 1001L -> fluent),
      "text", "doc_id", minWords = 5, minStopHits = 1, minAvgLogprob = -4.0)
      .select("doc_id", "avg_logprob", "keep")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(v(7L)._1 > v(8L)._1, s"fluent doc must outscore gibberish: $v")
    assert(v(7L)._2 && !v(8L)._2, s"verdicts: $v")
  }

  test("mean-word-length bounds reject minified-style text") {
    val v = verdictOf(mkDocs(
      9L -> ("the " + Seq.fill(20)("pneumonoultramicroscopicsilicovolcanoconiosis").mkString(" "))))
    assert(!v(9L)._2, "long-word doc must fail the mean-word-length gate")
  }
}
