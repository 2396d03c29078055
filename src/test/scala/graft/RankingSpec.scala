package graft

import graft.operators.Ranking

class RankingSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark joins data with hash join and merge join strategies"),
    (2L, "vector search over embeddings"),
    (3L, "merge sort and hash aggregation in the vector engine with join pushdown"),
    (4L, "completely unrelated text about cooking pasta"),
    (5L, "join join join join")
  ).toDF("doc_id", "text")

  private def naive(terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): Map[Long, Double] = {
    val docs = Seq(
      1L -> "spark joins data with hash join and merge join strategies",
      2L -> "vector search over embeddings",
      3L -> "merge sort and hash aggregation in the vector engine with join pushdown",
      4L -> "completely unrelated text about cooking pasta",
      5L -> "join join join join").map { case (id, t) => id -> t.split("\\s+").toSeq }
    val n = docs.size.toDouble
    val avgdl = docs.map(_._2.size).sum / n
    docs.flatMap { case (id, toks) =>
      val dl = toks.size.toDouble
      val score = terms.map { t =>
        val tf = toks.count(_ == t).toDouble
        val df = docs.count(_._2.contains(t)).toDouble
        val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
      }.sum
      if (terms.exists(toks.contains)) Some(id -> score) else None
    }.toMap
  }

  test("bm25 matches the textbook formula; zero-term docs dropped") {
    val out = Ranking.bm25(corpus, "text", "doc_id", Seq("join", "vector", "merge"))
      .as[(Long, Double)].collect().toMap
    val want = naive(Seq("join", "vector", "merge"))
    assert(out.keySet == want.keySet && !out.contains(4L))
    out.foreach { case (id, s) =>
      assert(math.abs(s - want(id)) < 1e-9, s"doc $id: $s vs ${want(id)}")
    }
    // Term saturation: doc 5 is pure repetition of 'join' but must not
    // dominate doc 1 unboundedly (tf term saturates at k1+1).
    assert(out(5L) < out(1L) * 3)
  }

  test("single term, custom k1/b, duplicate terms rejected") {
    val out = Ranking.bm25(corpus, "text", "doc_id", Seq("vector"), k1 = 2.0, b = 0.5)
      .as[(Long, Double)].collect().toMap
    val want = naive(Seq("vector"), k1 = 2.0, b = 0.5)
    assert(out.keySet == Set(2L, 3L))
    out.foreach { case (id, s) => assert(math.abs(s - want(id)) < 1e-9) }
    intercept[IllegalArgumentException](
      Ranking.bm25(corpus, "text", "doc_id", Seq("a", "a")))
  }
}
