package graft

import org.apache.spark.sql.functions._
import graft.operators.LanguageModel

/** Stupid-Backoff LM scoring vs a naive driver-side recomputation:
  * same tokenization, same backoff chain, same boundary handling. */
class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  /** Naive reference: per-doc (n_tokens, n_oov, logprob, avg). */
  private def naive(
      train: Seq[Seq[String]],
      docs: Seq[(Long, Seq[String])],
      minCount: Int): Map[Long, (Long, Long, Double, Option[Double])] = {
    val la = LanguageModel.LnAlpha
    val n = train.map(_.size).sum.toDouble
    def counted[K](xs: Seq[K]): Map[K, Long] =
      xs.groupBy(identity).view.mapValues(_.size.toLong)
        .filter(_._2 >= minCount).toMap
    val uni = counted(train.flatten)
    val bi = counted(train.flatMap(_.sliding(2).filter(_.size == 2)
      .map(s => (s(0), s(1))).toSeq))
    val tri = counted(train.flatMap(_.sliding(3).filter(_.size == 3)
      .map(s => (s(0), s(1), s(2))).toSeq))
    docs.map { case (id, toks) =>
      var lp = 0.0; var oov = 0L
      toks.zipWithIndex.foreach { case (w, i) =>
        if (!uni.contains(w)) oov += 1
        lp += {
          if (i >= 2) {
            val a = toks(i - 2); val b = toks(i - 1)
            if (tri.contains((a, b, w)))
              math.log(tri((a, b, w)).toDouble / bi((a, b)))
            else if (bi.contains((b, w)))
              la + math.log(bi((b, w)).toDouble / uni(b))
            else if (uni.contains(w)) la + la + math.log(uni(w) / n)
            else la + la + math.log(1.0 / n)
          } else if (i == 1) {
            val b = toks(0)
            if (bi.contains((b, w)))
              math.log(bi((b, w)).toDouble / uni(b))
            else if (uni.contains(w)) la + math.log(uni(w) / n)
            else la + math.log(1.0 / n)
          } else {
            if (uni.contains(w)) math.log(uni(w) / n)
            else math.log(1.0 / n)
          }
        }
      }
      id -> ((toks.size.toLong, oov, lp,
        if (toks.nonEmpty) Some(lp / toks.size) else None))
    }.toMap
  }

  /** Deterministic pseudo-random token docs over a small vocab (small so
    * trigram/bigram hit rates vary) plus `extra` OOV-only words. */
  private def mkDocs(
      seed: Long, count: Int, vocab: Seq[String],
      oovEvery: Int): Seq[(Long, Seq[String])] = {
    val rnd = new scala.util.Random(seed)
    (0 until count).map { i =>
      val len = rnd.nextInt(14) // includes 0 → empty docs in the mix
      val toks = (0 until len).map { j =>
        if (oovEvery > 0 && rnd.nextInt(oovEvery) == 0) s"zz${rnd.nextInt(5)}"
        else vocab(rnd.nextInt(vocab.size))
      }
      (i.toLong, toks)
    }
  }

  private def toDf(docs: Seq[(Long, Seq[String])]) =
    docs.map { case (id, t) => (id, t.mkString(" ")) }.toDF("doc_id", "text")

  private def check(
      train: Seq[(Long, Seq[String])],
      score: Seq[(Long, Seq[String])],
      minCount: Int): Unit = {
    val out = LanguageModel.stupidBackoffScores(
      toDf(train), toDf(score), "text", "doc_id", minCount)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    val exp = naive(train.map(_._2), score, minCount)
    assert(out.keySet == exp.keySet)
    exp.foreach { case (id, (nt, oov, lp, avg)) =>
      val (ont, ooov, olp, oavg) = out(id)
      assert(ont == nt, s"doc $id n_tokens $ont != $nt")
      assert(ooov == oov, s"doc $id n_oov $ooov != $oov")
      assert(math.abs(olp - lp) < 1e-6, s"doc $id logprob $olp != $lp")
      (oavg, avg) match {
        case (Some(x), Some(y)) => assert(math.abs(x - y) < 1e-6, s"doc $id avg")
        case (None, None)       =>
        case other              => fail(s"doc $id avg mismatch: $other")
      }
    }
  }

  private val vocab = Seq("the", "cat", "sat", "on", "mat", "dog", "ran")

  test("scores match the naive backoff chain incl. OOV, empty and short docs") {
    val train = mkDocs(11L, 40, vocab, oovEvery = 0)
      .filter(_._2.nonEmpty)
    // score docs draw OOV words and include empty/1-token/2-token docs
    val score = mkDocs(12L, 25, vocab, oovEvery = 4) ++
      Seq((100L, Seq.empty[String]), (101L, Seq("cat")),
        (102L, Seq("cat", "zz9")), (103L, Seq("zz8", "zz9", "zz7")))
    check(train, score, minCount = 1)
  }

  test("self-scoring the training set has zero OOV and pure trigram scores") {
    val train = mkDocs(21L, 30, vocab, oovEvery = 0).filter(_._2.size >= 3)
    val out = LanguageModel.stupidBackoffScores(
      toDf(train), toDf(train), "text", "doc_id")
    assert(out.agg(sum("n_oov")).first().getLong(0) == 0L)
    check(train, train, minCount = 1)
  }

  test("minCount pruning forces backoff and stays prune-consistent") {
    val train = mkDocs(31L, 35, vocab, oovEvery = 6).filter(_._2.nonEmpty)
    val score = mkDocs(32L, 20, vocab, oovEvery = 5)
    check(train, score, minCount = 2)
    check(train, score, minCount = 3)
  }

  test("empty-doc output contract: zero tokens, zero logprob, null avg") {
    val train = mkDocs(41L, 10, vocab, oovEvery = 0).filter(_._2.nonEmpty)
    val out = LanguageModel.stupidBackoffScores(
      toDf(train), toDf(Seq((7L, Seq.empty[String]))), "text", "doc_id")
      .collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getLong(1) == 0L && r.getLong(2) == 0L &&
      r.getDouble(3) == 0.0 && r.isNullAt(4))
  }
}
