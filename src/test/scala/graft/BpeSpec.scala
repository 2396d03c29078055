package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** [[TextAnalysis.bpeMerges]] — pinned against a hand-computed merge
  * sequence, plus a naive in-test BPE trainer on random words, the
  * boundary-correctness edge (a merged symbol's substring must not
  * match across symbol boundaries), and the repeated-symbol overlap
  * rule (left-to-right non-overlapping). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def merges(texts: Seq[String], rounds: Int): Seq[(Int, String, String, Long)] =
    TextAnalysis.bpeMerges(texts.toDF("text"), "text", rounds)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq

  /** Naive reference trainer over a word-count map. */
  private def reference(words: Map[String, Long], rounds: Int): Seq[(String, Long)] = {
    var repr = words.map { case (w, c) => (w.toCharArray.map(_.toString).toSeq, c) }
    (1 to rounds).flatMap { _ =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      repr.foreach { case (syms, c) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + c
        }
      }
      if (counts.isEmpty) None
      else {
        val ((a, b), n) = counts.toSeq.minBy { case ((x, y), m) => (-m, x + " " + y) }
        repr = repr.map { case (syms, c) =>
          val out = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < syms.size) {
            if (i + 1 < syms.size && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2 // left-to-right non-overlapping
            } else { out += syms(i); i += 1 }
          }
          (out.toSeq, c)
        }
        Some((s"$a $b", n))
      }
    }
  }

  test("hand-computed sequence on a tiny corpus") {
    // Vocab: low:5, lower:2, newest:6. Classic BPE walkthrough shape.
    val texts = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++ Seq.fill(6)("newest")
    val got = merges(texts, 3)
    // Round 1: w-e totals 2+6=8 (max). Round 2: l-o totals 7 (max).
    // Round 3: max is 6, tied among {e we, n e, we s, s t} → lex min
    // 'e we'.
    assert(got.map(t => (t._2, t._4)) ==
      Seq(("w e", 8L), ("l o", 7L), ("e we", 6L)), got.toString)
    assert(got.map(_._3) == Seq("we", "lo", "ewe"))
  }

  test("matches the naive reference trainer on random words") {
    val rnd = new scala.util.Random(13)
    val words = (1 to 120).map(_ =>
      (1 + rnd.nextInt(6), Seq.fill(2 + rnd.nextInt(6))(
        ('a' + rnd.nextInt(5)).toChar).mkString))
    val texts = words.flatMap { case (c, w) => Seq.fill(c)(w) }
    val wc = texts.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = merges(texts, 5).map(t => (t._2, t._4))
    assert(got == reference(wc, 5), s"got $got")
  }

  test("repeated symbols merge left-to-right non-overlapping") {
    // 'aaa' ×4: round 1 pair (a,a) counts 8 (two per word), merges to
    // [aa, a] per word — not [a, aa], and never double-merged.
    val got = merges(Seq.fill(4)("aaa"), 2)
    assert(got.head == ((1, "a a", "aa", 8L)))
    // Round 2 on [aa, a]: pair 'aa a' n=4.
    assert(got(1) == ((2, "aa a", "aaa", 4L)))
  }

  test("60 rounds agree with the naive trainer (incremental maintenance, bounded time)") {
    val rnd = new scala.util.Random(29)
    val words = (1 to 400).map(_ =>
      (1 + rnd.nextInt(9), Seq.fill(3 + rnd.nextInt(8))(
        ('a' + rnd.nextInt(7)).toChar).mkString))
    val texts = words.flatMap { case (c, w) => Seq.fill(c)(w) }
    val wc = texts.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = merges(texts, 60).map(t => (t._2, t._4))
    val ref = reference(wc, 60)
    assert(got.size == ref.size && got == ref,
      s"first divergence: ${got.zip(ref).indexWhere(p => p._1 != p._2)}")
  }

  test("driver-local tail and distributed incremental loop are BIT-IDENTICAL") {
    val rnd = new scala.util.Random(47)
    val words = (1 to 300).map(_ =>
      (1 + rnd.nextInt(7), Seq.fill(2 + rnd.nextInt(7))(
        ('a' + rnd.nextInt(6)).toChar).mkString))
    val texts = words.flatMap { case (c, w) => Seq.fill(c)(w) }
    val local = merges(texts, 40) // default: vocab fits, local tail
    spark.conf.set("spark.graft.bpe.localVocabLimit", "0") // force distributed
    try {
      val dist = merges(texts, 40)
      assert(local == dist,
        s"first divergence at round ${local.zip(dist).indexWhere(p => p._1 != p._2) + 1}: " +
          s"local=${local.take(3)} dist=${dist.take(3)}")
    } finally spark.conf.unset("spark.graft.bpe.localVocabLimit")
  }

  test("bpeStep recounts ONLY affected words; maintained counts equal a full recount") {
    // Vocab: 'abab' contains pair (a,b); 'ccc' and 'dd' do not.
    val repr = Seq((4L, "a b a b"), (3L, "c c c"), (2L, "d d"))
      .toDF("cnt", "r")
    val (newRepr, delta) = TextAnalysis.bpeStep(repr, "a b")
    // The delta touches pairs of the affected word only: every pair in
    // the delta involves a symbol of 'abab' pre- or post-merge; the
    // untouched words' pairs (c,c)/(d,d) never enter the delta frame.
    val deltaPairs = delta.select("p").as[String].collect().toSet
    assert(!deltaPairs.contains("c c") && !deltaPairs.contains("d d"),
      s"delta recounted unaffected words: $deltaPairs")
    assert(deltaPairs == Set("a b", "b a", "ab ab"), deltaPairs.toString)
    // Maintained = seed + delta must EQUAL a full recount of newRepr.
    val maintained = TextAnalysis.bpePairCounts(repr)
      .unionByName(delta)
      .groupBy("p").agg(sum("n").as("n")).filter($"n" > 0L)
      .as[(String, Long)].collect().toMap
    val recount = TextAnalysis.bpePairCounts(newRepr)
      .as[(String, Long)].collect().toMap
    assert(maintained == recount, s"maintained=$maintained recount=$recount")
    // And the rewrite itself: only the affected word changed.
    val rows = newRepr.as[(Long, String)].collect().toMap
    assert(rows == Map(4L -> "ab ab", 3L -> "c c c", 2L -> "d d"))
  }

  test("exhaustion stops early: an all-single-symbol vocab yields no merges") {
    assert(merges(Seq("a b c", "b c a"), 3).isEmpty)
    // And a vocab that exhausts after one merge stops there.
    assert(merges(Seq("ab", "ab"), 5).size == 1)
  }

  /** Naive encode: apply the merge list IN RANK ORDER to one word —
    * the trainer's own representation evolution, independently coded. */
  private def naiveEncode(word: String, ms: Seq[(String, String)]): Seq[String] = {
    var syms: Seq[String] = word.map(_.toString)
    ms.foreach { case (a, b) =>
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < syms.size) {
        if (i + 1 < syms.size && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.toSeq
    }
    syms
  }

  test("bpeEncode ≡ applying the merge list in rank order; counts and streams agree") {
    val texts = Seq(
      "the cat sat on the mat", "the bat and the cat", "a mat a bat a rat",
      "banana bandana ban", "rats eat oats", "the the the")
    val trained = merges(texts, 12).map { case (_, p, _, _) =>
      val Array(a, b) = p.split(" ", 2); (a, b)
    }
    assert(trained.nonEmpty)
    val enc = TextAnalysis.bpeEncode(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
      "text", "doc_id", trained)
      .orderBy("doc_id")
      .as[(Long, Long, String)].collect()
    assert(enc.length == texts.length)
    texts.zipWithIndex.foreach { case (t, i) =>
      val words = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val expected = words.flatMap(w => naiveEncode(w, trained))
      val (_, n, stream) = enc(i)
      assert(stream == expected.mkString(" "),
        s"doc $i: got '$stream' want '${expected.mkString(" ")}'")
      assert(n == expected.length.toLong)
    }
  }

  test("bpeEncode: the training corpus re-encodes to the trainer's final representation") {
    // Train to exhaustion-ish depth on a small corpus, then encode the
    // SAME corpus: every word's encoding must equal what the trainer's
    // own representation evolved to (checked via the naive evolution,
    // which test 2 above pinned against bpeMergesLocal already).
    val texts = Seq("aa ab aa ab", "ab aa b a", "aa aa ab")
    val trained = merges(texts, 6).map { case (_, p, _, _) =>
      val Array(a, b) = p.split(" ", 2); (a, b)
    }
    val enc = TextAnalysis.bpeEncode(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
      "text", "doc_id", trained).orderBy("doc_id")
      .as[(Long, Long, String)].collect()
    texts.zipWithIndex.foreach { case (t, i) =>
      val expected = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .flatMap(w => naiveEncode(w, trained)).mkString(" ")
      assert(enc(i)._3 == expected)
    }
  }

  test("bpeEncode: driver-local and distributed vocabulary paths are BIT-IDENTICAL") {
    val texts = Seq("the cat sat", "a bat a cat", "rats eat oats and hats")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val trained = merges(texts, 8).map { case (_, p, _, _) =>
      val Array(a, b) = p.split(" ", 2); (a, b)
    }
    val local = TextAnalysis.bpeEncode(df, "text", "doc_id", trained)
      .orderBy("doc_id").as[(Long, Long, String)].collect().toSeq
    spark.conf.set("spark.graft.bpe.localVocabLimit", "0")
    try {
      val dist = TextAnalysis.bpeEncode(df, "text", "doc_id", trained)
        .orderBy("doc_id").as[(Long, Long, String)].collect().toSeq
      assert(local == dist)
    } finally spark.conf.unset("spark.graft.bpe.localVocabLimit")
  }
}
