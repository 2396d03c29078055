package graft

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, TextAnalysis}
import graft.streaming.EventWindows

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("profile computes token counts, lang id, fingerprint") {
    val df = Seq(
      (1L, "The cat and the dog play in the garden, it is a fine day."),
      (2L, "Der Hund und die Katze, das ist ein Spiel und der Tag ist gut."),
      (3L, "Le chat et le chien, la vie est une chanson et les jours du matin."),
      (4L, "这是 一个 中文 文档 测试"),
      (5L, "")).toDF("doc_id", "text")
    val p = TextAnalysis.profile(df, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r).toMap

    assert(p(1).getAs[String]("pred_lang") == "en")
    assert(p(2).getAs[String]("pred_lang") == "de")
    assert(p(3).getAs[String]("pred_lang") == "fr")
    assert(p(4).getAs[String]("pred_lang") == "zh")
    assert(p(1).getAs[Int]("n_tokens") == 14)
    assert(p(5).getAs[Int]("n_tokens") == 0)
    // fingerprint is md5 of lowercased, whitespace-normalized text
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("the cat and the dog play in the garden, it is a fine day.".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(p(1).getAs[String]("fingerprint") == expected)
  }

  test("quality score favors natural text over junk") {
    val df = Seq(
      (1L, ("the quick brown fox jumps over the lazy dog and it is a very fine day " * 3)),
      (2L, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"),
      (3L, "")).toDF("doc_id", "text")
    val q = TextAnalysis.profile(df, "text", "doc_id")
      .select("doc_id", "quality").as[(Long, Double)].collect().toMap
    assert(q(1L) > q(2L), s"natural text should outscore junk: $q")
    assert(q(3L) == 0.2 || q(3L) < q(1L)) // empty doc scores low
  }

  test("repetition profile: dup-line fractions and top-bigram coverage") {
    val df = Seq(
      // 4 lines, "aaa bbb" twice: dup_line_frac = 1 - 3/4 = 0.25;
      // chars: total = 7+7+3+5 = 22, distinct = 7+3+5 = 15
      (1L, "aaa bbb\nAAA   BBB\nccc\nd e f"),
      // single line, bigram "x y" occurs 2x of 3 bigrams; norm = "x y x y"
      // (7 chars), top covers 2*3/7
      (2L, "x y x y"),
      // empty doc: everything 0
      (3L, ""),
      // one token: no bigrams
      (4L, "solo")).toDF("doc_id", "text")
    val p = TextAnalysis.repetitionProfile(df, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r).toMap

    assert(p(1).getAs[Long]("n_lines") == 4L)
    assert(math.abs(p(1).getAs[Double]("dup_line_frac") - 0.25) < 1e-9)
    assert(math.abs(p(1).getAs[Double]("dup_line_char_frac") - (1.0 - 15.0 / 22)) < 1e-6)
    assert(math.abs(p(2).getAs[Double]("top_bigram_char_frac") - 6.0 / 7) < 1e-6)
    assert(p(3).getAs[Long]("n_lines") == 0L)
    assert(p(3).getAs[Double]("top_bigram_char_frac") == 0.0)
    assert(p(4).getAs[Double]("top_bigram_char_frac") == 0.0)
    assert(p(4).getAs[Double]("dup_line_frac") == 0.0)
  }

  test("winnowing: shared long substring yields shared fingerprint; edges empty") {
    val shared = "the quick brown fox jumps over the lazy dog tonight" // 51 chars > k+w-1=23
    val df = Seq(
      (1L, s"AAA unique prefix one $shared and a tail xyz"),
      (2L, s"totally different opening words $shared closing stretch qq"),
      (3L, "short"),   // < k chars: no grams
      (4L, ""),
      (5L, "exactly12ch!")) // 12 chars: 5 grams, fewer than w -> global min
      .toDF("doc_id", "text")
    val fp = TextAnalysis.winnowFingerprints(df, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r).toMap

    val f1 = fp(1L).getSeq[Long](2).toSet
    val f2 = fp(2L).getSeq[Long](2).toSet
    assert((f1 intersect f2).nonEmpty,
      "docs sharing a >= w+k-1 substring must share a fingerprint")
    assert(fp(3L).getLong(1) == 0L && fp(3L).getSeq[Long](2).isEmpty)
    assert(fp(4L).getSeq[Long](2).isEmpty)
    assert(fp(5L).getLong(1) == 5L && fp(5L).getSeq[Long](2).size == 1)
    // determinism
    val again = TextAnalysis.winnowFingerprints(df, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](2)).toMap
    assert(again(1L) == fp(1L).getSeq[Long](2))
  }

  test("lang distribution groups by predicted language") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dist = TextAnalysis.langDistribution(docs, "text")
    assert(dist.agg(sum("n_docs")).first().getLong(0) == docs.count())
  }

  test("multimodal: decode features, resize, frame sample") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    val media = Multimodal.fromDocuments(docs)

    val feats = Multimodal.decodeFeatures(media).collect()
    assert(feats.length == 20)
    feats.foreach { f =>
      assert(f.byte_histogram.sum == f.n_bytes, "histogram buckets must sum to payload size")
    }

    val resized = Multimodal.resize(media, 8, 8).collect()
    assert(resized.forall(r => r.payload.length == 64 && r.meta.width == 8))

    val frames = Multimodal.frameSample(media, frameBytes = 32, everyNth = 2)
    val perDoc = frames.groupBy("media_id").count().select("count").as[Long].collect()
    assert(perDoc.forall(_ >= 1))
    // deterministic: same input → same checksum set
    val feats2 = Multimodal.decodeFeatures(media).collect()
    assert(feats.map(_.checksum).toSet == feats2.map(_.checksum).toSet)
  }

  test("tumbling window agg: batch and streaming agree") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val batch = EventWindows.tumbling(events, "ts", "10 minutes")
    val total = batch.agg(sum("n_events")).first().getLong(0)
    assert(total == events.count(), "window agg must cover every event")

    val q = EventWindows.streamTumblingToMemory(
      spark, "/root/testdata/sf0.001/events.parquet", "ts", "10 minutes",
      watermark = "1 minute", sinkTable = "stream_sink")
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("stream_sink")
    // append-mode emits only watermark-closed windows; every emitted row
    // must match the batch result exactly
    val batchSet = batch.collect().map(_.toSeq).toSet
    val streamSet = streamed.collect().map(_.toSeq).toSet
    assert(streamSet.nonEmpty, "streaming emitted no closed windows")
    assert(streamSet.subsetOf(batchSet), "streaming rows diverge from batch")
  }

  test("session windows cover all events per user") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val sessions = EventWindows.sessions(events, "ts", "5 minutes")
    assert(sessions.agg(sum("n_events")).first().getLong(0) == events.count())
  }

  test("session windows: batch and streaming agree") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val batch = EventWindows.sessions(events, "ts", "5 minutes")
    val q = EventWindows.streamSessionsToMemory(
      spark, "/root/testdata/sf0.001/events.parquet", "ts", "5 minutes",
      watermark = "1 minute", sinkTable = "stream_sessions_sink")
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("stream_sessions_sink")
    // append-mode emits only watermark-closed sessions; each emitted
    // session must match the batch sessionization exactly
    val batchSet = batch.collect().map(_.toSeq).toSet
    val streamSet = streamed.collect().map(_.toSeq).toSet
    assert(streamSet.nonEmpty, "streaming emitted no closed sessions")
    assert(streamSet.subsetOf(batchSet), "streaming sessions diverge from batch")
  }

  test("lineRules applies C4 keep rules per line and per document") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      // 3 keepable lines → keep
      (1L, "this line has enough words to pass.\nshort one\n" +
        "another line that carries plenty of words!\n" +
        "and a third line asking a proper question?"),
      // only 2 keepable lines → dropped by minLinesPerDoc
      (2L, "this line has enough words to pass.\n" +
        "another line that carries plenty of words!"),
      // javascript line doesn't count; lorem ipsum kills the doc
      (3L, "Enable JavaScript to continue reading this page.\n" +
        "lorem ipsum dolor sit amet consectetur adipiscing elit.\n" +
        "a real sentence with enough words to pass muster.\n" +
        "another real sentence with enough words to pass.\n" +
        "one more real sentence with enough words here."),
      // curly brace kills the doc even with enough kept lines
      (4L, "function f() { return 1; } is not prose at all.\n" +
        "a real sentence with enough words to pass muster.\n" +
        "another real sentence with enough words to pass.\n" +
        "one more real sentence with enough words here."),
      (5L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.lineRules(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(1L)._2 == 3 && out(1L)._4, s"doc 1: ${out(1L)}")
    assert(out(1L)._1 == 4, "all four non-empty lines counted")
    assert(out(2L) == ((2, 2, 77L, false)), s"doc 2: ${out(2L)}")
    // doc 3: lorem-ipsum line ends terminally and has ≥5 words → KEPT as
    // a line (4 kept incl. it, javascript line rejected), doc still dies
    // on the page-level lorem-ipsum rule
    assert(out(3L)._2 == 4 && !out(3L)._4, s"doc 3: ${out(3L)}")
    assert(out(4L)._2 == 4 && !out(4L)._4, s"doc 4: ${out(4L)}")
    assert(out(5L) == ((0, 0, 0L, false)), s"doc 5: ${out(5L)}")
    // kept_chars = characters of the kept lines only
    val k1 = "this line has enough words to pass.".length +
      "another line that carries plenty of words!".length +
      "and a third line asking a proper question?".length
    assert(out(1L)._3 == k1.toLong)
  }

  test("redactPii replaces emails and IPv4 and counts matches") {
    import spark.implicits._
    val df = Seq(
      (1L, "write to alice.smith+x@sub.example.org or 192.168.0.1 today"),
      (2L, "no pii here at all"),
      (3L, "two mails a@b.co c@d.io and ips 10.0.0.1 8.8.8.8")).toDF("id", "text")
    val out = graft.operators.TextAnalysis.redactPii(df, "text")
      .select("id", "n_emails", "n_ips", "text_redacted")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(out(1L) == ((1, 1, "write to <EMAIL> or <IP> today")))
    assert(out(2L) == ((0, 0, "no pii here at all")))
    assert(out(3L) == ((2, 2, "two mails <EMAIL> <EMAIL> and ips <IP> <IP>")))
  }

  test("vocabCoverage: top-k vocab with deterministic ties, per-group OOV rate") {
    val docs = Seq(
      ("en", "aa aa aa bb bb cc"),
      ("en", "aa bb zz"),
      ("de", "aa qq rr")).toDF("lang", "text")
    // Corpus counts: aa=5 bb=3 cc=1 zz=1 qq=1 rr=1 — vocabSize=2 keeps
    // {aa, bb}; ties at 1 are never reached. OOV: en has cc+zz (2 of 9),
    // de has qq+rr (2 of 3).
    val out = TextAnalysis.vocabCoverage(docs, "text", "lang", vocabSize = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("en") == ((9L, 2L, 0.222222)))
    assert(out("de") == ((3L, 2L, 0.666667)))
    // tie-break determinism: vocabSize=3 must pick cc (count 1, smallest
    // token among the five count-1 candidates is "cc").
    val out3 = TextAnalysis.vocabCoverage(docs, "text", "lang", vocabSize = 3)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out3("en") == 1L && out3("de") == 2L)
  }

  test("tfidfKeywords matches a naive driver-side computation") {
    val rnd = new scala.util.Random(17)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    val corpus = (1 to 40).map { i =>
      (i.toLong, Seq.fill(8 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }
    val docs = corpus.toDF("doc_id", "text")
    val k = 3
    val out = TextAnalysis.tfidfKeywords(docs, "text", "doc_id", k)
      .as[(Long, String, Int, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(r => (r._2, r._4)).toSeq).toMap
    // naive ground truth
    val n = corpus.size
    val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val dfreq = toks.values.flatMap(_.distinct).groupBy(identity).view.mapValues(_.size)
    val naive = toks.map { case (id, ts) =>
      val tf = ts.groupBy(identity).view.mapValues(_.size)
      val scored = tf.map { case (term, f) =>
        term -> f.toDouble * math.log((n + 1).toDouble / (dfreq(term) + 1.0))
      }.toSeq.sortBy { case (term, s) => (-s, term) }.take(k)
      id -> scored
    }
    corpus.foreach { case (id, _) =>
      val got = out(id); val want = naive(id)
      assert(got.map(_._1) == want.map(_._1), s"doc $id terms: $got vs $want")
      got.zip(want).foreach { case ((_, g), (_, w)) =>
        assert(math.abs(g - w) < 1e-9, s"doc $id score: $g vs $w") }
    }
  }

  test("native winnow fingerprints are bit-identical to the SQL-array probe") {
    val fixture = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(200).select("doc_id", "text")
    // edge planting: empty, below k, exactly k, between k and k+w-1
    // (single-global-min branch), exactly at the first full window
    val edges = Seq(
      (90001L, ""), (90002L, "abc"), (90003L, "exactly8"),
      (90004L, "twelve chars"), (90005L, "a" * 23), (90006L, "b" * 24),
      (90007L, "mixed 42 Words with CAPS  and   runs of space")
    ).toDF("doc_id", "text")
    val docs = fixture.unionByName(edges)
    val native = TextAnalysis.winnowFingerprints(docs, "text", "doc_id")
      .select(col("doc_id"), col("n_grams").as("ng_n"),
        col("fingerprints").as("fp_n"))
    val probe = TextAnalysis.winnowFingerprintsSqlProbe(docs, "text", "doc_id")
      .select(col("doc_id"), col("n_grams").as("ng_p"),
        col("fingerprints").as("fp_p"))
    val joined = native.join(probe, "doc_id")
    assert(joined.count() == 207)
    val mismatched = joined.filter(
      col("ng_n") =!= col("ng_p") || not(col("fp_n") === col("fp_p")))
    assert(mismatched.count() == 0,
      s"native winnow must equal the SQL probe:\n${mismatched.take(3).mkString("\n")}")
  }

  test("foldAccents strips diacritics, expands ligatures, is ASCII-idempotent") {
    import graft.functions.TextFunctions._
    val rows = Seq(
      (1L, "café crème naïve façade"),
      (2L, "Größe straße"),
      (3L, "Æon œuvre ÞORN þing"),
      (4L, "plain ascii stays untouched"),
      (5L, "ÀÉÎÕÜ ñ Ç š ž")
    ).toDF("id", "s").select(col("id"), foldAccents(col("s")).as("f"))
      .as[(Long, String)].collect().toMap
    assert(rows(1L) == "cafe creme naive facade")
    assert(rows(2L) == "Grosse strasse")
    assert(rows(3L) == "AEon oeuvre THORN thing")
    assert(rows(4L) == "plain ascii stays untouched")
    assert(rows(5L) == "AEIOU n C s z")
    // the map constants stay index-aligned by construction
    assert(AccentFrom.length == AccentTo.length)
  }
}
