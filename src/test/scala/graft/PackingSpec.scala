package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packs fill in id order; offsets and pack ids are consistent") {
    // one shard so the packing is a single readable sequence
    val df = Seq((0L, 100L), (1L, 300L), (2L, 200L), (3L, 50L), (4L, 500L))
      .toDF("id", "n_tokens")
    val out = Packing.packSequences(df, "id", "n_tokens", budget = 512, shards = 1)
      .select("id", "pack_id", "pack_offset").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    // cumulative starts: 0, 100, 400, 600, 650 → packs 0,0,0,1,1
    assert(out == Seq(
      (0L, 0L, 0L), (1L, 0L, 100L), (2L, 0L, 400L),
      (3L, 1L, 88L), (4L, 1L, 138L)))
  }

  test("doc longer than the budget occupies the pack where it starts") {
    val df = Seq((0L, 2000L), (1L, 10L)).toDF("id", "n_tokens")
    val out = Packing.packSequences(df, "id", "n_tokens", budget = 512, shards = 1)
      .select("id", "pack_id").as[(Long, Long)].collect().sortBy(_._1).toSeq
    // doc 0 starts at offset 0 (pack 0) and spills through pack 3;
    // doc 1 starts at cumulative 2000 → pack 3
    assert(out == Seq((0L, 0L), (1L, 3L)))
  }

  test("sharding preserves every row and packs independently per shard") {
    val df = spark.range(0, 1000).toDF("id")
      .withColumn("n_tokens", lit(100L))
    val out = Packing.packSequences(df, "id", "n_tokens", budget = 250, shards = 8)
    assert(out.count() == 1000)
    // every shard's first doc (by id) starts at offset 0 in pack 0
    val firsts = out.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("shard").orderBy("id")))
      .filter(col("rn") === 1)
    assert(firsts.filter(col("pack_id") =!= 0 || col("pack_offset") =!= 0).count() == 0)
    // deterministic: same input → identical assignment
    val again = Packing.packSequences(df, "id", "n_tokens", budget = 250, shards = 8)
    assert(out.exceptAll(again).isEmpty)
  }

  test("chunking: boundaries, overlap, tail suppression, empty docs") {
    def words(n: Int, p: String) = (0 until n).map(i => s"$p$i").mkString(" ")
    val df = Seq(
      (1L, words(5, "a")),   // n <= max → one whole chunk
      (2L, words(10, "b")),  // 10 tokens, max 8, ov 4, stride 4 → starts 0,4 (8 suppressed: no new tokens)
      (3L, words(13, "c")),  // starts 0,4,8 → lens 8,8,5
      (4L, ""),              // token-less → no chunks
      (5L, words(8, "d")))   // exactly max → one chunk
      .toDF("doc_id", "text")
    val out = Packing.chunkDocuments(df, "text", "doc_id", maxTokens = 8, overlap = 4)
      .select("doc_id", "chunk_id", "n_tokens", "chunk_text")
      .as[(Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(
      (1L, 0L, 5L, words(5, "a")),
      (2L, 0L, 8L, (0 until 8).map(i => s"b$i").mkString(" ")),
      (2L, 1L, 6L, (4 until 10).map(i => s"b$i").mkString(" ")),
      (3L, 0L, 8L, (0 until 8).map(i => s"c$i").mkString(" ")),
      (3L, 1L, 8L, (4 until 12).map(i => s"c$i").mkString(" ")),
      (3L, 2L, 5L, (8 until 13).map(i => s"c$i").mkString(" ")),
      (5L, 0L, 8L, words(8, "d"))))
    // every token of every doc is covered by at least one chunk
    val chunked = Packing.chunkDocuments(df, "text", "doc_id", maxTokens = 8, overlap = 4)
    val coverage = chunked.groupBy("doc_id")
      .agg(max(col("chunk_id") * 4 + col("n_tokens")).as("covered"))
    val lens = df.select(col("doc_id"),
      graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("n"))
    assert(coverage.join(lens, "doc_id").filter(col("covered") =!= col("n")).count() == 0)
  }

  test("chunking plan has zero exchanges (row-parallel scan stage)") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val p = Packing.chunkDocuments(df, "text", "doc_id", maxTokens = 40, overlap = 8)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"chunking must not shuffle:\n$p")
  }

  test("streaming packing equals batch packing; state carries across batches") {
    import graft.streaming.StreamingPacking
    val rnd = new scala.util.Random(42L)
    val rows = (0L until 200L).map(id => (id, 1L + rnd.nextInt(120).toLong))
    val df = rows.toDF("id", "tokens")
    val batch = Packing.packSequences(df, "id", "tokens", budget = 64, shards = 4)
      .select(col("id"), col("shard").cast("int").as("shard"),
        col("pack_id"), col("pack_offset"))
      .as[(Long, Int, Long, Long)].collect().toSet
    // stream the same rows as three id-ordered batches
    val streamed = StreamingPacking.packStaged(spark,
      Seq(df.filter(col("id") < 70), df.filter(col("id") >= 70 && col("id") < 140),
        df.filter(col("id") >= 140)),
      "id", "tokens", budget = 64, shards = 4)
    val got = streamed.select(col("id"), col("shard"),
      col("pack_id"), col("pack_offset"))
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(got == batch,
      s"stream-only=${(got -- batch).take(5)} batch-only=${(batch -- got).take(5)}")
    // the boundary actually exercised state: some pack spans batches
    // (i.e. a pack_id emitted in a later batch continues an earlier total)
    val nonZeroState = streamed.filter(col("pack_id") > 0).count()
    assert(nonZeroState > 0, "test corpus too small to exercise carried state")
  }

  test("unordered packing: in-bound stragglers pack exactly; violators flagged") {
    import graft.streaming.StreamingPacking
    val rows = (0L until 150L).map(id => (id, 1L + (id * 7 % 40)))
    val df = rows.toDF("id", "tokens")
    // id 95 arrives late but within lateness=20 of batch-1's max (99);
    // id 50 arrives in batch 2, lagging 49 — a contract violation
    val b1 = df.filter(col("id") < 100 && col("id") =!= 95 && col("id") =!= 50)
    val b2 = df.filter(col("id") >= 100 || col("id") === 95 || col("id") === 50)
    val streamed = StreamingPacking.packStagedUnordered(spark,
      Seq(b1, b2), "id", "tokens", budget = 64, shards = 4, lateness = 20L)
    val flagged = streamed.filter(col("pack_id") === -1L)
      .select("id").as[Long].collect().toSet
    assert(flagged == Set(50L), s"only the violator is flagged: $flagged")
    // every valid emission equals the batch packing of the corpus the
    // stream actually accepted (all rows minus the violator)
    val accepted = df.filter(col("id") =!= 50)
    val batch = Packing.packSequences(accepted, "id", "tokens",
      budget = 64, shards = 4)
      .select(col("id"), col("pack_id"), col("pack_offset"))
      .as[(Long, Long, Long)].collect()
      .map { case (id, p, o) => id -> ((p, o)) }.toMap
    val got = streamed.filter(col("pack_id") >= 0)
      .select(col("id"), col("pack_id"), col("pack_offset"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (id, p, o) =>
      assert(batch(id) == ((p, o)), s"id $id: stream ($p,$o) vs batch ${batch(id)}")
    }
    // the in-bound straggler was finalized and packed
    assert(got.exists(_._1 == 95L), "in-bound straggler must be emitted")
    // the trailing tail (above per-shard max - lateness) stays buffered
    val emittedIds = got.map(_._1).toSet
    assert(!emittedIds.contains(149L), "tail must stay unemitted at stream end")
  }

  test("chunkPackStaged rejects chunk_id >= keyFactor loudly (key-collision guard)") {
    import graft.streaming.StreamingPacking
    // 200 tokens → ceil((200-8)/32) = 6 chunks; keyFactor=4 < 6 would
    // collide doc 0's chunk keys into doc 1's key space. The guard must
    // raise, not silently mis-pack.
    val longDoc = (1 to 200).map(i => s"t$i").mkString(" ")
    val df = Seq((0L, longDoc), (1L, "short doc here")).toDF("doc_id", "text")
    val ex = intercept[Exception] {
      StreamingPacking.chunkPackStaged(spark, Seq(df), "text", "doc_id",
        maxTokens = 40, overlap = 8, keyFactor = 4L,
        budget = 64, shards = 2).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c => Option(c.getMessage).exists(
      _.contains("chunk keys would collide"))),
      s"expected the key-collision raise, got: $ex")
    // an adequate keyFactor on the same corpus still packs fine
    val ok = StreamingPacking.chunkPackStaged(spark, Seq(df), "text", "doc_id",
      maxTokens = 40, overlap = 8, keyFactor = 1000L, budget = 64, shards = 2)
    assert(ok.count() == 7)
  }
}
