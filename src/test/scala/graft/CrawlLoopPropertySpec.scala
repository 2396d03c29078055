package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Versioned}

/** Randomized soak for the closed crawl loop (`crawl_append_loop`'s
  * composition): random crawl batches — tail-appended near-dups, exact
  * copies, token-reversed redrafts, genuinely novel docs — run through
  * sig-store write → bloom-pruned incremental LSH → greater-member drop
  * → versioned append → CDC read-back, and the surviving id set must
  * equal a NAIVE from-scratch recomputation (exact trigram Jaccard over
  * every batch-touching pair, no banding, no bloom, no store). Three
  * seeded waves; determinism makes any pass permanent. */
class CrawlLoopPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260815L)

  private def norm(s: String): String =
    s.toLowerCase.replaceAll("\\s+", " ").trim

  /** Mirror of the word-trigram shingle contract: ≤3 tokens → ONE
    * whole-text shingle. */
  private def grams(s: String): Set[String] = {
    val t = norm(s).split(" ").filter(_.nonEmpty)
    if (t.length <= 3) Set(t.mkString(" "))
    else t.sliding(3).map(_.mkString(" ")).toSet
  }

  private def jaccard(a: Set[String], b: Set[String]): Double = {
    val i = a.intersect(b).size
    if (a.isEmpty && b.isEmpty) 1.0 else i.toDouble / (a.size + b.size - i)
  }

  test("random crawl batches: pipeline survivors equal the naive exact recomputation") {
    val corpusRows = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq

    (1 to 3).foreach { wave =>
      // random batch: 40 source docs, one of four mutations each
      val picks = rnd.shuffle(corpusRows).take(40)
      val batchRows = picks.zipWithIndex.map { case ((id, text), i) =>
        val nid = 5000000000L + wave * 1000000L + i
        val toks = norm(text).split(" ").filter(_.nonEmpty)
        val mutated = rnd.nextInt(4) match {
          case 0 => text + (" tail" + (1 to 1 + rnd.nextInt(6))
            .map(k => s" w${rnd.nextInt(50)}").mkString)          // near-dup-ish
          case 1 => text                                           // exact copy
          case 2 => toks.reverse.mkString(" ")                     // redraft
          case 3 => (1 to 30).map(_ => s"nv${rnd.nextInt(100000)}_$wave")
            .mkString(" ")                                         // novel
        }
        (nid, mutated)
      }

      // --- pipeline ---
      val corpus = corpusRows.toDF("doc_id", "text")
      val batch = batchRows.toDF("doc_id", "text")
      val dir = Files.createTempDirectory("graft-crawl-prop").toString
      Versioned.commit(corpus, s"$dir/t")
      Dedup.writeMinHashSignatures(corpus, "text", "doc_id", s"$dir/sigs",
        numHashes = 32)
      val pairs = Dedup.minHashLshIncremental(spark, batch, corpus,
        "text", "doc_id", s"$dir/sigs",
        numHashes = 32, bands = 16, threshold = 0.6)
      val drops = pairs.select(col("id_b").as("doc_id")).distinct()
      val survivors = batch.join(drops, Seq("doc_id"), "left_anti")
      Versioned.append(survivors, s"$dir/t")
      val got = Versioned.changes(spark, s"$dir/t", 0L)
        .select("doc_id").as[Long].collect().toSet

      // --- naive exact model: every batch-touching pair, no banding ---
      val corpusGrams = corpusRows.map { case (id, t) => id -> grams(t) }
      val batchGrams = batchRows.map { case (id, t) => id -> grams(t) }
      val all = corpusGrams ++ batchGrams
      val dropSet = (for {
        (bid, bg) <- batchGrams
        (oid, og) <- all
        if oid < bid && jaccard(bg, og) >= 0.6
      } yield bid).toSet
      val want = batchRows.map(_._1).filterNot(dropSet).toSet

      assert(got == want,
        s"wave $wave drifted: pipeline-only=${(got -- want).toSeq.sorted.take(5)} " +
          s"model-only=${(want -- got).toSeq.sorted.take(5)}")
      assert(got.nonEmpty && got.size < batchRows.size,
        s"wave $wave degenerate: ${got.size}/${batchRows.size} survived — " +
          "both verdicts must occur for the wave to prove anything")
    }
  }
}
