package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Dedup
import graft.streaming.StreamingCuration

/** Property soak for the streaming curation pipeline: random corpora
  * with planted exact duplicates and near-duplicate mutations, random
  * two-batch splits (fixed seed — deterministic). The streaming verdicts
  * must equal the CONTRACT recomputed independently with batch DataFrame
  * ops: per normalized-text fingerprint, emission at the first staged
  * batch containing it, min-id keeper, batch-dup count from that batch
  * only, and distinct stable docs at trigram-Jaccard ≥ threshold. */
class StreamingCurationPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260814L)

  private val vocab = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
    "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron",
    "pi", "rho", "sigma", "tau", "upsilon")

  private def sentence(words: Int): String =
    Seq.fill(words)(vocab(rnd.nextInt(vocab.size))).mkString(" ")

  test("random corpora: streaming verdicts equal the batch-recomputed contract") {
    (1 to 3).foreach { _ =>
      // Stable corpus + a batch of: fresh docs, exact clones of stable
      // docs, near-dup mutations (append one word), and within-batch
      // exact dup pairs.
      val stableRows = (0L until (8 + rnd.nextInt(8))).map(i => (i, sentence(10 + rnd.nextInt(15))))
      var next = 1000L
      val batchRows = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
      (0 until (6 + rnd.nextInt(8))).foreach { _ =>
        val kind = rnd.nextInt(4)
        val text = kind match {
          case 0 => sentence(10 + rnd.nextInt(15)) // fresh
          case 1 => stableRows(rnd.nextInt(stableRows.size))._2 // exact clone of stable
          case 2 => stableRows(rnd.nextInt(stableRows.size))._2 + " omega" // near-dup
          case 3 if batchRows.nonEmpty => batchRows(rnd.nextInt(batchRows.size))._2 // in-batch dup
          case _ => sentence(12)
        }
        batchRows += ((next, text)); next += 1
      }
      val stable = stableRows.toDF("doc_id", "text")
      val batch = batchRows.toSeq.toDF("doc_id", "text")
      val sigs = Files.createTempDirectory("graft-scps").toString + "/sigs"
      Dedup.writeMinHashSignatures(stable, "text", "doc_id", sigs, numHashes = 32)

      // Random two-batch split on doc-id parity of a random pivot.
      val pivot = rnd.nextInt(1000)
      def staged(first: Boolean, ts: String) = batch
        .filter((pmod(col("doc_id") + pivot, lit(2)) === 0) === first)
        .withColumn("__ts", lit(ts).cast("timestamp"))
      val out = StreamingCuration.curate(spark,
        Seq(staged(first = true, "2024-01-01 00:00:00"),
          staged(first = false, "2024-01-01 01:00:00")),
        stable, sigs, "text", "doc_id", "__ts",
        minQuality = -1.0, numHashes = 32, bands = 16, threshold = 0.6)

      // Contract recomputed with batch ops (no streaming, no band join:
      // matches come from ALL-PAIRS verified Jaccard — the streaming
      // band path must lose nothing at these parameters).
      val q = batch
        .withColumn("__fp", TextFunctions.fingerprint(col("text")))
        .withColumn("__stage",
          when(pmod(col("doc_id") + pivot, lit(2)) === 0, 0).otherwise(1))
      val firstStage = q.groupBy("__fp").agg(min(col("__stage")).as("__fs"))
      val grp = q.join(firstStage, "__fp").filter(col("__stage") === col("__fs"))
      val keeper = grp.groupBy("__fp").agg(
        min(col("doc_id")).as("doc_id"),
        (count(lit(1)) - 1).cast("int").as("n_batch_dups"))
      val sh = (d: DataFrame, c: String) =>
        d.withColumn(c, array_distinct(TextFunctions.wordShingles(col("text"), 3)))
      val kText = keeper.join(batch, "doc_id")
      val pairs = sh(kText, "__ba").crossJoin(
          sh(stable.withColumnsRenamed(Map("doc_id" -> "sid", "text" -> "stext"))
            .withColumnRenamed("stext", "text"), "__sa")
            .withColumnRenamed("text", "stext"))
        .withColumn("__jac",
          size(array_intersect(col("__ba"), col("__sa"))).cast("double") /
            size(array_union(col("__ba"), col("__sa"))))
        .filter(col("__jac") >= 0.6)
      val agg = pairs.groupBy("doc_id").agg(
        countDistinct(col("sid")).cast("int").as("n_store_matches"),
        round(max(col("__jac")), 4).as("best_jaccard"))
      val expected = keeper.join(agg, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_batch_dups"),
          coalesce(col("n_store_matches"), lit(0)).as("n_store_matches"),
          col("best_jaccard"),
          col("n_store_matches").isNull.as("kept"))

      val cols = Seq("doc_id", "n_batch_dups", "n_store_matches", "best_jaccard", "kept")
      val got = out.select(cols.map(col): _*)
      val diff = got.exceptAll(expected.select(cols.map(col): _*))
        .unionAll(expected.select(cols.map(col): _*).exceptAll(got))
      assert(diff.isEmpty,
        s"streaming verdicts diverged from the batch contract:\n" +
          diff.collect().map(_.toString).mkString("\n"))
    }
  }
}
