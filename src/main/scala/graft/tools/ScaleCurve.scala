package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev tool: empirical scale curve for the near-dup dedup family — the
  * measurement behind the "banded and capped, never all-pairs" claim at
  * the next order of magnitude (BASELINE.md records the output table).
  *
  * Corpus construction: m salted copies of the sf corpus, where copy c
  * applies a per-copy TOKEN BIJECTION (every token prefixed `c<c>_`).
  * A bijection of the token alphabet preserves every within-copy Jaccard
  * exactly (same shingle-set overlaps, renamed), while cross-copy
  * similarity is zero (disjoint alphabets) — so the TRUE pair count
  * scales exactly linearly in m, and any super-linear growth in
  * candidates or wall time is the algorithm's fault, not the data's.
  *
  * Reported per multiplier: docs, band-bucket candidate pairs (multiset,
  * Σ n·(n-1)/2 over buckets — what the band join enumerates), verified
  * pairs (jaccard ≥ threshold), and wall seconds for the full
  * minHashLsh pipeline. */
object ScaleCurve {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val multipliers = args.drop(1).headOption
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(1, 2, 5, 10))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")

    def salted(c: Int): DataFrame = base.select(
      (col("doc_id") + lit(c.toLong * 10000000L)).as("doc_id"),
      array_join(transform(graft.functions.TextFunctions.tokens(col("text")),
        t => concat(lit(s"c${c}_"), t)), " ").as("text"))

    multipliers.foreach { m =>
      val corpus = (0 until m).map(salted).reduce(_.unionByName(_))
        .localCheckpoint() // corpus build cost excluded from the timing
      val n = corpus.count()
      // Candidate volume the band join enumerates (pre-distinct): the
      // number the cap exists to bound.
      val sigTmp = java.nio.file.Files.createTempDirectory("graft-scale").toString + "/sigs"
      Dedup.writeMinHashSignatures(corpus, "text", "doc_id", sigTmp, numHashes = 32)
      val cand = Dedup.bandedStore(spark, sigTmp, numHashes = 32, bands = 16)
        .groupBy("__band", "__bandhash").count()
        .agg(sum(col("count") * (col("count") - 1) / 2)).collect()(0).getDouble(0).toLong
      val t0 = System.nanoTime()
      val pairs = Dedup.minHashLsh(corpus, "text", "doc_id",
        numHashes = 32, bands = 16, threshold = 0.6).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""[scale] {"multiplier":$m,"docs":$n,"candidate_pairs":$cand,"verified_pairs":$pairs,"lsh_seconds":$sec%.1f}""")
    }
    spark.stop()
  }
}
