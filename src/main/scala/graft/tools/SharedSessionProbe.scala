package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, Similarity}

/** Dev probe: per-stage wall-clock of the ivf_shared_session composition
  * (the bench's slowest repeatable non-streaming query) so optimization
  * targets the stage that actually costs, not the one that looks big.
  * Usage: runMain graft.tools.SharedSessionProbe <sfDir>
  */
object SharedSessionProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Warmup.run(spark, sfDir)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def drain(df: DataFrame): Unit =
      df.queryExecution.toRdd.foreach(_ => ())

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val idx = time("cachedIndex") {
        IvfIndex.cachedIndex(spark, s"$sfDir/embeddings.parquet",
          "shared_nlist16") { d =>
          IvfIndex.writeIndex(emb, "embedding", "vec_id", d, nlist = 16, iters = 2)
        }
      }
      val q = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
      time("bruteForceTopK(q)")(drain(
        Similarity.bruteForceTopK(emb, q, "embedding", "vec_id", k = 5)))
      time("loadTopK(q,k=5)")(drain(
        IvfIndex.loadTopK(spark, idx, q, "embedding", "vec_id", k = 5, nprobe = 4)))
      time("cellBlockedCosinePairs")(drain(
        Similarity.cellBlockedCosinePairs(emb, "embedding", "vec_id", threshold = 0.45)))
      time("loadTopK(all,k=10)")(drain(
        IvfIndex.loadTopK(spark, idx, emb, "embedding", "vec_id", k = 10, nprobe = 4)
          .filter(col("cosine") >= 0.45)
          .select(least(col("query_id"), col("neighbor_id")).as("query_id"),
            greatest(col("query_id"), col("neighbor_id")).as("neighbor_id"))
          .distinct()))
    }
    spark.stop()
  }
}
