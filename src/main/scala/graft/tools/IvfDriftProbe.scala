package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, Similarity}

/** Dev tool: measure the partial-build → append → rebalance lifecycle
  * behind `ivf_rebalance_recall` — cell imbalance before/after the
  * retrain and recall from the rebalanced artifact — so the query's
  * gates are pinned from measurements. Finding recorded in the query's
  * comment: the fixture embeddings are isotropic in 64-d, so NO
  * subset-trained build (label strata or half-space splits were both
  * tried) produces meaningful cell drift — imbalance reads 1.2-1.35 on
  * both sides of the retrain, which is why the driver query gates
  * recall + row integrity, not imbalance. Not a driver query. */
object IvfDriftProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    dirs.foreach { dir =>
      val emb = graft.Tables.load(spark, dir, "embeddings")
      val idx = s"/tmp/graft_ivf/driftprobe_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val p = new org.apache.hadoop.fs.Path(idx)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      IvfIndex.writeIndex(emb.filter(col("label") < 3),
        "embedding", "vec_id", idx, nlist = 16, iters = 2)
      IvfIndex.appendToIndex(spark, idx,
        emb.filter(col("label") >= 3), "embedding", "vec_id")
      val before = IvfIndex.cellImbalance(spark, idx)
      IvfIndex.rebalance(spark, idx, nlist = 16, iters = 2)
      val after = IvfIndex.cellImbalance(spark, idx)
      val q = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
      val exact = Similarity.bruteForceTopK(emb, q, "embedding", "vec_id", k = 5)
      val approx = IvfIndex.loadTopK(spark, idx, q, "embedding", "vec_id", k = 5, nprobe = 4)
      val recall = graft.SparkEntry.recallValue(exact, approx)
      println(f"$dir imbalance before=$before%.3f after=$after%.3f recall=$recall%.4f")
    }
    spark.stop()
  }
}
