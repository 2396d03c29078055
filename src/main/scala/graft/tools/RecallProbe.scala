package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, Similarity}

/** Dev tool: print the raw recall values behind the recall-gated queries
  * for a given SF dir, so floors are pinned from measurements rather
  * than guesses (BASELINE.md records the outputs). Not a driver query. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val l = emb.filter(pmod(col("vec_id"), lit(10)) === 0)
      .select("vec_id", "embedding")
    val r = emb.filter(pmod(col("vec_id"), lit(10)) =!= 0)
      .select("vec_id", "embedding")
    val idx = s"/tmp/graft_ivf/semjoin_probe"
    IvfIndex.writeIndex(r, "embedding", "vec_id", idx, nlist = 16, iters = 2)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .where(col("match_id").isNotNull)
      .select(col("vec_id").as("query_id"), col("match_id").as("neighbor_id"))
    val exact = pairs(Similarity.semanticJoin(l, r, "embedding", "vec_id", minCosine = 0.3))
    val ivf = pairs(Similarity.semanticJoinIvf(spark, l, idx, "embedding", "vec_id", minCosine = 0.3))
    println(f"semantic_join_ivf recall @ $dir = ${graft.SparkEntry.recallValue(exact, ivf)}%.4f")
    spark.stop()
  }
}
