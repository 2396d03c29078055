package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
object CellRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet").select("vec_id", "embedding")
      val n = emb.count()
      val exact = Similarity.cellBlockedCosinePairs(emb, "embedding", "vec_id", 0.45)
        .select("id_a", "id_b").localCheckpoint()
      val t = exact.count()
      for (p <- Seq(3, 4, 5)) {
        val got = Similarity.cellBlockedCosinePairs(emb, "embedding", "vec_id", 0.45,
          probeCells = p, maxBucket = 300).select("id_a", "id_b")
        val hit = got.join(exact, Seq("id_a", "id_b"), "left_semi").count()
        println(f"[cellrecall] $dir n=$n p=$p recall=${if (t==0) 1.0 else hit.toDouble/t}%.3f truth=$t")
      }
    }
    spark.stop()
  }
}
