package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
object SigProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").localCheckpoint()
    docs.count()
    def tm(name: String)(b: => Unit): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime(); b
      println(f"[sig] $name run$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val out1 = java.nio.file.Files.createTempDirectory("sigp").toString
    tm("batch explode+groupBy (writeMinHashSignatures)") {
      Dedup.writeMinHashSignatures(docs, "text", "doc_id", out1 + "/a", numHashes = 32)
    }
    tm("native graft_minhash_sig projection") {
      docs.select(col("doc_id").as("id"),
        Dedup.rowLocalMinhashSig(col("text"), 3, 32).as("sig"))
        .write.mode("overwrite").parquet(out1 + "/b")
    }
    spark.stop()
  }
}
