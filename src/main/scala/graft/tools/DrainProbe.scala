package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: where a staged streaming drain's wall-clock goes —
  * staging writes vs each checkpointed AvailableNow run vs the final
  * read-back — using the streaming_late_counts composition.
  * Usage: runMain graft.tools.DrainProbe <sfDir>
  */
object DrainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
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
    val ev = graft.Tables.adaptEventTs(
      spark.read.parquet(s"$sfDir/events.parquet"), "ts")
    (1 to 2).foreach { rnd =>
      println(s"--- round $rnd ---")
      val b1 = ev.filter(pmod(col("event_id"), lit(2)) === 0)
      val b2 = ev.filter(pmod(col("event_id"), lit(2)) =!= 0)
      val batches = Seq(b1, b2)
      val stage = java.nio.file.Files.createTempDirectory("graft_drain_probe")
      val ckpt = stage.resolve("__checkpoint").toString
      val out = stage.resolve("__out").toString
      batches.zipWithIndex.foreach { case (b, i) =>
        time(s"stageBatch $i") {
          val tmp = stage.resolve(s"__tmp_$i")
          b.coalesce(1).write.parquet(tmp.toString)
          val part = tmp.toFile.listFiles()
            .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
            .get
          val dest = new java.io.File(stage.toFile, f"batch_$i%03d.parquet")
          java.nio.file.Files.move(part.toPath, dest.toPath)
          tmp.toFile.listFiles().foreach(_.delete()); tmp.toFile.delete()
        }
        time(s"drain run $i") {
          val src = spark.readStream.schema(b.schema)
            .option("pathGlobFilter", "batch_*.parquet")
            .parquet(stage.toString)
          val q = graft.streaming.EventWindows.tumbling(
              src.withWatermark("ts", "30 minutes"), "ts", "15 minutes")
            .writeStream.format("parquet").outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
      }
      time("read-back agg") {
        spark.read.parquet(out)
          .agg(count(lit(1)), coalesce(sum(col("n_events")), lit(0L)))
          .queryExecution.toRdd.foreach(_ => ())
      }
    }
    spark.stop()
  }
}
