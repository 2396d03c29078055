package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-stage wall-clock of the zorder_scan composition
  * (quantile pass vs z-value write vs pruned read-back).
  * Usage: runMain graft.tools.LayoutProbe <sfDir>
  */
object LayoutProbe {
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
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select("event_id", "user_id", "event_type", "value")
    (1 to 2).foreach { rnd =>
      println(s"--- round $rnd ---")
      val p = s"/tmp/graft_layout_probe/events"
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
      val bs = time("boundariesFor") {
        graft.sources.Layout.boundariesFor(ev, Seq("user_id", "value"), 8)
      }
      time("zvalue only") {
        val zf = graft.sources.Layout.withZValue(ev, Seq("user_id", "value"), bs, 8)
        if (rnd == 1) {
          val ep = zf.queryExecution.executedPlan.toString
          println("[plan] executedPlan head:\n" +
            ep.linesIterator.take(12).mkString("\n"))
          println("[plan] wholestage spans: " +
            "WholeStageCodegen".r.findAllIn(ep).size +
            ", Project nodes: " + "Project".r.findAllIn(ep).size)
        }
        zf.queryExecution.toRdd.foreach(_ => ())
      }
      time("zvalue+range-repart") {
        graft.sources.Layout.withZValue(ev, Seq("user_id", "value"), bs, 8)
          .repartitionByRange(8, col("__z"))
          .queryExecution.toRdd.foreach(_ => ())
      }
      time("zvalue+write") {
        graft.sources.Layout.withZValue(ev, Seq("user_id", "value"), bs, 8)
          .repartitionByRange(8, col("__z"))
          .sortWithinPartitions("__z")
          .drop("__z")
          .write.mode("overwrite").parquet(p)
      }
      time("read-back agg") {
        spark.read.parquet(p)
          .where(col("user_id").between(30, 80) &&
            col("value") >= 50.0 && col("value") < 200.0)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"),
            round(min("value"), 4).as("min_value"),
            round(max("value"), 4).as("max_value"))
          .queryExecution.toRdd.foreach(_ => ())
      }
    }
    spark.stop()
  }
}
