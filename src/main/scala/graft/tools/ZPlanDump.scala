package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump the executed plan of the z-value staging projection
  * (the layout write's per-row hot path) for plan-evidence capture.
  * Usage: runMain graft.tools.ZPlanDump <sfDir> <outFile>
  */
object ZPlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val out = args(1)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select("event_id", "user_id", "event_type", "value")
    val bs = graft.sources.Layout.boundariesFor(ev, Seq("user_id", "value"), 8)
    val df = graft.sources.Layout.withZValue(ev, Seq("user_id", "value"), bs, 8)
    df.queryExecution.toRdd.foreach(_ => ())
    val plan = df.queryExecution.executedPlan.toString
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      plan.getBytes("UTF-8"))
    spark.stop()
  }
}
