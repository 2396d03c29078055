package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time (and optionally explain) selected SparkEntry queries.
  * Usage: runMain graft.TimeOne <sfDir> <query>[,<query>...] [--explain]
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val doExplain = args.contains("--explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    // extra confs: args like conf:spark.sql.codegen.wholeStage=false
    args.filter(_.startsWith("conf:")).foreach { a =>
      val kv = a.stripPrefix("conf:").split("=", 2)
      builder.config(kv(0), kv(1))
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Session warmup (same as Bench) — otherwise the FIRST query measured
    // absorbs 5-10 s of one-time JVM/codegen/parquet-reader startup.
    Warmup.run(spark, sfDir)
    names.foreach { name =>
      if (doExplain) SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      // Rebuild the DataFrame each run: run1 = cold (analysis + optimize +
      // janino codegen + execute, what the driver bench pays); run2 = warm
      // (identical generated code hits the codegen cache, shuffle reuse is
      // impossible because the RDD is fresh) — the delta is compile cost.
      // Full evaluation (not count()) so projection-only queries aren't
      // pruned to nothing — same action as Bench.
      (1 to 2).foreach { i =>
        // Construction INSIDE the timing: eager pipeline operators (LSH
        // dedup) do their work at construction, same as Bench measures.
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.queryExecution.toRdd.foreach(_ => ())
        val phases = df.queryExecution.tracker.phases
          .map { case (p, s) => s"$p=${s.endTimeMs - s.startTimeMs}ms" }
          .mkString(" ")
        println(f"[timeone] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($phases)")
      }
    }
    spark.stop()
  }
}
