package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Fixture-schema canary: a driver regen that ships a new physical
    // encoding gets ONE loud diagnosis line up front, not a dozen red
    // queries (the r7 failure mode). Queries still run — partial
    // artifacts beat empty ones — but the cause is unmissable.
    val diags = Tables.fixtureDiagnostics(spark, sfDir)
    diags.foreach(d => System.err.println(s"[verify] FIXTURE-SCHEMA CANARY: $d"))
    // Optional comma-separated subset for fast local iteration; the
    // driver sets no filter and always dumps the full suite.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None        => SparkEntry.queries
    }
    // Per-query wall-clock guard: one pathological query must never zero
    // the whole round's correctness artifact (r7: passage_overlap's
    // interpreted-eval blowup timed out the entire driver sweep at 63/100
    // queries dumped). Each query runs in its own thread under a job
    // group; past the budget we cancel the group, log, and move on.
    // Validated parse: a malformed env value must not throw before any
    // query runs — that would zero the whole artifact.
    val timeoutSec = sys.env.get("SPARK_GRAFT_QUERY_TIMEOUT_SEC")
      .flatMap { s =>
        val p = scala.util.Try(s.toInt).toOption.filter(_ > 0)
        if (p.isEmpty) System.err.println(
          s"[verify] ignoring malformed SPARK_GRAFT_QUERY_TIMEOUT_SEC=$s")
        p
      }.getOrElse(300)
    selected.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      val worker = new Thread(() => {
        try {
          // Thread-local: must be set on the thread that runs the jobs.
          spark.sparkContext.setJobGroup(s"verify-$name", name,
            interruptOnCancel = true)
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        } finally spark.sparkContext.clearJobGroup()
      }, s"verify-$name")
      worker.setDaemon(true)
      worker.start()
      worker.join(timeoutSec * 1000L)
      if (worker.isAlive) {
        System.err.println(
          s"[verify] $name exceeded ${timeoutSec}s — cancelled and skipped")
        spark.sparkContext.cancelJobGroup(s"verify-$name")
        worker.join(30000L)
      } else
        println(f"[verify] $name ok in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
