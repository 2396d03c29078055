package graft

import org.apache.spark.sql.SparkSession
import graft.operators.{EtlJob, ReconJob}
import graft.spec.{Params, Yaml}

/** CLI entry point (reference: execute_job.py — which targets a stale API;
  * this is the intended behavior): run a YAML job config with `k=v`
  * parameter arguments.
  *
  *   runMain graft.RunJob <config.yml> [k=v ...]
  *
  * The job kind is sniffed from the config: a top-level `group_by` means a
  * recon job (its joined result is printed); otherwise an ETL job (its
  * write op executes). Uses the active session when launched inside one
  * (notebook/driver), else builds a local session.
  */
object RunJob {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RunJob <config.yml> [k=v ...]")
    val configPath = args.head
    val params = args.tail.map { kv =>
      val i = kv.indexOf('=')
      require(i > 0, s"parameter '$kv' is not k=v shaped")
      kv.substring(0, i) -> kv.substring(i + 1)
    }.toMap

    implicit val spark: SparkSession = SparkSession.getActiveSession.getOrElse(
      SparkSession.builder()
        .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
        .config("spark.sql.shuffle.partitions",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
        .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    val raw = java.nio.file.Files.readString(java.nio.file.Paths.get(configPath))
    val substituted = Params.substitute(raw, params)
    val isRecon = Yaml.parse(substituted).contains("group_by")

    if (isRecon) {
      val joined = ReconJob.fromYaml(substituted).run()
      joined.show(100, truncate = false)
      println(s"[graft] recon rows: ${joined.count()}")
    } else {
      val job = EtlJob.fromYaml(substituted)
      // Print the job's plan before running — the reference CLI intends
      // this for debugging scheduled runs from their logs
      // (/root/reference/execute_job.py:23-24): the effective (param-
      // substituted) source SQL, hooks, and write op, so a failed run's
      // log shows exactly what was about to execute.
      println(s"[graft] source SQL: ${job.spec.source.effectiveQuery}")
      (job.spec.source.preSql ++ job.spec.source.postSql ++
        job.spec.target.preSql ++ job.spec.target.postSql) match {
        case Nil   => ()
        case hooks => println(s"[graft] SQL hooks: ${hooks.size}")
      }
      println(s"[graft] plan: ${job.spec.target.operation} into ${job.targetRef.describe}")
      job.run()
      println(s"[graft] ${job.spec.target.operation} into ${job.targetRef.describe} done")
    }
  }
}
