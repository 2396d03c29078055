package graft.operators

import org.apache.spark.sql.Dataset

/** The library's ONE lineage-cap primitive. Iterative operators
  * (PageRank power iterations, connected-components rounds, BPE merge
  * rounds, dedup waypoints, streaming static join sides) must cap
  * lineage or K rounds deepen the plan K-fold; the default cap is
  * `localCheckpoint(eager)` — executor-local blocks, no replication,
  * the fast choice Spark's own docs bless for single-tenant iteration.
  *
  * The caveat is cluster fault tolerance: local checkpoint blocks are
  * NOT recomputable and NOT replicated, so on a real cluster an
  * executor loss mid-query kills the job instead of recomputing. The
  * escape hatch for long 100 TB runs:
  *
  *   spark.conf.set("spark.graft.checkpoint.reliable", "true")
  *   // optional; defaults to <java.io.tmpdir>/graft_checkpoints
  *   spark.conf.set("spark.graft.checkpoint.dir", "hdfs://.../ckpt")
  *
  * which routes every cap through `Dataset.checkpoint(eager)` — blocks
  * persisted to the (replicated) checkpoint dir, so lost executors
  * re-read instead of failing the query. Results are IDENTICAL in both
  * modes (CheckpointsSpec pins it): the cap only pins a frame, it
  * never changes the frame. */
object Checkpoints {

  /** Cap `ds`'s lineage: local checkpoint by default, reliable
    * checkpoint when `spark.graft.checkpoint.reliable` is true. */
  def cap[T](ds: Dataset[T]): Dataset[T] = {
    val spark = ds.sparkSession
    val reliable = spark.conf
      .getOption("spark.graft.checkpoint.reliable").exists(_.toBoolean)
    if (!reliable) ds.localCheckpoint(true)
    else {
      val sc = spark.sparkContext
      if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(
        spark.conf.getOption("spark.graft.checkpoint.dir").getOrElse {
          // The tmpdir default is driver-LOCAL: fine under local masters
          // (one JVM), but on a real cluster it is not a shared
          // filesystem, so the fault-tolerance hatch would silently fail
          // its one purpose (executor loss still loses blocks). Refuse
          // instead of degrading.
          require(sc.isLocal,
            "spark.graft.checkpoint.reliable=true on a non-local master " +
              "requires spark.graft.checkpoint.dir to point at a SHARED " +
              "filesystem (hdfs://, s3a://, ...); the local-tmp fallback " +
              "cannot survive executor loss")
          sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft_checkpoints"
        })
      ds.checkpoint(true)
    }
  }

  /** `df.capLineage()` — the call-site spelling of [[cap]]. */
  implicit final class CapOps[T](private val ds: Dataset[T]) extends AnyVal {
    def capLineage(): Dataset[T] = cap(ds)
  }
}
