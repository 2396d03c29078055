package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persist-once report artifacts — the reuse seam between a pipeline's
  * ANALYSIS pass (contamination report, near-dup pair list, cluster
  * assignment) and its ACTION pass (strike, retention, split).
  *
  * At 100 TB the analysis pass is the expensive one (a full corpus scan
  * plus keyed shuffles); the action is a bounded left-anti or window over
  * its output. A pipeline owner runs the analysis once, audits the
  * artifact, then applies — possibly repeatedly, possibly with different
  * thresholds — WITHOUT recomputing the scan. `cached` provides exactly
  * that: compute-and-write iff the persisted copy is missing or its input
  * fingerprint changed, else serve the parquet-backed frame directly.
  *
  * Staleness guard: the artifact directory carries a marker recording a
  * fingerprint of the INPUT files (sorted name/length/mtime). Any rewrite
  * of the input — a driver fixture regen, a new corpus snapshot —
  * invalidates the artifact, so a cached report can never silently
  * describe data that no longer exists. */
object Reports {

  /** Fingerprint of every file under `inputPath` (recursive, sorted):
    * stable across runs, changed by any rewrite. Shared with
    * [[IvfIndex.cachedIndex]] so parquet reports and index artifacts
    * invalidate on the same rule. */
  private[graft] def fingerprint(spark: SparkSession, inputPath: String): String = {
    val p = new org.apache.hadoop.fs.Path(inputPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val s = it.next()
      entries += s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}"
    }
    java.security.MessageDigest.getInstance("MD5")
      .digest(entries.sorted.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** Return the persisted report for (`name`, `inputPath`), computing and
    * writing it only when absent or stale. `artifactRoot` defaults under
    * java.io.tmpdir; production callers pass a durable location. */
  def cached(
      spark: SparkSession,
      inputPath: String,
      name: String,
      artifactRoot: Option[String] = None)(compute: => DataFrame): DataFrame = {
    val root = artifactRoot.getOrElse(
      sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft_reports")
    val fp = fingerprint(spark, inputPath)
    val dir = new org.apache.hadoop.fs.Path(s"$root/$name/$fp")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val data = new org.apache.hadoop.fs.Path(dir, "data")
    val done = new org.apache.hadoop.fs.Path(dir, "_FINGERPRINT")
    if (!fs.exists(done)) {
      compute.write.mode("overwrite").parquet(data.toString)
      val out = fs.create(done, true)
      out.writeBytes(fp + "\n")
      out.close()
      // Older fingerprints of the same report are dead weight — the input
      // they describe was rewritten. Bounded: one sibling per past regen.
      val parent = dir.getParent
      fs.listStatus(parent).foreach { s =>
        if (s.isDirectory && s.getPath.getName != fp)
          fs.delete(s.getPath, true)
      }
    }
    spark.read.parquet(data.toString)
  }
}
