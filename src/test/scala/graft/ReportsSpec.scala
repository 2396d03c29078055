package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.{Components, Contamination, Reports}

/** The analysis/action reuse seam: a persisted report artifact feeds the
  * strike and retention actions without re-running the analysis scan. */
class ReportsSpec extends SparkSpec {
  import spark.implicits._

  test("cached computes once, serves the artifact, and invalidates on input rewrite") {
    val input = Files.createTempDirectory("graft-reports-in").toString + "/d"
    val root = Files.createTempDirectory("graft-reports-art").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(input)

    var computes = 0
    def report = { computes += 1; spark.read.parquet(input).withColumn("r", lit(1)) }

    val first = Reports.cached(spark, input, "t", Some(root))(report)
    assert(first.count() == 2 && computes == 1)
    val second = Reports.cached(spark, input, "t", Some(root))(report)
    assert(second.count() == 2 && computes == 1, "second call must reuse the artifact")

    // Input rewrite (new files → new fingerprint) invalidates the cache.
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .write.mode("overwrite").parquet(input)
    val third = Reports.cached(spark, input, "t", Some(root))(report)
    assert(third.count() == 3 && computes == 2, "rewritten input must recompute")
    // The stale artifact sibling is cleaned up; exactly one fingerprint dir.
    val kids = new java.io.File(s"$root/t").listFiles().filter(_.isDirectory)
    assert(kids.length == 1, s"stale artifacts must be pruned: ${kids.mkString(",")}")
  }

  test("decontaminateWithReport strikes from a persisted report, honoring minShared") {
    val train = Seq((1L, "x", "s1"), (2L, "y", "s1"), (3L, "z", "s2"))
      .toDF("doc_id", "text", "source")
    val report = Seq((10L, 1L, 5L), (11L, 3L, 1L))
      .toDF("bench_id", "train_id", "shared_fps")
    // minShared=2: only train_id=1 (shared_fps=5) is struck; 3 survives.
    val cleaned = Contamination.decontaminateWithReport(
      train, report, "doc_id", minShared = 2)
    assertRows(cleaned, Seq("doc_id"), Set(Seq(2L), Seq(3L)))
    // minShared=1 strikes both flagged ids — re-applying at a different
    // threshold is exactly the artifact-reuse point.
    val strict = Contamination.decontaminateWithReport(
      train, report, "doc_id", minShared = 1)
    assertRows(strict, Seq("doc_id"), Set(Seq(2L)))
  }

  test("keepBest over a precomputed cluster frame marks the per-cluster argmax") {
    val clustered = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L), (5L, 5L))
      .toDF("doc_id", "cluster")
    val scores = Seq((1L, 0.5), (2L, 0.9), (3L, 0.7), (4L, 0.7), (5L, 0.1))
      .toDF("doc_id", "quality")
    val kept = Components.keepBest(clustered, scores, "doc_id", "quality")
    // cluster 1 → 2 (higher), cluster 3 → 3 (tie, lower id), singleton 5.
    assertRows(kept.filter(col("keep")), Seq("doc_id"), Set(Seq(2L), Seq(3L), Seq(5L)))
    assert(kept.count() == 5)
  }
}
