package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.{EtlJob, Writes}
import graft.sources.{ParquetCatalogSource, PathRef, TableRef}
import graft.spec.{ConcurrentWriteException, JobConfigException}

/** Durability guards added after round 6: concurrent-merge detection
  * (the reference inherited real isolation from Delta's txn log; the
  * parquet stage-and-swap is single-writer, so a second in-flight merge
  * must fail FAST with the target intact) and the schema-drift contract
  * on append/merge against an existing target. */
class MergeGuardSpec extends SparkSpec {
  import spark.implicits._

  private val ds = new ParquetCatalogSource

  test("two interleaved merges: the second fails fast, the first publishes intact") {
    val dir = Files.createTempDirectory("graft-lock").toString + "/t"
    Seq((1L, "old"), (2L, "old")).toDF("pk", "v").write.parquet(dir)

    // Writer A's source sleeps inside evaluation, so A holds the lock
    // while its actions run; the main thread interleaves writer B.
    val slow = spark.range(1, 3).as[Long]
      .mapPartitions { it => Thread.sleep(4000); it }
      .toDF("pk").withColumn("v", lit("A"))
    val lock = Writes.mergeLockPath(PathRef(dir))
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)

    @volatile var aFailure: Option[Throwable] = None
    val a = new Thread(() =>
      try Writes.merge(slow, PathRef(dir), ds, Seq("pk"), Seq("v"), "1=1", false)
      catch { case t: Throwable => aFailure = Some(t) })
    a.start()
    try {
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      while (!fs.exists(lock) && System.nanoTime() < deadline) Thread.sleep(50)
      assert(fs.exists(lock), "writer A never acquired the lock")

      val b = Seq((1L, "B")).toDF("pk", "v")
      val e = intercept[ConcurrentWriteException] {
        Writes.merge(b, PathRef(dir), ds, Seq("pk"), Seq("v"), "1=1", false)
      }
      assert(e.getMessage.contains("__graft_lock"))
    } finally a.join(30000)

    assert(aFailure.isEmpty, s"writer A failed: $aFailure")
    assert(!fs.exists(lock), "lock must be released after a successful merge")
    // target reflects A's merge, untouched by B's refused attempt
    assertRows(spark.read.parquet(dir), Seq("pk", "v"),
      Set(Seq(1L, "A"), Seq(2L, "A")))
  }

  test("a stale lock (crashed merge) fails cleanly, names the file, and clears on removal") {
    sql("DROP TABLE IF EXISTS lock_stale")
    Seq((1L, "old")).toDF("pk", "v").write.format("parquet").saveAsTable("lock_stale")
    val lock = Writes.mergeLockPath(TableRef("lock_stale"))
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(lock, false).close()
    try {
      val src = Seq((1L, "new")).toDF("pk", "v")
      val e = intercept[ConcurrentWriteException] {
        Writes.merge(src, TableRef("lock_stale"), ds, Seq("pk"), Seq("v"), "1=1", false)
      }
      assert(e.getMessage.contains(lock.toString))
      // refused before any side effect
      assertRows(spark.table("lock_stale"), Seq("pk", "v"), Set(Seq(1L, "old")))
      fs.delete(lock, false)
      Writes.merge(src, TableRef("lock_stale"), ds, Seq("pk"), Seq("v"), "1=1", false)
      assertRows(spark.table("lock_stale"), Seq("pk", "v"), Set(Seq(1L, "new")))
    } finally {
      if (fs.exists(lock)) fs.delete(lock, false)
      sql("DROP TABLE IF EXISTS lock_stale")
    }
  }

  // ---------------------------------------------------------- schema drift

  private def appendJob(query: String, table: String): EtlJob =
    EtlJob.fromYaml(
      s"""version: 0
         |source:
         |  query: $query
         |target:
         |  table: $table
         |  operation: append
         |""".stripMargin)

  test("append schema drift: extra, missing, and retyped columns fail plan-time, named") {
    sql("DROP TABLE IF EXISTS drift_t")
    Seq((1L, "a", 1.5)).toDF("pk", "s", "v").write.format("parquet").saveAsTable("drift_t")
    try {
      val extra = intercept[JobConfigException] {
        appendJob("SELECT 2 AS pk, 'b' AS s, 2.5 AS v, 'boom' AS added", "drift_t").run()
      }
      assert(extra.getMessage.contains("added"), extra.getMessage)

      val missing = intercept[JobConfigException] {
        appendJob("SELECT CAST(2 AS BIGINT) AS pk, 'b' AS s", "drift_t").run()
      }
      assert(missing.getMessage.contains("v"), missing.getMessage)

      val retyped = intercept[JobConfigException] {
        appendJob("SELECT CAST(2 AS INT) AS pk, 'b' AS s, CAST(2.5 AS DOUBLE) AS v",
          "drift_t").run()
      }
      assert(retyped.getMessage.contains("pk"), retyped.getMessage)

      // target untouched by all three refusals
      assert(spark.table("drift_t").count() == 1)
      // a conforming source (any column ORDER) still appends
      appendJob("SELECT CAST(2.5 AS DOUBLE) AS v, 'b' AS s, CAST(2 AS BIGINT) AS pk",
        "drift_t").run()
      assert(spark.table("drift_t").count() == 2)
    } finally sql("DROP TABLE IF EXISTS drift_t")
  }

  test("merge schema drift: missing source columns stay allowed; extra/retyped rejected") {
    sql("DROP TABLE IF EXISTS drift_m")
    Seq((1L, "a", 1.5)).toDF("pk", "s", "v").write.format("parquet").saveAsTable("drift_m")
    def upsertJob(query: String): EtlJob = EtlJob.fromYaml(
      s"""version: 0
         |source:
         |  query: $query
         |target:
         |  table: drift_m
         |  operation: upsert
         |  primary_key_column: [pk]
         |  update_column: [v]
         |""".stripMargin)
    try {
      // missing source column `s`: upsert's NULL-for-unlisted semantics
      upsertJob("SELECT CAST(2 AS BIGINT) AS pk, CAST(9.0 AS DOUBLE) AS v").run()
      assert(spark.table("drift_m").count() == 2)

      val extra = intercept[JobConfigException] {
        upsertJob("SELECT CAST(3 AS BIGINT) AS pk, CAST(9.0 AS DOUBLE) AS v, 1 AS zz").run()
      }
      assert(extra.getMessage.contains("zz"), extra.getMessage)

      val retyped = intercept[JobConfigException] {
        upsertJob("SELECT CAST(3 AS BIGINT) AS pk, CAST(9 AS INT) AS v").run()
      }
      assert(retyped.getMessage.contains("v ("), retyped.getMessage)
      assert(spark.table("drift_m").count() == 2, "refused merges must not write")
    } finally sql("DROP TABLE IF EXISTS drift_m")
  }
}
