package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.Versioned

/** [[Versioned.compact]]/[[Versioned.cluster]] REBASE over concurrent
  * appends (Delta's OPTIMIZE conflict resolution): a maintenance
  * rewrite losing the publish race to pure appends republishes its
  * groups PLUS the winners' appended groups — both land, no row lost
  * or doubled, the full rewrite is never discarded. Real conflicts
  * (DML/snapshot winners) still raise and clean up. */
class CompactRebaseSpec extends SparkSpec {
  import spark.implicits._

  private def tbl() = Files.createTempDirectory("graft-rebase").toString + "/t"

  private def historyModes(dir: String): Seq[(Long, String, Long)] =
    Versioned.describeHistory(spark, dir)
      .select("version", "mode", "n_files")
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)

  test("compact rebases over racing appends: both land, no row lost or doubled") {
    // Loop until a rebase provably occurred (an append landed between
    // compact's snapshot read and its publish): the compacted version
    // then lists >1 file group — its own rewrite plus the winners'.
    var rebased = false
    var tries = 0
    while (!rebased && tries < 5) {
      tries += 1
      val dir = tbl()
      // enough rows that the compact's read+rewrite takes real time
      Versioned.commit(spark.range(0L, 200000L).toDF("id")
        .withColumn("v", col("id") * 2), dir)
      Versioned.append(spark.range(200000L, 220000L).toDF("id")
        .withColumn("v", col("id") * 2), dir)
      @volatile var appenderError: Option[Throwable] = None
      val appended = new java.util.concurrent.atomic.AtomicLong(0L)
      val appender = new Thread(() => {
        try {
          (0 until 8).foreach { i =>
            val lo = 1000000L + i * 1000L
            Versioned.append(
              spark.range(lo, lo + 1000L).toDF("id")
                .withColumn("v", col("id") * 2), dir)
            appended.addAndGet(1000L)
            Thread.sleep(120L)
          }
        } catch { case t: Throwable => appenderError = Some(t) }
      }, "rebase-appender")
      appender.start()
      Thread.sleep(200L) // let some appends land first
      val cv = Versioned.compact(spark, dir)
      appender.join(120000L)
      assert(appenderError.isEmpty, s"appender failed: $appenderError")
      // EVERY row present exactly once, whatever the interleaving
      val all = Versioned.read(spark, dir)
      assert(all.count() == 220000L + appended.get(),
        "a rebase must lose no appended row and double none")
      assert(all.groupBy("id").count().filter($"count" > 1).isEmpty,
        "no row doubled")
      // did the compact actually rebase? (its version lists the
      // compacted group PLUS winner groups)
      val compactRow = historyModes(dir).find(_._1 == cv).get
      assert(compactRow._2 == "optimize")
      if (compactRow._3 > 1) rebased = true
    }
    assert(rebased,
      s"no rebase observed in $tries racing runs — widen the race window")
  }

  test("cluster rebases too: appended groups ride along un-clustered") {
    var rebased = false
    var tries = 0
    while (!rebased && tries < 5) {
      tries += 1
      val dir = tbl()
      Versioned.commit(spark.range(0L, 150000L).toDF("id")
        .withColumn("w", pmod(col("id") * 37L, lit(1000L))), dir)
      @volatile var err: Option[Throwable] = None
      val appender = new Thread(() => {
        try (0 until 6).foreach { i =>
          val lo = 2000000L + i * 500L
          Versioned.append(spark.range(lo, lo + 500L).toDF("id")
            .withColumn("w", pmod(col("id") * 37L, lit(1000L))), dir)
          Thread.sleep(150L)
        } catch { case t: Throwable => err = Some(t) }
      }, "rebase-appender-cluster")
      appender.start()
      Thread.sleep(150L)
      val cv = Versioned.cluster(spark, dir, Seq("id", "w"), numGroups = 4)
      appender.join(120000L)
      assert(err.isEmpty, s"appender failed: $err")
      val all = Versioned.read(spark, dir)
      assert(all.count() == 150000L + 6 * 500L)
      assert(all.groupBy("id").count().filter($"count" > 1).isEmpty)
      val row = historyModes(dir).find(_._1 == cv).get
      if (row._3 > 4) rebased = true // 4 clustered groups + winners
    }
    assert(rebased, s"no cluster rebase observed in $tries racing runs")
  }

  test("DETERMINISTIC rebase: a rewrite of v0 publishing after an append " +
      "lands with both file sets; a DML winner refuses and cleans up") {
    // Simulate the compactor's exact position: it rewrote version 0's
    // content into `manual` and is about to publish expecting parent 0
    // — but a winner already committed version 1.
    val dir = tbl()
    Versioned.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir) // v0
    Versioned.append(Seq((3L, "c")).toDF("id", "v"), dir)            // v1 (append winner)
    val manual = "manual-rewrite-group"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.parquet(s"$dir/files/$manual")
    val cv = Versioned.rebasePublish(spark, dir, expectedParent = 0L,
      newGroups = Seq(manual -> 2L),
      schemaDdl = Some("id BIGINT, v STRING"))
    assert(cv == 2L)
    // the rebased version lists the rewrite AND the winner's group
    val row = historyModes(dir).find(_._1 == cv).get
    assert(row._2 == "optimize" && row._3 == 2L, row.toString)
    assertRows(Versioned.read(spark, dir), Seq("id", "v"),
      Set(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c")))
    // Now a DML winner: delete commits v3; a rewrite of v2 must REFUSE
    // (its content no longer represents the table) and clean its group
    Versioned.delete(spark, dir)(col("id") === lit(2L)) // v3, mode=delete
    val manual2 = "manual-rewrite-group-2"
    Seq((9L, "z")).toDF("id", "v").write.parquet(s"$dir/files/$manual2")
    val e = intercept[java.util.ConcurrentModificationException] {
      Versioned.rebasePublish(spark, dir, expectedParent = 2L,
        newGroups = Seq(manual2 -> 1L),
        schemaDdl = Some("id BIGINT, v STRING"))
    }
    assert(e.getMessage.contains("not an append"), e.getMessage)
    assert(!new java.io.File(s"$dir/files/$manual2").exists(),
      "the abandoned rewrite group must be deleted")
    // and the table is exactly the delete's result — nothing half-published
    assertRows(Versioned.read(spark, dir), Seq("id", "v"),
      Set(Seq(1L, "a"), Seq(3L, "c")))
  }

  test("DETERMINISTIC double race loss: every retry window's appends land") {
    // Forces the compact to lose the publish race TWICE, with one append
    // landing in EACH retry window. The winner diff must stay anchored to
    // the rewrite's original read version: a baseline that advances with
    // the moving parent drops the first window's group on the second loss
    // (the CompactRebaseSpec row-loss flake this pins).
    val dir = tbl()
    Versioned.commit(spark.range(0L, 1000L).toDF("id"), dir) // v0
    var calls = 0
    Versioned.rebaseAttemptHook = () => {
      calls += 1
      if (calls <= 2) // steal the target version: attempt loses, retries
        Versioned.append(
          spark.range(100000L * calls, 100000L * calls + 100L).toDF("id"), dir)
    }
    try {
      val cv = Versioned.compact(spark, dir)
      assert(calls >= 3, s"expected two forced losses + a win, saw $calls")
      val all = Versioned.read(spark, dir)
      assert(all.count() === 1200L,
        "both retry windows' appends must survive the rebase")
      assert(all.groupBy("id").count().filter($"count" > 1).isEmpty,
        "no row doubled")
      val row = historyModes(dir).find(_._1 == cv).get
      assert(row._2 == "optimize" && row._3 == 3L, row.toString)
    } finally Versioned.rebaseAttemptHook = () => ()
  }

  test("DETERMINISTIC rebase refusals: column-mapped winners and vacuumed parents") {
    // column-mapped table: even an append winner refuses (the rebased
    // snapshot manifest cannot carry physical names)
    val dir = tbl()
    Versioned.commit(Seq((1L, "a")).toDF("id", "v"), dir)      // v0
    Versioned.renameColumn(spark, dir, "v", "val")             // v1 (mapping)
    Versioned.append(Seq((2L, "b")).toDF("id", "val"), dir)    // v2 append
    val g = "manual-mapped-group"
    Seq((1L, "a")).toDF("id", "val").write.parquet(s"$dir/files/$g")
    val e = intercept[java.util.ConcurrentModificationException] {
      Versioned.rebasePublish(spark, dir, expectedParent = 1L,
        newGroups = Seq(g -> 1L),
        schemaDdl = Some("id BIGINT, val STRING"))
    }
    assert(e.getMessage.contains("column mapping"), e.getMessage)
    assert(!new java.io.File(s"$dir/files/$g").exists())
  }
}
