package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.Versioned
import graft.operators.Versioned.MergeClause._

/** [[Versioned.mergeClauses]] — the full Delta MERGE clause surface:
  * first-applicable semantics per category, conditional
  * update/delete/insert, NOT MATCHED BY SOURCE, COW touched-group
  * economics, and the ambiguity/schema contracts. */
class MergeClausesSpec extends SparkSpec {
  import spark.implicits._

  private def tbl() = Files.createTempDirectory("graft-mrgc").toString + "/t"

  /** Two groups, ids [0,100) and [100,200), w = id*10. */
  private def seeded(): String = {
    val dir = tbl()
    Versioned.commit(
      (0L until 100L).map(i => (i, s"v$i", i * 10L)).toDF("id", "v", "w"), dir)
    Versioned.append(
      (100L until 200L).map(i => (i, s"v$i", i * 10L)).toDF("id", "v", "w"), dir)
    dir
  }

  private def rows(dir: String): Map[Long, (String, Long)] =
    Versioned.read(spark, dir).as[(Long, String, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  private def groupsOf(dir: String): Set[String] =
    Versioned.read(spark, dir).inputFiles
      .map(_.split("/files/")(1).split("/")(0)).toSet

  test("conditional matched update + matched delete + insert, exact row semantics") {
    val dir = seeded()
    // source keys: 10 (w small -> delete), 150 (update), 500 (insert)
    val src = Seq((10L, "S10", 1L), (150L, "S150", 2L), (500L, "S500", 3L))
      .toDF("id", "v", "w")
    Versioned.mergeClauses(spark, dir, src, Seq("id"), Seq(
      MatchedDelete(Some(col("TGT.w") < 500L)),
      MatchedUpdate(Seq("v" -> concat(col("SRC.v"), lit("!")),
        "w" -> (col("TGT.w") + col("SRC.w")))),
      NotMatchedInsert()))
    val got = rows(dir)
    assert(!got.contains(10L), "id 10 (w=100 < 500) must be deleted")
    assert(got(150L) == ("S150!", 1502L), got(150L).toString) // 1500 + 2
    assert(got(500L) == ("S500", 3L), "unmatched source row inserted")
    assert(got(99L) == ("v99", 990L), "unclaimed rows carry unchanged")
    assert(got.size == 200) // 200 - 1 deleted + 1 inserted
  }

  test("first-applicable clause order decides overlapping conditions") {
    val dir = seeded()
    val src = Seq((20L, "x", 0L)).toDF("id", "v", "w")
    // Both clauses' conditions hold for id 20; the FIRST wins.
    Versioned.mergeClauses(spark, dir, src, Seq("id"), Seq(
      MatchedUpdate(Seq("v" -> lit("first")), Some(col("TGT.id") >= 0L)),
      MatchedUpdate(Seq("v" -> lit("second")), Some(col("TGT.id") >= 10L))))
    assert(rows(dir)(20L)._1 == "first")
  }

  test("NOT MATCHED BY SOURCE delete = retention sweep; conditional flavor keeps untouched groups") {
    val dir = seeded()
    // keep only the source's ids among the low group; the high group is
    // out of the by-source condition's range and must carry untouched.
    val src = (0L until 10L).map(i => (i, s"k$i", 0L)).toDF("id", "v", "w")
    val before = groupsOf(dir)
    Versioned.mergeClauses(spark, dir, src, Seq("id"), Seq(
      NotMatchedBySourceDelete(Some(col("TGT.id") < 100L))))
    val got = rows(dir)
    assert(got.size == 110, s"10 kept low + 100 high: ${got.size}")
    assert(got.keySet.filter(_ < 100L) == (0L until 10L).toSet)
    assert(got(150L) == ("v150", 1500L))
    assert(groupsOf(dir).intersect(before).size == 1,
      "the high group must carry metadata-only")
  }

  test("NOT MATCHED BY SOURCE update with empty source acts on every row") {
    val dir = seeded()
    val src = Seq.empty[(Long, String, Long)].toDF("id", "v", "w")
    Versioned.mergeClauses(spark, dir, src, Seq("id"), Seq(
      NotMatchedBySourceUpdate(Seq("v" -> lit("stale")))))
    val got = rows(dir)
    assert(got.size == 200 && got.values.forall(_._1 == "stale"))
  }

  test("matched-clause merges touch only the groups holding matches") {
    val dir = seeded()
    val before = groupsOf(dir)
    val src = Seq((5L, "z", 0L)).toDF("id", "v", "w") // low group only
    // 1 claimed row in a 100-row group: MERGE-ON-READ — BOTH original
    // groups carry metadata-only; the updated copy lands in a new
    // group and the original position joins the low group's DV
    val v = Versioned.mergeClauses(spark, dir, src, Seq("id"), Seq(
      MatchedUpdate(Seq("v" -> col("SRC.v")))))
    assert(groupsOf(dir).intersect(before).size == 2,
      "both groups must carry metadata-only under the DV path")
    val mm = Versioned.parseManifest(spark, dir, v)
    assert(mm.dvs.map(_._3).sum == 1L && mm.mode == "update")
    assert(rows(dir)(5L)._1 == "z")
    assert(rows(dir).size == 200)
    // forced COW (threshold 0) keeps the classic touched-group rewrite
    val dir2 = seeded()
    val before2 = groupsOf(dir2)
    spark.conf.set("spark.graft.dv.maxDeleteFraction", "0")
    try Versioned.mergeClauses(spark, dir2, src, Seq("id"), Seq(
      MatchedUpdate(Seq("v" -> col("SRC.v")))))
    finally spark.conf.unset("spark.graft.dv.maxDeleteFraction")
    assert(groupsOf(dir2).intersect(before2).size == 1,
      "high group must carry metadata-only; low group rewrites")
    assert(rows(dir2)(5L)._1 == "z")
  }

  test("source emptiness, dup guard, and key bounds fold into ONE source job") {
    // The merge prologue used to pay three separate source-scan jobs
    // (isEmpty, a groupBy-count duplicate probe, the min/max bounds);
    // they now ride one aggregate. Pin the whole lifecycle's job count
    // so a regression that re-splits the prologue (or adds a
    // per-mutation pre-pass anywhere else) fails loudly. The count is
    // environment-stable: same table shape, same clauses, AQE off has
    // no effect on job boundaries here.
    val dir = seeded()
    val src = Seq((10L, "S10", 1L), (150L, "S150", 2L), (500L, "S500", 3L))
      .toDF("id", "v", "w")
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        counter.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      Versioned.mergeClauses(spark, dir, src, Seq("id"), Seq(
        MatchedDelete(Some(col("TGT.w") < 500L)),
        MatchedUpdate(Seq("v" -> concat(col("SRC.v"), lit("!")),
          "w" -> (col("TGT.w") + col("SRC.w")))),
        NotMatchedInsert()))
      // Deterministic drain: every job-start event is POSTED before
      // the blocking merge call returns (actions are synchronous), so
      // once the listener bus reports empty the count is final — no
      // wall-clock polling, no dispatch-stall flake.
      org.apache.spark.sql.graftshim.GraftSqlBridge
        .waitListenerBusEmpty(spark.sparkContext, 30000L)
      assert(counter.get() <= 22,
        s"merge lifecycle ran ${counter.get()} jobs (expected <= 22 — did " +
          "the source prologue split back into separate scan jobs?)")
    } finally spark.sparkContext.removeSparkListener(listener)
    // the fold keeps exact semantics: the dup guard still fires (see
    // the contracts test below) and the merge's row effects held above
    assert(rows(dir).size == 200)
  }

  test("contracts: duplicate source keys raise; assignments cast to column type; unknown columns raise") {
    val dir = seeded()
    val dup = Seq((1L, "a", 0L), (1L, "b", 0L)).toDF("id", "v", "w")
    val e = intercept[IllegalArgumentException] {
      Versioned.mergeClauses(spark, dir, dup, Seq("id"),
        Seq(MatchedUpdate(Seq("v" -> lit("x")))))
    }
    assert(e.getMessage.contains("duplicate"))
    intercept[IllegalArgumentException] {
      Versioned.mergeClauses(spark, dir,
        Seq((1L, "a", 0L)).toDF("id", "v", "w"), Seq("id"),
        Seq(MatchedUpdate(Seq("nope" -> lit(1)))))
    }
    // int literal into BIGINT column: cast applies, schema unchanged
    Versioned.mergeClauses(spark, dir,
      Seq((1L, "a", 0L)).toDF("id", "v", "w"), Seq("id"),
      Seq(MatchedUpdate(Seq("w" -> lit(7)))))
    val sch = Versioned.read(spark, dir).schema
    assert(sch("w").dataType.simpleString == "bigint")
    assert(rows(dir)(1L)._2 == 7L)
  }

  test("partial-column INSERT: listed columns take their expression, unlisted are NULL") {
    val dir = seeded()
    val before = groupsOf(dir)
    // the source need NOT mirror the table for partial inserts
    val src = Seq((500L, "ignored", "P500"), (5L, "x", "P5"))
      .toDF("id", "extra", "name")
    Versioned.mergeClauses(spark, dir, src, Seq("id"), Seq(
      NotMatchedInsert(None, Seq("id" -> col("SRC.id"),
        "v" -> concat(col("SRC.name"), lit("!"))))))
    val got = Versioned.read(spark, dir)
    assert(got.count() == 201)
    assert(got.filter($"id" === 500L && $"v" === "P500!" && $"w".isNull)
      .count() == 1, "listed columns take their expression, unlisted w is NULL")
    assert(got.filter($"id" === 5L && $"v" === "v5" && $"w" === 50L)
      .count() == 1, "matched source rows are NOT inserted, target carries")
    // schema unchanged, and with NO matched/by-source clause both data
    // groups carry metadata-only (insert-only merges never rewrite)
    assert(got.schema.fieldNames.toSeq == Seq("id", "v", "w"))
    assert(before.subsetOf(groupsOf(dir)),
      "insert-only merges must carry every existing group metadata-only")
  }

  test("multiple INSERT clauses are first-applicable with per-clause values") {
    val dir = seeded()
    val src = Seq((300L, "a", 7L), (301L, "b", 99L)).toDF("id", "v", "w")
    Versioned.mergeClauses(spark, dir, src, Seq("id"), Seq(
      NotMatchedInsert(Some(col("SRC.w") < 50L),
        Seq("id" -> col("SRC.id"), "v" -> lit("small"))),
      NotMatchedInsert(None))) // catch-all INSERT *
    val got = Versioned.read(spark, dir)
    assert(got.filter($"id" === 300L && $"v" === "small" && $"w".isNull)
      .count() == 1, "first clause wins for w<50: partial insert, w NULL")
    assert(got.filter($"id" === 301L && $"v" === "b" && $"w" === 99L)
      .count() == 1, "catch-all INSERT * takes the source row")
    assert(got.count() == 202)
  }

  test("by-source-only clauses with a dup-keyed source never duplicate matched rows") {
    val dir = seeded()
    // Duplicate source keys are LEGAL here (no MATCHED clause — nothing
    // ambiguous); the rewrite join must use the source only as a match
    // FLAG. Before the fix, target row 5 was multiplied by the join and
    // every copy carried (action 0) — silent duplication.
    val src = Seq((5L, "a", 0L), (5L, "b", 0L), (7L, "c", 0L))
      .toDF("id", "v", "w")
    Versioned.mergeClauses(spark, dir, src, Seq("id"), Seq(
      NotMatchedBySourceDelete(Some(col("TGT.id") < 10L))))
    val got = rows(dir)
    // ids 0..9 except the source's {5,7} deleted; 5 and 7 exactly once
    assert(got.keySet.filter(_ < 10L) == Set(5L, 7L))
    assert(got.size == 192, s"190 (>=10) + {5,7}: ${got.size}")
    assert(got(5L) == ("v5", 50L), "matched row carried exactly once, unchanged")
    // same guarantee for the by-source UPDATE flavor
    val dir2 = seeded()
    Versioned.mergeClauses(spark, dir2, src, Seq("id"), Seq(
      NotMatchedBySourceUpdate(Seq("v" -> lit("stale")),
        Some(col("TGT.id") < 10L))))
    val got2 = rows(dir2)
    assert(got2.size == 200, "no row gained or lost")
    assert(got2(5L) == ("v5", 50L) && got2(7L) == ("v7", 70L))
    assert((0L until 10L).filterNot(Set(5L, 7L))
      .forall(got2(_)._1 == "stale"))
  }

  test("optimistic concurrency: racing clause merges on disjoint keys never lose updates") {
    val dir = seeded()
    def mergeRetrying(ids: Seq[Long], tag: String): Unit = {
      val src = ids.map(i => (i, tag, 0L)).toDF("id", "v", "w")
      var done = false
      while (!done) {
        try {
          Versioned.mergeClauses(spark, dir, src, Seq("id"),
            Seq(MatchedUpdate(Seq("v" -> col("SRC.v"))), NotMatchedInsert()))
          done = true
        } catch { case _: java.util.ConcurrentModificationException => () }
      }
    }
    val t1 = new Thread(() => mergeRetrying(0L until 10L, "A"))
    val t2 = new Thread(() => mergeRetrying(300L until 310L, "B"))
    t1.start(); t2.start(); t1.join(); t2.join()
    val got = rows(dir)
    assert(got.size == 210)
    assert((0L until 10L).forall(got(_)._1 == "A"), "merge A's updates landed")
    assert((300L until 310L).forall(got(_)._1 == "B"), "merge B's inserts landed")
  }

  test("star shape agrees with the tuned replace-by-key merge()") {
    val dirA = seeded(); val dirB = seeded()
    val src = Seq((3L, "R", 1L), (250L, "N", 2L)).toDF("id", "v", "w")
    Versioned.merge(spark, dirA, src, Seq("id"))
    val tableCols = Seq("id", "v", "w")
    Versioned.mergeClauses(spark, dirB, src, Seq("id"), Seq(
      MatchedUpdate(tableCols.map(c => c -> col(s"SRC.$c"))),
      NotMatchedInsert()))
    assert(rows(dirA) == rows(dirB))
  }
}
