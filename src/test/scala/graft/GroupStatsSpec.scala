package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.{GroupStats, Versioned}

/** Manifest-level data skipping on versioned tables: per-group min/max
  * sidecars ([[graft.operators.GroupStats]]) + [[Versioned.readWhere]].
  * The contract under test: (1) readWhere ≡ read().filter() — ALWAYS,
  * for any predicate; (2) provably-excluded groups leave the scan
  * (inputFiles shrinks to the overlapping groups); (3) everything the
  * stats can't reason about is conservatively kept. */
class GroupStatsSpec extends SparkSpec {
  import spark.implicits._

  private def tbl() = Files.createTempDirectory("graft-gstats").toString + "/t"

  /** Three appended groups with disjoint id ranges and distinct langs. */
  private def threeBands(): String = {
    val dir = tbl()
    Versioned.commit(
      (0L until 100L).map(i => (i, s"en", i * 2.0)).toDF("id", "lang", "score"), dir)
    Versioned.append(
      (100L until 200L).map(i => (i, s"de", i * 2.0)).toDF("id", "lang", "score"), dir)
    Versioned.append(
      (200L until 300L).map(i => (i, s"fr", i * 2.0)).toDF("id", "lang", "score"), dir)
    dir
  }

  private def groupOf(path: String): String =
    path.split("/files/")(1).split("/")(0)

  test("range predicate prunes to the overlapping groups; result is exact") {
    val dir = threeBands()
    val pruned = Versioned.readWhere(spark, dir)(col("id").between(120, 180))
    val full = Versioned.read(spark, dir).filter(col("id").between(120, 180))
    assert(pruned.inputFiles.map(groupOf).toSet.size == 1,
      s"id∈[120,180] lives in ONE group; scanned ${pruned.inputFiles.map(groupOf).toSet}")
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq ==
      full.collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("equality on a string column prunes by lang bounds") {
    val dir = threeBands()
    val pruned = Versioned.readWhere(spark, dir)(col("lang") === "de")
    assert(pruned.inputFiles.map(groupOf).toSet.size == 1)
    assert(pruned.count() == 100L)
  }

  test("isin prunes to the union of matching groups; Or keeps both sides") {
    val dir = threeBands()
    val in2 = Versioned.readWhere(spark, dir)(col("lang").isin("en", "fr"))
    assert(in2.inputFiles.map(groupOf).toSet.size == 2)
    assert(in2.count() == 200L)
    val or2 = Versioned.readWhere(spark, dir)(col("id") < 50 || col("id") >= 250)
    assert(or2.inputFiles.map(groupOf).toSet.size == 2)
    assert(or2.count() == 100L)
  }

  test("no group matches: empty result, exact schema") {
    val dir = threeBands()
    val none = Versioned.readWhere(spark, dir)(col("id") > 10000)
    assert(none.count() == 0L)
    assert(none.columns.toSeq == Seq("id", "lang", "score"))
  }

  test("predicates beyond the stats' reach are conservatively unpruned but exact") {
    val dir = threeBands()
    // length(lang) is a function call — no pruning, full correctness.
    val f = Versioned.readWhere(spark, dir)(length(col("lang")) === 2 && col("id") % 7 === 0)
    assert(f.inputFiles.map(groupOf).toSet.size == 3)
    val expect = Versioned.read(spark, dir)
      .filter(length(col("lang")) === 2 && col("id") % 7 === 0).count()
    assert(f.count() == expect && expect > 0)
  }

  test("skipping never wrongs the result: randomized ranges equal read+filter") {
    val dir = threeBands()
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { _ =>
      val lo = rnd.nextInt(350) - 25
      val hi = lo + rnd.nextInt(120)
      val p = Versioned.readWhere(spark, dir)(col("id") >= lo && col("id") < hi)
        .agg(count(lit(1)), coalesce(sum("id"), lit(0L))).collect()(0)
      val e = Versioned.read(spark, dir).filter(col("id") >= lo && col("id") < hi)
        .agg(count(lit(1)), coalesce(sum("id"), lit(0L))).collect()(0)
      assert(p == e, s"range [$lo,$hi) drifted: pruned=$p expected=$e")
    }
  }

  test("null-aware pruning: isNull skips all-non-null groups, IS NOT NULL keeps them") {
    val dir = tbl()
    Versioned.commit(Seq((1L, Some("a")), (2L, Some("b"))).toDF("id", "v"), dir)
    Versioned.append(Seq((3L, None: Option[String]), (4L, Some("d"))).toDF("id", "v"), dir)
    val nulls = Versioned.readWhere(spark, dir)(col("v").isNull)
    assert(nulls.inputFiles.map(groupOf).toSet.size == 1)
    assert(nulls.collect().map(_.getLong(0)).toSeq == Seq(3L))
    val nonNulls = Versioned.readWhere(spark, dir)(col("v").isNotNull)
    assert(nonNulls.count() == 3L)
  }

  test("a group written without a sidecar is conservatively kept") {
    val dir = threeBands()
    // Simulate a pre-feature group: strip one sidecar.
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val groups = Versioned.read(spark, dir).inputFiles.map(groupOf).distinct
    groups.take(1).foreach { g =>
      f.delete(GroupStats.sidecarPath(dir, g), false)
    }
    val pruned = Versioned.readWhere(spark, dir)(col("id").between(120, 180))
    // 1 matching group + possibly the stats-less one; never fewer rows.
    assert(pruned.count() ==
      Versioned.read(spark, dir).filter(col("id").between(120, 180)).count())
  }

  test("double columns: NaN bounds drop the stat, never mis-prune") {
    val dir = tbl()
    Versioned.commit(Seq((1L, 1.5), (2L, Double.NaN)).toDF("id", "x"), dir)
    Versioned.append(Seq((3L, 10.0), (4L, 20.0)).toDF("id", "x"), dir)
    // Group 0's max is NaN (Spark orders NaN largest) → stored as None →
    // upper-bound checks keep it; the result must still be exact.
    val p = Versioned.readWhere(spark, dir)(col("x") > 5.0)
    val e = Versioned.read(spark, dir).filter(col("x") > 5.0)
    assert(p.collect().map(_.getLong(0)).sorted.toSeq ==
      e.collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("stats JSON roundtrip preserves bounds, tags, and null counts") {
    val df = Seq(
      (1L, "alpha", java.sql.Date.valueOf("2026-01-10"),
        java.sql.Timestamp.valueOf("2026-01-10 10:00:00.123456"), Some(2.5)),
      (9L, "omega", java.sql.Date.valueOf("2026-03-01"),
        java.sql.Timestamp.valueOf("2026-03-01 23:59:59.0"), None)
    ).toDF("id", "s", "d", "ts", "x")
    val st = GroupStats.compute(df)
    val rt = GroupStats.fromJson(GroupStats.toJson(st))
    assert(rt == st)
    assert(st.cols("id").min.contains(1L) && st.cols("id").max.contains(9L))
    assert(st.cols("s").min.contains("alpha") && st.cols("s").max.contains("omega"))
    assert(st.cols("x").nulls == 1L)
    assert(st.cols("d").tag == "date" &&
      st.cols("d").min.contains(java.time.LocalDate.parse("2026-01-10").toEpochDay))
    assert(st.cols("ts").tag == "timestamp")
  }

  test("long string bounds: min truncates (safe prefix), max is dropped") {
    val long1 = "b" * 400
    val df = Seq((1L, long1), (2L, "a")).toDF("id", "s")
    val st = GroupStats.compute(df)
    assert(st.cols("s").min.contains("a"))
    assert(st.cols("s").max.isEmpty, "over-long max must be dropped, not truncated")
  }

  test("int column vs long/double literals: exact widening casts still prune") {
    val dir = tbl()
    Versioned.commit(Seq((1, "a"), (50, "b")).toDF("n", "v"), dir)
    Versioned.append(Seq((100, "c"), (150, "d")).toDF("n", "v"), dir)
    val p1 = Versioned.readWhere(spark, dir)(col("n") > 99L)
    assert(p1.inputFiles.map(groupOf).toSet.size == 1)
    assert(p1.count() == 2L)
    val p2 = Versioned.readWhere(spark, dir)(col("n") < 25.5)
    assert(p2.inputFiles.map(groupOf).toSet.size == 1)
    assert(p2.count() == 1L)
  }
}
