package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.Versioned

/** Column mapping ([[Versioned.renameColumn]]/[[Versioned.dropColumn]]):
  * RENAME/DROP COLUMN are METADATA-ONLY (no group rewritten), every
  * version reads through its own mapping (time travel shows the old
  * shape), post-rename writes and COW mutations keep working on logical
  * names, physical names are tombstoned against resurfacing stale
  * bytes, and constrained columns refuse DDL by name. */
class VersionedColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def tbl() = Files.createTempDirectory("graft-colmap").toString + "/t"

  private def groupsOf(dir: String, v: Long = -1L): Set[String] =
    Versioned.read(spark, dir, v).inputFiles
      .map(_.split("/files/")(1).split("/")(0)).toSet

  private def seeded(): String = {
    val dir = tbl()
    Versioned.commit(
      (0L until 50L).map(i => (i, s"d$i", i * 2L)).toDF("id", "v", "w"), dir)
    Versioned.append(
      (50L until 100L).map(i => (i, s"d$i", i * 2L)).toDF("id", "v", "w"), dir)
    dir
  }

  test("rename is metadata-only; every version reads through its own mapping") {
    val dir = seeded()
    val before = groupsOf(dir)
    val v = Versioned.renameColumn(spark, dir, "v", "label")
    assert(v == 2L)
    assert(groupsOf(dir) == before, "rename must not touch file groups")
    val now = Versioned.read(spark, dir)
    assert(now.columns.toSeq == Seq("id", "label", "w"))
    assert(now.filter($"label" === "d7").select("id").as[Long].head() == 7L)
    // time travel: the pre-rename version still shows the old name
    val old = Versioned.read(spark, dir, 1L)
    assert(old.columns.toSeq == Seq("id", "v", "w"))
    assert(old.count() == 100 && now.count() == 100)
    assert(Versioned.versions(spark, dir).filter($"mode" === "rename_column")
      .count() == 1)
  }

  test("post-rename appends and COW mutations work on logical names; groups store physical") {
    val dir = seeded()
    Versioned.renameColumn(spark, dir, "v", "label")
    Versioned.append(
      Seq((100L, "new", 0L)).toDF("id", "label", "w"), dir)
    assert(Versioned.read(spark, dir).filter($"label" === "new").count() == 1)
    // the appended group physically stores the ORIGINAL name
    val newest = Versioned.read(spark, dir).inputFiles
      .map(_.split("/files/")(1).split("/")(0)).toSet
      .diff(groupsOf(dir, 1L))
    assert(newest.size == 1)
    val raw = spark.read.parquet(s"$dir/files/${newest.head}")
    assert(raw.columns.contains("v") && !raw.columns.contains("label"),
      s"group must store physical names, got ${raw.columns.toSeq}")
    // COW update + delete via logical name; untouched groups carry
    val preGroups = groupsOf(dir)
    Versioned.update(spark, dir, col("id") === 100L, "label" -> lit("upd"))
    assert(Versioned.read(spark, dir).filter($"label" === "upd").count() == 1)
    assert(groupsOf(dir).intersect(preGroups).size >= 2,
      "update must rewrite only the touched group")
    Versioned.delete(spark, dir)(col("label") === "upd")
    assert(Versioned.read(spark, dir).count() == 100)
    // readWhere on the logical name still answers exactly
    assert(Versioned.readWhere(spark, dir)(col("label") === "d3").count() == 1)
  }

  test("stats skipping still prunes after a rename (predicates cross the mapping)") {
    val dir = seeded() // two groups with disjoint id ranges [0,50) / [50,100)
    Versioned.renameColumn(spark, dir, "id", "doc_id")
    val scan = Versioned.readWhere(spark, dir)(col("doc_id") < 10L)
    assert(scan.count() == 10)
    val scannedGroups = scan.inputFiles
      .map(_.split("/files/")(1).split("/")(0)).toSet
    assert(scannedGroups.size == 1,
      s"skipping must prune the [50,100) group: scanned $scannedGroups")
  }

  test("drop is metadata-only; tombstone blocks resurfacing; time travel keeps the column") {
    val dir = seeded()
    val before = groupsOf(dir)
    Versioned.dropColumn(spark, dir, "w")
    assert(groupsOf(dir) == before, "drop must not touch file groups")
    assert(Versioned.read(spark, dir).columns.toSeq == Seq("id", "v"))
    assert(Versioned.read(spark, dir, 1L).columns.toSeq == Seq("id", "v", "w"))
    // re-adding the dropped name would resurface stale bytes: refused
    val e = intercept[IllegalArgumentException] {
      Versioned.append(
        Seq((100L, "x", 9L)).toDF("id", "v", "w"), dir, evolveSchema = true)
    }
    assert(e.getMessage.contains("resurface"), e.getMessage)
    // a DIFFERENT new column evolves fine and the mapping extends
    Versioned.append(
      Seq((100L, "x", 9L)).toDF("id", "v", "w2"), dir, evolveSchema = true)
    val got = Versioned.read(spark, dir)
    assert(got.columns.toSeq == Seq("id", "v", "w2"))
    assert(got.filter($"w2".isNotNull).count() == 1)
  }

  test("rename collisions and constrained columns refuse by name") {
    val dir = seeded()
    Versioned.addConstraint(spark, dir, "w_pos", "w >= 0")
    val e1 = intercept[IllegalArgumentException] {
      Versioned.renameColumn(spark, dir, "w", "weight")
    }
    assert(e1.getMessage.contains("w_pos"))
    val e2 = intercept[IllegalArgumentException] {
      Versioned.dropColumn(spark, dir, "w")
    }
    assert(e2.getMessage.contains("w_pos"))
    // unconstrained columns still rename; the constraint keeps enforcing
    Versioned.renameColumn(spark, dir, "v", "label")
    intercept[IllegalArgumentException] {
      Versioned.append(Seq((200L, "bad", -1L)).toDF("id", "label", "w"), dir)
    }
    // renaming onto a physical name is refused
    Versioned.renameColumn(spark, dir, "label", "title")
    val e3 = intercept[IllegalArgumentException] {
      Versioned.renameColumn(spark, dir, "title", "v")
    }
    assert(e3.getMessage.contains("physical"), e3.getMessage)
  }

  test("a snapshot resets the mapping: the table reshapes freely again") {
    val dir = seeded()
    Versioned.renameColumn(spark, dir, "v", "label")
    Versioned.dropColumn(spark, dir, "w")
    Versioned.commit(
      Seq((1L, "fresh", 5L)).toDF("id", "v", "w"), dir) // old names reusable
    val got = Versioned.read(spark, dir)
    assert(got.columns.toSeq == Seq("id", "v", "w"))
    assert(got.count() == 1)
    // constraints survive the reshape only if they still analyze; here
    // there were none — and history is intact
    assert(Versioned.read(spark, dir, 2L).columns.toSeq == Seq("id", "label", "w"))
  }
}
