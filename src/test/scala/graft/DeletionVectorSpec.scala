package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.Versioned

/** Deletion vectors (merge-on-read deletes): a delete whose matched
  * fraction of a group's live rows is at or below
  * `spark.graft.dv.maxDeleteFraction` records the deleted positions in
  * a parquet sidecar artifact instead of rewriting the group. Pins:
  * the scattered-delete fast path (file groups untouched), semantic
  * transparency across every read and mutation surface (a DV'd row is
  * GONE — it cannot re-match, block an insert, violate a constraint,
  * or resurrect under a rewrite), materialization by compact, vacuum's
  * artifact lifecycle, and time travel across DV commits. */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  private def tbl() = Files.createTempDirectory("graft-dv").toString + "/t"

  private def dataGroups(dir: String): Set[String] =
    new java.io.File(s"$dir/files").listFiles().map(_.getName)
      .filterNot(_.startsWith("dv-")).toSet

  private def withDvFraction[A](frac: Double)(body: => A): A = {
    val key = "spark.graft.dv.maxDeleteFraction"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, frac.toString)
    try body
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("scattered delete writes a deletion vector, not a rewrite") {
    val dir = tbl()
    // 4 append groups of 100 rows each
    Versioned.commit((0L until 100L).toDF("id"), dir)
    (1 to 3).foreach(i =>
      Versioned.append((i * 100L until (i + 1) * 100L).toDF("id"), dir))
    val before = dataGroups(dir)
    // one row per group: 1% of each group's live rows — DV territory
    val v = Versioned.delete(spark, dir)(col("id") % 100 === 0)
    assert(v == 4L)
    assert(dataGroups(dir) == before,
      "a DV delete must not add or rewrite any data group")
    val m = Versioned.parseManifest(spark, dir, v)
    assert(m.mode == "delete" && m.files.toSet == before)
    assert(m.dvs.map(_._1).toSet == before, "every group carries a DV entry")
    assert(m.dvs.map(_._3).sum == 4L)
    assert(m.nRows == 396L)
    val ids = Versioned.read(spark, dir).select("id").as[Long].collect().toSet
    assert(ids == (0L until 400L).toSet -- Set(0L, 100L, 200L, 300L))
    // time travel: the parent still reads every row
    assert(Versioned.read(spark, dir, 3).count() == 400L)
    // readWhere through the DV: a deleted row never surfaces
    assert(Versioned.readWhere(spark, dir)(col("id") < 10).count() == 9L)
    assert(Versioned.readWhere(spark, dir)(col("id") === 200L).count() == 0L)
  }

  test("a heavy delete still rewrites (fraction above the threshold)") {
    val dir = tbl()
    Versioned.commit((0L until 100L).toDF("id"), dir)
    val before = dataGroups(dir)
    val v = Versioned.delete(spark, dir)(col("id") < 50)
    val m = Versioned.parseManifest(spark, dir, v)
    assert(m.dvs.isEmpty, "50% delete must take the rewrite path")
    assert(dataGroups(dir) != before)
    assert(Versioned.read(spark, dir).count() == 50L)
  }

  test("spark.graft.dv.maxDeleteFraction = 0 disables DVs entirely") {
    val dir = tbl()
    Versioned.commit((0L until 100L).toDF("id"), dir)
    withDvFraction(0.0) {
      val v = Versioned.delete(spark, dir)(col("id") === 7L)
      assert(Versioned.parseManifest(spark, dir, v).dvs.isEmpty)
    }
    assert(Versioned.read(spark, dir).count() == 99L)
  }

  test("second DV delete on the same groups merges position sets") {
    val dir = tbl()
    Versioned.commit((0L until 200L).toDF("id"), dir)
    withDvFraction(0.5) {
      Versioned.delete(spark, dir)(col("id") === 10L)
      val v2 = Versioned.delete(spark, dir)(col("id") === 20L)
      val m = Versioned.parseManifest(spark, dir, v2)
      assert(m.dvs.map(_._3).sum == 2L, "merged DV carries both deletes")
      assert(m.nRows == 198L)
      val ids = Versioned.read(spark, dir).select("id").as[Long].collect().toSet
      assert(!ids(10L) && !ids(20L) && ids.size == 198)
    }
  }

  test("a rewrite of a DV'd group materializes the DV (update path)") {
    val dir = tbl()
    Versioned.commit((0L until 100L).map(i => (i, 0L)).toDF("id", "v"), dir)
    withDvFraction(0.5) {
      Versioned.delete(spark, dir)(col("id") === 5L)
    }
    // force the classic COW update (the merge-on-read flavor is pinned
    // in its own test below) — this test pins that a REWRITE of a
    // DV'd group materializes the DV
    val v = withDvFraction(0.0) {
      Versioned.update(spark, dir, col("id") === 6L, "v" -> lit(9L))
    }
    val m = Versioned.parseManifest(spark, dir, v)
    assert(m.dvs.isEmpty, "the rewrite must drop the group's DV entry")
    val rows = Versioned.read(spark, dir)
    assert(rows.count() == 99L, "the DV'd row must not resurrect under the rewrite")
    assert(rows.filter(col("id") === 5L).count() == 0L)
    assert(rows.filter(col("id") === 6L && col("v") === 9L).count() == 1L)
  }

  test("a DV-deleted key no longer matches and no longer blocks an insert") {
    val dir = tbl()
    Versioned.commit((0L until 100L).map(i => (i, s"old$i")).toDF("id", "v"), dir)
    withDvFraction(0.5) {
      Versioned.delete(spark, dir)(col("id") === 3L)
    }
    // merge with key 3: NOT matched (the row is deleted) → inserts fresh
    Versioned.merge(spark, dir, Seq((3L, "fresh")).toDF("id", "v"), Seq("id"))
    val out = Versioned.read(spark, dir).filter(col("id") === 3L)
      .select("v").as[String].collect().toSeq
    assert(out == Seq("fresh"),
      s"a DV'd key must insert (not update) on merge; got $out")
    assert(Versioned.read(spark, dir).count() == 100L)
  }

  test("mergeClauses by-source clause cannot claim a DV-deleted row") {
    val dir = tbl()
    Versioned.commit((0L until 100L).map(i => (i, 0L)).toDF("id", "n"), dir)
    withDvFraction(0.5) {
      Versioned.delete(spark, dir)(col("id") === 1L)
    }
    import Versioned.MergeClause._
    // unconditional by-source update: every LIVE unmatched row gets n=7
    Versioned.mergeClauses(spark, dir,
      Seq((0L, 5L)).toDF("id", "n"), Seq("id"),
      Seq(MatchedUpdate(Seq("n" -> col("SRC.n"))),
        NotMatchedBySourceUpdate(Seq("n" -> lit(7L)))))
    val rows = Versioned.read(spark, dir)
    assert(rows.count() == 99L, "the DV'd row stays deleted through the merge")
    assert(rows.filter(col("id") === 1L).count() == 0L)
    assert(rows.filter(col("id") === 0L && col("n") === 5L).count() == 1L)
    assert(rows.filter(col("n") === 7L).count() == 98L)
  }

  test("compact materializes DVs away; vacuum reclaims the artifact") {
    val dir = tbl()
    Versioned.commit((0L until 100L).toDF("id"), dir)
    withDvFraction(0.5) {
      Versioned.delete(spark, dir)(col("id") === 42L)
    }
    val dvArtifacts = new java.io.File(s"$dir/files").listFiles()
      .map(_.getName).filter(_.startsWith("dv-")).toSet
    assert(dvArtifacts.size == 1)
    val vc = Versioned.compact(spark, dir)
    val m = Versioned.parseManifest(spark, dir, vc)
    assert(m.dvs.isEmpty && m.nRows == 99L)
    assert(Versioned.read(spark, dir).count() == 99L)
    // DV version still referenced → artifact survives a keepFrom=1 vacuum
    Versioned.vacuum(spark, dir, 1L)
    assert(new java.io.File(s"$dir/files").listFiles().map(_.getName)
      .filter(_.startsWith("dv-")).toSet == dvArtifacts)
    // dropping the DV version reclaims its artifact
    Versioned.vacuum(spark, dir, vc)
    assert(!new java.io.File(s"$dir/files").listFiles().map(_.getName)
      .exists(_.startsWith("dv-")))
    assert(Versioned.read(spark, dir).count() == 99L)
  }

  test("restore to a DV version carries its deletion vectors") {
    val dir = tbl()
    Versioned.commit((0L until 100L).toDF("id"), dir)
    val vd = withDvFraction(0.5) {
      Versioned.delete(spark, dir)(col("id") === 9L)
    }
    Versioned.append(Seq(500L).toDF("id"), dir)
    val vr = Versioned.restore(spark, dir, vd)
    val m = Versioned.parseManifest(spark, dir, vr)
    assert(m.dvs.nonEmpty && m.nRows == 99L)
    val ids = Versioned.read(spark, dir).select("id").as[Long].collect().toSet
    assert(!ids(9L) && !ids(500L) && ids.size == 99)
  }

  test("append after a DV delete carries the DV entries forward") {
    val dir = tbl()
    Versioned.commit((0L until 100L).toDF("id"), dir)
    withDvFraction(0.5) {
      Versioned.delete(spark, dir)(col("id") === 0L)
    }
    val va = Versioned.append(Seq(1000L).toDF("id"), dir)
    val m = Versioned.parseManifest(spark, dir, va)
    assert(m.dvs.nonEmpty && m.nRows == 100L)
    val ids = Versioned.read(spark, dir).select("id").as[Long].collect().toSet
    assert(!ids(0L) && ids(1000L) && ids.size == 100)
  }

  test("CDC treats a DV commit as a delete boundary") {
    val dir = tbl()
    Versioned.commit((0L until 100L).toDF("id"), dir)
    Versioned.append(Seq(100L).toDF("id"), dir)
    withDvFraction(0.5) {
      Versioned.delete(spark, dir)(col("id") === 100L)
    }
    val e = intercept[IllegalArgumentException] {
      Versioned.changes(spark, dir, 0L)
    }
    assert(e.getMessage.contains("rewrite version"))
    val (_, cur, resync) = Versioned.pollChanges(spark, dir, 1L)
    assert(resync && cur == 2L)
  }

  test("addConstraint validates LIVE rows only (DV'd violations are gone)") {
    val dir = tbl()
    Versioned.commit((0L until 100L).map(i => i - 1L).toDF("id"), dir) // has -1
    withDvFraction(0.5) {
      Versioned.delete(spark, dir)(col("id") < 0L)
    }
    // the only violating row is DV-deleted → the constraint must add
    Versioned.addConstraint(spark, dir, "nonneg", "id >= 0")
    val e = intercept[Exception] {
      Versioned.append(Seq(-5L).toDF("id"), dir)
    }
    assert(e.getMessage.contains("nonneg"))
  }

  test("changesFeed: row-level inserts AND deletes from manifests + DVs") {
    val dir = tbl()
    Versioned.commit((0L until 100L).toDF("id"), dir) // v0
    Versioned.append((100L until 200L).toDF("id"), dir) // v1: inserts
    withDvFraction(0.5) {
      Versioned.delete(spark, dir)(col("id").isin(7L, 150L)) // v2: DV deletes
    }
    Versioned.append((200L until 210L).toDF("id"), dir) // v3: inserts
    val feed = Versioned.changesFeed(spark, dir, 0L)
    val got = feed.select("id", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val expect =
      (100L until 200L).map(i => (i, "insert", 1L)).toSet ++
        Set((7L, "delete", 2L), (150L, "delete", 2L)) ++
        (200L until 210L).map(i => (i, "insert", 3L)).toSet
    assert(got == expect)
    // a second DV delete on an ALREADY-DV'd group: the feed must emit
    // only the NEW positions (the position diff, not the whole DV)
    withDvFraction(0.5) {
      Versioned.delete(spark, dir)(col("id") === 8L) // v4
    }
    val later = Versioned.changesFeed(spark, dir, 3L)
      .select("id", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(later == Set((8L, "delete", 4L)))
    // an INSERT-ONLY merge (no rewrite, no DV change) serves as inserts
    Versioned.merge(spark, dir,
      Seq(500L).toDF("id"), Seq("id")) // no key matches → pure insert
    val mergeFeed = Versioned.changesFeed(spark, dir, 4L)
      .select("id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(mergeFeed == Set((500L, "insert")))
    // REWRITE updates still raise (DV updates are served — see the
    // merge-on-read UPDATE test)
    withDvFraction(0.0) {
      Versioned.update(spark, dir, col("id") === 9L, "id" -> lit(900L)) // v5
    }
    val e = intercept[IllegalArgumentException] {
      Versioned.changesFeed(spark, dir, 4L)
    }
    assert(e.getMessage.contains("rewrite version"))
    // replaying the full feed against v0 reconstructs v4 exactly
    val (ins, del) = Versioned.changesFeed(spark, dir, 0L, 4L).collect()
      .foldLeft((Set.empty[Long], Set.empty[Long])) { case ((i, d), r) =>
        if (r.getString(r.fieldIndex("_change_type")) == "insert")
          (i + r.getLong(0), d) else (i, d + r.getLong(0))
      }
    val replayed = ((0L until 100L).toSet ++ ins) -- del
    val v4ids = Versioned.read(spark, dir, 4L).as[Long].collect().toSet
    assert(replayed == v4ids)
  }

  test("DV pressure: cumulative fraction triggers materialization, not unbounded growth") {
    val dir = tbl()
    Versioned.commit((0L until 100L).toDF("id"), dir)
    // 9 rounds of 2%-deletes accrete positions merge-on-read; the round
    // that would push the CUMULATIVE deleted fraction past the policy
    // (here lowered to 12%) must REWRITE instead — vector back to zero
    spark.conf.set("spark.graft.dv.maxCumulativeFraction", "0.12")
    try {
      val v1 = Versioned.delete(spark, dir)(col("id").isin(0L, 1L))   // 2/100
      val m1 = Versioned.parseManifest(spark, dir, v1)
      assert(m1.dvs.map(_._3).sum == 2L, "first slice rides the DV")
      val v2 = Versioned.delete(spark, dir)(col("id").isin(2L, 3L, 4L, 5L))
      val m2 = Versioned.parseManifest(spark, dir, v2)
      assert(m2.dvs.map(_._3).sum == 6L, "6/100 cumulative still under 12%")
      // next slice would reach 10/100 — 10% ≤ 12% → still DV
      val v3 = Versioned.delete(spark, dir)(col("id").isin(6L, 7L, 8L, 9L))
      val m3 = Versioned.parseManifest(spark, dir, v3)
      assert(m3.dvs.map(_._3).sum == 10L)
      // this one would cross (13/100 > 12%): the group REWRITES and the
      // vector materializes away
      val v4 = Versioned.delete(spark, dir)(col("id").isin(10L, 11L, 12L))
      val m4 = Versioned.parseManifest(spark, dir, v4)
      assert(m4.dvs.isEmpty, "crossing the cumulative threshold materializes")
      assert(m4.nRows == 87L)
      assert(Versioned.read(spark, dir).count() == 87L)
      // describeHistory surfaces the pressure gauge per version
      val dvRowsByV = Versioned.describeHistory(spark, dir)
        .select("version", "dv_rows").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(dvRowsByV(v1) == 2L && dvRowsByV(v2) == 6L &&
        dvRowsByV(v3) == 10L && dvRowsByV(v4) == 0L)
    } finally spark.conf.unset("spark.graft.dv.maxCumulativeFraction")
  }

  test("MERGE matched actions take the DV path; effect modes feed the CDF") {
    import Versioned.MergeClause._
    // 2 groups x 100 rows
    def seed(): String = {
      val dir = tbl()
      Versioned.commit((0L until 100L).map(i => (i, s"v$i", i * 10L))
        .toDF("id", "v", "w"), dir)
      Versioned.append((100L until 200L).map(i => (i, s"v$i", i * 10L))
        .toDF("id", "v", "w"), dir)
      dir
    }
    // (1) matched DELETE, scattered: pure-DV commit, EFFECT mode
    // 'delete', file set untouched, changesFeed serves the rows
    val d1 = seed()
    val g1 = dataGroups(d1)
    val v1 = Versioned.mergeClauses(spark, d1,
      Seq((7L, "", 0L), (150L, "", 0L)).toDF("id", "v", "w"), Seq("id"),
      Seq(MatchedDelete()))
    val m1 = Versioned.parseManifest(spark, d1, v1)
    assert(dataGroups(d1) == g1, "no group rewritten, none added")
    assert(m1.mode == "delete" && m1.dvs.map(_._3).sum == 2L && m1.nRows == 198L)
    assert(Versioned.read(spark, d1).count() == 198L)
    val feed1 = Versioned.changesFeed(spark, d1, v1 - 1)
      .select("id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(feed1 == Set((7L, "delete"), (150L, "delete")))
    // (2) matched UPDATE, scattered: copies + DV, EFFECT mode 'update',
    // originals carried, update pair on the feed
    val d2 = seed()
    val g2 = dataGroups(d2)
    val v2 = Versioned.mergeClauses(spark, d2,
      Seq((7L, "zz", 0L), (150L, "zz", 0L)).toDF("id", "v", "w"), Seq("id"),
      Seq(MatchedUpdate(Seq("v" -> col("SRC.v")))))
    val m2 = Versioned.parseManifest(spark, d2, v2)
    assert(g2.subsetOf(dataGroups(d2)) && dataGroups(d2).size == g2.size + 1,
      "originals carried; ONE copies group added")
    assert(m2.mode == "update" && m2.dvs.map(_._3).sum == 2L && m2.nRows == 200L)
    val r2 = Versioned.read(spark, d2)
    assert(r2.count() == 200L)
    assert(r2.filter(col("v") === "zz").select("id").as[Long].collect().toSet ==
      Set(7L, 150L))
    assert(r2.filter(col("id") === 7L).count() == 1L, "no duplicate")
    val feed2 = Versioned.changesFeed(spark, d2, v2 - 1)
      .select("id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(feed2 == Set((7L, "update_preimage"), (150L, "update_preimage"),
      (7L, "update_postimage"), (150L, "update_postimage")))
    // (3) MIXED update+delete claims (and an insert): mode stays
    // 'merge'; the feed attributes EVERY row — the delete claim, the
    // update pre/post pair, and the insert — via the artifact's
    // per-row claim kinds and the manifest's copies annotation
    val d3 = seed()
    val g3 = dataGroups(d3)
    val v3 = Versioned.mergeClauses(spark, d3,
      Seq((7L, "up", 70L), (150L, "del", 0L), (900L, "new", 1L))
        .toDF("id", "v", "w"),
      Seq("id"), Seq(
        MatchedDelete(Some(col("SRC.v") === "del")),
        MatchedUpdate(Seq("v" -> col("SRC.v"))),
        NotMatchedInsert()))
    val m3 = Versioned.parseManifest(spark, d3, v3)
    assert(m3.mode == "merge" && m3.dvs.map(_._3).sum == 2L)
    assert(m3.copies.size == 1 && m3.files.contains(m3.copies.head))
    assert(g3.subsetOf(dataGroups(d3)), "originals all carried (DV path)")
    val r3 = Versioned.read(spark, d3)
    assert(r3.count() == 200L) // -1 delete +1 insert
    assert(r3.filter(col("id") === 150L).isEmpty)
    assert(r3.filter(col("id") === 7L).select("v").as[String].head() == "up")
    assert(r3.filter(col("id") === 900L).count() == 1L)
    val feed3 = Versioned.changesFeed(spark, d3, v3 - 1)
      .select("id", "v", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(feed3 == Set(
      (150L, "v150", "delete"),
      (7L, "v7", "update_preimage"), (7L, "up", "update_postimage"),
      (900L, "new", "insert")), s"got $feed3")
    // (4) matched rows whose clause conditions claim NOTHING: the
    // group carries fully untouched (no DV entry, no rewrite)
    val d4 = seed()
    val g4 = dataGroups(d4)
    val v4before = Versioned.latestVersion(spark, d4)
    val v4 = Versioned.mergeClauses(spark, d4,
      Seq((7L, "x", 0L)).toDF("id", "v", "w"), Seq("id"),
      Seq(MatchedUpdate(Seq("v" -> lit("x")), Some(lit(false)))))
    assert(v4 == v4before, "no claims anywhere: pure no-op, no commit")
    assert(dataGroups(d4) == g4)
    // (5) forced COW (threshold 0): classic rewrite, mode 'merge'
    val d5 = seed()
    val v5 = withDvFraction(0.0) {
      Versioned.mergeClauses(spark, d5,
        Seq((7L, "", 0L)).toDF("id", "v", "w"), Seq("id"),
        Seq(MatchedDelete()))
    }
    val m5 = Versioned.parseManifest(spark, d5, v5)
    assert(m5.mode == "merge" && m5.dvs.isEmpty)
    assert(Versioned.read(spark, d5).count() == 199L)
  }

  test("merge-on-read UPDATE: updated copies + DV, no group rewrite") {
    val dir = tbl()
    Versioned.commit((0L until 100L).map(i => (i, 0L)).toDF("id", "n"), dir)
    Versioned.append((100L until 200L).map(i => (i, 0L)).toDF("id", "n"), dir)
    val before = dataGroups(dir)
    // one row per group — DV-update territory at the default threshold
    val v = Versioned.update(spark, dir,
      col("id").isin(7L, 150L), "n" -> lit(9L))
    val m = Versioned.parseManifest(spark, dir, v)
    assert(before.subsetOf(m.files.toSet) && m.files.size == before.size + 1,
      "DV update must keep every original group and add ONE copies group")
    assert(m.dvs.map(_._3).sum == 2L && m.mode == "update")
    val rows = Versioned.read(spark, dir)
    assert(rows.count() == 200L, "update must not change the row count")
    assert(rows.filter(col("n") === 9L).select("id").as[Long]
      .collect().toSet == Set(7L, 150L))
    assert(rows.filter(col("id") === 7L).count() == 1L, "no duplicate post-image")
    // pre-update version unaffected
    assert(Versioned.read(spark, dir, 1).filter(col("n") === 9L).count() == 0L)
    // the feed reads it as an update pair
    val feed = Versioned.changesFeed(spark, dir, 1L)
      .select("id", "n", "_change_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(feed == Set(
      (7L, 0L, "update_preimage"), (150L, 0L, "update_preimage"),
      (7L, 9L, "update_postimage"), (150L, 9L, "update_postimage")))
    // a second DV update touching one of the same rows: feed emits only
    // the NEW position growth; the copies group row updates via rewrite
    // or DV of the copies group — either way values stay exact
    val v2 = Versioned.update(spark, dir, col("id") === 7L, "n" -> lit(11L))
    val rows2 = Versioned.read(spark, dir, v2)
    assert(rows2.count() == 200L)
    assert(rows2.filter(col("id") === 7L).select("n").as[Long]
      .collect().toSeq == Seq(11L))
    // a heavy update still rewrites (no DV entries for its groups)
    val v3 = Versioned.update(spark, dir, col("id") < 90L, "n" -> lit(1L))
    val m3 = Versioned.parseManifest(spark, dir, v3)
    assert(Versioned.read(spark, dir, v3).filter(col("n") === 1L).count() == 90L)
    assert(!m3.dvs.exists(d => !m3.files.contains(d._1)),
      "no dangling DV entries after the rewrite")
  }

  test("changesFeed collapses consecutive appends into ONE scan; tags stay per-version") {
    val dir = tbl()
    Versioned.commit(Seq(0L).toDF("id"), dir) // v0
    (1 to 5).foreach(v => Versioned.append(Seq(v * 10L).toDF("id"), dir))
    val feed = Versioned.changesFeed(spark, dir, 0L)
    val got = feed.select("id", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == (1 to 5).map(v => (v * 10L, v.toLong)).toSet)
    // plan-size bound: the 5-append run plans as ONE parquet scan (plus
    // the broadcast-local version map) — a from-genesis CDF replay of a
    // long append history must not build per-version plan nodes
    val scans = feed.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }
    assert(scans.size == 1, s"expected one collapsed scan, got ${scans.size}")
    // _commit_timestamp (Delta CDF's third column) rides the same
    // broadcast map: each collapsed row carries ITS version's manifest
    // committed_at, not the run's first or last
    val byVersion = (1 to 5).map { v =>
      v.toLong -> java.sql.Timestamp.from(java.time.Instant.parse(
        Versioned.parseManifest(spark, dir, v.toLong).committedAt)
        .truncatedTo(java.time.temporal.ChronoUnit.MICROS))
    }.toMap
    feed.select("_commit_version", "_commit_timestamp").collect().foreach { r =>
      assert(r.getTimestamp(1) == byVersion(r.getLong(0)),
        s"version ${r.getLong(0)}: timestamp ${r.getTimestamp(1)} != manifest")
    }
  }

  test("sequential small deletes keep a bounded artifact count; the CDF " +
      "run-consolidation still attributes every position to its version") {
    val dir = tbl()
    // 4 append groups of 100 rows; each delete claims ONE row in ONE
    // group, cycling groups — the worst accretion shape (one fresh
    // artifact per mutation, nothing shared)
    Versioned.commit((0L until 100L).toDF("id"), dir)
    (1 to 3).foreach(i =>
      Versioned.append((i * 100L until (i + 1) * 100L).toDF("id"), dir))
    val key = "spark.graft.dv.maxArtifacts"
    spark.conf.set(key, "3")
    try {
      (0 until 10).foreach { k =>
        val id = (k % 4) * 100L + k / 4 // group cycles, row advances
        Versioned.delete(spark, dir)(col("id") === id)
      }
    } finally spark.conf.unset(key)
    val v = Versioned.latestVersion(spark, dir)
    val m = Versioned.parseManifest(spark, dir, v)
    assert(m.dvs.map(_._3).sum == 10L, "ten positions across the vectors")
    val artifacts = m.dvs.map(_._2).distinct
    assert(artifacts.size <= 3,
      s"artifact accretion unbounded: ${artifacts.size} directories " +
        "(maxArtifacts=3) — the absorb fold did not fire")
    // the gauge surfaces the bound (and bytes) per version
    val hist = Versioned.describeHistory(spark, dir)
      .select("version", "dv_files", "dv_bytes", "dv_rows").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(hist(v) == ((artifacts.size.toLong, hist(v)._2, 10L)))
    assert(hist(v)._2 > 0L, "dv_bytes must gauge the artifacts' disk size")
    assert(hist(3L) == ((0L, 0L, 0L)), "pre-delete versions carry no DVs")
    // content: exactly the ten deleted ids are gone
    val deleted = (0 until 10).map(k => (k % 4) * 100L + k / 4).toSet
    assert(Versioned.read(spark, dir).select("id").as[Long].collect().toSet ==
      (0L until 400L).toSet -- deleted)
    // CDF attribution ACROSS absorbed artifacts: an absorbed group's
    // unchanged positions must NOT re-attribute to the fold version —
    // each delete version owns exactly its one row
    val feed = Versioned.tableChanges(spark, dir, 0L)
    val deletes = feed.filter(col("_change_type") === "delete")
      .select("id", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(deletes == (0 until 10)
      .map(k => ((k % 4) * 100L + k / 4, 4L + k)).toSet, deletes.toString)
    // plan-size bound: the 10-delete run consolidates into ONE frame
    // (plus one for the collapsed append run) — a from-genesis CDF
    // replay over a long DV-mutation history must not build
    // per-version plan frames
    val pieces = Versioned.changesFeedPieces(spark, dir, 0L, v)
    assert(pieces.size == 2,
      s"expected [append-run, dv-delete-run] = 2 frames, got ${pieces.size}")
    // timestamps ride per-version through the consolidated frame too
    val byVersion = (4L to v).map { vv =>
      vv -> java.sql.Timestamp.from(java.time.Instant.parse(
        Versioned.parseManifest(spark, dir, vv).committedAt)
        .truncatedTo(java.time.temporal.ChronoUnit.MICROS))
    }.toMap
    feed.filter(col("_change_type") === "delete")
      .select("_commit_version", "_commit_timestamp").collect().foreach { r =>
        assert(r.getTimestamp(1) == byVersion(r.getLong(0)),
          s"version ${r.getLong(0)}: timestamp ${r.getTimestamp(1)} != manifest")
      }
  }

  test("a mixed run of pure-DV updates and deletes replays in two frames " +
      "with per-version pre/post attribution") {
    val dir = tbl()
    Versioned.commit((0L until 100L).map(i => (i, 0L)).toDF("id", "n"), dir) // v0
    Versioned.append((100L until 200L).map(i => (i, 0L)).toDF("id", "n"), dir) // v1
    // threshold 0.5 keeps the RE-mutations of the 10-row copies group
    // on the DV path (cumulative 3/10 claimed stays under BOTH the
    // per-mutation threshold and the 0.5 cumulative-pressure trigger)
    withDvFraction(0.5) {
      Versioned.update(spark, dir,
        col("id") >= 5L && col("id") <= 14L, "n" -> (col("id") + 1000L)) // v2
      Versioned.update(spark, dir, col("id") === 105L, "n" -> lit(2105L)) // v3
      Versioned.delete(spark, dir)(col("id") === 5L)                      // v4
      Versioned.delete(spark, dir)(col("id") === 7L)                      // v5
      Versioned.update(spark, dir, col("id") === 8L, "n" -> lit(3008L))   // v6
    }
    val v = Versioned.latestVersion(spark, dir)
    assert(v == 6L)
    // the whole v2..v6 mutation run consolidates into pre+post frames
    // (plus one collapsed frame for the v0..v1 genesis/append side)
    val pieces = Versioned.changesFeedPieces(spark, dir, 0L, v)
    assert(pieces.size == 3,
      s"expected [insert-run, dv-preimages, dv-postimages], got ${pieces.size}")
    val feed = Versioned.tableChanges(spark, dir, 2L)
    val got = feed.select("id", "n", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2), r.getLong(3))).toSet
    // v4/v5 delete COPIES v2 wrote: their delete pre-images must carry
    // the UPDATED values, attributed to v4/v5 — the re-mutation case;
    // v6 re-updates an updated row (pre-image 1008, not 0)
    assert(got == (5L to 14L).map(i => (i, 0L, "update_preimage", 2L)).toSet ++
      (5L to 14L).map(i => (i, 1000L + i, "update_postimage", 2L)).toSet ++ Set(
      (105L, 0L, "update_preimage", 3L), (105L, 2105L, "update_postimage", 3L),
      (5L, 1005L, "delete", 4L),
      (7L, 1007L, "delete", 5L),
      (8L, 1008L, "update_preimage", 6L), (8L, 3008L, "update_postimage", 6L)),
      got.toString)
    // live content agrees with the replay
    val live = Versioned.read(spark, dir).as[(Long, Long)].collect().toMap
    assert(!live.contains(5L) && !live.contains(7L))
    assert(live(105L) == 2105L && live(8L) == 3008L && live(9L) == 1009L &&
      live.size == 198)
  }

  test("changesStream (manifest-driven) never ingests DV artifacts; a DV delete fails loudly") {
    val dir = tbl()
    Versioned.commit((0L until 100L).toDF("id"), dir)
    val io = Files.createTempDirectory("graft-dv-stream")
    def drain(): Unit = {
      val q = Versioned.changesStream(spark, dir,
        Versioned.read(spark, dir).schema)
        .writeStream.format("parquet")
        .option("path", s"$io/sink").option("checkpointLocation", s"$io/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    assert(spark.read.parquet(s"$io/sink").count() == 100L)
    withDvFraction(0.5) {
      Versioned.delete(spark, dir)(col("id") === 1L)
    }
    // the delete version is not stream-safe: the tail fails AT PLAN
    // TIME, and the position artifact can never be listed as data —
    // batches are planned from manifests, not directory listings
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain()
    }
    assert(e.getMessage.contains("not an append") ||
      Option(e.getCause).exists(_.getMessage.contains("not an append")))
    val sunk = spark.read.parquet(s"$io/sink")
    assert(sunk.count() == 100L, "nothing (re-)emitted past the failure")
    assert(sunk.filter(col("id").isNull).isEmpty,
      "no all-NULL rows from a dv-* artifact misread as table data")
  }

  test("reserved internal column names are refused at write time") {
    val dir = tbl()
    val e = intercept[IllegalArgumentException] {
      Versioned.commit(Seq((1L, 2L)).toDF("id", "__dv_rel"), dir)
    }
    assert(e.getMessage.contains("reserved"))
  }

  test("DV delete on a column-mapped (renamed) table") {
    val dir = tbl()
    Versioned.commit((0L until 100L).map(i => (i, i * 2)).toDF("id", "v"), dir)
    Versioned.renameColumn(spark, dir, "v", "val")
    withDvFraction(0.5) {
      Versioned.delete(spark, dir)(col("val") === 10L)
    }
    val rows = Versioned.read(spark, dir)
    assert(rows.count() == 99L)
    assert(rows.filter(col("val") === 10L).count() == 0L)
    assert(Versioned.read(spark, dir, 1).count() == 100L)
  }

  test("a run of consecutive mixed DV MERGEs (and trailing delete/update) " +
      "replays in <= 3 run frames with per-row kind attribution") {
    import Versioned.MergeClause._
    val dir = tbl()
    Versioned.commit((0L until 100L).map(i => (i, i)).toDF("id", "n"), dir)   // v0
    Versioned.append((100L until 200L).map(i => (i, i)).toDF("id", "n"), dir) // v1
    withDvFraction(0.5) {
      // four consecutive MIXED merges (v2..v5): each claims one delete,
      // one update, and one insert — mode stays 'merge' every version
      (0 until 4).foreach { k =>
        Versioned.mergeClauses(spark, dir,
          Seq((10L + k, -1L), (120L + k, 1000L + k), (900L + k, -2L))
            .toDF("id", "n"),
          Seq("id"), Seq(
            MatchedDelete(Some(col("SRC.n") === -1L)),
            MatchedUpdate(Seq("n" -> col("SRC.n"))),
            NotMatchedInsert()))
      }
      // the run keeps absorbing plain DV mutations too
      Versioned.delete(spark, dir)(col("id") === 50L)                 // v6
      Versioned.update(spark, dir, col("id") === 60L, "n" -> lit(999L)) // v7
    }
    val v = Versioned.latestVersion(spark, dir)
    assert(v == 7L)
    (2L to 5L).foreach { vv =>
      assert(Versioned.parseManifest(spark, dir, vv).mode == "merge") }
    // PLAN-SIZE BOUND: [insert-run(v1)] + the whole v2..v7 mutation run
    // as [preimages/deletes, postimages, merge-inserts] — never one
    // frame per merge version
    val pieces = Versioned.changesFeedPieces(spark, dir, 0L, v)
    assert(pieces.size == 4,
      s"expected [insert-run, dv-pre/del, dv-post, merge-ins] = 4 frames, " +
        s"got ${pieces.size}")
    // row-exact attribution across the consolidated frames
    val got = Versioned.tableChanges(spark, dir, 2L)
      .select("id", "n", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSet
    val want = (0 until 4).flatMap { k =>
      Seq((10L + k, 10L + k, "delete", 2L + k),
        (120L + k, 120L + k, "update_preimage", 2L + k),
        (120L + k, 1000L + k, "update_postimage", 2L + k),
        (900L + k, -2L, "insert", 2L + k))
    }.toSet ++ Set(
      (50L, 50L, "delete", 6L),
      (60L, 60L, "update_preimage", 7L), (60L, 999L, "update_postimage", 7L))
    assert(got == want, s"got $got")
    // live content agrees with the replay
    val live = Versioned.read(spark, dir).as[(Long, Long)].collect().toMap
    assert(live.size == 199L) // 200 - 5 deletes + 4 inserts
    assert(!live.contains(10L) && !live.contains(13L) && !live.contains(50L))
    assert(live(120L) == 1000L && live(123L) == 1003L && live(60L) == 999L)
    assert(live(900L) == -2L && live(903L) == -2L)
  }
}
