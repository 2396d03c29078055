package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.Versioned
import graft.sources.GraftDml

/** SQL row-level DML on graft tables ([[graft.sources.GraftExtensions]]):
  * DELETE FROM / UPDATE / MERGE INTO statements — path form
  * (graft.`/dir`) and catalog-name form — delegate to the COW triad,
  * so untouched file groups carry METADATA-ONLY across SQL mutations;
  * unsupported shapes raise clear errors, never wrong results. */
class GraftDmlSpec extends SparkSpec {
  import spark.implicits._

  private lazy val sql = {
    val s = GraftDml.enabledSession(spark)
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def tbl() = Files.createTempDirectory("graft-dml").toString + "/t"

  private def groupsOf(dir: String): Set[String] =
    Versioned.read(sql, dir).inputFiles
      .map(_.split("/files/")(1).split("/")(0)).toSet

  /** Two groups with DISJOINT id ranges: low [0,100), high [100,200). */
  private def seeded(): String = {
    val dir = tbl()
    Versioned.commit(
      (0L until 100L).map(i => (i, s"v$i", i * 10L)).toDF("id", "v", "w"), dir)
    Versioned.append(
      (100L until 200L).map(i => (i, s"v$i", i * 10L)).toDF("id", "v", "w"), dir)
    dir
  }

  test("table_changes TVF: the CDF over SQL, inclusive start, version and time bounds") {
    val dir = tbl()
    Versioned.commit((0L until 100L).map(i => (i, 0L)).toDF("id", "n"), dir) // v0
    Versioned.append((100L until 120L).map(i => (i, 0L)).toDF("id", "n"), dir) // v1
    Versioned.delete(sql, dir)(col("id") === 7L)                             // v2 (DV)
    Versioned.update(sql, dir, col("id") === 110L, "n" -> lit(5L))           // v3 (DV)
    def rows(q: String): Set[(Long, String, Long)] =
      sql.sql(q).select("id", "_change_type", "_commit_version").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // inclusive start at v1: the append's own inserts arrive
    val fromV1 = rows(s"SELECT * FROM table_changes('$dir', 1)")
    assert(fromV1 == (100L until 120L).map(i => (i, "insert", 1L)).toSet ++
      Set((7L, "delete", 2L),
        (110L, "update_preimage", 3L), (110L, "update_postimage", 3L)))
    // end bound is inclusive too
    assert(rows(s"SELECT * FROM table_changes('$dir', 2, 2)") ==
      Set((7L, "delete", 2L)))
    // start 0 = genesis: v0's full content as version-0 inserts
    val fromV0 = rows(s"SELECT * FROM table_changes('$dir', 0, 1)")
    assert(fromV0 == (0L until 120L).map(i => (i, "insert", if (i < 100) 0L else 1L)).toSet)
    // _commit_timestamp rides along and matches the manifest instants
    val ts2 = sql.sql(s"SELECT DISTINCT _commit_timestamp FROM " +
      s"table_changes('$dir', 2, 2)").collect()
    assert(ts2.length == 1 && ts2(0).getTimestamp(0) ==
      graft.operators.Versioned.commitTs(
        Versioned.parseManifest(sql, dir, 2L), 2L))
    // a TIMESTAMP string start resolves through the manifest instants
    val t1 = Versioned.parseManifest(sql, dir, 2L).committedAt
    assert(rows(s"SELECT * FROM table_changes('$dir', '$t1', 2)") ==
      Set((7L, "delete", 2L)))
    // a TIMESTAMP-TYPED literal resolves too (the typed arm must win
    // over the generic Number arm — a timestamp evals to boxed micros)
    assert(rows(s"SELECT * FROM table_changes('$dir', 2, " +
      "TIMESTAMP '2099-01-01 00:00:00')") ==
      Set((7L, "delete", 2L),
        (110L, "update_preimage", 3L), (110L, "update_postimage", 3L)))
    // DATE and TIMESTAMP_NTZ literals resolve through the same arm
    // (both eval to boxed numbers the generic Number arm must not eat)
    assert(rows(s"SELECT * FROM table_changes('$dir', 2, DATE '2099-01-01')") ==
      Set((7L, "delete", 2L),
        (110L, "update_preimage", 3L), (110L, "update_postimage", 3L)))
    assert(rows(s"SELECT * FROM table_changes('$dir', 2, " +
      "TIMESTAMP_NTZ '2099-01-01 00:00:00')") ==
      Set((7L, "delete", 2L),
        (110L, "update_preimage", 3L), (110L, "update_postimage", 3L)))
    // catalog-name form resolves like the rest of the SQL surface
    sql.sql(s"CREATE TABLE tvf_tbl USING graft OPTIONS (path '$dir')")
    try assert(rows("SELECT * FROM table_changes('tvf_tbl', 2, 2)") ==
      Set((7L, "delete", 2L)))
    finally sql.sql("DROP TABLE tvf_tbl")
    // a non-graft first argument refuses loudly
    val e = intercept[Exception] {
      sql.sql("SELECT * FROM table_changes('no_such_table_anywhere', 0)").collect()
    }
    assert(e.getMessage.contains("graft"), e.getMessage)
  }

  test("SQL DELETE rewrites only touched groups; untouched carry metadata-only") {
    val dir = seeded()
    val before = groupsOf(dir)
    assert(before.size == 2)
    // force classic COW (the DV fast path is pinned separately below
    // and in DeletionVectorSpec) — this test pins the REWRITE economics
    sql.conf.set("spark.graft.dv.maxDeleteFraction", "0")
    try sql.sql(s"DELETE FROM graft.`$dir` WHERE id < 10")
    finally sql.conf.unset("spark.graft.dv.maxDeleteFraction")
    val after = groupsOf(dir)
    assert(Versioned.read(sql, dir).count() == 190)
    assert(after.intersect(before).size == 1,
      s"high-range group must carry over untouched: $before -> $after")
    // and the whole-table read agrees row-for-row with the library path
    assert(Versioned.read(sql, dir).filter($"id" < 10).count() == 0)
  }

  test("SQL DELETE under the DV threshold writes a deletion vector — no group rewrites") {
    val dir = seeded()
    val before = groupsOf(dir)
    sql.sql(s"DELETE FROM graft.`$dir` WHERE id = 7") // 1% of one group
    val m = Versioned.parseManifest(sql, dir, Versioned.latestVersion(sql, dir))
    assert(m.files.toSet == before, s"DV delete must keep the data groups: $before -> ${m.files}")
    assert(m.dvs.map(_._3).sum == 1L)
    assert(Versioned.read(sql, dir).count() == 199)
    assert(Versioned.read(sql, dir).filter($"id" === 7L).count() == 0)
  }

  test("SQL UPDATE: only the matching group rewrites; values ANSI-cast to column type") {
    val dir = seeded()
    val before = groupsOf(dir)
    // `SET w = 7` is an int literal against a BIGINT column: the command
    // casts assignment values to the column's type (Delta does too).
    sql.sql(s"UPDATE graft.`$dir` SET w = 7 WHERE id >= 150")
    val after = groupsOf(dir)
    assert(after.intersect(before).size == 1,
      s"low-range group must carry over untouched: $before -> $after")
    val got = Versioned.read(sql, dir)
    assert(got.filter($"w" === 7L).count() == 50)
    assert(got.filter($"id" < 150 && $"w" === 7L).count() == 0)
    assert(got.schema("w").dataType.simpleString == "bigint")
  }

  test("SQL MERGE: replace-by-key + insert; untouched group carries; history records it") {
    val dir = seeded()
    val before = groupsOf(dir)
    locally {
      val ss = sql; import ss.implicits._
      Seq((150L, "R", 0L), (500L, "N", 1L)).toDF("id", "v", "w")
        .createOrReplaceTempView("dml_spec_src") // in the DML session
    }
    sql.sql(s"""MERGE INTO graft.`$dir` t USING dml_spec_src s ON t.id = s.id
               |WHEN MATCHED THEN UPDATE SET *
               |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val after = groupsOf(dir)
    val got = Versioned.read(sql, dir)
    assert(got.count() == 201)
    assert(got.filter($"id" === 150L).select("v").as[String].head() == "R")
    assert(got.filter($"id" === 500L).count() == 1)
    assert(after.intersect(before).size == 1,
      s"low-range group must carry over untouched: $before -> $after")
    val modes = Versioned.versions(sql, dir).select("mode")
      .as[String].collect().toSeq
    assert(modes == Seq("snapshot", "append", "merge"))
  }

  test("catalog-name form: CREATE TABLE USING graft, then DELETE/UPDATE by name") {
    val dir = seeded()
    sql.sql("DROP TABLE IF EXISTS graft_dml_spec_cat")
    sql.sql(s"CREATE TABLE graft_dml_spec_cat USING graft OPTIONS (path '$dir')")
    try {
      sql.sql("DELETE FROM graft_dml_spec_cat WHERE id % 2 = 0")
      sql.sql("UPDATE graft_dml_spec_cat SET v = 'odd' WHERE id < 100")
      val got = sql.table("graft_dml_spec_cat")
      assert(got.count() == 100)
      assert(got.filter($"v" === "odd").count() == 50)
    } finally sql.sql("DROP TABLE graft_dml_spec_cat")
  }

  test("general SQL MERGE: conditional update, matched delete, conditional insert") {
    val dir = seeded()
    locally {
      val ss = sql; import ss.implicits._
      Seq((10L, "S10", 1L), (150L, "S150", 2L), (500L, "S500", 3L),
        (600L, "S600", 4L)).toDF("id", "v", "w")
        .createOrReplaceTempView("dml_gen_src")
    }
    sql.sql(s"""MERGE INTO graft.`$dir` t USING dml_gen_src s ON t.id = s.id
               |WHEN MATCHED AND t.w < 500 THEN DELETE
               |WHEN MATCHED THEN UPDATE SET v = concat(s.v, '!'), w = t.w + s.w
               |WHEN NOT MATCHED AND s.w > 3 THEN INSERT *""".stripMargin)
    val got = Versioned.read(sql, dir).as[(Long, String, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(!got.contains(10L), "matched delete (w=100 < 500)")
    assert(got(150L) == ("S150!", 1502L), got(150L).toString)
    assert(!got.contains(500L), "insert condition s.w > 3 excludes w=3")
    assert(got(600L) == ("S600", 4L), "conditional insert admits w=4")
    assert(got.size == 200) // -1 deleted, +1 inserted
  }

  test("SQL MERGE: partial-column INSERT NULL-fills unlisted columns; untouched groups carry") {
    val dir = seeded()
    val before = groupsOf(dir)
    locally {
      val ss = sql; import ss.implicits._
      Seq((10L, "U10", 123L), (700L, "N700", 456L)).toDF("id", "v", "w")
        .createOrReplaceTempView("dml_partial_src")
    }
    // the reference's own upsert shape: pk ∪ update columns, others NULL
    sql.sql(s"""MERGE INTO graft.`$dir` t USING dml_partial_src s ON t.id = s.id
               |WHEN MATCHED THEN UPDATE SET v = s.v
               |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)
               |""".stripMargin)
    val got = Versioned.read(sql, dir)
    assert(got.count() == 201)
    assert(got.filter($"id" === 700L && $"v" === "N700" && $"w".isNull)
      .count() == 1, "unlisted column w must be NULL on insert")
    assert(got.filter($"id" === 10L && $"v" === "U10" && $"w" === 100L)
      .count() == 1, "partial UPDATE SET leaves unlisted columns untouched")
    // 1 claimed row in a 100-row group: merge-on-read — BOTH original
    // groups carry; the update's copy and the insert land in new groups
    assert(groupsOf(dir).intersect(before).size == 2,
      "both groups must carry metadata-only under the DV merge path")
    // expressions (not just column refs) in the VALUES list work too
    sql.sql(s"""MERGE INTO graft.`$dir` t USING dml_partial_src s ON t.id = s.id
               |WHEN NOT MATCHED AND s.w > 9999 THEN INSERT (id, v)
               |  VALUES (s.id + 1000, upper(s.v))""".stripMargin)
    assert(Versioned.read(sql, dir).count() == 201,
      "conditional partial insert admits nothing at w <= 9999")
    // target references in INSERT values are refused loudly (Spark's
    // analyzer rejects them before our rule; our guard backstops it)
    val e = intercept[Exception] {
      sql.sql(s"""MERGE INTO graft.`$dir` t USING dml_partial_src s ON t.id = s.id
                 |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (t.id, s.v)
                 |""".stripMargin)
    }
    assert(e.isInstanceOf[org.apache.spark.sql.AnalysisException] ||
      e.getMessage.contains("source row"), e.toString)
  }

  test("SQL MERGE: NOT MATCHED BY SOURCE DELETE sweeps rows absent from the source") {
    val dir = seeded()
    locally {
      val ss = sql; import ss.implicits._
      (0L until 20L).map(i => (i, s"k$i", 0L)).toDF("id", "v", "w")
        .createOrReplaceTempView("dml_bs_src")
    }
    sql.sql(s"""MERGE INTO graft.`$dir` t USING dml_bs_src s ON t.id = s.id
               |WHEN MATCHED THEN UPDATE SET *
               |WHEN NOT MATCHED BY SOURCE AND t.id < 100 THEN DELETE""".stripMargin)
    val got = Versioned.read(sql, dir)
    assert(got.count() == 120, s"20 kept low + 100 high: ${got.count()}")
    assert(got.filter($"id" < 100 && $"v".startsWith("v")).count() == 0,
      "all surviving low rows were replaced by the source")
  }

  test("IN-subquery DELETE/UPDATE: pre-image evaluation, COW carry, residual conjuncts") {
    val dir = seeded()
    val before = groupsOf(dir)
    locally {
      val ss = sql; import ss.implicits._
      (0L until 20L).toDF("k").createOrReplaceTempView("dml_sq_keys")
    }
    // keys 0..19, residual keeps odd ids: deletes even ids < 20
    sql.sql(s"""DELETE FROM graft.`$dir`
               |WHERE id IN (SELECT k FROM dml_sq_keys) AND id % 2 = 0""".stripMargin)
    val afterDelete = Versioned.read(sql, dir)
    assert(afterDelete.count() == 190)
    assert(afterDelete.filter($"id" < 20 && $"id" % 2 === 0).count() == 0)
    // 10 claims / 100 live = the DV threshold boundary: merge-on-read,
    // both original groups carry (positions only, no rewrite)
    assert(groupsOf(dir).intersect(before).size == 2,
      "both groups must carry metadata-only under the DV delete path")
    // UPDATE with a SELF-REFERENTIAL subquery: the key set is evaluated
    // against the PRE-IMAGE (w of the id<10 survivors), so rows gaining
    // w=5555 here must not re-qualify mid-statement.
    sql.sql(s"""UPDATE graft.`$dir` SET w = 5555
               |WHERE id IN (SELECT id FROM graft.`$dir` WHERE w < 100)""".stripMargin)
    val got = Versioned.read(sql, dir)
    // pre-image w<100: ids 1..9 odd (w=10..90) → exactly 5 rows
    assert(got.filter($"w" === 5555L).count() == 5, "pre-image key set only")
    assert(got.filter($"id" === 1L && $"w" === 5555L).count() == 1)
    assert(got.filter($"id" === 11L && $"w" === 110L).count() == 1,
      "rows outside the pre-image key set keep their values")
    // multi-column IN: (id, v) pairs — composite keys ride the same path
    locally {
      val ss = sql; import ss.implicits._
      Seq((21L, "v21"), (23L, "nope")).toDF("id", "v")
        .createOrReplaceTempView("dml_sq_pairs")
    }
    sql.sql(s"""DELETE FROM graft.`$dir`
               |WHERE (id, v) IN (SELECT id, v FROM dml_sq_pairs)""".stripMargin)
    val got2 = Versioned.read(sql, dir)
    assert(got2.filter($"id" === 21L).count() == 0, "matching pair deleted")
    assert(got2.filter($"id" === 23L).count() == 1,
      "id matches but v does not — the composite key must not match")
  }

  test("scalar-subquery DML conditions: pre-image evaluation, empty -> NULL, correlated refused") {
    val dir = seeded() // ids 0..199, w = id*10 -> avg(w) = 995
    // the scalar is computed on the PRE-IMAGE and substituted as a
    // typed literal, so stats pruning sees a plain comparison
    sql.sql(s"DELETE FROM graft.`$dir` WHERE w < (SELECT avg(w) FROM graft.`$dir`)")
    val got = Versioned.read(sql, dir)
    assert(got.count() == 100, "w < 995 (the pre-image avg) deletes ids 0..99")
    assert(got.filter($"id" < 100).count() == 0)
    // arithmetic around the scalar + UPDATE flavor
    sql.sql(s"""UPDATE graft.`$dir` SET v = 'top'
               |WHERE w > (SELECT max(w) FROM graft.`$dir`) - 100""".stripMargin)
    assert(Versioned.read(sql, dir).filter($"v" === "top").count() == 10,
      "w > 1990-100 marks ids 190..199")
    // empty scalar result -> NULL -> ANSI: no row qualifies, nothing deleted
    locally {
      val ss = sql; import ss.implicits._
      Seq.empty[Long].toDF("k").createOrReplaceTempView("dml_scalar_empty")
    }
    sql.sql(s"DELETE FROM graft.`$dir` WHERE w < (SELECT max(k) FROM dml_scalar_empty)")
    assert(Versioned.read(sql, dir).count() == 100, "NULL scalar deletes nothing")
    // correlated scalar subqueries refuse loudly
    val e = intercept[Exception] {
      sql.sql(s"""DELETE FROM graft.`$dir`
                 |WHERE w < (SELECT max(k) FROM dml_scalar_empty WHERE k = id)""".stripMargin)
    }
    assert(e.getMessage.contains("correlated") || e.getMessage.contains("subquer"),
      e.getMessage)
    assert(Versioned.read(sql, dir).count() == 100)
  }

  test("subquery DML refusals: multiple conjuncts, multi-col NOT IN, uncorrelated EXISTS") {
    val dir = seeded()
    locally {
      val ss = sql; import ss.implicits._
      Seq(1L, 2L).toDF("k").createOrReplaceTempView("dml_sq_k2")
    }
    def refuse(stmt: String, want: String): Unit = {
      val e = intercept[Exception](sql.sql(stmt))
      assert(e.getMessage != null && (e.getMessage.contains(want) ||
        e.getMessage.contains("subquer")), s"$stmt -> ${e.getMessage}")
    }
    refuse(s"""DELETE FROM graft.`$dir` WHERE id IN (SELECT k FROM dml_sq_k2)
              |AND w IN (SELECT k FROM dml_sq_k2)""".stripMargin,
      "subquery conjuncts")
    refuse(s"""DELETE FROM graft.`$dir`
              |WHERE EXISTS (SELECT 1 FROM dml_sq_k2)""".stripMargin,
      "uncorrelated EXISTS")
    // and nothing above mutated the table
    assert(Versioned.read(sql, dir).count() == 200)
  }

  test("EXISTS / NOT EXISTS DML: correlated key extraction rides the key-set COW") {
    val dir = seeded() // ids 0..199, two groups split at 100
    locally {
      val ss = sql; import ss.implicits._
      Seq(3L, 5L, 150L, 9999L).toDF("k").createOrReplaceTempView("dml_ex_keys")
    }
    // EXISTS with a local conjunct: only k < 100 rows of the key set fire
    sql.sql(s"""DELETE FROM graft.`$dir`
               |WHERE EXISTS (SELECT 1 FROM dml_ex_keys e
               |  WHERE e.k = id AND e.k < 100)""".stripMargin)
    val got = Versioned.read(sql, dir)
    assert(got.count() == 198, "ids 3 and 5 deleted; 150 kept (local filter)")
    assert(got.filter($"id".isin(3L, 5L)).count() == 0)
    assert(got.filter($"id" === 150L).count() == 1)
    // NOT EXISTS claims rows matching NO key — with a residual conjunct
    sql.sql(s"""UPDATE graft.`$dir` SET v = 'orphan'
               |WHERE NOT EXISTS (SELECT 1 FROM dml_ex_keys e WHERE e.k = id)
               |  AND w >= 1900""".stripMargin)
    val got2 = Versioned.read(sql, dir)
    assert(got2.filter($"v" === "orphan").count() == 10,
      "ids 190..199 have no key match and w >= 1900")
    assert(got2.filter($"id" === 150L && $"v" === "orphan").count() == 0,
      "id 150 matches a key: NOT EXISTS false")
  }

  test("NOT IN DML: ANSI NULL semantics pinned — NULL in set = no-op; " +
      "empty set = all rows; NULL key kept against a non-empty set") {
    val dir = tbl()
    locally {
      val ss = sql; import ss.implicits._
      Versioned.commit(Seq(
        (java.lang.Long.valueOf(1L), "a"),
        (java.lang.Long.valueOf(2L), "b"),
        (null.asInstanceOf[java.lang.Long], "c")).toDF("id", "v"), dir)
      Seq(java.lang.Long.valueOf(1L), null.asInstanceOf[java.lang.Long])
        .toDF("k").createOrReplaceTempView("dml_ni_withnull")
      Seq(1L).toDF("k").createOrReplaceTempView("dml_ni_one")
      Seq.empty[Long].toDF("k").createOrReplaceTempView("dml_ni_empty")
    }
    // S contains NULL: `id NOT IN S` is never TRUE — global no-op
    sql.sql(s"DELETE FROM graft.`$dir` WHERE id NOT IN (SELECT k FROM dml_ni_withnull)")
    assert(Versioned.read(sql, dir).count() == 3, "NULL in S: nothing deleted")
    assert(Versioned.latestVersion(sql, dir) == 0L, "no-op publishes no version")
    // S = {1}: id=2 deleted; id=1 kept (IN); id=NULL kept (NULL NOT IN S = NULL)
    sql.sql(s"DELETE FROM graft.`$dir` WHERE id NOT IN (SELECT k FROM dml_ni_one)")
    assertRows(Versioned.read(sql, dir).select("v"), Seq("v"),
      Set(Seq("a"), Seq("c")))
    // S empty: NOT IN is TRUE for every row, the NULL key included
    sql.sql(s"DELETE FROM graft.`$dir` WHERE id NOT IN (SELECT k FROM dml_ni_empty)")
    assert(Versioned.read(sql, dir).count() == 0, "empty S deletes everything")
  }

  test("multi-column NOT IN DML: exact ANSI tuple three-valued logic") {
    val dir = tbl()
    locally {
      val ss = sql; import ss.implicits._
      Versioned.commit(Seq(
        (java.lang.Long.valueOf(1L), "a"),
        (java.lang.Long.valueOf(2L), "b"),
        (null.asInstanceOf[java.lang.Long], "c"),
        (java.lang.Long.valueOf(3L), null.asInstanceOf[String]))
        .toDF("id", "v"), dir)
      Seq((java.lang.Long.valueOf(1L), "a"),
        (null.asInstanceOf[java.lang.Long], "b"),
        (java.lang.Long.valueOf(4L), "d"))
        .toDF("k", "sv").createOrReplaceTempView("dml_nim_set")
    }
    // ANSI per row: (1,a) IN the set -> kept; (2,b) vs (NULL,b) is
    // UNKNOWN (b matches, k is NULL) -> kept; (3,NULL) vs (NULL,b) is
    // UNKNOWN on both columns -> kept; (NULL,c) fails EVERY tuple on
    // the v column -> NOT IN is TRUE -> deleted DESPITE the NULL id
    // (the case the single-column "NULL key kept" shortcut gets wrong).
    sql.sql(s"""DELETE FROM graft.`$dir`
               |WHERE (id, v) NOT IN (SELECT k, sv FROM dml_nim_set)""".stripMargin)
    val got = Versioned.read(sql, dir).select("id", "v").collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)))).toSet
    assert(got == Set((Some(1L), Some("a")), (Some(2L), Some("b")),
      (Some(3L), None)), s"got $got")
    // and it must agree with Spark's OWN evaluation of the predicate
    val wantSurvivors = sql.sql(
      """SELECT id, v FROM (SELECT 1L AS id, 'a' AS v UNION ALL
        |SELECT 2L, 'b' UNION ALL SELECT CAST(NULL AS BIGINT), 'c' UNION ALL
        |SELECT 3L, CAST(NULL AS STRING))
        |WHERE ((id, v) NOT IN (SELECT k, sv FROM dml_nim_set)) IS NOT TRUE
        |""".stripMargin).collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)))).toSet
    assert(got == wantSurvivors, "must match Spark's own NOT IN evaluation")
    // UPDATE flavor with a residual conjunct
    sql.sql(s"""UPDATE graft.`$dir` SET v = 'mark'
               |WHERE (id, v) NOT IN (SELECT k, sv FROM dml_nim_set)
               |  AND id IS NOT NULL""".stripMargin)
    assert(Versioned.read(sql, dir).filter($"v" === "mark").count() == 0,
      "every survivor is IN-or-UNKNOWN: nothing qualifies")
    // empty set: tuple NOT IN is TRUE for every row
    locally {
      val ss = sql; import ss.implicits._
      Seq.empty[(Long, String)].toDF("k", "sv")
        .createOrReplaceTempView("dml_nim_empty")
    }
    sql.sql(s"""DELETE FROM graft.`$dir`
               |WHERE (id, v) NOT IN (SELECT k, sv FROM dml_nim_empty)""".stripMargin)
    assert(Versioned.read(sql, dir).count() == 0, "empty set deletes everything")
  }

  test("multi-column NOT IN above the literal limit: the join fallback " +
      "matches the literal path row-for-row (NULL rows and tuples included)") {
    // Two identical tables; the same statements run once through the
    // bounded-literal path (default limit) and once forced through the
    // null-aware anti-join fallback (limit 1) — survivors must match
    // exactly. The table carries NULL-keyed rows (the nested-loop h3
    // arm) and the set carries a NULL-bearing tuple (the h2 arm).
    val ss = sql; import ss.implicits._
    def seed(): String = {
      val dir = tbl()
      Versioned.commit(Seq(
        (java.lang.Long.valueOf(1L), "a", 10L),
        (java.lang.Long.valueOf(2L), "b", 20L),
        (java.lang.Long.valueOf(3L), "x", 30L),
        (null.asInstanceOf[java.lang.Long], "c", 40L),
        (java.lang.Long.valueOf(4L), null.asInstanceOf[String], 50L),
        (java.lang.Long.valueOf(9L), "z", 60L))
        .toDF("id", "v", "w"), dir)
      dir
    }
    Seq((java.lang.Long.valueOf(1L), "a"),
      (null.asInstanceOf[java.lang.Long], "b"),
      (java.lang.Long.valueOf(4L), "d"))
      .toDF("k", "sv").createOrReplaceTempView("dml_nimf_set")
    def surv(dir: String): Set[(Option[Any], Option[Any], Long)] =
      Versioned.read(sql, dir).collect()
        .map(r => (Option(r.get(0)), Option(r.get(1)), r.getLong(2))).toSet
    def run(dir: String): Unit = {
      sql.sql(s"""DELETE FROM graft.`$dir`
                 |WHERE (id, v) NOT IN (SELECT k, sv FROM dml_nimf_set)
                 |  AND w < 55""".stripMargin)
      sql.sql(s"""UPDATE graft.`$dir` SET w = w + 1000
                 |WHERE (id, v) NOT IN (SELECT k, sv FROM dml_nimf_set)
                 |""".stripMargin)
    }
    val litDir = seed(); val joinDir = seed()
    run(litDir) // literal path (set of 3 is under the default limit)
    sql.conf.set("spark.graft.dml.notInLiteralLimit", "1")
    try run(joinDir) // forced through the anti-join fallback
    finally sql.conf.unset("spark.graft.dml.notInLiteralLimit")
    assert(surv(joinDir) == surv(litDir),
      s"join fallback diverged:\n  join=${surv(joinDir)}\n  lit=${surv(litDir)}")
    // sanity vs hand-derivation: (3,'x'), (NULL,'c') and (9,'z') fail
    // every tuple on a non-NULL column -> claimed (the NULL-id row is
    // the ANSI trap: claimed DESPITE its NULL key); (9,'z') escapes
    // the DELETE's w<55 residual and takes the UPDATE instead; the
    // rest are IN-or-UNKNOWN and survive untouched.
    assert(surv(litDir) == Set(
      (Some(1L), Some("a"), 10L), (Some(2L), Some("b"), 20L),
      (Some(4L), None, 50L), (Some(9L), Some("z"), 1060L)),
      surv(litDir).toString)
    // an all-NULL tuple makes the statement a global no-op on BOTH paths
    Seq((null.asInstanceOf[java.lang.Long], null.asInstanceOf[String]))
      .toDF("k", "sv").createOrReplaceTempView("dml_nimf_allnull")
    val before = surv(joinDir)
    sql.conf.set("spark.graft.dml.notInLiteralLimit", "0")
    try sql.sql(s"""DELETE FROM graft.`$joinDir`
                   |WHERE (id, v) NOT IN (SELECT k, sv FROM dml_nimf_allnull)
                   |""".stripMargin)
    finally sql.conf.unset("spark.graft.dml.notInLiteralLimit")
    assert(surv(joinDir) == before, "all-NULL tuple must be a no-op")
  }

  test("MERGE ON with differently-named keys: t.id = s.src_id rides the key path") {
    val dir = seeded() // ids 0..199, two groups split at 100
    val before = groupsOf(dir)
    locally {
      val ss = sql; import ss.implicits._
      Seq((5L, "R5"), (150L, "R150"), (900L, "NEW"))
        .toDF("src_id", "sv").createOrReplaceTempView("merge_ren_src")
    }
    sql.sql(s"""MERGE INTO graft.`$dir` t USING merge_ren_src s
               |ON t.id = s.src_id
               |WHEN MATCHED THEN UPDATE SET v = s.sv
               |WHEN NOT MATCHED THEN INSERT (id, v, w)
               |  VALUES (s.src_id, s.sv, 0)""".stripMargin)
    val out = Versioned.read(sql, dir)
    assert(out.count() == 201)
    assertRows(out.filter($"id".isin(5L, 150L, 900L)), Seq("id", "v"),
      Set(Seq(5L, "R5"), Seq(150L, "R150"), Seq(900L, "NEW")))
    // COW carry still holds under renamed keys: add a fresh high-range
    // group the source cannot touch, merge again — it must carry over
    locally {
      val ss = sql; import ss.implicits._
      Versioned.append(
        (1000L until 1100L).map(i => (i, s"v$i", i * 10L)).toDF("id", "v", "w"),
        dir)
    }
    val before2 = groupsOf(dir)
    sql.sql(s"""MERGE INTO graft.`$dir` t USING merge_ren_src s
               |ON t.id = s.src_id
               |WHEN MATCHED AND s.src_id = 5 THEN UPDATE SET v = 'again'
               |""".stripMargin)
    assert(groupsOf(dir).intersect(before2).nonEmpty,
      s"groups without matches must carry over: $before2 -> ${groupsOf(dir)}")
    assertRows(Versioned.read(sql, dir).filter($"id" === 5L).select("id", "v"),
      Seq("id", "v"), Set(Seq(5L, "again")))
    // INSERT * cannot be satisfied with a renamed key: loud refusal
    val e = intercept[Exception] {
      sql.sql(s"""MERGE INTO graft.`$dir` t USING merge_ren_src s
                 |ON t.id = s.src_id
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(e.getMessage.contains("INSERT *") ||
      e.getMessage.contains("Cannot resolve") ||
      e.getMessage.contains("UNRESOLVED"), e.getMessage)
  }

  test("MERGE ON residual conjuncts: key-equal pairs failing the residual are " +
      "NOT MATCHED (the ANSI trap: the source row inserts)") {
    val dir = seeded() // w = id * 10
    locally {
      val ss = sql; import ss.implicits._
      // id=5 key-matches with w=50 <= 500 → residual FALSE → NOT matched
      // id=150 key-matches with w=1500 > 500 → matched
      Seq((5L, "U5"), (150L, "U150")).toDF("id", "sv")
        .createOrReplaceTempView("merge_res_src")
    }
    sql.sql(s"""MERGE INTO graft.`$dir` t USING merge_res_src s
               |ON t.id = s.id AND t.w > 500
               |WHEN MATCHED THEN UPDATE SET v = s.sv
               |WHEN NOT MATCHED THEN INSERT (id, v, w)
               |  VALUES (s.id, concat('INS_', s.sv), -1)""".stripMargin)
    val out = Versioned.read(sql, dir)
    // id=5's source row INSERTED (now two rows with id=5); id=150 updated
    assert(out.count() == 201)
    assertRows(out.filter($"id" === 5L).select("id", "v", "w"),
      Seq("id", "v", "w"),
      Set(Seq(5L, "v5", 50L), Seq(5L, "INS_U5", -1L)))
    assertRows(out.filter($"id" === 150L), Seq("id", "v"),
      Set(Seq(150L, "U150")))
  }

  test("MERGE ON residual + NOT MATCHED BY SOURCE: residual-false rows are " +
      "claimable by by-source clauses; NULL residual = not matched") {
    val dir = tbl()
    locally {
      val ss = sql; import ss.implicits._
      Versioned.commit(Seq(
        (1L, "a", java.lang.Long.valueOf(10L)),
        (2L, "b", java.lang.Long.valueOf(999L)),
        (3L, "c", null.asInstanceOf[java.lang.Long])).toDF("id", "v", "w"), dir)
      // source matches ids 1 (w=10: residual w>100 FALSE), 2 (TRUE),
      // 3 (w NULL: residual NULL = not matched)
      Seq((1L, "S1"), (2L, "S2"), (3L, "S3")).toDF("id", "sv")
        .createOrReplaceTempView("merge_bs_res_src")
    }
    sql.sql(s"""MERGE INTO graft.`$dir` t USING merge_bs_res_src s
               |ON t.id = s.id AND t.w > 100
               |WHEN MATCHED THEN UPDATE SET v = s.sv
               |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    // id=2 matched → updated; ids 1 and 3 NOT matched (residual false /
    // NULL) → by-source DELETE claims them
    assertRows(Versioned.read(sql, dir).select("id", "v"), Seq("id", "v"),
      Set(Seq(2L, "S2")))
  }

  test("MERGE ON refusals: no key equality at all; dup-keyed source under a residual") {
    val dir = seeded()
    locally {
      val ss = sql; import ss.implicits._
      Seq((5L, "x"), (5L, "y")).toDF("id", "sv")
        .createOrReplaceTempView("merge_dup_src")
    }
    val e1 = intercept[Exception] {
      sql.sql(s"""MERGE INTO graft.`$dir` t USING merge_dup_src s
                 |ON t.id < s.id
                 |WHEN MATCHED THEN UPDATE SET v = s.sv""".stripMargin)
    }
    assert(e1.getMessage.contains("no target=source column equality"),
      e1.getMessage)
    val e2 = intercept[Exception] {
      sql.sql(s"""MERGE INTO graft.`$dir` t USING merge_dup_src s
                 |ON t.id = s.id AND t.w > 0
                 |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    }
    assert(e2.getMessage.contains("duplicate keys"), e2.getMessage)
  }

  test("MERGE ON residual with star actions runs; subqueries still refuse") {
    val dir = seeded()
    locally {
      val ss = sql; import ss.implicits._
      Seq((1L, "x", 0L)).toDF("id", "v", "w")
        .createOrReplaceTempView("dml_spec_bad") // in the DML session
    }
    // formerly a refusal — ON residuals are now the general ON surface:
    // id=1 has w=10 > 5 → matched → SET * replaces the row
    sql.sql(s"""MERGE INTO graft.`$dir` t USING dml_spec_bad s
               |ON t.id = s.id AND t.w > 5
               |WHEN MATCHED THEN UPDATE SET *
               |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(Versioned.read(sql, dir).count() == 200, "matched: no insert")
    assertRows(Versioned.read(sql, dir).filter($"id" === 1L),
      Seq("id", "v", "w"), Set(Seq(1L, "x", 0L)))
    // subqueries in MERGE conditions are still refused (only the
    // DELETE/UPDATE IN-subquery path is supported)
    val vAfter = Versioned.latestVersion(sql, dir)
    val e3 = intercept[Exception] {
      sql.sql(s"""MERGE INTO graft.`$dir` t USING dml_spec_bad s ON t.id = s.id
                 |WHEN MATCHED AND t.w IN (SELECT w FROM dml_spec_bad)
                 |THEN DELETE""".stripMargin)
    }
    assert(e3.getMessage.contains("subquer"), e3.getMessage)
    // nothing mutated by the refused statement
    assert(Versioned.read(sql, dir).count() == 200)
    assert(Versioned.latestVersion(sql, dir) == vAfter)
  }

  test("a catalog database literally named `graft` stays resolvable (path form needs a path)") {
    // The path rule claims graft.`x` only when x LOOKS like a path —
    // otherwise a real database named graft becomes unreadable.
    sql.sql("CREATE DATABASE IF NOT EXISTS graft")
    try {
      locally {
        val ss = sql; import ss.implicits._
        Seq((1L, "a"), (2L, "b")).toDF("id", "v")
          .write.mode("overwrite").saveAsTable("graft.plain_parquet_tbl")
      }
      assert(sql.sql("SELECT * FROM graft.plain_parquet_tbl").count() == 2,
        "a non-path identifier under the graft database must resolve via the catalog")
      // a graft-provider table UNDER the graft database: DML and
      // maintenance statements resolve through the catalog branch, with
      // plain and backquoted identifier forms alike
      val tdir = tbl()
      locally {
        val ss = sql; import ss.implicits._
        Seq((1L, "a"), (2L, "b")).toDF("id", "v")
          .write.format("graft").option("path", tdir)
          .saveAsTable("graft.versioned_tbl")
      }
      sql.sql("DELETE FROM graft.versioned_tbl WHERE id = 1")
      assert(sql.sql("SELECT count(*) FROM graft.versioned_tbl")
        .collect()(0).getLong(0) == 1L)
      assert(sql.sql("DESCRIBE HISTORY `graft`.`versioned_tbl`").count() == 2L)
      assert(sql.sql("DESCRIBE HISTORY spark_catalog.graft.versioned_tbl")
        .count() == 2L)
      // graft.`x` with a NON-path x is the catalog form on the
      // maintenance surface too — the same rule as SELECT/DML, so one
      // spelling never resolves to a relative directory 'x'
      assert(sql.sql("DESCRIBE HISTORY graft.`versioned_tbl`").count() == 2L)
      sql.sql("DROP TABLE IF EXISTS graft.versioned_tbl")
    } finally {
      sql.sql("DROP TABLE IF EXISTS graft.plain_parquet_tbl")
      sql.sql("DROP TABLE IF EXISTS graft.versioned_tbl")
      sql.sql("DROP DATABASE IF EXISTS graft")
    }
  }

  test("graft.`/path` resolves for plain reads too (delta.`path` surface)") {
    val dir = seeded()
    val n = sql.sql(s"SELECT count(*) AS n FROM graft.`$dir` WHERE id >= 100")
      .as[Long].head()
    assert(n == 100L)
  }

  test("graft.`reldir`: a single-segment RELATIVE path resolves as the path form " +
      "when the directory holds a _versions log") {
    // No slash in the identifier, so the lexical rule alone would route
    // it to a database literally named `graft` — but the directory
    // probe sees the live manifest log and keeps the legitimate
    // relative-path spelling working (SELECT, DML and maintenance
    // statements all through one resolution).
    val name = s"graft_reldir_${java.util.UUID.randomUUID().toString.take(8)}"
    val fs = new org.apache.hadoop.fs.Path(name)
      .getFileSystem(sql.sparkContext.hadoopConfiguration)
    try {
      locally {
        val ss = sql; import ss.implicits._
        Versioned.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), name)
      }
      assert(sql.sql(s"SELECT count(*) AS n FROM graft.`$name`")
        .collect()(0).getLong(0) == 2L)
      sql.sql(s"DELETE FROM graft.`$name` WHERE id = 1")
      assert(Versioned.read(sql, name).count() == 1L)
      assert(sql.sql(s"DESCRIBE HISTORY graft.`$name`").count() == 2L)
    } finally fs.delete(new org.apache.hadoop.fs.Path(name), true)
  }

  test("maintenance SQL: DESCRIBE HISTORY, OPTIMIZE [ZORDER], RESTORE, VACUUM") {
    val dir = seeded() // v0 snapshot, v1 append
    val hist = sql.sql(s"DESCRIBE HISTORY graft.`$dir`").collect()
    assert(hist.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((0L, "snapshot"), (1L, "append")))
    // OPTIMIZE compacts into a new snapshot version; rows identical
    val v2 = sql.sql(s"OPTIMIZE graft.`$dir`").as[Long].head()
    assert(v2 == 2L && Versioned.read(sql, dir).count() == 200)
    // ZORDER BY rewrites clustered; readWhere still exact
    sql.sql(s"OPTIMIZE graft.`$dir` ZORDER BY (id, w)")
    assert(Versioned.readWhere(sql, dir)(col("id") < 20L).count() == 20)
    // RESTORE back to v1: metadata-only, row set of v1
    val v4 = sql.sql(s"RESTORE graft.`$dir` TO VERSION AS OF 1").as[Long].head()
    assert(v4 == 4L && Versioned.read(sql, dir).count() == 200)
    // VACUUM RETAIN 1 VERSIONS drops everything before the latest
    val vac = sql.sql(s"VACUUM graft.`$dir` RETAIN 1 VERSIONS").collect()(0)
    assert(vac.getLong(0) == 4L, s"expected 4 dropped versions: $vac")
    assert(Versioned.read(sql, dir).count() == 200) // latest intact
    intercept[Exception] { Versioned.read(sql, dir, 0L).count() }
  }

  test("maintenance SQL: constraints and column DDL, catalog + path forms") {
    val dir = seeded()
    sql.sql(s"ALTER TABLE graft.`$dir` ADD CONSTRAINT pos CHECK (id >= 0)")
    intercept[IllegalArgumentException] {
      Versioned.append(Seq((-1L, "bad", 0L)).toDF("id", "v", "w"), dir)
    }
    // renaming the constrained column is refused by name, via SQL
    val e = intercept[IllegalArgumentException] {
      sql.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN id TO doc_id")
    }
    assert(e.getMessage.contains("pos"))
    sql.sql(s"ALTER TABLE graft.`$dir` DROP CONSTRAINT pos")
    sql.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN id TO doc_id")
    sql.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN v")
    assert(Versioned.read(sql, dir).columns.toSeq == Seq("doc_id", "w"))
    // catalog-name form + fall-through: non-graft targets delegate
    sql.sql("DROP TABLE IF EXISTS graft_maint_cat")
    sql.sql(s"CREATE TABLE graft_maint_cat USING graft OPTIONS (path '$dir')")
    try {
      assert(sql.sql("DESCRIBE HISTORY graft_maint_cat").count() >= 5)
      sql.sql("ALTER TABLE graft_maint_cat RENAME COLUMN w TO weight")
      assert(Versioned.read(sql, dir).columns.toSeq == Seq("doc_id", "weight"))
    } finally sql.sql("DROP TABLE graft_maint_cat")
    // graft-only statement on a non-graft table: clear error
    val e2 = intercept[Exception] {
      sql.sql("DESCRIBE HISTORY some_random_table")
    }
    assert(e2.getMessage.contains("not a graft table"))
    // ordinary SQL still parses through the delegate untouched
    assert(sql.sql("SELECT 1 AS one").as[Int].head() == 1)
  }

  test("YAML job hooks reach the DML/maintenance SQL surface under an enabled session") {
    // The reference's whole user surface is YAML whose pre/post SQL
    // hooks run Delta SQL statements. With the job driven by a
    // DML-enabled session, the same YAML reaches graft's SQL surface:
    // here post_sql prunes the versioned target (DELETE) and compacts
    // it (OPTIMIZE) right after the versioned_append lands.
    val ss = sql; import ss.implicits._
    val dir = seeded() // v0+v1 = 200 rows
    (200L until 260L).map(i => (i, s"v$i", i * 10L)).toDF("id", "v", "w")
      .createOrReplaceTempView("dml_hook_src")
    val yaml =
      s"""version: 0
         |source:
         |  query: SELECT id, v, w FROM dml_hook_src
         |target:
         |  path: $dir
         |  operation: versioned_append
         |  post_sql:
         |    - DELETE FROM graft.`$dir` WHERE id % 2 = 1
         |    - OPTIMIZE graft.`$dir`
         |""".stripMargin
    val f = java.nio.file.Files.createTempFile("graft_dml_hook_", ".yml")
    java.nio.file.Files.writeString(f, yaml)
    try graft.operators.EtlJob.fromConfig(f.toString)(ss).run()
    finally java.nio.file.Files.deleteIfExists(f)
    val got = Versioned.read(sql, dir)
    assert(got.count() == 130, s"260 rows appended-then-pruned to evens: ${got.count()}")
    assert(got.filter($"id" % 2 === 1).count() == 0)
    val modes = Versioned.versions(sql, dir).select("mode").as[String].collect().toSeq
    assert(modes == Seq("snapshot", "append", "append", "delete", "optimize"),
      modes.toString) // the OPTIMIZE is the final snapshot
  }

  test("CONVERT TO GRAFT adopts a plain parquet dir in place (moves, never rewrites)") {
    val ss = sql; import ss.implicits._
    val dir = Files.createTempDirectory("graft-convert").toString + "/data"
    (0L until 100L).map(i => (i, s"d$i")).toDF("id", "v")
      .repartition(4).write.parquet(dir)
    val beforeNames = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    assert(beforeNames.size == 4)
    val v = sql.sql(s"CONVERT TO GRAFT parquet.`$dir`").as[Long].head()
    assert(v == 0L)
    // adopted, not copied: the same file names live inside the group,
    // none remain at the root
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet")) == 0)
    val group = new java.io.File(s"$dir/files").listFiles()
      .filter(_.isDirectory).toSeq
    assert(group.size == 1)
    assert(group.head.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(_.getName).toSet == beforeNames)
    // it is a live table now: reads, SQL DML, history
    assert(Versioned.read(sql, dir).count() == 100)
    sql.sql(s"DELETE FROM graft.`$dir` WHERE id < 10")
    assert(Versioned.read(sql, dir).count() == 90)
    assert(Versioned.read(sql, dir, 0L).count() == 100) // time travel
    // refusals: double convert; partitioned layout
    val e1 = intercept[IllegalArgumentException] {
      Versioned.convert(sql, dir)
    }
    assert(e1.getMessage.contains("already"))
    val pdir = Files.createTempDirectory("graft-convp").toString + "/p"
    (0L until 10L).map(i => (i, i % 2)).toDF("id", "k")
      .write.partitionBy("k").parquet(pdir)
    val e2 = intercept[IllegalArgumentException] {
      sql.sql(s"CONVERT TO GRAFT parquet.`$pdir`")
    }
    assert(e2.getMessage.contains("partition"), e2.getMessage)
  }

  test("SQL time travel: VERSION AS OF / TIMESTAMP AS OF on path and catalog forms") {
    val dir = seeded() // v0 = 100 rows, v1 = 200 rows
    sql.sql(s"DELETE FROM graft.`$dir` WHERE id >= 150") // v2 = 150 rows
    assert(sql.sql(s"SELECT count(*) AS n FROM graft.`$dir` VERSION AS OF 0")
      .as[Long].head() == 100L)
    assert(sql.sql(s"SELECT count(*) AS n FROM graft.`$dir` VERSION AS OF 1")
      .as[Long].head() == 200L)
    assert(sql.sql(s"SELECT count(*) AS n FROM graft.`$dir`")
      .as[Long].head() == 150L)
    // TIMESTAMP AS OF far future = latest; a literal timestamp works too
    assert(sql.sql(
      s"SELECT count(*) AS n FROM graft.`$dir` TIMESTAMP AS OF '2999-01-01'")
      .as[Long].head() == 150L)
    // catalog-name form
    sql.sql("DROP TABLE IF EXISTS graft_tt_spec_cat")
    sql.sql(s"CREATE TABLE graft_tt_spec_cat USING graft OPTIONS (path '$dir')")
    try {
      assert(sql.sql(
        "SELECT count(*) AS n FROM graft_tt_spec_cat VERSION AS OF 1")
        .as[Long].head() == 200L)
      assert(sql.table("graft_tt_spec_cat").count() == 150L)
    } finally sql.sql("DROP TABLE graft_tt_spec_cat")
    // clear errors: non-numeric version, pre-history timestamp
    val e1 = intercept[Exception] {
      sql.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 'abc'").collect()
    }
    assert(e1.getMessage.contains("version number"))
    val e2 = intercept[Exception] {
      sql.sql(s"SELECT * FROM graft.`$dir` TIMESTAMP AS OF '1990-01-01'").collect()
    }
    assert(e2.getMessage.contains("no version"))
  }
}
