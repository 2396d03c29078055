package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.Versioned

/** Parquet-native time travel: immutable file groups + create-exclusive
  * manifests. Pins the Delta-workflow properties a user relies on:
  * historical reads are stable, appends share parent files (no rewrite),
  * and concurrent committers serialize to distinct versions. */
class VersionedSpec extends SparkSpec {
  import spark.implicits._

  private def tbl() = Files.createTempDirectory("graft-versioned").toString + "/t"

  test("commit / append / read: every historical version stays readable and exact") {
    val dir = tbl()
    val v0 = Versioned.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    val v1 = Versioned.append(Seq((3L, "c")).toDF("id", "v"), dir)
    val v2 = Versioned.commit(Seq((9L, "z")).toDF("id", "v"), dir)
    assert(Seq(v0, v1, v2) == Seq(0L, 1L, 2L))
    assert(Versioned.latestVersion(spark, dir) == 2L)
    assertRows(Versioned.read(spark, dir, 0), Seq("id"), Set(Seq(1L), Seq(2L)))
    assertRows(Versioned.read(spark, dir, 1), Seq("id"), Set(Seq(1L), Seq(2L), Seq(3L)))
    assertRows(Versioned.read(spark, dir), Seq("id"), Set(Seq(9L))) // latest
    assertRows(Versioned.versions(spark, dir), Seq("version", "mode", "n_rows"),
      Set(Seq(0L, "snapshot", 2L), Seq(1L, "append", 3L), Seq(2L, "snapshot", 1L)))
  }

  test("torn or truncated manifests fail closed, never parse best-effort") {
    val dir = tbl()
    Versioned.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    Versioned.delete(spark, dir)(col("id") === 1L) // nothing DV'd (full group over threshold) — fine either way
    val p = java.nio.file.Paths.get(s"$dir/_versions/v1.json")
    val full = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    // Truncate mid-object (cut the closing brace and whatever precedes
    // it): a reader must RAISE, not silently parse a field-dropped
    // prefix — dvs is the last key, and a waved-through prefix would
    // resurrect deleted rows.
    java.nio.file.Files.write(p, full.dropRight(8).getBytes("UTF-8"))
    val e = intercept[java.io.IOException](Versioned.parseManifest(spark, dir, 1L))
    assert(e.getMessage.contains("failing closed"))
    // restore and confirm the parse works again
    java.nio.file.Files.write(p, full.getBytes("UTF-8"))
    assert(Versioned.parseManifest(spark, dir, 1L).files.nonEmpty)
    // an unterminated ARRAY inside a complete-looking object raises too
    val mangled = full.lastIndexOf("]") match {
      case -1 => full
      case i => full.substring(0, i) + " " + full.substring(i + 1)
    }
    java.nio.file.Files.write(p, mangled.getBytes("UTF-8"))
    intercept[IllegalStateException](Versioned.parseManifest(spark, dir, 1L))
    java.nio.file.Files.write(p, full.getBytes("UTF-8"))
  }

  test("createExclusive publishes content atomically on the local scheme") {
    val dir = Files.createTempDirectory("graft-atomic")
    val fs = new org.apache.hadoop.fs.Path(dir.toString)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(dir.toString, "m.json")
    assert(graft.sources.FsAtomic.createExclusive(fs, target, "{\"a\":1}"))
    assert(!graft.sources.FsAtomic.createExclusive(fs, target, "{\"b\":2}"))
    val back = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir.toString, "m.json")), "UTF-8")
    assert(back == "{\"a\":1}") // loser never clobbers the winner
    // no temp litter left behind
    assert(Files.list(dir).toArray.map(_.toString).forall(_.endsWith("m.json")))
  }

  test("manifests record per-group row counts; mutation planning reads no sidecars") {
    val dir = tbl()
    Versioned.commit((0L until 50L).toDF("id"), dir)
    Versioned.append((50L until 120L).toDF("id"), dir)
    val m = Versioned.parseManifest(spark, dir, 1L)
    assert(m.files.size == 2 && m.fileRows.keySet == m.files.toSet)
    assert(m.fileRows.values.sum == 120L)
    // scattered DV delete: row totals AND min/max bounds come from the
    // manifest (fileRows + fileStats), so mutation planning on a fresh
    // table reads ZERO sidecars — the former prune pass's one batched
    // read per group moved into the manifest too
    val before = graft.operators.GroupStats.readCount.get()
    val v = Versioned.delete(spark, dir)(col("id").isin(7L, 90L))
    val reads = graft.operators.GroupStats.readCount.get() - before
    assert(reads == 0L, s"expected zero sidecar reads, got $reads")
    val m2 = Versioned.parseManifest(spark, dir, v)
    assert(m2.fileRows.keySet == m2.files.toSet)
    assert(Versioned.read(spark, dir).count() == 118L)
    // PRE-UPGRADE manifests (no file_rows) still plan correctly via the
    // sidecar fallback, and the NEXT publish records the counts
    val p = java.nio.file.Paths.get(s"$dir/_versions/v$v.json")
    // v is a DELTA record now (counts fold from the parent chain), so
    // stripping one array is not enough — rewrite it in place as a
    // FULL record carrying neither file_rows nor file_stats, the exact
    // shape a pre-upgrade table's manifests have
    val m2full = graft.operators.Versioned.parseManifest(spark, dir, v)
    val asPreUpgrade =
      s"""{"version":$v,"mode":"${m2full.mode}","files":[${
        m2full.files.map("\"" + _ + "\"").mkString(",")}],""" +
        s""""n_rows":${m2full.nRows},"committed_at":"${m2full.committedAt}"""" +
        m2full.schemaDdl.map(d => s""","schema":"${d.replace("\\", "\\\\")
          .replace("\"", "\\\"")}"""").getOrElse("") +
        (if (m2full.dvs.isEmpty) "" else m2full.dvs
          .flatMap { case (g, a, c) => Seq(g, a, c.toString) }
          .map(s => "\"" + s + "\"")
          .mkString(""","dvs":[""", ",", "]")) + "}"
    java.nio.file.Files.write(p, asPreUpgrade.getBytes("UTF-8"))
    assert(Versioned.parseManifest(spark, dir, v).fileRows.isEmpty)
    val v2 = Versioned.delete(spark, dir)(col("id") === 8L)
    assert(Versioned.read(spark, dir).count() == 117L)
    val m3 = Versioned.parseManifest(spark, dir, v2)
    assert(m3.fileRows.keySet == m3.files.toSet, "upgrade re-records counts")
    assert(m3.nRows == 117L)
  }

  test("append shares parent file groups — only the batch is written") {
    val dir = tbl()
    Versioned.commit(spark.range(100).toDF("id"), dir)
    val before = new java.io.File(s"$dir/files").listFiles().map(_.getName).toSet
    Versioned.append(spark.range(100, 110).toDF("id"), dir)
    val after = new java.io.File(s"$dir/files").listFiles().map(_.getName).toSet
    assert(before.subsetOf(after) && after.size == before.size + 1,
      "append must add exactly one group and leave parent groups untouched")
    assert(Versioned.read(spark, dir, 1).count() == 110)
    // v0 is unaffected by the append — time travel reads the old manifest
    assert(Versioned.read(spark, dir, 0).count() == 100)
  }

  test("concurrent committers get distinct versions, both readable") {
    val dir = tbl()
    Versioned.commit(spark.range(5).toDF("id"), dir)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val threads = (0 until 2).map { i =>
      new Thread(() => results.add(
        Versioned.commit(spark.range(i * 100, i * 100 + 10).toDF("id"), dir)))
    }
    threads.foreach(_.start()); threads.foreach(_.join(60000))
    import scala.jdk.CollectionConverters._
    val vs = results.asScala.toSet
    assert(vs.size == 2 && vs.subsetOf(Set(1L, 2L)),
      s"concurrent commits must serialize to distinct versions, got $vs")
    vs.foreach(v => assert(Versioned.read(spark, dir, v).count() == 10))
  }

  test("diffVersions classifies row-level changes between versions") {
    val dir = tbl()
    Versioned.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    Versioned.commit(Seq((2L, "B"), (3L, "c")).toDF("id", "v"), dir)
    val d = Versioned.diffVersions(spark, dir, 0, 1, "id", Seq("v"))
    assertRows(d.select("id", "status"), Seq("id", "status"),
      Set(Seq(1L, "removed"), Seq(2L, "changed"), Seq(3L, "added")))
  }

  test("vacuum drops only groups no kept version references") {
    val dir = tbl()
    Versioned.commit(spark.range(10).toDF("id"), dir)   // v0: group A
    Versioned.append(spark.range(10, 15).toDF("id"), dir) // v1: A + B
    Versioned.append(spark.range(15, 18).toDF("id"), dir) // v2: A + B + C
    val (droppedV, deletedG) = Versioned.vacuum(spark, dir, keepFrom = 1)
    // v0's manifest goes, but its group is SHARED by v1/v2 — nothing deleted.
    assert((droppedV, deletedG) == (1L, 0L))
    assert(Versioned.read(spark, dir, 1).count() == 15)
    assert(Versioned.read(spark, dir, 2).count() == 18)
    intercept[Exception] { Versioned.read(spark, dir, 0) }

    // A REWRITE's abandoned groups do get deleted once unreferenced.
    val dir2 = tbl()
    Versioned.commit(spark.range(10).toDF("id"), dir2)  // v0: group A
    Versioned.commit(spark.range(3).toDF("id"), dir2)   // v1: group B (rewrite)
    val (dv2, dg2) = Versioned.vacuum(spark, dir2, keepFrom = 1)
    assert((dv2, dg2) == (1L, 1L))
    assert(Versioned.read(spark, dir2, 1).count() == 3)
    assert(new java.io.File(s"$dir2/files").listFiles().length == 1)
  }

  test("historical reads keep filter pushdown and column pruning") {
    val dir = tbl()
    Versioned.commit(
      spark.range(1000).toDF("id").withColumn("payload", concat(lit("p"), col("id"))),
      dir)
    Versioned.append(
      spark.range(1000, 2000).toDF("id").withColumn("payload", concat(lit("p"), col("id"))),
      dir)
    val q = Versioned.read(spark, dir, 1).filter(col("id") === 1500L).select("id")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("EqualTo(id,1500)"),
      s"filter not pushed to the versioned scan:\n$p")
    val leaves = q.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(!leaves.contains("payload"), s"column pruning lost:\n$leaves")
    assert(q.count() == 1)
  }

  test("job-config versioned ops: path-only, parquet-only, append drift-checked") {
    import graft.operators.EtlJob
    import graft.spec.JobConfigException
    val dir = tbl()
    def yaml(op: String, target: String, q: String, ds: String = "parquet") =
      s"""version: 0
         |source:
         |  query: $q
         |target:
         |  datasource: $ds
         |  $target
         |  operation: $op
         |""".stripMargin
    // table target refused, named
    val e1 = intercept[JobConfigException] {
      EtlJob.fromYaml(yaml("versioned_snapshot", "table: some_tbl", "SELECT 1 AS a")).run()
    }
    assert(e1.getMessage.contains("path"), e1.getMessage)
    // non-parquet datasource refused
    val e2 = intercept[JobConfigException] {
      EtlJob.fromYaml(yaml("versioned_append", s"path: $dir", "SELECT 1 AS a", ds = "csv")).run()
    }
    assert(e2.getMessage.contains("parquet"), e2.getMessage)
    // snapshot then append works; a drifted append is refused plan-time
    EtlJob.fromYaml(yaml("versioned_snapshot", s"path: $dir", "SELECT 1 AS a, 'x' AS b")).run()
    EtlJob.fromYaml(yaml("versioned_append", s"path: $dir", "SELECT 2 AS a, 'y' AS b")).run()
    assert(Versioned.read(spark, dir, 1).count() == 2)
    val e3 = intercept[JobConfigException] {
      EtlJob.fromYaml(yaml("versioned_append", s"path: $dir", "SELECT 3 AS a")).run()
    }
    assert(e3.getMessage.contains("b"), e3.getMessage)
    assert(Versioned.latestVersion(spark, dir) == 1L, "refused append must not commit")

    // evolve_schema: true accepts the drift — the NEW column extends the
    // manifest schema and prior rows null-fill it.
    EtlJob.fromYaml(
      s"""version: 0
         |source:
         |  query: SELECT 4 AS a, 'z' AS b, 9.5 AS c
         |target:
         |  datasource: parquet
         |  path: $dir
         |  operation: versioned_append
         |  evolve_schema: true
         |""".stripMargin).run()
    val evolved = Versioned.read(spark, dir)
    assert(evolved.columns.toSeq == Seq("a", "b", "c"))
    assert(evolved.filter(col("c").isNull).count() == 2)
    // ... but only on versioned_append: anywhere else the flag is config error
    val e4 = intercept[JobConfigException] {
      EtlJob.fromYaml(
        s"""version: 0
           |source:
           |  query: SELECT 1 AS a
           |target:
           |  datasource: parquet
           |  path: ${dir}_plain
           |  operation: append
           |  evolve_schema: true
           |""".stripMargin)
    }
    assert(e4.getMessage.contains("versioned_append"), e4.getMessage)
  }

  test("curate: strike writes a new version, parent stays intact (rollback shape)") {
    val dir = tbl()
    // corpus with a planted containment: doc 100 is an excerpt of doc 1
    val base = (0L until 40L).map { i =>
      (i, (1 to 60).map(j => s"w${i}_$j").mkString(" "))
    }
    val excerpt = Seq((100L, base(1)._2.split(" ").take(40).mkString(" ")))
    Versioned.commit((base ++ excerpt).toDF("doc_id", "text"), dir)
    val v1 = Versioned.curate(spark, dir) { cur =>
      val pairs = graft.operators.Dedup.containmentPairs(cur, "text", "doc_id",
        maxDf = 100, minFp = 5, minContain = 0.8)
      graft.operators.Dedup.containmentStrike(cur, "doc_id", pairs)
    }
    assert(v1 == 1L)
    // the excerpt is struck in v1...
    val v1Ids = Versioned.read(spark, dir, 1).select("doc_id").as[Long].collect().toSet
    assert(!v1Ids.contains(100L), "contained excerpt must be struck in the new version")
    assert(v1Ids.contains(1L), "the containing doc must survive")
    // ...while v0 still has the full pre-strike corpus — the rollback read
    val v0Ids = Versioned.read(spark, dir, 0).select("doc_id").as[Long].collect().toSet
    assert(v0Ids.contains(100L) && v0Ids.size == 41)
    // history shows both as snapshots
    assertRows(Versioned.versions(spark, dir), Seq("version", "n_rows"),
      Set(Seq(0L, 41L), Seq(1L, v1Ids.size.toLong)))
  }

  test("describeHistory: audit rows with commit instants; vacuum flips readable") {
    val dir = tbl()
    Versioned.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    Versioned.append(Seq((3L, "c")).toDF("id", "v"), dir)
    Versioned.commit(Seq((9L, "z")).toDF("id", "v"), dir)
    val h = Versioned.describeHistory(spark, dir).orderBy("version").collect()
    assert(h.map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((0L, "snapshot", 2L, 1L), (1L, "append", 3L, 2L), (2L, "snapshot", 1L, 1L)))
    // commit instants recorded and ISO-8601-shaped, nondecreasing
    val ats = h.map(_.getString(4))
    assert(ats.forall(_.matches("""\d{4}-\d{2}-\d{2}T.*Z""")), ats.mkString(","))
    assert(ats.sorted.toSeq == ats.toSeq, "commit instants must be nondecreasing")
    assert(h.forall(_.getBoolean(5)), "all versions readable before vacuum")
    // vacuum v0: its manifest goes (history follows retention), v1 keeps
    // the shared group so it stays fully readable
    Versioned.vacuum(spark, dir, keepFrom = 1L)
    val after = Versioned.describeHistory(spark, dir).orderBy("version").collect()
    assert(after.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(after.forall(_.getBoolean(5)))
  }

  test("reading an uncommitted version or empty table fails loudly") {
    val dir = tbl()
    intercept[IllegalArgumentException] { Versioned.read(spark, dir) }
    Versioned.commit(Seq((1L, "a")).toDF("id", "v"), dir)
    intercept[Exception] { Versioned.read(spark, dir, 7) }
  }

  test("changes: appended rows only, scan never touches the base version's files") {
    val dir = tbl()
    Versioned.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    Versioned.append(Seq((3L, "c"), (4L, "d")).toDF("id", "v"), dir)
    Versioned.append(Seq((3L, "c2")).toDF("id", "v"), dir) // dup id: kept, CDC is row-grain
    val chg = Versioned.changes(spark, dir, fromVersion = 0L)
    assert(chg.orderBy("id", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((3L, "c"), (3L, "c2"), (4L, "d")))
    // metadata-only planning: v0's file group is NOT in the scan
    val v0Files = Versioned.read(spark, dir, 0L).inputFiles.toSet
    assert(v0Files.nonEmpty && chg.inputFiles.toSet.intersect(v0Files).isEmpty,
      "changes() must read only the appended groups")
    // partial range: (1, 2] is just the second append
    assert(Versioned.changes(spark, dir, 1L, 2L).collect().map(_.getString(1)).toSeq ==
      Seq("c2"))
    // empty range: (2, 2] has no added groups
    assert(Versioned.changes(spark, dir, 2L).isEmpty)
  }

  test("compact: rows identical, one group, history intact, vacuum reclaims") {
    val dir = tbl()
    Versioned.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    Versioned.append(Seq((3L, "c")).toDF("id", "v"), dir)
    Versioned.append(Seq((4L, "d"), (4L, "d2")).toDF("id", "v"), dir)
    val parent = Versioned.read(spark, dir).orderBy("id", "v").collect().toSeq
    val newV = Versioned.compact(spark, dir)
    assert(newV == 3L)
    // row-identical (duplicates preserved — compaction is layout-only)
    assert(Versioned.read(spark, dir, newV).orderBy("id", "v").collect().toSeq == parent)
    val h = Versioned.describeHistory(spark, dir).orderBy("version").collect()
    assert(h.map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSeq ==
      Seq((0L, "snapshot", 1L), (1L, "append", 2L), (2L, "append", 3L),
        (3L, "optimize", 1L)),
      "compacted version must be a 1-group 'optimize' commit")
    // pre-compaction versions still read their own groups
    assert(Versioned.read(spark, dir, 2L).count() == 5)
    assert(Versioned.read(spark, dir, 0L).count() == 2)
    // vacuum to the compacted version reclaims every superseded group
    Versioned.vacuum(spark, dir, keepFrom = newV)
    assert(Versioned.read(spark, dir, newV).orderBy("id", "v").collect().toSeq == parent)
    val after = Versioned.describeHistory(spark, dir).collect()
    assert(after.map(_.getLong(0)).toSeq == Seq(newV) && after.head.getBoolean(5))
  }

  test("compact: targetFileBytes splits large versions into multiple files") {
    val dir = tbl()
    Versioned.commit(spark.range(20000).selectExpr("id", "repeat('x', 64) AS v"), dir)
    Versioned.compact(spark, dir, targetFileBytes = 64 * 1024)
    val files = Versioned.read(spark, dir).inputFiles
    assert(files.length > 1, s"expected a multi-file compaction, got ${files.length}")
    assert(Versioned.read(spark, dir).count() == 20000)
  }

  test("vacuumOlderThan: drops strictly-older versions, always keeps the latest") {
    val dir = tbl()
    Versioned.commit(Seq((1L, "a")).toDF("id", "v"), dir)
    Thread.sleep(15)
    val mid = java.time.Instant.now()
    Thread.sleep(15)
    Versioned.append(Seq((2L, "b")).toDF("id", "v"), dir)
    Versioned.append(Seq((3L, "c")).toDF("id", "v"), dir)
    // cutoff between v0 and v1: v0 drops, v1+v2 keep (v1's shared group
    // with v0 survives through the reference)
    val (dv, _) = Versioned.vacuumOlderThan(spark, dir, mid)
    assert(dv == 1L)
    assert(Versioned.describeHistory(spark, dir).collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 2L))
    assert(Versioned.read(spark, dir, 1L).count() == 2)
    // cutoff after everything: ONLY the latest survives
    val (dv2, _) = Versioned.vacuumOlderThan(spark, dir, java.time.Instant.now())
    assert(dv2 == 1L)
    assert(Versioned.describeHistory(spark, dir).collect().map(_.getLong(0)).toSeq ==
      Seq(2L))
    assert(Versioned.read(spark, dir).orderBy("id").collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 2L, 3L), "latest must stay fully readable after full expiry")
  }

  test("pollChanges: append windows serve deltas; snapshots and vacuumed cursors resync") {
    val dir = tbl()
    Versioned.commit(Seq((1L, "a")).toDF("id", "v"), dir)
    Versioned.append(Seq((2L, "b")).toDF("id", "v"), dir)
    val (d1, c1, r1) = Versioned.pollChanges(spark, dir, 0L)
    assert(!r1 && c1 == 1L &&
      d1.collect().map(_.getString(1)).toSeq == Seq("b"))
    // caught up: empty frame, cursor unchanged
    val (d2, c2, r2) = Versioned.pollChanges(spark, dir, c1)
    assert(!r2 && c2 == 1L && d2.isEmpty)
    // a snapshot intervenes: full resync
    Versioned.commit(Seq((9L, "z")).toDF("id", "v"), dir)
    val (d3, c3, r3) = Versioned.pollChanges(spark, dir, c2)
    assert(r3 && c3 == 2L && d3.collect().map(_.getString(1)).toSeq == Seq("z"))
    // cursor predating retention: resync too
    Versioned.append(Seq((10L, "y")).toDF("id", "v"), dir)
    Versioned.vacuum(spark, dir, keepFrom = 3L)
    val (d4, _, r4) = Versioned.pollChanges(spark, dir, 1L)
    assert(r4 && d4.count() == 2L, "vacuumed-away cursor must hand back the full latest")
  }

  test("changesStream tails an append-only table: each group exactly once across restarts") {
    val dir = tbl()
    Versioned.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    Versioned.append(Seq((3L, "c")).toDF("id", "v"), dir)
    val schema = Versioned.read(spark, dir).schema
    val scratch = Files.createTempDirectory("graft-vstream")
    val sink = scratch.resolve("sink").toString
    val ckpt = scratch.resolve("ckpt").toString
    def drain(): Unit = {
      val q = Versioned.changesStream(spark, dir, schema)
        .writeStream.format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain() // genesis: both existing groups
    assert(spark.read.parquet(sink).orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    Versioned.append(Seq((4L, "d")).toDF("id", "v"), dir)
    Versioned.append(Seq((5L, "e")).toDF("id", "v"), dir)
    drain() // restart from the checkpoint: ONLY the two new groups
    assert(spark.read.parquet(sink).orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")),
      "each appended group must be emitted exactly once")
  }

  test("changesStream: a mid-stream compact FAILS the query and never re-emits") {
    val dir = tbl()
    Versioned.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    Versioned.append(Seq((3L, "c")).toDF("id", "v"), dir)
    val schema = Versioned.read(spark, dir).schema
    val scratch = Files.createTempDirectory("graft-vstream-guard")
    val sink = scratch.resolve("sink").toString
    val ckpt = scratch.resolve("ckpt").toString
    def drain(): Unit = {
      val q = Versioned.changesStream(spark, dir, schema)
        .writeStream.format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain() // genesis + one append
    assert(spark.read.parquet(sink).count() == 3)
    // the rewrite: a compact re-packs all 3 rows into a NEW group
    Versioned.compact(spark, dir)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain()
    }
    assert(e.getMessage.contains("not an append") ||
      Option(e.getCause).exists(_.getMessage.contains("not an append")),
      s"the guard must name the violation: ${e.getMessage}")
    // NO re-emission into the checkpointed sink — not even from the
    // batch that raced the failure (the exclusion join holds it back)
    assert(spark.read.parquet(sink).count() == 3,
      "the compact group's rows must never re-emit")
    // a NEW consumer of the compacted table fails at start too (the
    // historical rewrite makes file-group tailing unsound from genesis
    // once the superseded groups can be vacuumed)
    val ckpt2 = scratch.resolve("ckpt2").toString
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = Versioned.changesStream(spark, dir, schema)
        .writeStream.format("parquet")
        .option("path", scratch.resolve("sink2").toString)
        .option("checkpointLocation", ckpt2)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
  }

  test("changes: crossing a snapshot boundary raises; bad ranges raise") {
    val dir = tbl()
    Versioned.commit(Seq((1L, "a")).toDF("id", "v"), dir)
    Versioned.append(Seq((2L, "b")).toDF("id", "v"), dir)
    Versioned.commit(Seq((9L, "z")).toDF("id", "v"), dir) // rewrite at v2
    val e = intercept[IllegalArgumentException] {
      Versioned.changes(spark, dir, 0L)
    }
    assert(e.getMessage.contains("rewrite"))
    // an all-append subrange before the snapshot still works
    assert(Versioned.changes(spark, dir, 0L, 1L).collect().map(_.getString(1)).toSeq ==
      Seq("b"))
    intercept[IllegalArgumentException] { Versioned.changes(spark, dir, 3L, 1L) }
  }
}
