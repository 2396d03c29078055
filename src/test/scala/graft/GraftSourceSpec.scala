package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.operators.Versioned

/** The `format("graft")` datasource over versioned tables: reads
  * (latest + versionAsOf time travel), SaveMode writes mapping onto
  * commit modes, SQL DDL/DML (`CREATE TABLE USING graft`, INSERT
  * INTO/OVERWRITE), and the advisory filter→group-skipping translation
  * (which must never wrong a result, translated or not). */
class GraftSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tbl() = Files.createTempDirectory("graft-dsrc").toString + "/t"

  private def rows(lo: Long, hi: Long, tag: String) =
    (lo until hi).map(i => (i, tag, i * 1.5)).toDF("id", "tag", "x")

  test("write modes map onto commit modes; reads round-trip; versionAsOf time travel") {
    val dir = tbl()
    rows(0, 100, "a").write.format("graft").mode(SaveMode.ErrorIfExists).save(dir)
    rows(100, 150, "b").write.format("graft").mode(SaveMode.Append).save(dir)
    assert(Versioned.versions(spark, dir).select("mode").as[String].collect().toSeq
      == Seq("snapshot", "append"))

    val latest = spark.read.format("graft").load(dir)
    assert(latest.count() == 150L)
    assert(latest.schema.fieldNames.toSeq == Seq("id", "tag", "x"))
    val v0 = spark.read.format("graft").option("versionAsOf", 0).load(dir)
    assert(v0.count() == 100L)
    assert(v0.filter(col("tag") === "b").count() == 0L)

    // Overwrite = snapshot; history intact underneath.
    rows(0, 10, "c").write.format("graft").mode(SaveMode.Overwrite).save(dir)
    assert(spark.read.format("graft").load(dir).count() == 10L)
    assert(spark.read.format("graft").option("versionAsOf", 1).load(dir).count() == 150L)

    // ErrorIfExists on an existing table raises; Ignore is a no-op.
    intercept[IllegalStateException] {
      rows(0, 1, "x").write.format("graft").mode(SaveMode.ErrorIfExists).save(dir)
    }
    rows(0, 1, "x").write.format("graft").mode(SaveMode.Ignore).save(dir)
    assert(spark.read.format("graft").load(dir).count() == 10L)

    // Schema evolution through the writer: refused by default, opt-in
    // via option("evolveSchema", "true"); old rows null-fill.
    val extra = Seq((500L, "e", 1.0, true)).toDF("id", "tag", "x", "flag")
    intercept[IllegalArgumentException] {
      extra.write.format("graft").mode(SaveMode.Append).save(dir)
    }
    extra.write.format("graft").mode(SaveMode.Append)
      .option("evolveSchema", "true").save(dir)
    val evolved = spark.read.format("graft").load(dir)
    assert(evolved.columns.toSeq == Seq("id", "tag", "x", "flag"))
    assert(evolved.filter(col("flag").isNull).count() == 10L)
  }

  test("filters and projections: every shape equals the library read, translated or not") {
    val dir = tbl()
    rows(0, 200, "a").write.format("graft").mode(SaveMode.Overwrite).save(dir)
    rows(200, 400, "b").write.format("graft").mode(SaveMode.Append).save(dir)
    val ds = spark.read.format("graft").load(dir)
    val lib = Versioned.read(spark, dir)
    val predicates = Seq(
      col("id").between(150, 250),                      // spans both groups
      col("id") < 100 || col("tag") === "b",            // Or
      !(col("tag") === "a"),                             // Not
      col("tag").startsWith("b") && col("x") > 350.0,    // startsWith + And
      col("id").isin(1L, 199L, 200L, 399L),              // In
      length(col("tag")) === 1 && col("id") % 3 === 0,   // untranslatable parts
      col("x").isNotNull && !(col("id") <= 5 && col("tag") =!= "q")) // Not(And)
    predicates.foreach { p =>
      val got = ds.filter(p).agg(count(lit(1)), coalesce(sum("id"), lit(0L))).collect()(0)
      val want = lib.filter(p).agg(count(lit(1)), coalesce(sum("id"), lit(0L))).collect()(0)
      assert(got == want, s"predicate $p drifted: ds=$got lib=$want")
    }
    // Projection pruning + 0-column scans (count star).
    assert(ds.select("tag").distinct().as[String].collect().sorted.toSeq == Seq("a", "b"))
    assert(ds.count() == 400L)
  }

  test("SQL surface: CREATE TABLE USING graft, SELECT, INSERT INTO, INSERT OVERWRITE") {
    val dir = tbl()
    rows(0, 50, "a").write.format("graft").mode(SaveMode.Overwrite).save(dir)
    sql("DROP TABLE IF EXISTS graft_src_t")
    sql(s"CREATE TABLE graft_src_t USING graft OPTIONS (path '$dir')")
    assert(sql("SELECT count(*) AS n, sum(id) AS s FROM graft_src_t")
      .as[(Long, Long)].collect()(0) == ((50L, (0L until 50L).sum)))

    sql("INSERT INTO graft_src_t SELECT id + 1000, 'z', 0.0 FROM graft_src_t WHERE id < 5")
    assert(Versioned.versions(spark, dir).count() == 2L)
    assert(sql("SELECT count(*) FROM graft_src_t").as[Long].collect()(0) == 55L)

    sql("INSERT OVERWRITE graft_src_t SELECT id, tag, x FROM graft_src_t WHERE tag = 'z'")
    assert(sql("SELECT count(*) FROM graft_src_t").as[Long].collect()(0) == 5L)
    // History under the SQL table: the pre-overwrite version still reads.
    assert(spark.read.format("graft").option("versionAsOf", 1).load(dir).count() == 55L)
    sql("DROP TABLE graft_src_t")
  }

  test("pushed filters on a RENAMED column still drive group skipping through the datasource") {
    // Column mapping: rename is metadata-only, groups store PHYSICAL
    // names. A pushed filter arrives at buildScan under the LOGICAL
    // name; skipping must still prune via the stats sidecars (which
    // speak physical names). Observable: records actually read.
    val dir = tbl()
    rows(0, 100, "a").write.format("graft").mode(SaveMode.Overwrite).save(dir)
    rows(100, 200, "b").write.format("graft").mode(SaveMode.Append).save(dir)
    Versioned.renameColumn(spark, dir, "tag", "label")
    Versioned.renameColumn(spark, dir, "id", "key")
    val records = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          records.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val ds = spark.read.format("graft").load(dir)
      assert(ds.schema.fieldNames.toSeq == Seq("key", "label", "x"))
      // filter on two renamed columns: only the 'b' group may be read
      val got = ds.filter(col("label") === "b" && col("key") >= 150)
        .agg(count(lit(1)), sum("key")).as[(Long, Long)].collect()(0)
      assert(got == ((50L, (150L until 200L).sum)))
      Thread.sleep(1000) // listener events post asynchronously
      // group skipping caps the read at the 'b' group's 100 rows;
      // parquet's own pushed row-group filtering may prune further
      assert(records.get() > 0 && records.get() <= 100L,
        s"the 'a' group must be SKIPPED, not scanned: read ${records.get()} rows")
      // contrast: an un-prunable read pays both groups
      records.set(0)
      assert(ds.count() == 200L)
      Thread.sleep(1000)
      assert(records.get() == 200L)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("missing path or empty table raise with clear messages") {
    intercept[IllegalArgumentException] {
      spark.read.format("graft").options(Map.empty[String, String]).load()
    }
    intercept[IllegalArgumentException] {
      spark.read.format("graft").load(tbl()) // no versions committed
    }
  }
}
