package graft

import org.apache.spark.sql.functions._

import graft.operators.{EtlJob, Writes}
import graft.sources.{DataSource, PathRef}
import graft.spec.JobConfigException

/** CSV/JSON path datasources: factory resolution, format-honoring writes
  * through the ETL job surface, schema-inferred reads, and the merge
  * rejection for non-parquet path targets. */
class FileFormatSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$name").toString + "/out"

  test("factory resolves csv and json; unknown formats still rejected") {
    assert(DataSource("csv").pathFormat == "csv")
    assert(DataSource("JSON").pathFormat == "json")
    assert(DataSource("parquet").pathFormat == "parquet")
    assert(DataSource("orc").pathFormat == "orc")
    intercept[IllegalArgumentException](DataSource("avro"))
    // self-describing formats reject a declared schema rather than
    // silently ignoring it
    intercept[IllegalArgumentException](DataSource("orc", Some("a INT")))
  }

  test("overwrite job to an orc path target round-trips losslessly, exact types") {
    val out = tmpDir("orc_rt")
    Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "b", 3.25))
      .toDF("k", "cat", "v").createOrReplaceTempView("__orc_rt_src")
    EtlJob.fromYaml(
      s"""version: 0
         |source:
         |  query: SELECT * FROM __orc_rt_src
         |target:
         |  datasource: orc
         |  path: $out
         |  operation: overwrite
         |""".stripMargin).run()
    val back = DataSource("orc").readPath(out)
    // unlike csv, orc carries the schema in file footers: types come
    // back EXACTLY, with no inference pass
    assert(back.schema.map(f => (f.name, f.dataType.typeName)) ==
      Seq(("k", "long"), ("cat", "string"), ("v", "double")))
    assertRows(back, Seq("k", "cat", "v"),
      Set(Seq[Any](1L, "a", 1.5), Seq[Any](2L, "b", 2.5), Seq[Any](3L, "b", 3.25)))
  }

  test("overwrite job to a csv path target round-trips through the csv reader") {
    val out = tmpDir("csv_rt")
    Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "b", 3.25))
      .toDF("k", "cat", "v").createOrReplaceTempView("__csv_rt_src")
    EtlJob.fromYaml(
      s"""version: 0
         |source:
         |  query: SELECT * FROM __csv_rt_src
         |target:
         |  datasource: csv
         |  path: $out
         |  operation: overwrite
         |""".stripMargin).run()
    // header row written, schema inferred on the way back
    val back = DataSource("csv").readPath(out)
    assert(back.columns.toSeq == Seq("k", "cat", "v"))
    assert(back.schema("k").dataType.typeName == "integer" ||
      back.schema("k").dataType.typeName == "long")
    assertRows(back, Seq("k", "cat", "v"),
      Set(Seq(1, "a", 1.5), Seq(2, "b", 2.5), Seq(3, "b", 3.25))
        .map(r => Seq[Any](r(0).asInstanceOf[Int].toLong, r(1), r(2))))
  }

  test("append job to a json path target accumulates records") {
    val out = tmpDir("json_app")
    Seq((1L, "x")).toDF("k", "s").createOrReplaceTempView("__json_src")
    val yaml =
      s"""version: 0
         |source:
         |  query: SELECT * FROM __json_src
         |target:
         |  datasource: json
         |  path: $out
         |  operation: append
         |""".stripMargin
    EtlJob.fromYaml(yaml).run()
    EtlJob.fromYaml(yaml).run()
    val back = DataSource("json").readPath(out)
    assert(back.count() == 2)
    assert(back.select("s").distinct().collect().map(_.getString(0)).toSeq == Seq("x"))
  }

  test("declared schema: csv read plans with ZERO Spark jobs (no inference pass)") {
    val out = tmpDir("csv_decl")
    Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("k", "cat", "v")
      .write.option("header", "true").csv(out)
    val ddl = "k BIGINT, cat STRING, v DOUBLE"
    // count jobs triggered between plan construction and schema access:
    // with inferSchema a full pass runs here; with a declared schema the
    // plan is metadata-only
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        counter.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val declared = DataSource("csv", Some(ddl)).readPath(out)
      val schema = declared.schema
      Thread.sleep(1000) // listener events are posted asynchronously
      assert(counter.get() == 0,
        s"declared-schema read must not run an inference job, ran ${counter.get()}")
      assert(schema.toDDL.toLowerCase.contains("k bigint"))
      // and the inferred flavor DOES pay a pass (the contrast that makes
      // the zero-job assertion meaningful)
      DataSource("csv").readPath(out).schema
      Thread.sleep(1000)
      assert(counter.get() > 0, "inferred read should have run an inference job")
      // values identical either way
      assertRows(declared, Seq("k", "cat", "v"),
        Set(Seq[Any](1L, "a", 1.5), Seq[Any](2L, "b", 2.5)))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("declared schema: ETL spec `schema:` validates at plan time; misuse rejected") {
    val out = tmpDir("csv_decl_job")
    Seq((1L, "x")).toDF("k", "s").createOrReplaceTempView("__csv_decl_src")
    // matching declared schema: job runs, read back with no inference
    EtlJob.fromYaml(
      s"""version: 0
         |source:
         |  query: SELECT * FROM __csv_decl_src
         |target:
         |  datasource: csv
         |  path: $out
         |  schema: "k BIGINT, s STRING"
         |  operation: overwrite
         |""".stripMargin).run()
    assert(DataSource("csv", Some("k BIGINT, s STRING")).readPath(out)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "x")))
    // source column set drifting from the declared contract fails at
    // PLAN time with the column named, before any write
    val drift = intercept[JobConfigException] {
      EtlJob.fromYaml(
        s"""version: 0
           |source:
           |  query: SELECT 1 AS k, 'y' AS s, 2.0 AS extra
           |target:
           |  datasource: csv
           |  path: $out
           |  schema: "k BIGINT, s STRING"
           |  operation: overwrite
           |""".stripMargin).run()
    }
    assert(drift.getMessage.contains("extra"), drift.getMessage)
    // schema on a catalog-table target is a config error
    intercept[JobConfigException] {
      EtlJob.fromYaml(
        """version: 0
          |source:
          |  query: SELECT 1 AS k
          |target:
          |  table: some_table
          |  schema: "k BIGINT"
          |  operation: overwrite
          |""".stripMargin)
    }
    // self-describing formats reject a declared schema; bad DDL named
    intercept[IllegalArgumentException](DataSource("parquet", Some("k BIGINT")))
    val bad = intercept[IllegalArgumentException](
      DataSource("csv", Some("k NOT_A_TYPE banana")).readPath(out))
    assert(bad.getMessage.contains("invalid schema DDL"))
  }

  test("update/upsert to a csv path target is rejected cleanly") {
    val out = tmpDir("csv_merge")
    val df = Seq((1L, 1.0)).toDF("k", "v")
    Writes.overwrite(df, PathRef(out), DataSource("csv"))
    val e = intercept[JobConfigException] {
      Writes.merge(df, PathRef(out), DataSource("csv"), Seq("k"), Seq("v"),
        baseCondition = "1=1", insertWhenNotMatched = false)
    }
    assert(e.getMessage.contains("parquet path target"))
  }

  test("csv merge target rejected at PLAN time, before the target pre-sql hook runs") {
    val out = tmpDir("csv_merge_plan")
    Seq((1L, 1.0)).toDF("k", "v").createOrReplaceTempView("__csv_merge_src")
    Writes.overwrite(spark.table("__csv_merge_src"), PathRef(out), DataSource("csv"))
    sql("DROP TABLE IF EXISTS csv_merge_canary")
    val e = intercept[JobConfigException] {
      EtlJob.fromYaml(
        s"""version: 0
           |source:
           |  query: SELECT * FROM __csv_merge_src
           |target:
           |  datasource: csv
           |  path: $out
           |  operation: update
           |  primary_key_column: k
           |  update_column: v
           |  pre_sql: CREATE TABLE csv_merge_canary (x INT) USING parquet
           |""".stripMargin).run()
    }
    assert(e.getMessage.contains("parquet path target"))
    assert(!spark.catalog.tableExists("csv_merge_canary"),
      "validation must fire before the target pre-sql side effect")
  }
}
