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
    intercept[IllegalArgumentException](DataSource("avro"))
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
