package graft

import java.nio.file.Files

class RunJobSpec extends SparkSpec {

  private def write(yaml: String): String = {
    val f = Files.createTempFile("graft-cli", ".yml")
    Files.writeString(f, yaml)
    f.toString
  }

  test("CLI runs an ETL job config with k=v params") {
    val out = Files.createTempDirectory("graft-cli-out").toString + "/nation"
    val cfg = write(
      s"""version: 0
         |source:
         |  query: SELECT n_nationkey, n_name FROM parquet.`$${sf}/nation.parquet`
         |target:
         |  path: $out
         |  operation: overwrite
         |""".stripMargin)
    RunJob.main(Array(cfg, "sf=/root/testdata/sf0.001"))
    assert(spark.read.parquet(out).count() == 25)
  }

  test("CLI sniffs and runs a recon config") {
    val cfg = write(
      """version: 0
        |group_by: [o_orderstatus]
        |data:
        |  - name: a
        |    query: SELECT * FROM parquet.`/root/testdata/sf0.001/orders.parquet`
        |    metrics:
        |      - total: round(sum(o_totalprice), 2)
        |      - n: count(*)
        |  - name: b
        |    query: SELECT * FROM parquet.`/root/testdata/sf0.001/orders.parquet`
        |    metrics:
        |      - total: round(sum(o_totalprice), 2)
        |      - n: count(*)
        |""".stripMargin)
    RunJob.main(Array(cfg)) // self-recon: must not throw
  }

  test("CLI rejects malformed parameters and missing substitutions") {
    val cfg = write(
      """version: 0
        |source:
        |  query: SELECT 1 FROM parquet.`${missing}/nation.parquet`
        |target: {path: /tmp/none, operation: append}
        |""".stripMargin)
    intercept[graft.spec.JobConfigException](RunJob.main(Array(cfg)))
    intercept[IllegalArgumentException](RunJob.main(Array(cfg, "not-a-pair")))
  }
}
