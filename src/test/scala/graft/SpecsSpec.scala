package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.spec._

/** Pure spec-layer tests — no Spark session involved. */
class SpecsSpec extends AnyFunSuite {

  private def minimal(op: String = "append") =
    s"""version: 0
       |source:
       |  query: SELECT 1 AS x
       |target:
       |  path: /tmp/t
       |  operation: $op
       |""".stripMargin

  test("${param} substitution replaces all occurrences") {
    val spec = JobSpec.fromString(
      """version: 0
        |source:
        |  query: SELECT * FROM ${tbl} WHERE d = '${day}'
        |target:
        |  path: /tmp/${tbl}
        |  operation: append
        |""".stripMargin, Map("tbl" -> "orders", "day" -> "2024-01-01"))
    assert(spec.source.query.contains("SELECT * FROM orders WHERE d = '2024-01-01'"))
    assert(spec.target.path.contains("/tmp/orders"))
  }

  test("missing parameters fail with the missing names") {
    val e = intercept[JobConfigException] {
      JobSpec.fromString(minimal().replace("SELECT 1 AS x", "SELECT ${a}, ${b}"), Map.empty)
    }
    assert(e.getMessage.contains("a") && e.getMessage.contains("b"))
  }

  test("top-level keys are lowercased; operation dispatch is case-insensitive") {
    val spec = JobSpec.fromString(
      """version: 0
        |SOURCE:
        |  query: SELECT 1 AS x
        |TARGET:
        |  path: /tmp/t
        |  operation: UPSERT
        |  primary_key_column: [x]
        |  update_column: [x]
        |""".stripMargin)
    assert(spec.target.operation == Operation.Upsert)
  }

  test("insert is a strict alias of append") {
    assert(JobSpec.fromString(minimal("insert")).target.operation == Operation.Append)
    assert(JobSpec.fromString(minimal("INSERT")).target.operation == Operation.Append)
  }

  test("unknown operation is rejected") {
    val e = intercept[JobConfigException](JobSpec.fromString(minimal("replace")))
    assert(e.getMessage.toLowerCase.contains("operation"))
  }

  test("target requires exactly one of table|path") {
    intercept[JobConfigException] {
      JobSpec.fromString(
        """version: 0
          |source: {query: SELECT 1}
          |target: {operation: append}
          |""".stripMargin)
    }
    intercept[JobConfigException] {
      JobSpec.fromString(
        """version: 0
          |source: {query: SELECT 1}
          |target: {table: t, path: /tmp/t, operation: append}
          |""".stripMargin)
    }
  }

  test("update/upsert require primary_key_column and update_column") {
    intercept[JobConfigException](JobSpec.fromString(minimal("update")))
    intercept[JobConfigException] {
      JobSpec.fromString(
        minimal("upsert") + "  primary_key_column: [x]\n")
    }
  }

  test("versioned_merge requires primary_key_column and rejects update_column") {
    intercept[JobConfigException](JobSpec.fromString(minimal("versioned_merge")))
    val ok = JobSpec.fromString(
      minimal("versioned_merge") + "  primary_key_column: [x]\n")
    assert(ok.target.operation == Operation.VersionedMerge)
    val e = intercept[JobConfigException] {
      JobSpec.fromString(minimal("versioned_merge") +
        "  primary_key_column: [x]\n  update_column: [y]\n")
    }
    assert(e.getMessage.contains("whole rows"))
  }

  test("target/recon `schema:` parses; path-only constraint enforced") {
    val spec = JobSpec.fromString(
      """version: 0
        |source: {query: SELECT 1 AS k}
        |target:
        |  path: /tmp/t
        |  datasource: csv
        |  schema: "k BIGINT, s STRING"
        |  operation: overwrite
        |""".stripMargin)
    assert(spec.target.schema.contains("k BIGINT, s STRING"))
    intercept[JobConfigException] {
      JobSpec.fromString(
        """version: 0
          |source: {query: SELECT 1 AS k}
          |target: {table: t, schema: "k BIGINT", operation: append}
          |""".stripMargin)
    }
    val recon = ReconSpec.fromString(
      """version: 0
        |group_by: [g]
        |data:
        |  - name: a
        |    datasource: csv
        |    path: /tmp/a.csv
        |    schema: "g STRING, v DOUBLE"
        |    metrics:
        |      - n: count(*)
        |  - name: b
        |    query: SELECT 'x' AS g, 1.0 AS v
        |    metrics:
        |      - n: count(*)
        |""".stripMargin)
    assert(recon.data.head.schema.contains("g STRING, v DOUBLE"))
    assert(recon.data(1).schema.isEmpty)
  }

  test("table-only source synthesizes SELECT *") {
    val spec = JobSpec.fromString(
      """version: 0
        |source:
        |  table: some_db.some_table
        |target:
        |  path: /tmp/t
        |  operation: append
        |""".stripMargin)
    assert(spec.source.effectiveQuery == "SELECT * FROM some_db.some_table")
  }

  test("recon spec normalizes default source names and metric list-of-maps") {
    val spec = ReconSpec.fromString(
      """version: 0
        |group_by: [k]
        |data:
        |  - query: SELECT 1 AS k
        |    metrics: [{m: "count(*)"}]
        |  - name: named
        |    query: SELECT 1 AS k
        |    metrics:
        |      - m: "count(*)"
        |      - n: "sum(k)"
        |""".stripMargin)
    assert(spec.data.head.name == "source_0")
    assert(spec.data(1).name == "named")
    assert(spec.data(1).metrics == Seq("m" -> "count(*)", "n" -> "sum(k)"))
  }
}
