package graft

import org.apache.spark.sql.functions._
import graft.operators.ReconJob

class ReconSpec extends SparkSpec {
  import spark.implicits._

  private def seed(): Unit = {
    Seq((1, "a", 10.0, 5L), (1, "b", 20.0, 7L), (2, "a", 30.0, 9L))
      .toDF("k", "sub", "amount", "n")
      .createOrReplaceTempView("recon_base")
  }

  test("self-recon matches everywhere with zero deltas") {
    seed()
    val out = ReconJob.fromYaml(
      """version: 0
        |group_by: [k]
        |data:
        |  - name: x
        |    query: SELECT * FROM recon_base
        |    metrics:
        |      - total: sum(amount)
        |      - rows: count(*)
        |  - name: y
        |    query: SELECT * FROM recon_base
        |    metrics:
        |      - total: sum(amount)
        |      - rows: count(*)
        |""".stripMargin).run()
    assert(out.count() == 2)
    assert(out.filter(!col("match_total") || !col("match_rows")).isEmpty)
    assert(out.filter(col("delta_total") =!= 0.0 || col("delta_rows") =!= 0).isEmpty)
  }

  test("three sources join but emit no delta/match columns") {
    seed()
    val out = ReconJob.fromYaml(
      """version: 0
        |group_by: [k]
        |data:
        |  - name: a
        |    query: SELECT * FROM recon_base
        |    metrics: [{total: sum(amount)}]
        |  - name: b
        |    query: SELECT * FROM recon_base
        |    metrics: [{total: sum(amount)}]
        |  - name: c
        |    query: SELECT * FROM recon_base
        |    metrics: [{total: sum(amount)}]
        |""".stripMargin).run()
    assert(out.columns.toSet == Set("k", "a_total", "b_total", "c_total"))
  }

  test("vs_first mode: each later source gets delta/match vs the baseline; auto untouched") {
    seed()
    val out = ReconJob.fromYaml(
      """version: 0
        |group_by: [k]
        |compare_mode: vs_first
        |data:
        |  - name: a
        |    query: SELECT * FROM recon_base
        |    metrics: [{total: sum(amount)}, {rows: count(*)}]
        |  - name: b
        |    query: SELECT k, amount * 1.0002 AS amount FROM recon_base
        |    metrics: [{total: sum(amount)}, {rows: count(*)}]
        |  - name: c
        |    query: SELECT k, amount * 2 AS amount FROM recon_base
        |    metrics: [{total: sum(amount)}, {rows: count(*)}]
        |""".stripMargin).run()
    assert(out.columns.toSet == Set("k",
      "a_total", "a_rows", "b_total", "b_rows", "c_total", "c_rows",
      "delta_b_total", "match_b_total", "delta_b_rows", "match_b_rows",
      "delta_c_total", "match_c_total", "delta_c_rows", "match_c_rows"))
    // b drifts 2e-4 (inside tolerance), c doubles (outside); counts match.
    assert(out.filter(!col("match_b_total") || !col("match_b_rows") ||
      !col("match_c_rows")).isEmpty)
    assert(out.filter(col("match_c_total")).isEmpty)

    // An invalid mode fails loudly at spec parse, not mid-plan.
    val e = intercept[graft.spec.JobConfigException] {
      ReconJob.fromYaml(
        """version: 0
          |group_by: [k]
          |compare_mode: pairwise_all
          |data:
          |  - name: a
          |    query: SELECT * FROM recon_base
          |    metrics: [{total: sum(amount)}]
          |  - name: b
          |    query: SELECT * FROM recon_base
          |    metrics: [{total: sum(amount)}]
          |""".stripMargin).run()
    }
    assert(e.getMessage.contains("compare_mode"))
  }

  test("float tolerance: within 1e-3 matches, b=0 vs a!=0 mismatches, 0=0 matches") {
    Seq((1, 1000.0), (2, 5.0), (3, 0.0)).toDF("k", "v")
      .createOrReplaceTempView("recon_a")
    // k=1 drifts by 0.05% (within tolerance), k=2 second source is 0
    // (mismatch), k=3 both 0 (match).
    Seq((1, 1000.5), (2, 0.0), (3, 0.0)).toDF("k", "v")
      .createOrReplaceTempView("recon_b")
    val out = ReconJob.fromYaml(
      """version: 0
        |group_by: [k]
        |data:
        |  - name: s1
        |    query: SELECT * FROM recon_a
        |    metrics: [{m: sum(v)}]
        |  - name: s2
        |    query: SELECT * FROM recon_b
        |    metrics: [{m: sum(v)}]
        |""".stripMargin).run()
    assertRows(out, Seq("k", "match_m"),
      Set(Seq(1, true), Seq(2, false), Seq(3, true)))
  }

  test("integer metrics compare strictly; non-numeric metrics get no delta/match") {
    seed()
    val out = ReconJob.fromYaml(
      """version: 0
        |group_by: [k]
        |data:
        |  - name: p
        |    query: SELECT * FROM recon_base
        |    metrics:
        |      - cnt: count(*)
        |      - top: max(sub)
        |  - name: q
        |    query: SELECT * FROM recon_base WHERE sub <> 'b'
        |    metrics:
        |      - cnt: count(*)
        |      - top: max(sub)
        |""".stripMargin).run()
    // string metric 'top' must not produce delta/match columns
    assert(!out.columns.contains("delta_top") && !out.columns.contains("match_top"))
    // k=1 loses a row in q -> strict int mismatch; k=2 unchanged
    assertRows(out, Seq("k", "match_cnt"), Set(Seq(1, false), Seq(2, true)))
  }

  test("per-source metric expressions may differ while aliases align") {
    seed()
    val out = ReconJob.fromYaml(
      """version: 0
        |group_by: [k]
        |data:
        |  - name: u
        |    query: SELECT * FROM recon_base
        |    metrics: [{m: sum(amount)}]
        |  - name: v
        |    query: SELECT k, amount / 2 AS amount FROM recon_base
        |    metrics: [{m: sum(amount) * 2}]
        |""".stripMargin).run()
    assert(out.filter(!col("match_m")).isEmpty)
  }

  test("full outer join keeps keys present in only one source") {
    Seq((1, 10.0)).toDF("k", "v").createOrReplaceTempView("recon_l")
    Seq((2, 20.0)).toDF("k", "v").createOrReplaceTempView("recon_r")
    val out = ReconJob.fromYaml(
      """version: 0
        |group_by: [k]
        |data:
        |  - name: l
        |    query: SELECT * FROM recon_l
        |    metrics: [{m: sum(v)}]
        |  - name: r
        |    query: SELECT * FROM recon_r
        |    metrics: [{m: sum(v)}]
        |""".stripMargin).run()
    assertRows(out, Seq("k", "l_m", "r_m"),
      Set(Seq(1, 10.0, null), Seq(2, null, 20.0)))
  }
}
