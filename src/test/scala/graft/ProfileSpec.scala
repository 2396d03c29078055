package graft

import graft.operators.Profile
import org.apache.spark.sql.functions.expr

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("tableProfile: nulls, exact distincts, min/max per column in one pass") {
    val df = Seq(
      (1L, Some("a"), Some(10)),
      (2L, None, Some(10)),
      (3L, Some("b"), None),
      (4L, Some("a"), Some(30))).toDF("id", "s", "x")
    val p = Profile.tableProfile(df, Seq("id", "s", "x"), exact = true)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))).toMap
    assert(p("id") == ((4L, 0L, 4L, "1", "4")))
    assert(p("s") == ((4L, 1L, 2L, "a", "b")))
    assert(p("x") == ((4L, 1L, 2L, "10", "30")))
  }

  test("exact mode plans per-column two-level aggregates — no Expand node") {
    // Multi-column count(DISTINCT) in one aggregate goes through an
    // Expand that duplicates every input row ×|cols| into one shuffle —
    // the scale-killer this plan shape exists to avoid. Pin its absence
    // in the EXECUTED plan (same style as RangeJoinSpec's no-nested-loop
    // property).
    val df = Seq((1L, "a", 10), (2L, "b", 20), (3L, "a", 20)).toDF("id", "s", "x")
    val p = Profile.tableProfile(df, Seq("id", "s", "x"), exact = true)
    p.collect()
    val plan = p.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"exact profile must not plan an Expand:\n$plan")
  }

  test("approx mode counts distincts within HLL error; unknown column rejected") {
    val df = spark.range(10000).toDF("id")
    val p = Profile.tableProfile(df, Seq("id")).collect().head
    val dist = p.getLong(3)
    assert(math.abs(dist - 10000L) < 600, s"approx distinct too far off: $dist")
    intercept[IllegalArgumentException](Profile.tableProfile(df, Seq("nope")))
  }

  test("quantileProfile: SQL-standard discrete percentiles (actual data values)") {
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val q = Profile.quantileProfile(df, Seq("x"), Seq(0.25, 0.5, 0.75, 1.0))
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    // percentile_disc: smallest value whose cume_dist >= p.
    assert(q == Map(0.25 -> 1.0, 0.5 -> 2.0, 0.75 -> 3.0, 1.0 -> 4.0))
  }

  test("quantileProfile: multi-column, nulls ignored, approx within tolerance of exact") {
    val rnd = new scala.util.Random(13)
    val df = Seq.tabulate(4000)(i =>
      (rnd.nextDouble() * 100, if (i % 7 == 0) None else Some(rnd.nextGaussian() * 10)))
      .toDF("u", "g")
    val q = Profile.quantileProfile(df, Seq("u", "g"), Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(q("u") - 50.0) < 5.0 && math.abs(q("g")) < 1.5)
    // The documented 100 TB pattern: approx_percentile gated against the
    // exact contract within its accuracy budget.
    val approx = df.agg(expr("approx_percentile(u, 0.5, 1000)")).head.getDouble(0)
    assert(math.abs(approx - q("u")) < 1.0, s"approx $approx vs exact ${q("u")}")
  }

  test("joinCardinality: exact prediction incl. multiplicative keys, nulls, disjoint sides") {
    val rnd = new scala.util.Random(23)
    val left = (Seq.fill(3000)((rnd.nextInt(50), rnd.nextInt(10))) ++
      Seq((999, 1), (999, 2)) ++ Seq.fill(5)((-1, 0)))
      .map { case (k, v) => (if (k == -1) None else Some(k), v) }
      .toDF("k", "v")
    val right = (Seq.fill(800)((Option(rnd.nextInt(60)), rnd.nextInt(10))) ++
      Seq.fill(3)((Option.empty[Int], 0)))
      .toDF("k", "w")
    val p = Profile.joinCardinality(left, right, Seq("k")).collect().head
    val actual = left.join(right, Seq("k")).count()
    assert(p.getLong(0) == actual, s"predicted ${p.getLong(0)} vs actual $actual")
    assert(p.getLong(4) <= p.getLong(0) && p.getLong(1) > 0)
    // disjoint key spaces → all-zero profile, single row
    val d = Profile.joinCardinality(
      Seq(1, 2).toDF("k"), Seq(7, 8).toDF("k"), Seq("k")).collect().head
    assert(d.getLong(0) == 0 && d.getLong(1) == 0 && d.getLong(4) == 0)
  }

  test("histogram: width_bucket semantics, empty bins materialized, nulls ignored") {
    val df = Seq[java.lang.Double](-5.0, 0.0, 0.5, 9.999, 10.0, 25.0, 99.9, 100.0, 140.0, null)
      .toDF("x")
    val h = Profile.histogram(df, "x", lo = 0.0, hi = 100.0, nBins = 10)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(h.size == 12, "nBins+2 rows always")
    assert(h(0L)._3 == 1)                         // underflow: -5.0
    assert(h(1L) == ((0.0, 10.0, 3L)))            // 0.0, 0.5, 9.999
    assert(h(2L)._3 == 1)                         // 10.0 (left-closed)
    assert(h(3L)._3 == 1 && h(10L)._3 == 1)       // 25.0; 99.9
    assert(h(11L)._3 == 2)                        // overflow: 100.0, 140.0
    assert(h(5L)._3 == 0, "empty bins present with n=0")
    intercept[IllegalArgumentException](Profile.histogram(df, "x", 5.0, 5.0, 10))
  }

  test("distributed rank selection ≡ percentile_disc aggregate (duplicate-heavy)") {
    val rnd = new scala.util.Random(97)
    // Coarse values force duplicates across range-partition boundaries.
    val df = Seq.fill(5000)(rnd.nextInt(40).toDouble).toDF("x")
    val probs = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    val got = Profile.quantileProfile(df, Seq("x"), probs)
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    val want = probs.map { p =>
      p -> df.agg(expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY x)"))
        .head.getDouble(0)
    }.toMap
    assert(got == want, s"got $got want $want")
  }
}
