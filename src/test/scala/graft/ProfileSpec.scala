package graft

import graft.operators.Profile

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

  test("approx mode counts distincts within HLL error; unknown column rejected") {
    val df = spark.range(10000).toDF("id")
    val p = Profile.tableProfile(df, Seq("id")).collect().head
    val dist = p.getLong(3)
    assert(math.abs(dist - 10000L) < 600, s"approx distinct too far off: $dist")
    intercept[IllegalArgumentException](Profile.tableProfile(df, Seq("nope")))
  }
}
