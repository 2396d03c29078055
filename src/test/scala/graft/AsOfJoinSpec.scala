package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asof attaches latest right row at or before left ts, per key") {
    val left = Seq(
      (1L, 10L, "p1"), // key 1, ts 10
      (1L, 25L, "p2"),
      (2L, 5L, "p3"),  // before any right row for key 2
      (3L, 99L, "p4")  // key with no right rows at all
    ).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, 10L, 100.0), // equal ts -> matches p1
      (1L, 20L, 200.0),
      (1L, 30L, 300.0), // after p2, must not match
      (2L, 7L, 700.0)   // after p3, must not match
    ).toDF("k", "ts", "price")

    val out = AsOfJoin.asof(left, right, Seq("k"), "ts", "ts")
    assertRows(out, Seq("tag", "price"), Set(
      Seq("p1", 100.0),
      Seq("p2", 200.0),
      Seq("p3", null),
      Seq("p4", null)))
  }

  test("asof tolerance nulls out matches older than the budget") {
    val left = Seq((1L, 10L, "a"), (1L, 25L, "b")).toDF("k", "ts", "tag")
    val right = Seq((1L, 10L, 100.0), (1L, 20L, 200.0)).toDF("k", "ts", "price")
    // "b" matched right ts=20, 5s stale: allowed at tol=5, dropped at tol=3
    val tol5 = AsOfJoin.asof(left, right, Seq("k"), "ts", "ts", toleranceSeconds = 5)
    assertRows(tol5, Seq("tag", "price"), Set(Seq("a", 100.0), Seq("b", 200.0)))
    val tol3 = AsOfJoin.asof(left, right, Seq("k"), "ts", "ts", toleranceSeconds = 3)
    assertRows(tol3, Seq("tag", "price"), Set(Seq("a", 100.0), Seq("b", null)))
  }

  test("asof forward attaches earliest right row at or after left ts") {
    val left = Seq(
      (1L, 10L, "p1"),  // right at 10 matches (same instant)
      (1L, 25L, "p2"),  // next right is 30
      (1L, 99L, "p3")   // nothing after
    ).toDF("k", "ts", "tag")
    val right = Seq((1L, 10L, 100.0), (1L, 20L, 200.0), (1L, 30L, 300.0))
      .toDF("k", "ts", "price")
    val out = AsOfJoin.asof(left, right, Seq("k"), "ts", "ts",
      direction = "forward")
    assertRows(out, Seq("tag", "price"), Set(
      Seq("p1", 100.0), Seq("p2", 300.0), Seq("p3", null)))
    // forward + tolerance: 30 is 5s after 25 -> allowed at 5, dropped at 4
    val tol = AsOfJoin.asof(left, right, Seq("k"), "ts", "ts",
      direction = "forward", toleranceSeconds = 4)
    assertRows(tol, Seq("tag", "price"), Set(
      Seq("p1", 100.0), Seq("p2", null), Seq("p3", null)))
  }

  test("asof collapses duplicate right (key, ts) rows deterministically") {
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((1L, 5L, 1.0), (1L, 5L, 9.0)).toDF("k", "ts", "price")
    val out = AsOfJoin.asof(left, right, Seq("k"), "ts", "ts")
    assertRows(out, Seq("price"), Set(Seq(9.0)))
  }

  test("asof matches brute-force max-ts join on real events") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))

    val fast = AsOfJoin.asof(purchases, clicks, Seq("user_id"), "ts", "ts")
      .select("event_id", "click_id")

    // brute force: all qualifying pairs, keep latest click (max ts, then
    // max click_id for determinism)
    val brute = purchases.as("p")
      .join(clicks.as("c"),
        col("p.user_id") === col("c.user_id") && col("c.ts") <= col("p.ts"),
        "left")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("p.event_id"))
          .orderBy(col("c.ts").desc_nulls_last, col("click_id").desc_nulls_last)))
      .filter(col("rn") === 1)
      .select(col("p.event_id"), col("click_id"))

    val n = purchases.count()
    assert(fast.count() == n)
    assert(fast.except(brute).isEmpty && brute.except(fast).isEmpty)
  }
}
