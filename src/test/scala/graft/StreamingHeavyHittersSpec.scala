package graft

import org.apache.spark.sql.functions._
import graft.streaming.StreamingHeavyHitters

/** [[StreamingHeavyHitters.topKStaged]] — the always-exact contract
  * across checkpointed micro-batches, with bounded per-shard state. */
class StreamingHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def reference(vals: Seq[String], k: Int): Seq[(String, Long)] =
    vals.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (v, n) => (-n, v) }.take(k)

  test("staged drain equals the full top-k (fast path)") {
    val vals = (1 to 30000).map(i => s"t${(math.pow(i % 499 + 1, 0.5)).toInt}")
    val batches = vals.grouped(10000).map(_.toDF("v")).toSeq
    val got = StreamingHeavyHitters
      .topKStaged(spark, batches, "v", k = 10, sketchSize = 256)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == reference(vals, 10))
  }

  test("tiny sketch forces the fallback and stays exact") {
    val vals = (1 to 6000).map(i => s"u${i % 300}")
    val batches = vals.grouped(2000).map(_.toDF("v")).toSeq
    val got = StreamingHeavyHitters
      .topKStaged(spark, batches, "v", k = 20, sketchSize = 4, shards = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == reference(vals, 20))
  }

  test("final batch that trims the shard map EMPTY still yields the exact top-k") {
    // sketchSize=1: adding a third equal-count value trims ALL counters
    // (cut == max), so the final micro-batch's Misra-Gries map is empty.
    // Without the per-batch sentinel row, the reader's max(seq) window
    // silently fell back to the seq-0 snapshot — stale candidates {a,b}
    // and slack 0 — and returned a "provably exact" top-k missing c.
    val batches = Seq(Seq("a", "b").toDF("v"), Seq("c").toDF("v"))
    val got = StreamingHeavyHitters
      .topKStaged(spark, batches, "v", k = 3, sketchSize = 1, shards = 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == reference(Seq("a", "b", "c"), 3))
    // And the sentinel really is the mechanism: the final seq carries a
    // row for the shard even though its counter map is empty.
    val (emitted, _) = graft.streaming.StagedDrain.run(spark, batches,
      src => StreamingHeavyHitters.summaryStream(src, "v", 1, 1))
    val finalSeq = emitted.agg(max("seq")).as[Long].head()
    val lastRows = emitted.filter($"seq" === finalSeq).collect()
    assert(lastRows.nonEmpty, "empty-map batch must still emit a sentinel")
    assert(lastRows.forall(_.isNullAt(2)) && lastRows.forall(_.getLong(4) > 0L),
      "sentinel carries null value and the true (grown) slack")
  }

  test("state stays bounded: emissions per shard per batch <= 2*sketch") {
    val vals = (1 to 20000).map(i => s"x$i") // all distinct: worst case
    val batches = vals.grouped(10000).map(_.toDF("v")).toSeq
    val (emitted, _) = graft.streaming.StagedDrain.run(spark, batches,
      src => StreamingHeavyHitters.summaryStream(src, "v", 64, 4))
    val worst = emitted.groupBy("shard", "seq").count()
      .agg(max("count")).as[Long].head()
    assert(worst <= 128L, s"shard summary leaked past 2*sketch: $worst")
    // And the gated top-k STILL equals the reference (fallback path).
    val got = StreamingHeavyHitters
      .topKStaged(spark, batches, "v", k = 5, sketchSize = 64, shards = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == reference(vals, 5))
  }
}
