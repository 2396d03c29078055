package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.EventWindows

/** Watermark semantics of the streaming tumbling aggregation, pinned with
  * a MemoryStream so batch boundaries (and therefore watermark advances)
  * are exact. Spark's contract, which this spec encodes:
  *   - a late event is DROPPED once its WINDOW is closed — i.e. when
  *     window.end ≤ watermark (not merely when its timestamp is below the
  *     watermark: a late row belonging to a still-open window is a valid
  *     update and must be counted);
  *   - a window is emitted exactly once, only after the watermark passes
  *     its end (append mode), and carries the final counts.
  * The watermark for batch N is derived from the max event time of batches
  * < N, so each addData + processAllAvailable below steps it explicitly. */
class EventWindowsLateDataSpec extends SparkSpec {
  import spark.implicits._

  private def ts(hm: String) = Timestamp.valueOf(s"2026-01-01 $hm:00")

  private def emitted(): Map[Timestamp, (Long, Double)] =
    spark.table("late_sink")
      .select("window_start", "n_events", "sum_value")
      .collect()
      .map(r => r.getTimestamp(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap

  test("availableNow streaming run equals the batch tumbling aggregation exactly") {
    val sf = "/root/testdata/sf0.001"
    val batch = EventWindows.tumbling(Tables.load(spark, sf, "events"), "ts", "15 minutes")
      .collect().map(_.toSeq).toSet
    val streamed = EventWindows.tumblingAvailableNow(
      spark, s"$sf/events.parquet", "ts", "15 minutes", "30 minutes")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch, "streaming-to-completion must equal batch")
    assert(batch.nonEmpty)
  }

  test("availableNow streaming sliding windows equal the batch sliding aggregation exactly") {
    val sf = "/root/testdata/sf0.001"
    val batch = EventWindows.sliding(Tables.load(spark, sf, "events"), "ts",
      "30 minutes", "15 minutes")
      .collect().map(_.toSeq).toSet
    val streamed = EventWindows.slidingAvailableNow(
      spark, s"$sf/events.parquet", "ts", "30 minutes", "15 minutes", "30 minutes")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch, "streaming sliding windows must equal batch")
    assert(batch.nonEmpty)
  }

  test("availableNow streaming sessionization equals the batch session windows exactly") {
    val sf = "/root/testdata/sf0.001"
    val batch = EventWindows.sessions(Tables.load(spark, sf, "events"), "ts", "5 minutes")
      .collect().map(_.toSeq).toSet
    val streamed = EventWindows.sessionsAvailableNow(
      spark, s"$sf/events.parquet", "ts", "5 minutes", "30 minutes")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch, "streaming sessionization must equal batch")
    assert(batch.nonEmpty)
  }

  test("tumblingLateAudit: incremental checkpointed drains drop closed-window groups, counts hand-verified") {
    val b1 = Seq(
      (ts("10:00"), "c", 1.0),
      (ts("10:05"), "c", 1.0),
      (ts("11:00"), "c", 1.0)).toDF("ts", "event_type", "value")
    // Run-1 watermark commits at max(b1) − 10 min = 10:50:
    //   10:05 → window [10:00,10:15) closed → its GROUP dropped (1);
    //   10:55 → [10:45,11:00) open → counted;
    //   11:40 → final wm 11:30 → emits [10:45,11:00) and [11:00,11:15),
    //           holds [11:30,11:45).
    val b2 = Seq(
      (ts("10:05"), "c", 100.0),
      (ts("10:55"), "c", 1.0),
      (ts("11:40"), "c", 1.0)).toDF("ts", "event_type", "value")
    val row = EventWindows.tumblingLateAudit(spark, Seq(b1, b2),
      "ts", "15 minutes", "10 minutes").collect().head
    // emitted: [10:00,10:15)×2 (run 1), [10:45,11:00)×1, [11:00,11:15)×1
    assert(row.getLong(0) == 3, s"n_windows: $row")
    assert(row.getLong(1) == 4, s"n_events: $row")
    assert(row.getLong(2) == 1, s"n_dropped_late: $row")
  }

  test("late data into a closed window is dropped; into an open window is counted; windows finalize once") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val agg = EventWindows.tumbling(
      events.withWatermark("ts", "10 minutes"), "ts", "15 minutes")
    val q = agg.writeStream.format("memory").queryName("late_sink")
      .outputMode("append").start()
    try {
      // Batch 1: two events in window [10:00,10:15), one in [10:30,10:45).
      // Max event time 10:40 → watermark advances to 10:30, and
      // processAllAvailable's trailing no-data batch immediately flushes
      // the now-closed [10:00,10:15) window. [10:30,10:45) stays open.
      input.addData(
        (ts("10:00"), "click", 1.0),
        (ts("10:05"), "click", 1.0),
        (ts("10:40"), "click", 1.0))
      q.processAllAvailable()
      assert(emitted() == Map(ts("10:00") -> ((2L, 2.0))),
        "only the window passed by the watermark may be emitted")

      // Batch 2 (watermark 10:30):
      //   10:05 value=100 → its window was finalized above → DROPPED; the
      //     value-100 payload makes any leak visible in count and sum;
      //   10:32 → arrives after 10:40 did (out of order) but its window
      //     [10:30,10:45) is still open → counted;
      //   11:00 → advances the watermark to 10:50, whose no-data batch
      //     flushes [10:30,10:45) with the out-of-order row included.
      input.addData(
        (ts("10:05"), "click", 100.0),
        (ts("10:32"), "click", 1.0),
        (ts("11:00"), "click", 1.0))
      q.processAllAvailable()
      assert(emitted() == Map(
        ts("10:00") -> ((2L, 2.0)),
        ts("10:30") -> ((2L, 2.0))),
        "late row into a closed window leaked, or an open-window update was lost")

      // Batch 3: nothing newly closed → emitted set must be STABLE (each
      // window appears exactly once, never re-emitted or revised).
      input.addData((ts("10:59"), "click", 1.0))
      q.processAllAvailable()
      assert(emitted() == Map(
        ts("10:00") -> ((2L, 2.0)),
        ts("10:30") -> ((2L, 2.0))),
        "a finalized window was re-emitted or revised")
    } finally q.stop()
  }
}
