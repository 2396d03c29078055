package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Guards the schema-adaptive events loader: the driver has regenerated
  * `events.parquet` under different physical encodings across rounds
  * (TIMESTAMP(NANOS) → BIGINT nanos under `nanosAsLong`; `timestamp[us]`
  * → TIMESTAMP_NTZ), and a loader pinned to one encoding broke 13 queries
  * when the fixture flipped. `adaptEventTs` must normalize every encoding
  * to the same session-TZ TIMESTAMP values. */
class TablesSpec extends SparkSpec {

  // 2024-01-01T00:00:00Z and one microsecond later, in micros.
  private val micros = Seq(1704067200000000L, 1704067200000001L)

  private def expectedTs = {
    import spark.implicits._
    micros.toDF("us").select(timestamp_micros(col("us")).as("ts"))
      .collect().map(_.getTimestamp(0)).toSeq
  }

  test("adaptEventTs converts BIGINT nanos to timestamp") {
    import spark.implicits._
    val df = micros.map(_ * 1000L).toDF("ts")
    val out = Tables.adaptEventTs(df)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.collect().map(_.getTimestamp(0)).toSeq == expectedTs)
  }

  test("adaptEventTs casts TIMESTAMP_NTZ to session-TZ timestamp losslessly") {
    import spark.implicits._
    val df = micros.toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    assert(df.schema("ts").dataType == TimestampNTZType)
    val out = Tables.adaptEventTs(df)
    assert(out.schema("ts").dataType == TimestampType)
    // Session TZ is UTC, so the NTZ→TZ cast must preserve the instant.
    assert(out.collect().map(_.getTimestamp(0)).toSeq == expectedTs)
  }

  test("adaptEventTs is a no-op on an already-timestamp column") {
    import spark.implicits._
    val df = micros.toDF("us").select(timestamp_micros(col("us")).as("ts"))
    val out = Tables.adaptEventTs(df)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.collect().map(_.getTimestamp(0)).toSeq == expectedTs)
  }

  test("events loads the driver fixture with a usable timestamp ts") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    // Arithmetic on ts must analyze (this is exactly what broke in r7).
    val n = ev.filter(col("ts") > lit("2000-01-01").cast(TimestampType))
      .limit(5).count()
    assert(n > 0)
  }

  test("adaptEventTs fails loudly (named column + type) on an unseen encoding") {
    import spark.implicits._
    val df = Seq("2024-01-01").toDF("ts") // STRING ts: never shipped
    val e = intercept[IllegalStateException] { Tables.adaptEventTs(df) }
    assert(e.getMessage.contains("ts") && e.getMessage.toLowerCase.contains("unexpected"),
      e.getMessage)
  }

  test("fixtureDiagnostics: clean fixture is silent, unseen encodings get one line each") {
    import spark.implicits._
    val real = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$real/events.parquet").exists())
    assert(Tables.fixtureDiagnostics(spark, real).isEmpty,
      "the shipped fixture must report no diagnostics")

    // Doctored regen: STRING ts and ARRAY<STRING> embedding — both unseen.
    val dir = java.nio.file.Files.createTempDirectory("graft-canary").toString
    Seq(("2024-01-01", 1L)).toDF("ts", "event_id")
      .write.parquet(s"$dir/events.parquet")
    Seq((1L, Seq("a", "b"))).toDF("vec_id", "embedding")
      .write.parquet(s"$dir/embeddings.parquet")
    val diags = Tables.fixtureDiagnostics(spark, dir)
    assert(diags.size == 2, diags.mkString("\n"))
    assert(diags.exists(d => d.contains("events.ts") && d.contains("UNSEEN")), diags)
    assert(diags.exists(d => d.contains("embeddings.embedding") && d.contains("UNSEEN")), diags)

    // Missing file → a readable one-liner, not a stack trace.
    val empty = java.nio.file.Files.createTempDirectory("graft-canary-empty").toString
    val missing = Tables.fixtureDiagnostics(spark, empty)
    assert(missing.size == 2 && missing.forall(_.contains("unreadable/missing")), missing)
  }

  test("adaptEventTs round-trips a re-written batch (StagedDrain shape)") {
    // StagedDrain writes batches back to parquet as TIMESTAMP and re-reads;
    // adapting twice must be stable.
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val ev = Tables.events(spark, dir).limit(10)
    val tmp = java.nio.file.Files.createTempDirectory("graft-ts").toString
    ev.write.mode("overwrite").parquet(tmp)
    val back = Tables.adaptEventTs(spark.read.parquet(tmp))
    assert(back.schema("ts").dataType == TimestampType)
    assert(back.count() == 10)
  }
}
