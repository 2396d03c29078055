package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated testdata directory layout
  * (`<dir>/<table>.parquet`, see TESTDATA.md).
  *
  * `events.parquet` has shipped under TWO physical encodings across fixture
  * regenerations: parquet TIMESTAMP(NANOS) (which Spark's reader rejects
  * unless `spark.sql.legacy.parquet.nanosAsLong` is set, arriving as a
  * nanos BIGINT) and plain `timestamp[us]` (arriving as TIMESTAMP_NTZ).
  * [[Tables.adaptEventTs]] normalizes either to a session-TZ TIMESTAMP at
  * microsecond precision — the same value DuckDB sees natively (the
  * Verify/Bench sessions pin the session time zone to UTC, so the NTZ→TZ
  * cast is value-preserving). */
object Tables {

  private val NanosKey = "spark.sql.legacy.parquet.nanosAsLong"

  /** Run `body` with `nanosAsLong=true` (harmless for non-nanos files),
    * restoring the prior conf value. The conf is only consulted at
    * read-plan time, so scoping it here avoids a session-wide leak. */
  def withNanosAsLong[T](spark: SparkSession)(body: => T): T = {
    val prev = spark.conf.getOption(NanosKey)
    spark.conf.set(NanosKey, "true")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(NanosKey, v)
      case None    => spark.conf.unset(NanosKey)
    }
  }

  /** Normalize an events `ts` column to TIMESTAMP (session TZ, micros)
    * regardless of which physical encoding the fixture was written with.
    * Works on batch and streaming DataFrames alike. */
  def adaptEventTs(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.schema(tsCol).dataType match {
      case LongType => // TIMESTAMP(NANOS) read under nanosAsLong → BIGINT nanos
        df.withColumn(tsCol, timestamp_micros(expr(s"`$tsCol` div 1000")))
      case TimestampNTZType => // timestamp[us], not UTC-adjusted
        df.withColumn(tsCol, col(tsCol).cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalStateException(
        s"events.$tsCol: unexpected physical type $other")
    }

  /** Fixture-schema canary: one diagnosis line per fixture column whose
    * PHYSICAL encoding is outside the set this codebase has absorbed —
    * run as a Verify pre-flight so a driver fixture regen that ships a
    * new encoding produces a one-line "here's what changed and where to
    * add the case" instead of a dozen red queries with per-query stack
    * traces (the r7 failure mode: 13 events/streaming/asof queries died
    * on a TIMESTAMP(NANOS)→timestamp[us] regen before [[adaptEventTs]]
    * learned both). Empty result = all encodings seen before. */
  def fixtureDiagnostics(spark: SparkSession, dir: String): Seq[String] = {
    import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    def check(table: String, column: String, known: String)(
        ok: DataType => Boolean): Unit =
      try {
        val df =
          if (table == "events") withNanosAsLong(spark) {
            spark.read.parquet(s"$dir/$table.parquet")
          } else spark.read.parquet(s"$dir/$table.parquet")
        val dt = df.schema(column).dataType
        if (!ok(dt)) out +=
          s"$table.$column: UNSEEN physical type ${dt.sql} (known encodings: " +
            s"$known) — teach the adapter the new case before trusting any " +
            s"query over $table"
      } catch {
        case e: Exception =>
          out += s"$table.parquet: unreadable/missing ($column check): " +
            s"${e.getMessage.linesIterator.next()}"
      }
    check("events", "ts", "BIGINT nanos, TIMESTAMP_NTZ, TIMESTAMP") {
      case LongType | TimestampNTZType | TimestampType => true
      case _ => false
    }
    check("embeddings", "embedding", "ARRAY<FLOAT>, ARRAY<DOUBLE>") {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    out.toSeq
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  def events(spark: SparkSession, dir: String): DataFrame =
    eventsAt(spark, s"$dir/events.parquet")

  /** Events loader for an explicit file/dir path (batch). */
  def eventsAt(spark: SparkSession, path: String): DataFrame =
    withNanosAsLong(spark) {
      adaptEventTs(spark.read.parquet(path))
    }
}
