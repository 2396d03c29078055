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
