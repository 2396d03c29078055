package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata directory layout
  * (`<dir>/<table>.parquet`, see TESTDATA.md).
  *
  * `events.parquet` stores its `ts` as parquet TIMESTAMP(NANOS), which
  * Spark's reader rejects outright. We read it with
  * `spark.sql.legacy.parquet.nanosAsLong` (ts arrives as nanos-long) and
  * convert to a proper timestamp at microsecond precision — the same value
  * DuckDB sees natively. */
object Tables {

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  def events(spark: SparkSession, dir: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val raw = spark.read.parquet(s"$dir/events.parquet")
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}
