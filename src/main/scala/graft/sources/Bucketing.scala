package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed catalog tables: pre-shuffle fact tables once at write time so
  * every subsequent equi-join or aggregation on the bucket key runs
  * WITHOUT an exchange — the 100 TB answer to "this join shuffles the big
  * table every night".
  *
  * Both sides bucketed by the same key into the same bucket count →
  * Catalyst plans a zero-shuffle sort-merge join; a groupBy on the bucket
  * key skips its exchange too. Bucket pruning applies to point predicates
  * on the bucket column. */
object Bucketing {

  /** Write `df` as a bucketed (and optionally sorted-within-buckets)
    * catalog table. Overwrites any existing table of that name. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketKeys: Seq[String],
      numBuckets: Int,
      sortKeys: Seq[String] = Nil): Unit = {
    require(bucketKeys.nonEmpty, "bucketing requires at least one key")
    val w = df.write.format("parquet").mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketKeys.head, bucketKeys.tail: _*)
    (if (sortKeys.nonEmpty) w.sortBy(sortKeys.head, sortKeys.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Co-located equi-join of two tables bucketed on the join keys: with
    * matching bucket specs this plans with NO shuffle exchange on either
    * side. */
  def colocatedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      on: Seq[String],
      joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), on, joinType)
}
