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
    * catalog table. Overwrites any existing table of that name — and any
    * STALE warehouse directory left by a previous session: a fresh
    * session's catalog doesn't know the table, so `saveAsTable` with
    * Overwrite refuses the existing managed location
    * (LOCATION_ALREADY_EXISTS) instead of replacing it. `table` must be
    * an unqualified name in the default database (its managed location
    * is `<warehouse>/<lowercase name>`). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketKeys: Seq[String],
      numBuckets: Int,
      sortKeys: Seq[String] = Nil): Unit = {
    require(bucketKeys.nonEmpty, "bucketing requires at least one key")
    require(!table.contains("."), "writeBucketed expects an unqualified table name")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
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
