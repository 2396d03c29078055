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
    * catalog table, STAGED: the (expensive — it carries the pay-once
    * bucket shuffle) write lands in a staging table first, and only a
    * successful write displaces the existing table, via a metadata-level
    * rename. A failed or killed write therefore never destroys the table
    * it was refreshing, and the publish itself is ordered so that a crash
    * at any point leaves a live copy of the data: the displaced table is
    * renamed aside (not dropped) before the staged table takes its name,
    * and is deleted only after the swap succeeds — at worst the data is
    * briefly reachable under the aside name instead of the canonical one,
    * never gone. Any stale warehouse directory left at the
    * target location by a previous session (a fresh catalog doesn't know
    * the table, so a rename into it would fail) is cleared only after the
    * staged write has succeeded. `table` must be an unqualified name in
    * the default database (its managed location is
    * `<warehouse>/<lowercase name>`). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketKeys: Seq[String],
      numBuckets: Int,
      sortKeys: Seq[String] = Nil): Unit = {
    require(bucketKeys.nonEmpty, "bucketing requires at least one key")
    require(!table.contains("."), "writeBucketed expects an unqualified table name")
    val spark = df.sparkSession
    val stage = s"${table}__graft_stage_${java.util.UUID.randomUUID().toString.take(8)}"
    val w = df.write.format("parquet").mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketKeys.head, bucketKeys.tail: _*)
    try {
      (if (sortKeys.nonEmpty) w.sortBy(sortKeys.head, sortKeys.tail: _*) else w)
        .saveAsTable(stage)
    } catch {
      case e: Throwable =>
        try spark.sql(s"DROP TABLE IF EXISTS `$stage`")
        catch { case cleanup: Throwable => e.addSuppressed(cleanup) }
        throw e
    }
    // Staged write succeeded — publish in three steps, each of which
    // leaves a live copy of the data: (1) rename the displaced table
    // ASIDE (metadata + dir rename, no deletion), (2) rename the staged
    // table into place, (3) only then drop the aside. A crash between any
    // two steps loses nothing: before (2) the previous contents are
    // queryable under the aside name, after (2) the new contents are live
    // under the target name and the aside is garbage to clean up — never
    // a window with neither table. RENAME moves the managed location too,
    // so no second data write happens.
    val aside = s"${table}__graft_old_${java.util.UUID.randomUUID().toString.take(8)}"
    if (spark.catalog.tableExists(table))
      spark.sql(s"ALTER TABLE `$table` RENAME TO `$aside`")
    // A stale directory at the target location with no catalog entry (a
    // previous session's orphan) would make the rename-into-place fail;
    // the staged write has already succeeded, so clearing it is safe.
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    spark.sql(s"ALTER TABLE `$stage` RENAME TO `$table`")
    spark.sql(s"DROP TABLE IF EXISTS `$aside`")
    // Sweep asides orphaned by EARLIER publishes that crashed between
    // steps (2) and (3): each leaks a full table copy (catalog entry +
    // data dir) indefinitely otherwise. Safe now — the swap above
    // succeeded, so the canonical name serves the new contents and any
    // older `__graft_old_*` is garbage by construction. This bounds
    // crashed-publish garbage to at most one generation.
    val stalePattern = s"${table.toLowerCase}__graft_old_*"
    spark.sessionState.catalog
      .listTables("default", stalePattern)
      .map(_.table)
      .filterNot(_.equalsIgnoreCase(aside))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
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
