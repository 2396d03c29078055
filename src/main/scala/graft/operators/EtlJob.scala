package graft.operators

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import graft.spec.{JobConfigException, JobSpec, Operation}
import graft.sources.{DataSource, PathRef, TableRef, TargetRef}

import scala.jdk.CollectionConverters._

/** ETL job lifecycle (reference: etl/parent.py:206-223). Seven logical
  * phases — the reference numbers them 01,03..08 (a planned step_02 was
  * never built, parent.py:208-216):
  *   1. source pre-sql        (side-effecting SQL hook)
  *   2. materialize source query as temp view `__source_view`
  *   3. source post-sql
  *   4. target pre-sql        — the reference runs this on the SOURCE
  *      datasource (parent.py:181), a catalogued defect; intended and
  *      implemented semantics: target datasource.
  *   5. operate (append/overwrite/update/upsert)
  *   6. target post-sql
  *   7. clean — deliberate no-op (parent.py:202-204): temp views are
  *      session-scoped.
  *
  * Everything before `operate` is lazy plan construction; the first Spark
  * action is the write inside `operate` (plus hook side effects).
  */
final class EtlJob(val spec: JobSpec)(implicit spark: SparkSession) {
  import EtlJob._

  private val fromDs = DataSource(spec.source.datasource)
  private val toDs   = DataSource(spec.target.datasource)

  val targetRef: TargetRef =
    spec.target.table.map(TableRef.apply)
      .orElse(spec.target.path.map(PathRef.apply))
      .getOrElse(throw new IllegalStateException("validated spec lacks target"))

  def run(): Unit = {
    spec.source.preSql.foreach(fromDs.sql(_))
    val source = fromDs.sql(spec.source.effectiveQuery)
    source.createOrReplaceTempView(SourceView)
    spec.source.postSql.foreach(fromDs.sql(_))
    validatePlan(source)
    spec.target.preSql.foreach(toDs.sql(_))
    operate(spark.table(SourceView))
    spec.target.postSql.foreach(toDs.sql(_))
  }

  /** Plan-time validation of the configured columns against real schemas —
    * the reference validator's INTENDED checks (its implementation parses
    * `SHOW CREATE TABLE` output and is disabled; defects catalogued in
    * SURVEY.md §2.6): for update/upsert the target must already exist, and
    * every primary_key_column / update_column must resolve in BOTH the
    * source view and the target. Without this, a typo'd column name
    * surfaces as an AnalysisException deep inside the merge join instead
    * of a clean JobConfigException naming the offending key. Runs after
    * the source view is built (schema known, no data read) and before any
    * target side effect. Comparison is case-insensitive, matching Spark's
    * default resolution. */
  private[graft] def validatePlan(source: DataFrame): Unit =
    spec.target.operation match {
      case Operation.Update | Operation.Upsert =>
        val exists = targetRef match {
          case TableRef(t) => spark.catalog.tableExists(t)
          case PathRef(p) =>
            val hp = new org.apache.hadoop.fs.Path(p)
            hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp)
        }
        if (!exists)
          throw new JobConfigException(
            s"${spec.target.operation} requires an existing target, " +
              s"but ${targetRef} does not exist")
        val srcCols = source.schema.fieldNames.map(_.toLowerCase).toSet
        val tgtCols = toDs.read(targetRef).schema.fieldNames.map(_.toLowerCase).toSet
        def check(role: String, cols: Seq[String], schema: Set[String], side: String): Unit = {
          val missing = cols.filterNot(c => schema.contains(c.toLowerCase))
          if (missing.nonEmpty)
            throw new JobConfigException(
              s"$role ${missing.mkString(", ")} not found in $side schema")
        }
        check("primary_key_column", spec.target.primaryKeyColumns, srcCols, "source")
        check("primary_key_column", spec.target.primaryKeyColumns, tgtCols, "target")
        check("update_column", spec.target.updateColumns, srcCols, "source")
        check("update_column", spec.target.updateColumns, tgtCols, "target")
      case _ => ()
    }

  private[graft] def operate(source: DataFrame): Unit = spec.target.operation match {
    case Operation.Append    => Writes.append(source, targetRef)
    case Operation.Overwrite => Writes.overwrite(source, targetRef)
    case Operation.Update =>
      Writes.merge(source, targetRef, toDs, spec.target.primaryKeyColumns,
        spec.target.updateColumns, spec.target.whereStatementOnTable,
        insertWhenNotMatched = false)
    case Operation.Upsert =>
      Writes.merge(source, targetRef, toDs, spec.target.primaryKeyColumns,
        spec.target.updateColumns, spec.target.whereStatementOnTable,
        insertWhenNotMatched = true)
  }
}

object EtlJob {
  val SourceView = "__source_view"

  /** Factory mirroring `init_etl_job` (parent.py:10-65): YAML → ${param}
    * substitution → lowercased keys → operation dispatch. */
  def fromConfig(path: String, params: Map[String, String] = Map.empty)(
      implicit spark: SparkSession): EtlJob =
    new EtlJob(JobSpec.load(path, params))

  def fromYaml(yaml: String, params: Map[String, String] = Map.empty)(
      implicit spark: SparkSession): EtlJob =
    new EtlJob(JobSpec.fromString(yaml, params))
}

/** The physical write operations. All are DataFrame-writer based — no
  * driver-side data movement; every shape here scales with executor count.
  */
object Writes {

  /** O7 append / insert: name-resolved append (reference: etl/append.py,
    * delta.py:65-102). Creates the table/path when absent. */
  def append(source: DataFrame, ref: TargetRef)(implicit spark: SparkSession): Unit =
    ref match {
      case TableRef(t) =>
        val w = source.write.format("parquet").mode(SaveMode.Append)
        // saveAsTable-append onto an existing partitioned table must restate
        // the table's partitioning (Spark checks spec equality).
        val parts = if (spark.catalog.tableExists(t)) partitionColumns(t) else Nil
        (if (parts.nonEmpty) w.partitionBy(parts: _*) else w).saveAsTable(t)
      case PathRef(p) =>
        source.write.mode(SaveMode.Append).parquet(p)
    }

  /** O8 partition-scoped overwrite. The reference collects the source's
    * distinct partition values to the DRIVER and builds a `replaceWhere`
    * predicate (etl/overwrite.py:20-36) — a driver bottleneck at scale.
    * Spark gives the same observable semantics natively with dynamic
    * partition overwrite: only partitions present in the source are
    * rewritten, untouched partitions survive; the partition set is computed
    * distributed, never on the driver. Non-partitioned targets degenerate
    * to full overwrite, same as the reference's `1=1` predicate. */
  def overwrite(source: DataFrame, ref: TargetRef)(implicit spark: SparkSession): Unit =
    ref match {
      case TableRef(t) if spark.catalog.tableExists(t) =>
        withConf("spark.sql.sources.partitionOverwriteMode", "dynamic") {
          alignedTo(source, t).write.mode(SaveMode.Overwrite).insertInto(t)
        }
      case TableRef(t) =>
        source.write.format("parquet").mode(SaveMode.Overwrite).saveAsTable(t)
      case PathRef(p) =>
        source.write.mode(SaveMode.Overwrite).parquet(p)
    }

  /** O9/O10 update/upsert via the Merge join-rewrite. The merged result is
    * staged (one data write) and then swapped into the target: Spark
    * refuses to overwrite files it is concurrently reading, so the lineage
    * must be broken by a materialization. For a PARTITIONED table target
    * the stage-and-swap happens per affected partition — only partitions
    * containing matched, inserted, or moved rows are written and swapped;
    * everything else is left byte-identical on disk (the parquet analogue
    * of Delta's file-pruned MERGE). Multi-writer isolation is out of scope
    * (the reference delegated it to Delta). */
  def merge(
      source: DataFrame,
      ref: TargetRef,
      ds: DataSource,
      primaryKeys: Seq[String],
      updateColumns: Seq[String],
      baseCondition: String,
      insertWhenNotMatched: Boolean)(implicit spark: SparkSession): Unit = {

    val target = ds.read(ref)
    Merge.checkAmbiguousMatches(target, source, primaryKeys, baseCondition)
    val merged =
      Merge(target, source, primaryKeys, updateColumns, baseCondition, insertWhenNotMatched)

    ref match {
      case TableRef(t) =>
        val ident = spark.sessionState.sqlParser.parseTableIdentifier(t)
        val location = new org.apache.hadoop.fs.Path(
          spark.sessionState.catalog.getTableMetadata(ident).location)
        val partCols = partitionColumns(t)
        if (partCols.nonEmpty)
          mergePartitionScoped(target, source, merged, t, location, partCols,
            primaryKeys, updateColumns, baseCondition, insertWhenNotMatched)
        else {
          // Unpartitioned: stage-and-swap at the table's storage location —
          // ONE data write (to a staging directory) + two directory
          // renames, exactly like the path variant; not stage-table +
          // INSERT OVERWRITE, which writes the full merged dataset TWICE.
          // The catalog entry is untouched — only the bytes under the
          // table's location change — so the table definition and grants
          // survive.
          swapIntoPlace(location,
            stage => alignedTo(merged, t).write.format("parquet").save(stage.toString))
          spark.catalog.refreshTable(t)
        }
      case PathRef(p) =>
        val hadoopPath = new org.apache.hadoop.fs.Path(p)
        swapIntoPlace(hadoopPath,
          stage => merged.write.mode(SaveMode.Overwrite).parquet(stage.toString))
    }
  }

  /** Partition-scoped merge rewrite: write ONLY the partitions the merge
    * can change, swap each affected partition directory into place, leave
    * every other partition's files untouched (byte-identical, same
    * inodes). At 100 TB this is the difference between rewriting the
    * table and rewriting the handful of partitions a daily source feed
    * touches. The affected-partition set itself is computed distributed
    * ([[Merge.affectedPartitions]]) and only its DISTINCT tuples come to
    * the driver — bounded by the table's partition count (metadata scale,
    * same order as any metastore listing), never by data volume. */
  private def mergePartitionScoped(
      target: DataFrame,
      source: DataFrame,
      merged: DataFrame,
      table: String,
      location: org.apache.hadoop.fs.Path,
      partCols: Seq[String],
      primaryKeys: Seq[String],
      updateColumns: Seq[String],
      baseCondition: String,
      insertWhenNotMatched: Boolean)(implicit spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    import org.apache.spark.sql.functions.{broadcast, col}

    val affected = Merge.affectedPartitions(target, source, primaryKeys,
      updateColumns, baseCondition, insertWhenNotMatched, partCols).persist()
    try {
      val affectedRows = affected.collect()
      if (affectedRows.isEmpty) return // merge is a no-op; touch nothing
      // Canonical partition-directory fragments (part1=v/part2=v…), using
      // the same escaping Spark's own dynamic-partition writer applies, so
      // the fragments match the directories the staging write produces.
      val frags = affected
        .select(partCols.map(c => col(c).cast("string")): _*)
        .collect()
        .map { row =>
          partCols.indices.map { i =>
            ExternalCatalogUtils.getPartitionPathString(partCols(i), row.getString(i))
          }.mkString("/")
        }

      // Rows to rewrite = full merged contents of the affected partitions
      // (matched AND untouched rows of those partitions — a partition is
      // replaced wholesale or not at all). The affected tuples are
      // re-materialized as a fresh LOCAL DataFrame so the semi-join's right
      // side shares no lineage with `merged` (avoids self-join attribute
      // ambiguity), with renamed columns and an explicit broadcast.
      val local = spark
        .createDataFrame(affectedRows.toList.asJava, affected.schema)
        .select(partCols.map(c => col(c).as(s"__aff_$c")): _*)
      val joinCond = partCols
        .map(c => col(c) <=> col(s"__aff_$c"))
        .reduce(_ && _)
      val writeSet = merged.join(broadcast(local), joinCond, "left_semi")

      val fs = location.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val staging = new org.apache.hadoop.fs.Path(
        location.toString.stripSuffix("/") +
          s"__graft_staging_${UUID.randomUUID().toString.take(8)}")
      alignedTo(writeSet, table).write.format("parquet")
        .partitionBy(partCols: _*).save(staging.toString)

      frags.foreach { frag =>
        val stagedDir = new org.apache.hadoop.fs.Path(staging, frag)
        val liveDir   = new org.apache.hadoop.fs.Path(location, frag)
        if (fs.exists(stagedDir)) {
          val old = new org.apache.hadoop.fs.Path(liveDir + "__old")
          val hadOld = fs.exists(liveDir) && fs.rename(liveDir, old)
          fs.mkdirs(liveDir.getParent)
          if (!fs.rename(stagedDir, liveDir)) {
            if (hadOld) fs.rename(old, liveDir) // restore
            throw new IllegalStateException(
              s"merge swap: cannot publish $stagedDir to $liveDir")
          }
          if (hadOld) fs.delete(old, true)
        } else {
          // Affected but absent from the staged output: every row moved
          // out of this partition — it is now empty, remove it.
          fs.delete(liveDir, true)
        }
      }
      fs.delete(staging, true)
      // The files changed underneath the catalog: refresh caches and sync
      // the metastore's partition list (new partitions from inserts/moves,
      // dropped partitions from emptied ones).
      spark.catalog.refreshTable(table)
      spark.sql(s"MSCK REPAIR TABLE $table SYNC PARTITIONS")
    } finally affected.unpersist()
  }

  /** Write to a staging sibling of `dest` via `write`, then swap it into
    * place: one data write + two renames (metadata-only on HDFS-like
    * filesystems; object stores without atomic rename should front this
    * with a rename-capable committer). The displaced old data is removed
    * after a successful swap and restored on failure. */
  private def swapIntoPlace(
      dest: org.apache.hadoop.fs.Path,
      write: org.apache.hadoop.fs.Path => Unit)(implicit spark: SparkSession): Unit = {
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val suffix = UUID.randomUUID().toString.take(8)
    val staging = new org.apache.hadoop.fs.Path(
      dest.toString.stripSuffix("/") + s"__graft_staging_$suffix")
    write(staging)
    val old = new org.apache.hadoop.fs.Path(staging + "_old")
    if (!fs.rename(dest, old))
      throw new IllegalStateException(s"merge swap: cannot move $dest aside")
    if (!fs.rename(staging, dest)) {
      fs.rename(old, dest) // restore
      throw new IllegalStateException(s"merge swap: cannot publish $staging to $dest")
    }
    fs.delete(old, true)
  }

  /** insertInto is position-based — reorder to the table's schema first. */
  private def alignedTo(df: DataFrame, table: String)(
      implicit spark: SparkSession): DataFrame = {
    val cols = spark.table(table).columns
    df.select(cols.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
  }

  def partitionColumns(table: String)(implicit spark: SparkSession): Seq[String] =
    spark.catalog.listColumns(table).collect().toSeq
      .filter(_.isPartition).map(_.name)

  private def withConf[A](key: String, value: String)(body: => A)(
      implicit spark: SparkSession): A = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}
