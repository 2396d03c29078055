package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diffing for versioned corpora: classify every row of two
  * table versions as added / removed / changed / unchanged. This is the
  * data-versioning primitive an incremental 100 TB pipeline runs FIRST —
  * its output feeds the incremental paths that already exist here
  * (`Dedup.minHashLshIncremental` dedups `added ∪ changed` against the
  * signature store; embeddings/quality only recompute for touched docs)
  * instead of reprocessing the whole corpus per crawl.
  *
  * The reference's recon engine (`source/pyzzle/recon/recon.py:83-194`)
  * answers "do two sources AGGREGATE the same" — this answers the
  * row-level question its users would ask next, with the same
  * full-outer-join shape.
  *
  * Scale shape: each side is projected to `(id, fingerprint)` BEFORE the
  * join — the md5 fingerprint is 32 bytes, so the full-outer equi-join on
  * id shuffles two narrow frames, never the payload columns. One keyed
  * shuffle per side, no windows, no driver state. The fingerprint is
  * engine-portable (DuckDB's md5/concat_ws produce identical hex), which
  * is what lets an independent engine audit the verdicts.
  *
  * Null discipline: values are stringified with a NUL sentinel for
  * NULL and joined on `\u0001`, so `NULL` vs `''` vs absent-column can
  * never collide. Comparison is on the STRING form — columns whose cast
  * is engine-ambiguous (float formatting) should be pre-rounded/cast by
  * the caller; id and text/string/integral columns compare exactly.
  * Known limit (the standard surrogate-key caveat, dbt/Delta do the
  * same): a value CONTAINING the SOH separator can collide across
  * column boundaries — irrelevant for natural text/ids, callers with
  * binary columns should hash per column first.
  */
object Snapshot {

  /** md5 fingerprint over `cols` with null sentinels (see object doc). */
  def rowFingerprint(cols: Seq[Column]): Column =
    md5(concat_ws("\u0001",
      cols.map(c => coalesce(c.cast("string"), lit("\u0000"))): _*))

  /** Row-level diff: one row per id present in either snapshot with
    * `status` ∈ added | removed | changed | unchanged. Output columns:
    * (idCol, status, old_fp, new_fp) — fingerprints kept so downstream
    * can route changed rows without recomputing them. */
  def diff(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "compareCols must not be empty")
    val o = oldDf.select(col(idCol).as("__oid"),
      rowFingerprint(compareCols.map(oldDf(_))).as("old_fp"))
    val n = newDf.select(col(idCol).as("__nid"),
      rowFingerprint(compareCols.map(newDf(_))).as("new_fp"))
    o.join(n, o("__oid") === n("__nid"), "full")
      .select(
        coalesce(col("__oid"), col("__nid")).as(idCol),
        when(col("__oid").isNull, "added")
          .when(col("__nid").isNull, "removed")
          .when(col("old_fp") === col("new_fp"), "unchanged")
          .otherwise("changed").as("status"),
        col("old_fp"), col("new_fp"))
  }

  /** The diff rolled up per status: row count plus an id checksum (sum of
    * ids), the snapshot-delta health row a pipeline monitors per crawl.
    * Statuses with no rows are materialized with zeros so the summary
    * shape is data-independent (the [[Profile.histogram]] discipline). */
  def diffSummary(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      compareCols: Seq[String]): DataFrame = {
    val statuses = Seq("added", "removed", "changed", "unchanged")
    val spark = oldDf.sparkSession
    import spark.implicits._
    val shape = statuses.toDF("status")
    val agg = diff(oldDf, newDf, idCol, compareCols)
      .groupBy("status")
      .agg(count(lit(1)).as("n"), sum(col(idCol)).as("id_sum"))
    shape.join(agg, Seq("status"), "left")
      .select(col("status"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("id_sum"), lit(0L)).as("id_sum"))
  }
}
