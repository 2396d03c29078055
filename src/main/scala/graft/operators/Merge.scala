package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE as a deterministic join-rewrite (no Delta in the environment, and
  * vanilla parquet catalog tables don't support `MERGE INTO`).
  *
  * Semantics reproduced from the reference's Delta merge
  * (datasource/delta.py:104-148, etl/update_and_upsert.py):
  *   - condition: `base AND TGT.pk1=SRC.pk1 AND …` with fixed aliases
  *     TGT/SRC (delta.py:115,143; update_and_upsert.py:3-8);
  *   - update set = `update_column ∪ primary_key_column`
  *     (update_and_upsert.py:26-27);
  *   - upsert inserts carry values ONLY for the update set — every other
  *     target column is NULL (delta.py:124-127,146-147);
  *   - multiple source rows matching one target row is an error, matching
  *     Delta's contract.
  *
  * The plan is three joins of target against source on the same equi-keys —
  * Catalyst plans them as shuffle joins partitioned by pk (or broadcasts a
  * small source), so at 100 TB this scales like any keyed join; no driver
  * collect anywhere. The rewrite touches the whole target; partition-scoped
  * rewrite (only files containing matches) is a format capability (Delta)
  * that plain parquet lacks — documented trade-off.
  */
object Merge {

  /** Pure plan: returns the post-merge contents of `target` (lazy). */
  def apply(
      target: DataFrame,
      source: DataFrame,
      primaryKeys: Seq[String],
      updateColumns: Seq[String],
      baseCondition: String = "1=1",
      insertWhenNotMatched: Boolean = false): DataFrame = {

    require(primaryKeys.nonEmpty, "merge requires primary key columns")
    val updateSet = (updateColumns ++ primaryKeys).distinct
    val tgtCols = target.columns.toSeq
    val srcCols = source.columns.toSet

    val tgt = target.alias("TGT")
    val src = source.alias("SRC")
    val cond: Column =
      primaryKeys.map(k => col(s"TGT.$k") === col(s"SRC.$k")).reduce(_ && _) &&
        expr(baseCondition)

    // Matched target rows take SRC values for the update set.
    val matched = tgt.join(src, cond, "inner").select(
      tgtCols.map { c =>
        if (updateSet.contains(c) && srcCols.contains(c)) col(s"SRC.$c").as(c)
        else col(s"TGT.$c").as(c)
      }: _*)

    val untouched = tgt.join(src, cond, "left_anti")
      .select(tgtCols.map(col): _*)

    val base = untouched.unionByName(matched)

    if (!insertWhenNotMatched) base
    else {
      // Not-matched source rows: update-set columns from SRC, NULL elsewhere
      // (reference golden data: upserted rows carry NULL c5/c6).
      val tgtSchema = target.schema
      val inserts = src.join(tgt, cond, "left_anti").select(
        tgtCols.map { c =>
          if (updateSet.contains(c) && srcCols.contains(c))
            col(s"SRC.$c").cast(tgtSchema(c).dataType).as(c)
          else lit(null).cast(tgtSchema(c).dataType).as(c)
        }: _*)
      base.unionByName(inserts)
    }
  }

  /** Fails if more than one source row matches a single target row —
    * Delta's multiple-matches contract. Joins the FULL target (tagged with
    * a per-row id) so `baseCondition` may reference any TGT column, not
    * just primary keys; counts source matches per target ROW. One extra
    * keyed aggregation job; scales map-side (partial count). */
  def checkAmbiguousMatches(
      target: DataFrame,
      source: DataFrame,
      primaryKeys: Seq[String],
      baseCondition: String): Unit = {
    val tgt = target
      .withColumn("__tgt_row", monotonically_increasing_id())
      .alias("TGT")
    val src = source.alias("SRC")
    val cond =
      primaryKeys.map(k => col(s"TGT.$k") === col(s"SRC.$k")).reduce(_ && _) &&
        expr(baseCondition)
    val dupes = tgt
      .join(src, cond, "inner")
      .groupBy(col("TGT.__tgt_row")).count()
      .filter(col("count") > 1)
      .limit(1).count()
    if (dupes > 0)
      throw new IllegalStateException(
        "Merge failed: multiple source rows matched a single target row " +
          s"on keys ${primaryKeys.mkString(", ")}")
  }
}
