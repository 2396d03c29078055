package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-column data-quality profile (the Deequ/Great-Expectations class of
  * check a curation pipeline runs before and after every transform):
  * row count, null count, distinct count, min/max — one row per column.
  *
  * Shape: ONE wide aggregate (map-side partial combine) followed by a
  * `stack` unpivot, so the corpus is scanned once and nothing but the
  * single aggregate row moves. min/max are cast to string so columns of
  * any type share one output schema.
  *
  * Distinct counting has two modes:
  *   - `exact = false` (default): `approx_count_distinct` (HLL) — one
  *     plain aggregation pass, the only sane choice at 10⁸+ rows;
  *   - `exact = true`: `count(DISTINCT c)` per column. Spark plans
  *     multi-column exact distincts through an Expand (one input row
  *     duplicated per profiled column), so cost scales ×|cols| — fine
  *     for validation at test scale, deliberate at 100 TB.
  */
object Profile {

  def tableProfile(
      df: DataFrame,
      cols: Seq[String],
      exact: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    cols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))

    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)

    val stackArgs = cols.map { c =>
      s"'$c', __n, __nulls_$c, __dist_$c, __min_$c, __max_$c"
    }.mkString(", ")
    row
      .select(expr(
        s"stack(${cols.size}, $stackArgs) AS " +
          "(column_name, n_rows, n_nulls, n_distinct, min_value, max_value)"))
  }
}
