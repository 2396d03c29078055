package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-column data-quality profile (the Deequ/Great-Expectations class of
  * check a curation pipeline runs before and after every transform):
  * row count, null count, distinct count, min/max — one row per column.
  *
  * min/max are cast to string so columns of any type share one output
  * schema.
  *
  * Distinct counting has two modes, each with its own scale-safe plan:
  *   - `exact = false` (default): `approx_count_distinct` (HLL) in ONE
  *     wide aggregate (map-side partial combine) + a `stack` unpivot —
  *     one corpus scan, nothing but a single aggregate row moves; the
  *     sane choice at 10⁸+ rows.
  *   - `exact = true`: per-column TWO-LEVEL aggregation —
  *     `groupBy(c).count` (narrow keyed shuffle, map-side combined)
  *     followed by a global roll-up over the group counts, one branch
  *     per column, unioned. Deliberately NOT `count(DISTINCT c)` per
  *     column in one aggregate: Spark plans multi-column exact
  *     distincts through an Expand that duplicates every input row
  *     ×|cols| into one shuffle — at 100 TB that's |cols|× the corpus
  *     through a single exchange. The per-column branches instead each
  *     scan ONE column (parquet column pruning: total I/O ≈ one full
  *     scan) and shuffle only distinct values. Measured at sf0.1: the
  *     Expand plan was the suite's most expensive query (17.7 s); the
  *     two-level plan removes the Expand node entirely (pinned by
  *     ProfileSpec's executed-plan assertion).
  */
object Profile {

  def tableProfile(
      df: DataFrame,
      cols: Seq[String],
      exact: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    cols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))

    if (exact) {
      // Per-column branches: (group counts) -> (roll-up). A null group
      // carries the null count; min/max ignore nulls by SQL semantics.
      val perCol = cols.map { c =>
        df.select(col(c).as("__v"))
          .groupBy("__v")
          .agg(count(lit(1)).as("__cnt"))
          .agg(
            coalesce(sum(col("__cnt")), lit(0L)).as("n_rows"),
            coalesce(sum(when(col("__v").isNull, col("__cnt")).otherwise(0L)),
              lit(0L)).as("n_nulls"),
            count(when(col("__v").isNotNull, lit(1))).as("n_distinct"),
            min(col("__v")).cast("string").as("min_value"),
            max(col("__v")).cast("string").as("max_value"))
          .select(lit(c).as("column_name"), col("n_rows"), col("n_nulls"),
            col("n_distinct"), col("min_value"), col("max_value"))
      }
      perCol.reduce(_ unionAll _)
    } else {
      val aggs = cols.flatMap { c =>
        Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
          approx_count_distinct(col(c)).as(s"__dist_$c"),
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

  /** Join-cardinality profile: EXACTLY how many rows `left ⋈ right` on
    * `keys` would produce, and how that mass distributes over keys —
    * the number you want BEFORE launching a 100 TB join, because a
    * multiplicative key (n_left × n_right per key) is how a 10⁹-row
    * join becomes a 10¹³-row job. Output is ONE row:
    *   - `predicted_rows`: Σ_key n_left(key)·n_right(key) — the exact
    *     inner-join row count;
    *   - `n_join_keys`: keys present on both sides;
    *   - `max_left_mult` / `max_right_mult`: the heaviest key's row
    *     count per side (the [[SkewJoin]] decision inputs);
    *   - `max_key_rows`: the largest single key's output contribution —
    *     if this alone exceeds what one task should hold, no amount of
    *     partitioning saves the plain join; salt or hot/cold-split it.
    * Cost: one keyed count per side (map-side combined) + a join over
    * the DISTINCT KEYS only — never the data rows. */
  def joinCardinality(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "joinCardinality requires join keys")
    val lc = left.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__nl"))
    val rc = right.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__nr"))
    lc.join(rc, keys)
      .select((col("__nl") * col("__nr")).as("__rows"),
        col("__nl"), col("__nr"))
      .agg(
        coalesce(sum(col("__rows")), lit(0L)).as("predicted_rows"),
        count(lit(1)).as("n_join_keys"),
        coalesce(max(col("__nl")), lit(0L)).as("max_left_mult"),
        coalesce(max(col("__nr")), lit(0L)).as("max_right_mult"),
        coalesce(max(col("__rows")), lit(0L)).as("max_key_rows"))
  }

  /** Fixed-width histogram of a numeric column over [lo, hi): bins
    * 1..nBins, with underflow in bin 0 and overflow in bin nBins+1
    * (`width_bucket` semantics), EMPTY BINS INCLUDED — a profile whose
    * shape doesn't depend on the data is joinable/diffable across
    * snapshots, which is the point of profiling. One scan + one tiny
    * keyed aggregate; the bin frame is a generated `spark.range`, so the
    * output is exactly nBins+2 rows no matter the data. Nulls are
    * ignored. */
  def histogram(
      df: DataFrame,
      c: String,
      lo: Double,
      hi: Double,
      nBins: Int): DataFrame = {
    require(df.columns.contains(c), s"no such column: $c")
    require(nBins > 0 && hi > lo, s"need nBins>0 and hi>lo, got $nBins, [$lo, $hi)")
    val spark = df.sparkSession
    val w = (hi - lo) / nBins
    val x = col(c).cast("double")
    val bin = when(x < lo, lit(0L))
      .when(x >= hi, lit(nBins + 1L))
      .otherwise(floor((x - lo) / w).cast("long") + 1L)
    val counts = df.where(x.isNotNull)
      .groupBy(bin.as("bin")).agg(count(lit(1)).as("n"))
    spark.range(0, nBins + 2).select(col("id").as("bin"))
      .join(counts, Seq("bin"), "left")
      .select(col("bin"),
        (lit(lo) + (col("bin") - 1L) * w).as("lo_edge"),
        (lit(lo) + col("bin") * w).as("hi_edge"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Per-column quantile profile over NUMERIC columns: discrete
    * percentiles (`percentile_disc` semantics — the value at 1-based
    * sorted position max(1, ceil(p·n)), nulls ignored). Each reported
    * value is an actual data value, which makes the profile
    * engine-portable: two engines agreeing on the sorted order report
    * bit-identical doubles, where interpolated or approximate quantiles
    * differ in the last ULP or by sketch design.
    *
    * NOT implemented with the `percentile_disc` aggregate: that is a
    * buffering `TypedImperativeAggregate` whose merge concatenates every
    * value of the column onto a single node — at 10⁸+ rows it's an OOM,
    * and at sf0.1 it already measured 10 s for three columns. Instead,
    * exact DISTRIBUTED rank selection, ALL COLUMNS IN ONE PASS (the
    * columns are melted to (column, value) rows first, so k columns do
    * not cost k scans + k shuffles the way a per-column loop would):
    *   1. melt to (__c, __v) and range-repartition on (__c, __v) —
    *      tuple ordering makes each column's partitions contiguous and
    *      ordered, exactly as a per-column range shuffle would, just
    *      sharing one exchange;
    *   2. per-(partition, column) counts → per-column cumulative
    *      offsets (≤ P·k longs to the driver, nothing else leaves the
    *      executors);
    *   3. each target (column, global rank) resolves to (partition,
    *      column, local rank);
    *   4. `row_number` over (__pid, __c) + a broadcast join picks the
    *      values.
    * Memory per task is one partition's slice (spills if needed); every
    * stage is a keyed shuffle or broadcast — the same plan works when
    * the column is 10 TB. `approx_percentile` (mergeable GK sketch)
    * remains the cheaper one-pass alternative where a toleranced answer
    * is acceptable (ProfileSpec shows the gating pattern). */
  def quantileProfile(
      df: DataFrame,
      cols: Seq[String],
      probs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9, 0.99)): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    cols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
      s"probabilities must be in [0,1]: $probs")
    val spark = df.sparkSession
    import org.apache.spark.sql.expressions.Window

    val nParts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val stackArgs = cols.map(c => s"'$c', CAST(`$c` AS DOUBLE)").mkString(", ")
    val melted = df
      .select(expr(s"stack(${cols.size}, $stackArgs) AS (__c, __v)"))
      .where(col("__v").isNotNull)
    val ranged = melted.repartitionByRange(nParts, col("__c"), col("__v"))
      .withColumn("__pid", spark_partition_id())
      .persist()
    val collected =
      try {
        val counts = ranged.groupBy("__pid", "__c").count().collect()
          .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
        // For a fixed column, partitions in pid order hold ascending
        // value slices (the range ordering is (__c, __v)), so global
        // rank r lives in the first of ITS COLUMN'S partitions whose
        // cumulative count reaches r.
        val targets = cols.flatMap { c =>
          val pc = counts.filter(_._2 == c).sortBy(_._1)
          val n = pc.map(_._3).sum
          if (n == 0L) Nil
          else {
            val offsets = pc.scanLeft(0L)(_ + _._3).init
            probs.map { p =>
              val r = math.max(1L, math.ceil(p * n).toLong)
              val idx = pc.indices.find(i => offsets(i) + pc(i)._3 >= r).get
              (pc(idx)._1, c, r - offsets(idx), p)
            }
          }
        }
        val found =
          if (targets.isEmpty) Seq.empty[(String, Double, Option[Double])]
          else {
            val targetDf = spark.createDataFrame(targets)
              .toDF("__pid", "__c", "__local", "__prob")
            val ranked = ranged.withColumn("__rn",
              row_number().over(Window.partitionBy("__pid", "__c").orderBy("__v")))
            ranked
              .join(broadcast(targetDf),
                ranked("__pid") === targetDf("__pid") &&
                  ranked("__c") === targetDf("__c") &&
                  col("__rn") === col("__local"))
              .select(ranked("__c"), col("__prob"), col("__v"))
              .collect()
              .map(r => (r.getString(0), r.getDouble(1), Some(r.getDouble(2))))
              .toSeq
          }
        // All-null/empty columns still report every probe, as NULLs.
        val present = found.map(_._1).toSet
        found ++ cols.filterNot(present)
          .flatMap(c => probs.map(p => (c, p, Option.empty[Double])))
      } finally ranged.unpersist()
    val rows = collected.map { case (c, p, v) =>
      (c, p, v.map(java.lang.Double.valueOf).orNull)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(r => org.apache.spark.sql.Row(r._1, r._2, r._3)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("column_name",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("quantile",
          org.apache.spark.sql.types.DoubleType, nullable = false),
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.DoubleType, nullable = true))))
  }
}
