package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (time-travel) join: for each left row, attach the payload of the
  * LATEST right row with `right.ts <= left.ts`, per join key — the classic
  * "state of the dimension at event time" operator (market data, feature
  * lookups, slowly-changing joins).
  *
  * Spark has no built-in ASOF JOIN. The naive formulation —
  * `l JOIN r ON l.k = r.k AND r.ts <= l.ts` + keep max —
  * materializes O(|matches|²) pairs per key and dies at scale. This
  * implementation is the union-sort formulation:
  *
  *   1. union left and right rows, tagged by side (right sorts before left
  *      at equal timestamps so `<=` matches same-instant rows);
  *   2. one window pass per key ordered by (ts, side): running
  *      `last(payload, ignoreNulls)` carries the most recent right payload
  *      forward onto every subsequent left row;
  *   3. keep the left rows.
  *
  * Cost: ONE shuffle on the join key + a sort within partitions — linear
  * in input size, no pair blowup, skew bounded by per-key row counts
  * (same profile as any keyed window). This is the shape that survives a
  * 100× scale-up.
  */
object AsOfJoin {

  /** @param left      probe side; all its columns are preserved
    * @param right     state side; `payloadCols` are attached to left rows
    * @param on        equi-join keys present on both sides
    * @param leftTs    event-time column on `left`
    * @param rightTs   event-time column on `right`
    * @param payloadCols right columns to carry (default: all except keys+ts)
    * @param toleranceSeconds if positive, a right match more than this many
    *   seconds away from the left row is treated as NO match (payload
    *   NULL) — the "state too stale to use" guard every feature-lookup
    *   pipeline wants. Applied after the window pass as a pure projection,
    *   so it adds zero shuffles.
    * @param direction "backward" (default): latest right row with
    *   `right.ts <= left.ts`; "forward": earliest right row with
    *   `right.ts >= left.ts` (next-event attribution). Same plan either
    *   way — only the window ordering flips.
    *
    * Right rows that share (key, ts) are deterministically collapsed to
    * one row (greatest payload struct) first, so the result is unique and
    * stable — mirroring DuckDB's ASOF JOIN determinism contract.
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTs: String,
      rightTs: String,
      payloadCols: Seq[String] = Nil,
      toleranceSeconds: Long = -1L,
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be 'backward' or 'forward', got '$direction'")
    val payload =
      if (payloadCols.nonEmpty) payloadCols
      else right.columns.filterNot(c => on.contains(c) || c == rightTs).toSeq
    require(payload.nonEmpty, "as-of join needs at least one right payload column")

    // one deterministic right row per (key, ts): max payload tuple
    val rightOne = right
      .groupBy((on :+ rightTs).map(col): _*)
      .agg(max(struct(payload.map(col): _*)).as("__p"))
      .select(on.map(col) :+ col(rightTs).as("__ts") :+ col("__p"): _*)
      .withColumn("__side", lit(0))

    val leftTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))

    val unioned = leftTagged.unionByName(rightOne, allowMissingColumns = true)

    // backward: walk timestamps ascending, the running last right payload
    // is the latest right row at-or-before each left row. forward: walk
    // DESCENDING, the running last right payload is the earliest right
    // row at-or-after. Right sorts before left at equal ts either way,
    // so same-instant rows match (<= / >=).
    val tsOrder =
      if (direction == "backward") col("__ts").asc else col("__ts").desc
    val w = Window
      .partitionBy(on.map(col): _*)
      .orderBy(tsOrder, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = unioned
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .withColumn("__match_ts",
        last(when(col("__side") === 0, col("__ts")), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val withinTol =
      if (toleranceSeconds <= 0) matched
      else matched.withColumn("__match",
        when(abs(col("__ts").cast("double") - col("__match_ts").cast("double"))
          <= toleranceSeconds.toDouble, col("__match")))
    withinTol.select(left.columns.map(col) ++
      payload.map(c => col(s"__match.$c").as(c)): _*)
  }
}
