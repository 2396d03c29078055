package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: assign each document to the
  * fixed-size context window ("pack") it would land in if the corpus were
  * concatenated in order and cut every `budget` tokens — the standard
  * concat-then-chunk batching scheme. The assignment is pure arithmetic
  * over a running token total, so it is deterministic and exactly
  * SQL-expressible (the DuckDB oracle replicates it with the same window
  * function).
  *
  * Scale shape: a single global running sum would serialize on one
  * partition, so the corpus is sharded by a deterministic function of the
  * id (`pmod(id, shards)`) and packed WITHIN each shard — one hash
  * shuffle + per-shard window sort, fully parallel, and each shard's
  * packing is independently reproducible. Shard count should track
  * cluster parallelism (it only bounds the window size, not the
  * semantics). Documents longer than `budget` span packs; they belong to
  * the pack where their first token lands (their tail fills the
  * following packs, exactly as the training loader would consume them).
  */
object Packing {

  /** Pack assignment. Output: every input row plus
    *   - `shard`   — pmod(id, shards)
    *   - `pack_id` — window index within the shard (0-based)
    *   - `pack_offset` — the doc's first-token offset inside its pack.
    * `tokenCol` must be a non-negative integer column (token count). */
  def packSequences(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      budget: Int,
      shards: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(shards > 0, "shards must be positive")
    val w = Window.partitionBy("shard").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", pmod(col(idCol), lit(shards)).cast("int"))
      .withColumn("__cum_before",
        sum(col(tokenCol)).over(w) - col(tokenCol))
      .withColumn("pack_id", floor(col("__cum_before") / budget).cast("long"))
      .withColumn("pack_offset", pmod(col("__cum_before"), lit(budget)).cast("long"))
      .drop("__cum_before")
  }
}
