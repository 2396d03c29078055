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

  /** Sliding-window token CHUNKING of long documents — the standard
    * preprocessing step upstream of packing: split each document into
    * windows of at most `maxTokens` whitespace tokens, consecutive
    * windows overlapping by `overlap` tokens (stride = maxTokens −
    * overlap). Chunk starts are 0, stride, 2·stride, …; a window is
    * emitted only while it contributes at least one token not covered by
    * its predecessor, so no chunk is ever a subset of the previous one
    * and every token appears in ≥1 chunk. Token-less documents emit no
    * chunks. Chunks are built over NORMALIZED tokens (lowercased,
    * whitespace-collapsed — `TextFunctions.tokens`), the same stream a
    * token-count budget or tokenizer sees.
    *
    * Output: `idCol`, `chunk_id` (0-based), `n_tokens` (window length),
    * `chunk_text` (the window's tokens re-joined with single spaces).
    *
    * Scale shape: one projection computes the token array and chunk
    * count, one `posexplode` fans out to chunk grain, and `slice` +
    * `concat_ws` assemble each window — no shuffle at all; chunking is
    * embarrassingly row-parallel. The chunk-count arithmetic is integer
    * (`(n − overlap + stride − 1) div stride`), so the DuckDB oracle
    * reproduces boundaries exactly. */
  def chunkDocuments(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxTokens: Int,
      overlap: Int = 0): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens): $overlap vs $maxTokens")
    val stride = maxTokens - overlap
    val toks = graft.functions.TextFunctions.tokens(col(textCol))
    val n = size(col("__toks"))
    val nChunks = when(n <= 0, lit(0))
      .when(n <= maxTokens, lit(1))
      .otherwise(floor((n - overlap + (stride - 1)) / lit(stride.toDouble)).cast("int"))
    df.select(col(idCol), toks.as("__toks"))
      .withColumn("__nc", nChunks)
      .filter(col("__nc") > 0)
      .select(col(idCol), col("__toks"),
        posexplode(sequence(lit(0), col("__nc") - 1)).as(Seq("chunk_id", "__s")))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        slice(col("__toks"), col("chunk_id") * stride + 1, lit(maxTokens)).as("__w"))
      .select(col(idCol), col("chunk_id"),
        size(col("__w")).cast("long").as("n_tokens"),
        concat_ws(" ", col("__w")).as("chunk_text"))
  }
}
