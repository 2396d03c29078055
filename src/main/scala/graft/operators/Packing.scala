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

  /** BIN-PACKING flavor of sequence packing — best-fit-decreasing
    * within each shard, for pipelines that may reorder documents inside
    * a shard and want the padding waste gone: [[packSequences]] (the
    * concat-in-id-order contract) leaves `pack_tokens < budget` slack
    * wherever the running sum crosses a boundary, while BFD places each
    * document (largest first) into the open pack with the LEAST
    * remaining room that still fits it — the classic 11/9·OPT+1 family.
    * Fully deterministic: order is `(tokens DESC, id ASC)`, the fit tie
    * breaks to the lowest pack id, so reruns and shards reproduce
    * bit-for-bit. Documents longer than `budget` get a pack of their
    * own (never reopened), mirroring how an oversized doc would be
    * truncated/split downstream.
    *
    * Scale shape: one hash exchange on the shard + an in-partition
    * `(shard, tokens DESC, id)` sort — the same shuffle the window
    * packer pays — then a single streaming pass whose working set is
    * the OPEN-PACK table only (`TreeMap[residual → pack ids]`,
    * ~16 bytes per pack, never the documents), so a shard's memory is
    * O(total_tokens/budget), not O(docs). Output:
    * `(id, shard, tokens, pack_id)` with `pack_id` 0-based per shard.
    *
    * Not SQL-expressible (the fit decision is sequential), so the
    * driver gate checks invariants instead: doc/token totals exact, no
    * pack over budget, and pack count no worse than [[packSequences]]'
    * on the same shards (and ≥ the ceil(total/budget) lower bound). */
  def packBestFitDecreasing(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      budget: Int,
      shards: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(shards > 0, "shards must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val prepped = df
      .select(col(idCol).cast("long").as("id"),
        col(tokenCol).cast("long").as("tokens"))
      .withColumn("shard", pmod(col("id"), lit(shards.toLong)))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("tokens").desc, col("id").asc)
      .select("shard", "tokens", "id").as[(Long, Long, Long)]
    prepped.mapPartitions { it =>
      // Streaming best-fit over one partition; partitions hold whole
      // shards (hash exchange on shard), possibly several — state
      // resets at each shard boundary. Open packs indexed by residual.
      var shard = Long.MinValue
      var bins = new java.util.TreeMap[Long, java.util.TreeSet[Integer]]()
      var residual = scala.collection.mutable.Map[Int, Long]()
      var nextBin = 0
      def reset(s: Long): Unit = {
        shard = s; bins = new java.util.TreeMap(); residual.clear(); nextBin = 0
      }
      def place(t: Long): Int = {
        val e = bins.ceilingEntry(t)
        if (t <= budget && e != null) {
          val bin: Int = e.getValue.first()
          e.getValue.remove(bin)
          if (e.getValue.isEmpty) bins.remove(e.getKey)
          val r = residual(bin) - t
          residual(bin) = r
          if (r > 0) bins.computeIfAbsent(r, _ => new java.util.TreeSet())
            .add(bin)
          bin
        } else {
          val bin = nextBin; nextBin += 1
          val r = budget.toLong - t
          residual(bin) = r
          if (r > 0) bins.computeIfAbsent(r, _ => new java.util.TreeSet())
            .add(bin)
          bin
        }
      }
      it.map { case (s, t, id) =>
        if (s != shard) reset(s)
        (id, s, t, place(t).toLong)
      }
    }.toDF("id", "shard", "tokens", "pack_id")
      .withColumnRenamed("id", idCol)
      .withColumnRenamed("tokens", tokenCol)
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
