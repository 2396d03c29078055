package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING sequence packing — the incremental twin of
  * [[graft.operators.Packing.packSequences]] for the periodic-ingest
  * shape: each arriving batch of documents is appended to the existing
  * packs without re-reading the corpus.
  *
  * State is ONE LONG per shard (the running token total) — bounded by
  * construction, independent of corpus size; no TTL needed because the
  * key space IS the shard count. Documents are packed in id order
  * within each micro-batch group, so the stream equals the batch
  * packing of the full corpus exactly whenever per-shard ids arrive in
  * nondecreasing order across micro-batches — the natural shape when
  * batches are id- or time-partitioned crawl increments (the
  * `chunk_pack_streaming` query is gated by the IDENTICAL batch SQL).
  */
object StreamingPacking {

  // Encoder-visible row shapes (codegen'd projections cannot access
  // private members).
  case class InRow(id: Long, shard: Int, tokens: Long)
  case class OutRow(
      id: Long, shard: Int, tokens: Long, pack_id: Long, pack_offset: Long)

  /** The stateful packing transform (streaming or batch frame in,
    * streaming frame out when the input streams). Output columns:
    * `id`, `shard`, `tokens`, `pack_id`, `pack_offset` — same assignment law as
    * the batch window (`floor(cum_before / budget)`,
    * `cum_before mod budget`). */
  def packStream(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      budget: Int,
      shards: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(shards > 0, "shards must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val typed = df.select(
      col(idCol).cast("long").as("id"),
      pmod(col(idCol), lit(shards)).cast("int").as("shard"),
      col(tokenCol).cast("long").as("tokens")).as[InRow]
    typed.groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[InRow], state: GroupState[Long]) =>
          var cum = state.getOption.getOrElse(0L)
          // id order within the group: matches the batch window's
          // ORDER BY id. The sort is per-shard-per-micro-batch — bounded
          // by the batch size, never the corpus.
          val out = rows.toArray.sortBy(_.id).map { r =>
            val before = cum
            cum += r.tokens
            OutRow(r.id, shard, r.tokens, before / budget, before % budget)
          }
          state.update(cum)
          out.iterator
      }.toDF()
  }

  case class UnorderedState(
      cum: Long, maxSeen: Long, bufIds: Array[Long], bufToks: Array[Long])

  /** Out-of-order streaming packing with BOUNDED LATENESS — relaxes
    * [[packStream]]'s nondecreasing-id contract: rows may arrive out of
    * id order as long as no row lags the largest id its shard has seen
    * by more than `lateness`. Rows above the per-shard finalization
    * threshold (`maxSeen − lateness`) are buffered in state; once the
    * threshold passes them they are packed in exact id order against
    * the carried running total, so every EMITTED assignment equals the
    * batch packing of the full corpus. A row arriving BELOW an
    * already-finalized threshold (a lateness-contract violation) is
    * emitted with `pack_id = -1, pack_offset = -1` — the auditable
    * analog of a watermark late-drop; silently mis-packing it would
    * corrupt every later offset in the shard.
    *
    * State per shard: the running total, the monotonic max id, and the
    * not-yet-finalized buffer — bounded by `lateness` for dense ids (in
    * general by arrival-rate × disorder), never by corpus size. The
    * trailing `lateness`-wide tail at stream end stays buffered and
    * unemitted, exactly as a watermark holds its last window open. */
  def packStreamUnordered(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      budget: Int,
      shards: Int,
      lateness: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(shards > 0, "shards must be positive")
    require(lateness >= 0, "lateness must be >= 0")
    val spark = df.sparkSession
    import spark.implicits._
    val typed = df.select(
      col(idCol).cast("long").as("id"),
      pmod(col(idCol), lit(shards)).cast("int").as("shard"),
      col(tokenCol).cast("long").as("tokens")).as[InRow]
    typed.groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[InRow], state: GroupState[UnorderedState]) =>
          val st = state.getOption
            .getOrElse(UnorderedState(0L, Long.MinValue, Array.empty, Array.empty))
          val incoming = rows.toArray
          val prevThreshold =
            if (st.maxSeen == Long.MinValue) Long.MinValue
            else st.maxSeen - lateness
          // contract violators: below a threshold that already finalized
          val (late, fresh) = incoming.partition(r =>
            prevThreshold != Long.MinValue && r.id <= prevThreshold)
          val all = (st.bufIds.zip(st.bufToks).map { case (i, t) =>
            InRow(i, shard, t)
          } ++ fresh).sortBy(_.id)
          val maxSeen = math.max(st.maxSeen,
            if (incoming.isEmpty) Long.MinValue else incoming.map(_.id).max)
          val threshold =
            if (maxSeen == Long.MinValue) Long.MinValue else maxSeen - lateness
          val (fin, keep) = all.partition(_.id <= threshold)
          var cum = st.cum
          val out = fin.map { r =>
            val before = cum
            cum += r.tokens
            OutRow(r.id, shard, r.tokens, before / budget, before % budget)
          } ++ late.map(r => OutRow(r.id, shard, r.tokens, -1L, -1L))
          state.update(UnorderedState(
            cum, maxSeen, keep.map(_.id), keep.map(_.tokens)))
          out.iterator
      }.toDF()
  }

  /** Pack pre-tokenized rows drained incrementally over staged
    * id-ordered batches — the bare packing twin (no chunking). */
  def packStaged(
      spark: SparkSession,
      batches: Seq[DataFrame],
      idCol: String,
      tokenCol: String,
      budget: Int,
      shards: Int): DataFrame = {
    val (emitted, _) = StagedDrain.run(spark, batches,
      src => packStream(src, idCol, tokenCol, budget, shards))
    emitted
  }

  /** [[packStreamUnordered]] drained over staged batches. */
  def packStagedUnordered(
      spark: SparkSession,
      batches: Seq[DataFrame],
      idCol: String,
      tokenCol: String,
      budget: Int,
      shards: Int,
      lateness: Long): DataFrame = {
    val (emitted, _) = StagedDrain.run(spark, batches,
      src => packStreamUnordered(src, idCol, tokenCol, budget, shards, lateness))
    emitted
  }

  /** The full chunk→pack composition drained incrementally: documents
    * arrive in id-ordered staged batches, each batch is chunked (a
    * stateless projection) and packed against the carried per-shard
    * totals. Returns the emitted pack assignments for ALL batches.
    *
    * `chunk_key = id · keyFactor + chunk_id` is only collision-free while
    * every document's chunk count stays below `keyFactor` (i.e. docs
    * shorter than ~`keyFactor · stride` tokens). That contract is
    * ENFORCED per row: a chunk_id at or past keyFactor raises instead of
    * silently colliding with the next document's key space — a collision
    * would mis-order packing for every later chunk in the shard with no
    * other symptom. */
  def chunkPackStaged(
      spark: SparkSession,
      batches: Seq[DataFrame],
      textCol: String,
      idCol: String,
      maxTokens: Int,
      overlap: Int,
      keyFactor: Long,
      budget: Int,
      shards: Int): DataFrame = {
    val (emitted, _) = StagedDrain.run(spark, batches, src => {
      val chunks = graft.operators.Packing
        .chunkDocuments(src, textCol, idCol, maxTokens, overlap)
        .withColumn("chunk_key",
          when(col("chunk_id") < lit(keyFactor),
            col(idCol) * keyFactor + col("chunk_id"))
            .otherwise(raise_error(concat(
              lit(s"chunkPackStaged: chunk_id >= keyFactor=$keyFactor for doc "),
              col(idCol).cast("string"),
              lit(" — chunk keys would collide across documents; raise keyFactor")))))
      packStream(chunks, "chunk_key", "n_tokens", budget, shards)
    })
    emitted
  }
}
