package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.HeavyHitters
import graft.operators.Checkpoints.CapOps

/** Streaming twin of [[graft.operators.HeavyHitters.exactTopK]]: track
  * heavy hitters over an unbounded value stream with BOUNDED state —
  * a full streaming `groupBy(value).count()` keeps one state row per
  * distinct value forever (trillions of web-text singletons), while
  * this keeps one Misra–Gries summary per shard: ≤ 2·sketchSize
  * counters plus the explicit slack bound, independent of the stream's
  * cardinality.
  *
  * Values hash-route to a shard (`pmod(xxhash64(v), shards)`), so each
  * value's full count lives in exactly ONE shard's summary — an absent
  * value's true count is bounded by ITS shard's slack, hence by the
  * max shard slack. Each micro-batch the shard folds its new values
  * into the summary and emits a sequence-tagged snapshot (Append mode
  * writes to any sink; the reader keeps each shard's latest sequence).
  *
  * [[topKStaged]] closes the loop with the same always-exact contract
  * as the batch operator: drain the staged batches, take the final
  * summaries, recount the candidates EXACTLY over the full corpus,
  * and gate — the k-th count must beat the max shard slack, else fall
  * back to the full groupBy. The summaries' content depends on
  * arrival order, but the gated RESULT does not: the slack bound holds
  * for every order, so exactness is order-independent. */
object StreamingHeavyHitters {

  case class InVal(v: String, shard: Int)
  case class SummaryRow(shard: Int, seq: Long, value: String, cnt: Long, slack: Long)
  case class ShardState(counts: Map[String, Long], slack: Long, seq: Long)

  /** The stateful summary transform (streaming in, streaming out):
    * per-shard Misra–Gries folding with sequence-tagged snapshot
    * emission. Emission is ≤ 2·sketchSize rows per shard per batch. */
  def summaryStream(
      df: DataFrame,
      valueCol: String,
      sketchSize: Int,
      shards: Int): DataFrame = {
    require(sketchSize >= 1, "sketchSize must be >= 1")
    require(shards >= 1, "shards must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val typed = df
      .select(col(valueCol).cast("string").as("v"))
      .filter(col("v").isNotNull)
      .withColumn("shard", pmod(xxhash64(col("v")), lit(shards.toLong)).cast("int"))
      .as[InVal]
    typed.groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[InVal], state: GroupState[ShardState]) =>
          val prior = state.getOption.getOrElse(ShardState(Map.empty, 0L, -1L))
          val mg = new HeavyHitters.MgSummary(sketchSize)
          prior.counts.foreach { case (v, c) => mg.add(v, c) }
          mg.slack += prior.slack
          rows.foreach(r => mg.add(r.v))
          val seq = prior.seq + 1
          state.update(ShardState(mg.counts.toMap, mg.slack, seq))
          // ALWAYS at least one row per invoked shard per batch: a trim
          // can empty the counter map (> 2·sketchSize near-equal values),
          // and a silent batch would leave the reader's max(seq) window
          // on an OLDER snapshot whose smaller slack understates the
          // bound — breaking the always-exact gate. The null-value
          // sentinel carries (shard, seq, slack); readers drop it from
          // the candidate set but keep its slack.
          if (mg.counts.isEmpty)
            Iterator.single(SummaryRow(shard, seq, null, 0L, mg.slack))
          else mg.counts.iterator.map { case (v, c) =>
            SummaryRow(shard, seq, v, c, mg.slack)
          }
      }.toDF()
  }

  /** Drain id-ordered staged batches through [[summaryStream]], then
    * return the EXACT top-k: final-sequence candidates recounted over
    * the full corpus, provable-exactness gate (k-th count must beat
    * the max shard slack), full-groupBy fallback. Same contract as
    * the batch [[HeavyHitters.exactTopK]]: always exact. */
  def topKStaged(
      spark: SparkSession,
      batches: Seq[DataFrame],
      valueCol: String,
      k: Int,
      sketchSize: Int,
      shards: Int = 8): DataFrame = {
    require(k >= 1, "k must be >= 1")
    import spark.implicits._
    val (emitted, _) = StagedDrain.run(spark, batches,
      src => summaryStream(src, valueCol, sketchSize, shards))
    val latest = emitted
      .withColumn("__mx", max(col("seq"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("shard")))
      .filter(col("seq") === col("__mx"))
    val slackBound = latest.agg(
      coalesce(max(col("slack")), lit(0L))).as[Long].head()
    val all = batches.reduce(_ unionByName _)
      .select(col(valueCol).cast("string").as("value"))
      .filter(col("value").isNotNull)
    def fullTopK: DataFrame = all.groupBy("value")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("value").asc).limit(k)
    val cand = latest.select(col("value"))
      .filter(col("value").isNotNull).distinct() // drop empty-map sentinels
    val recount = all.join(broadcast(cand), Seq("value"), "left_semi")
      .groupBy("value").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("value").asc).limit(k)
      .capLineage()
    val head = recount.collect()
    val exact = slackBound == 0L ||
      (head.length == k && head.last.getLong(1) > slackBound)
    if (exact) recount else fullTopK
  }
}
