package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.TextFunctions
import graft.operators.Dedup
import graft.operators.Checkpoints.CapOps

/** STREAMING incremental curation: a batch of new documents flows through
  * quality gating + exact dedup (TTL state) + minhash near-dup detection
  * against the PERSISTED signature store of the stable corpus — the
  * composition `incremental_curation` runs in batch, re-expressed as one
  * Structured Streaming query drained per staged micro-batch.
  *
  * Stage shapes (and why each survives 100 TB):
  *   1. quality gate — stateless scan-stage filter;
  *   2. per-doc minhash signature — [[Dedup.rowLocalMinhashSig]], the
  *      row-local twin of the batch signature (streaming scan stages
  *      cannot host aggregations); only the incoming batch pays the HOF
  *      cost, the corpus side reads its persisted store;
  *   3. band candidates — stream-static equi-join on (band, bandhash)
  *      against [[Dedup.bandedStore]]: stateless, keyed, never all-pairs;
  *   4. exact-Jaccard verification — stream-static join attaching stable
  *      text for CANDIDATES only, same verify-only-candidates discipline
  *      as every batch LSH pipeline;
  *   5. exact dedup + emission — ONE `flatMapGroupsWithState` keyed by
  *      the normalized-text fingerprint with an EVENT-TIME TTL (state
  *      bounded by keys active in the retention window, the
  *      StreamingDedup.firstPerKeyTtl discipline): the first batch
  *      containing a fingerprint emits one verdict row (min-id keeper,
  *      batch-duplicate count, distinct store matches, best Jaccard);
  *      later occurrences are suppressed until the lease expires.
  *
  * Determinism contract (what the driver oracle recomputes from raw
  * text): emission at the fingerprint's FIRST staged batch; keeper =
  * min id among that batch's rows; match set = stable docs whose
  * distinct-trigram Jaccard clears the threshold (band recall at these
  * parameters is 1.0 on the fixture — the same guarantee the
  * incremental-LSH family records in BASELINE.md). */
object StreamingCuration {

  /** Drain `batches` (each carrying `tsCol`) through the curation
    * pipeline; returns one verdict row per emitted fingerprint:
    * (idCol, n_batch_dups, n_store_matches, best_jaccard, kept). */
  def curate(
      spark: SparkSession,
      batches: Seq[DataFrame],
      stable: DataFrame,
      sigPath: String,
      textCol: String,
      idCol: String,
      tsCol: String,
      minQuality: Double = 0.5,
      shingleSize: Int = 3,
      numHashes: Int = 32,
      bands: Int = 16,
      threshold: Double = 0.6,
      watermarkDelay: String = "10 hours",
      retentionMs: Long = 7L * 24 * 3600 * 1000): DataFrame = {
    graft.functions.GraftFunctions.register(spark) // graft_minhash_sig
    // Both static sides are eagerly checkpointed: a static branch of a
    // stream-static join is RE-EVALUATED for every micro-batch (data and
    // no-data alike), and the stable shingle sets are interpreted-HOF
    // work worth paying exactly once per curate() call.
    val storeBands = Dedup.bandedStore(spark, sigPath, numHashes, bands)
      .withColumnRenamed("__id", "__sid")
      .capLineage()
    // Stable side carries its DISTINCT shingle set, computed once on the
    // static branch — the verify join must never re-shingle text per
    // candidate row.
    val stableShingles = stable.select(col(idCol).as("__sid"),
      array_distinct(TextFunctions.wordShingles(col(textCol), shingleSize))
        .as("__ssh"))
      .capLineage()

    val (emitted, _) = StagedDrain.run(spark, batches, df => {
      import spark.implicits._
      val q = df
        .filter(TextFunctions.qualityScore(col(textCol)) >= minQuality)
        .withWatermark(tsCol, watermarkDelay)
      // Signature + shingle set are computed ONCE per doc row, before the
      // band explode fans out to `bands` rows per doc.
      val banded = q
        .withColumn("__fp", TextFunctions.fingerprint(col(textCol)))
        .withColumn("__bsh",
          array_distinct(TextFunctions.wordShingles(col(textCol), shingleSize)))
        .withColumn("__bh", explode(Dedup.bandStructs(
          Dedup.rowLocalMinhashSig(col(textCol), shingleSize, numHashes),
          numHashes, bands)))
        .select(col("__fp"), col(tsCol), col(idCol), col("__bsh"),
          col("__bh.b").as("__band"), col("__bh.h").as("__bandhash"))
      // left_outer: docs with zero band collisions must still reach the
      // verdict stage (they are the KEPT ones).
      val withSh = banded
        .join(storeBands, Seq("__band", "__bandhash"), "left_outer")
        .join(stableShingles, Seq("__sid"), "left_outer")
      val jac = size(array_intersect(col("__bsh"), col("__ssh"))).cast("double") /
        size(array_union(col("__bsh"), col("__ssh"))).cast("double")
      val verified = withSh.select(
        col("__fp"),
        col(tsCol), // bare alias-free: the watermark attribute must survive
        col(idCol).cast("long").as("__id"),
        when(col("__sid").isNotNull && jac >= threshold, col("__sid").cast("long"))
          .as("__m"),
        when(col("__sid").isNotNull && jac >= threshold, jac).as("__mj"))
      verified
        .as[(String, java.sql.Timestamp, Long, Option[Long], Option[Double])]
        .groupByKey(_._1)
        .flatMapGroupsWithState[Long, (Long, Int, Int, Option[Double], Boolean)](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
          (fp: String,
           rows: Iterator[(String, java.sql.Timestamp, Long, Option[Long], Option[Double])],
           state: GroupState[Long]) =>
            if (state.hasTimedOut) { state.remove(); Iterator.empty }
            else {
              val rs = rows.toSeq
              val batchMax = rs.iterator.map(_._2.getTime).max
              val newMax = if (state.exists) math.max(state.get, batchMax) else batchMax
              val out =
                if (state.exists) Iterator.empty
                else {
                  // Each doc appears `bands` times (per band row) — set
                  // semantics give distinct docs and distinct matches.
                  val ids = rs.iterator.map(_._3).toSet
                  val matches = rs.iterator.flatMap(_._4).toSet
                  val best = rs.iterator.flatMap(_._5)
                    .foldLeft(Option.empty[Double])((a, v) =>
                      Some(a.fold(v)(math.max(_, v))))
                  Iterator((ids.min, ids.size - 1, matches.size, best, matches.isEmpty))
                }
              state.update(newMax)
              state.setTimeoutTimestamp(newMax + retentionMs)
              out
            }
        }
        .toDF(idCol, "n_batch_dups", "n_store_matches", "__bj", "kept")
        .withColumn("best_jaccard", round(col("__bj"), 4))
        .select(idCol, "n_batch_dups", "n_store_matches", "best_jaccard", "kept")
    })
    emitted
  }
}
