package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Checkpoints.CapOps

/** Deterministic sampling and dataset splitting for training-data
  * pipelines.
  *
  * Everything here is a pure projection + filter over a row's own id — NO
  * shuffle, no RNG state, no driver work — so it costs one scan at any
  * scale, evaluates inside the scan stage (no exchange anywhere in the plan),
  * and a re-run (or a different engine) selects the EXACT same rows.
  * That reproducibility is the point: dataset mixing recipes, ablation
  * subsets, and train/val/test membership must be stable across runs and
  * auditable in SQL — `rand()`-based sampling is none of those.
  *
  * The hash is a Knuth multiplicative mix over (id + seed) in 64-bit
  * integer arithmetic, expressible identically in any SQL engine (the
  * DuckDB oracles replicate it verbatim): no engine-specific hash
  * function, no overflow (ids up to ~2^31 stay far below 2^63 before the
  * mod), uniform enough for percentage sampling. Bucket = bits 6..19 of
  * the 32-bit mix, reduced mod 10000 → per-mille-of-percent granularity.
  */
object Sampling {

  /** Knuth's multiplicative constant (golden-ratio scaled to 2^32). */
  val KnuthA = 2654435761L
  private val Mod32 = 1L << 32
  private val Mod31 = 1L << 31
  val Buckets = 10000L

  /** Deterministic bucket in [0, 10000) for an integer id. The mix input
    * is reduced mod 2^31 BEFORE the multiply: 2^31 · KnuthA < 2^63, so
    * the arithmetic can never overflow (Spark 4's ANSI mode throws on
    * wraparound) for any id/seed combination. For ids and seeds below
    * 2^31 the reduction is the identity, so existing bucket assignments
    * are unchanged. */
  def bucket(id: Column, seed: Long): Column =
    pmod(
      shiftrightunsigned(
        pmod(pmod(id.cast("long") + lit(seed % Mod31), lit(Mod31)) * lit(KnuthA),
          lit(Mod32)), 6),
      lit(Buckets))

  /** The same bucket as an inline SQL string (DuckDB/ANSI) — kept next to
    * the Column form so oracle SQL cannot drift from the implementation. */
  def bucketSql(idExpr: String, seed: Long): String =
    s"(((((($idExpr + ${seed % Mod31}) % $Mod31) * $KnuthA) % $Mod32) // 64) % $Buckets)"

  /** Bernoulli-by-hash sample: keeps ~`fraction` of rows, exactly
    * reproducible for a fixed seed. */
  def deterministicSample(
      df: DataFrame, idCol: String, fraction: Double, seed: Long): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0,1]")
    df.filter(bucket(col(idCol), seed) < lit((fraction * Buckets).toLong))
  }

  /** Stratified sample: a different rate per stratum value (e.g. keep 10%
    * of English, 50% of everything else when rebalancing a corpus).
    * Strata not in `fractions` fall back to `defaultFraction`. Still a
    * pure filter — the per-stratum threshold is a literal CASE tree, so
    * there is no groupBy and no shuffle at any corpus size. */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double,
      seed: Long): DataFrame = {
    val threshold = fractions.toSeq.sortBy(_._1).foldLeft(
      lit((defaultFraction * Buckets).toLong)) { case (acc, (k, f)) =>
      when(col(strataCol) === k, lit((f * Buckets).toLong)).otherwise(acc)
    }
    df.filter(bucket(col(idCol), seed) < threshold)
  }

  /** Domain-mixture rebalancing plan: per-domain keep fractions that
    * reshape the corpus toward `targetShares` by DOWN-sampling only
    * (no row is ever duplicated — upsampling is a training-loader
    * concern, not a storage one). The most over-target domain keeps
    * 100% and every other domain keeps `ratio_d / max_e(ratio_e)` where
    * `ratio_d = target_d / actual_d`, so kept counts land proportional
    * to the target mixture with the largest possible surviving corpus.
    * Domains absent from `targetShares` get share 0 and are dropped.
    *
    * Output: (domain, n_docs, target_share, actual_share, keep_frac).
    * Cost: ONE map-side-combine aggregate over the corpus; the window
    * functions run over |domains| rows. Fractions are plain double
    * arithmetic over the counts, so any engine recomputes them
    * bit-identically from the same counts (the DuckDB oracle does). */
  def mixturePlan(
      df: DataFrame,
      domainCol: String,
      targetShares: Seq[(String, Double)]): DataFrame = {
    require(targetShares.nonEmpty, "at least one target share required")
    require(targetShares.forall(_._2 >= 0), "target shares must be >= 0")
    require(math.abs(targetShares.map(_._2).sum - 1.0) < 1e-9,
      "target shares must sum to 1")
    val target = targetShares.sortBy(_._1).foldLeft(lit(0.0)) {
      case (acc, (k, share)) => when(col(domainCol) === k, lit(share)).otherwise(acc)
    }
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy()
      .rowsBetween(Long.MinValue, Long.MaxValue)
    df.groupBy(domainCol).agg(count(lit(1)).as("n_docs"))
      .withColumn("target_share", target)
      .withColumn("actual_share",
        col("n_docs").cast("double") / sum("n_docs").over(all))
      .withColumn("__ratio", col("target_share") / col("actual_share"))
      .withColumn("keep_frac", col("__ratio") / max("__ratio").over(all))
      .select(domainCol, "n_docs", "target_share", "actual_share", "keep_frac")
  }

  /** Apply a [[mixturePlan]]: deterministic hash resample at each
    * domain's keep fraction. One broadcast join (|domains| rows) + the
    * usual shuffle-free bucket filter — membership is a pure function of
    * (id, seed, the domain counts), reproducible across runs and
    * engines. */
  def resampleToMixture(
      df: DataFrame,
      idCol: String,
      domainCol: String,
      targetShares: Seq[(String, Double)],
      seed: Long): DataFrame = {
    val plan = mixturePlan(df, domainCol, targetShares)
      .select(col(domainCol),
        floor(col("keep_frac") * lit(Buckets.toDouble)).cast("long").as("__thresh"))
    df.join(broadcast(plan), domainCol)
      .filter(bucket(col(idCol), seed) < col("__thresh"))
      .drop("__thresh")
  }

  /** [[mixturePlan]] applied as keep-the-BEST instead of keep-at-random:
    * each domain retains its top `floor(keep_frac * n_docs)` rows by
    * `qualityCol` (ties broken by lowest `idCol` — a total order, so
    * membership is stable and SQL-auditable). This is the composition a
    * training-data pipeline actually wants when reshaping the mixture:
    * the down-sampling a target mixture forces should spend its budget
    * on the LOWEST-quality rows, not a uniform hash of them — the same
    * counts land per domain as [[resampleToMixture]] (so the mixture is
    * hit identically), but the survivors are each domain's best.
    *
    * Scale: one broadcast join (|domains| rows) + one keyed rank window
    * per domain — the [[domainQuota]] shape with a per-domain quota from
    * the plan; for a mega-domain, pre-thin with the salted two-stage
    * trick ([[domainQuotaSkewed]]) before the exact rank. */
  def resampleToMixtureByQuality(
      df: DataFrame,
      idCol: String,
      domainCol: String,
      qualityCol: String,
      targetShares: Seq[(String, Double)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val plan = mixturePlan(df, domainCol, targetShares)
      .select(col(domainCol),
        floor(col("keep_frac") * col("n_docs").cast("double"))
          .cast("long").as("__keep"))
    val w = Window.partitionBy(col(domainCol))
      .orderBy(col(qualityCol).desc, col(idCol).asc)
    df.join(broadcast(plan), domainCol)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= col("__keep"))
      .drop("__rk", "__keep")
  }

  /** Disjoint split assignment (train/val/test …): adds a `split` column
    * chosen by consecutive bucket ranges proportional to `weights`
    * (which must sum to ≤ 1; any remainder falls into the LAST split).
    * Membership is a deterministic function of (id, seed) alone, so a doc
    * can never migrate between splits across runs — the property that
    * keeps evaluation sets uncontaminated as the corpus grows. */
  def assignSplits(
      df: DataFrame,
      idCol: String,
      weights: Seq[(String, Double)],
      seed: Long): DataFrame = {
    require(weights.nonEmpty, "at least one split required")
    require(weights.map(_._2).sum <= 1.0 + 1e-9, "weights must sum to <= 1")
    val b = bucket(col(idCol), seed)
    val bounds = weights.scanLeft(0L) { case (acc, (_, w)) =>
      acc + (w * Buckets).toLong
    }.tail
    val expr = weights.init.zip(bounds.init).foldRight(
      lit(weights.last._1): Column) { case (((name, _), bound), acc) =>
      when(b < bound, lit(name)).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Deterministic global shuffle for training output: every row gets a
    * `shard` in [0, numShards) and a within-shard `shuffle_ord` key, both
    * pure functions of (id, seed) — no RNG, no state, rerunning on the
    * same corpus reproduces the identical permutation. Training loaders
    * want data order decorrelated from ingest order (crawl runs, domain
    * blocks); the scale-correct form is exactly this — a hash order key
    * and ONE shuffle when the shards are written, never a global sort of
    * the corpus by a random() column (non-reproducible, and a repartition
    * +sort anyway). `shuffle_ord` composes two independent [[bucket]]
    * mixes into a [0, 10^8) key so ties are rare; consumers break
    * residual ties on the id. Engine-portable by construction — the same
    * arithmetic is expressible via [[bucketSql]], so a SQL oracle can
    * recompute the full permutation. */
  def shuffleShards(
      df: DataFrame, idCol: String, numShards: Int, seed: Long): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    df.withColumn("shard",
        pmod(bucket(col(idCol), seed + 2), lit(numShards.toLong)))
      .withColumn("shuffle_ord",
        bucket(col(idCol), seed) * lit(Buckets) + bucket(col(idCol), seed + 1))
  }

  /** Greedy selection under a GLOBAL token budget: keep documents in
    * (`qualityCol` desc, `idCol` asc) order while the running token total
    * stays ≤ `budget` — "take the best `budget` tokens", the standard
    * final step when a curated pool must shrink to a target training
    * size. Token counts are exact integers, so the running total (and
    * therefore membership) is bit-reproducible across runs and engines;
    * because counts are non-negative the cumulative sum is monotone and
    * the kept set is a strict PREFIX of the quality ordering.
    *
    * Scale shape: the naive formulation is one global window cumsum —
    * a single-partition sort at 100 TB. Instead, the exact distributed
    * prefix sum (same machinery as [[Profile.quantileProfile]]'s rank
    * selection): range-repartition on the order key, localCheckpoint to
    * pin partition identity, per-partition token sums (≤ P longs to the
    * driver), cumulative offsets back via a broadcast join, and a
    * per-partition window supplies the local component. One wide
    * shuffle + one tiny collect; no global sort ever happens.
    *
    * Output: the kept rows plus `cum_tokens` (inclusive running total).
    * `tokenCol` must be non-negative; NULL counts as 0. */
  def budgetSelect(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      qualityCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0: $budget")
    val spark = df.sparkSession
    import org.apache.spark.sql.expressions.Window
    val nParts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val ranged = df
      .withColumn("__tok", coalesce(col(tokenCol).cast("long"), lit(0L)))
      .repartitionByRange(nParts, col(qualityCol).desc, col(idCol).asc)
      .withColumn("__pid", spark_partition_id())
      .capLineage() // pins partition ids: offsets below stay valid
    val partSums = ranged.groupBy("__pid").agg(sum("__tok").as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    if (partSums.isEmpty) return ranged.withColumn("cum_tokens", lit(0L))
      .where(lit(false)).drop("__tok", "__pid")
    val offsets = partSums.map(_._2).scanLeft(0L)(_ + _).init
    val offDf = spark.createDataFrame(
      partSums.map(_._1).zip(offsets).toSeq).toDF("__pid2", "__off")
    val w = Window.partitionBy("__pid")
      .orderBy(col(qualityCol).desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .withColumn("__local_cum", sum(col("__tok")).over(w))
      .join(broadcast(offDf), col("__pid") === col("__pid2"))
      .withColumn("cum_tokens", col("__off") + col("__local_cum"))
      .where(col("cum_tokens") <= budget)
      .drop("__tok", "__pid", "__pid2", "__off", "__local_cum")
  }

  /** Cap each domain's contribution to the training mix: keep at most
    * `quota` rows per `groupCol`, preferring highest `scoreCol` with
    * ties broken by lowest `idCol` — the anti-domination guard for
    * crawl corpora where a handful of hosts supply most of the pages
    * (the C4/Gopher pipelines apply exactly this shape per domain).
    * Deterministic: the (score desc, id asc) order is a total order, so
    * membership is stable and SQL-auditable like every sampler here.
    *
    * Scale: one keyed shuffle on the domain; `row_number` over the
    * per-domain sort ranks within each group. A skewed mega-domain sorts
    * on one task — acceptable because the rank window is the textbook
    * Spark formulation and the sort is O(n log n) in that domain's rows
    * only; if a single domain outgrows an executor, pre-filter with an
    * approximate per-domain score floor before the exact quota. */
  def domainQuota(
      df: DataFrame,
      groupCol: String,
      scoreCol: String,
      idCol: String,
      quota: Int): DataFrame = {
    require(quota > 0, s"quota must be positive: $quota")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= quota)
      .drop("__rk")
  }

  /** Per-domain QUANTILE cutoff — "drop the worst `frac` of every
    * domain": the adaptive form of quality filtering, where a single
    * global threshold would gut low-scoring domains (code, non-English)
    * and leave high-scoring ones untrimmed. Exact and deterministic:
    * rows rank ascending by `(score, id)` inside their domain and the
    * bottom `floor(frac·n)` of each domain drop — no sampled quantiles,
    * ties broken by id, so reruns and engines agree bit-for-bit (the
    * oracle recomputes the same window). One keyed rank window = one
    * shuffle; for mega-domains compose with the [[domainQuotaSkewed]]
    * salting shape if a single domain exceeds a task's sort budget. */
  def dropBottomFraction(
      df: DataFrame,
      groupCol: String,
      scoreCol: String,
      idCol: String,
      frac: Double): DataFrame = {
    require(frac >= 0.0 && frac < 1.0, s"frac must be in [0,1): $frac")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).asc, col(idCol).asc)
    val n = Window.partitionBy(col(groupCol))
    df.withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(n))
      .filter(col("__rk") > floor(lit(frac) * col("__n")))
      .drop("__rk", "__n")
  }

  /** [[domainQuota]] for SKEWED domain distributions — result-identical
    * (spec-pinned), different cost shape. The plain quota sorts every
    * domain's full row set on ONE task under the rank window; a
    * mega-domain (quota=100 out of 10^9 rows) sorts a billion rows on
    * one executor to keep a hundred. This flavor is the classic salted
    * two-stage top-k: stage 1 ranks within `(domain, salt)` — the
    * mega-domain splits across `salt` parallel partitions of n/salt
    * rows each — and keeps each salted partition's top `quota`; stage 2
    * runs the EXACT rank on the ≤ salt·quota survivors per domain.
    *
    * Result-identity is deterministic, not probabilistic: a row in a
    * domain's true top-quota has at most quota−1 rows ordered ahead of
    * it globally, therefore at most quota−1 in ITS salted partition —
    * it always survives stage 1, and stage 2 is the exact operator.
    * The salt is hashed from the id (no RNG), so reruns are stable. */
  def domainQuotaSkewed(
      df: DataFrame,
      groupCol: String,
      scoreCol: String,
      idCol: String,
      quota: Int,
      salt: Int = 64): DataFrame = {
    require(quota > 0, s"quota must be positive: $quota")
    require(salt >= 1, s"salt must be >= 1: $salt")
    import org.apache.spark.sql.expressions.Window
    val w1 = Window.partitionBy(col(groupCol), col("__salt"))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val pre = df
      .withColumn("__salt", pmod(xxhash64(col(idCol)), lit(salt.toLong)))
      .withColumn("__rk1", row_number().over(w1))
      .filter(col("__rk1") <= quota)
      .drop("__salt", "__rk1")
    domainQuota(pre, groupCol, scoreCol, idCol, quota)
  }

  /** Materialize the shuffled corpus as `numShards` parquet shard
    * directories, rows inside each shard in shuffle order: one hash
    * repartition + per-partition sort (the sort is local — no global
    * range exchange), then a partitioned write. */
  def writeShuffledShards(
      df: DataFrame,
      idCol: String,
      path: String,
      numShards: Int,
      seed: Long): Unit =
    shuffleShards(df, idCol, numShards, seed)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("shuffle_ord"), col(idCol))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
}
