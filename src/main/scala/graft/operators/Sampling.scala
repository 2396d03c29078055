package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
